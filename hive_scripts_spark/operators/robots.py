"""RFC 9309 robots.txt politeness filter (LLM-pipeline extension
surface; the reference has no web concept — this extends the same
"parse a config, gate the rows" posture as its INI layer,
``verizon_automation_script.sh:1-40``, to the crawl-compliance gate a
web-scale training pipeline needs).

A crawl-derived corpus (the WARC → documents chain in
:mod:`hive_scripts_spark.sources.warc`) carries pages whose sites
disallow crawling — either the fetch predated the rule or the crawler
ignored it. Training pipelines increasingly re-apply robots policies
AT CURATION TIME (respect-robots post-filtering): parse each host's
``robots.txt`` once, then gate every document URL by the rules. That
shape is exactly right for Spark:

* **Rule extraction is per-host and tiny**: one ``mapInPandas`` pass
  over (host, robots payload) rows — helpers defined inside the
  closure per the repo's vanilla-pickling rule — emits one packed
  rule array per host. Map-only, no shuffle; a million hosts make a
  few-hundred-MB rules table.
* **The decision is JVM-side**: documents join the rules table on
  host (broadcast by default — the rules side is host-count-sized,
  never corpus-sized), then ONE array fold per row picks the
  longest-match verdict. Robots patterns compile to SQL ``LIKE``
  patterns at parse time (``*`` → ``%``, trailing ``$`` anchors by
  omitting the trailing ``%``, LIKE metacharacters escaped), so the
  100 TB hot path is a single join + projection — zero Python, zero
  extra exchange.

Semantics implemented (RFC 9309, with the documented choices every
real implementation makes):

* Group parsing: consecutive ``User-agent`` lines open a group and
  share its rules; a ``User-agent`` line after rules starts a NEW
  group; rules before any ``User-agent`` line are invalid and
  ignored; ``#`` comments stripped; unknown directives ignored (they
  also end a group's agent-collecting state, per the spec's
  "groups are separated by user-agent lines" reading).
* Agent selection: case-insensitive EXACT product-token match; all
  matching groups MERGE (RFC 9309 §2.2.1); the ``*`` group applies
  only when no named group matched. (Googlebot-style token-prefix
  matching is an implementation extension — callers wanting it pass
  the exact token their crawler used.)
* Rule matching: patterns match from the start of ``path?query``;
  ``*`` matches any run of octets; a trailing ``$`` anchors the end.
  The most specific (longest pattern, RFC §2.2.2) match wins; on an
  allow/disallow tie at equal length, ALLOW wins. No matching rule —
  or no rules, or no robots.txt row for the host at all — means
  allowed.
* An empty ``Disallow:`` value is the classic allow-all idiom (no
  rule emitted); patterns not starting with ``/`` or ``*`` get ``/``
  prepended (the lenient reading of real-world files).

Deliberately out of scope: ``Crawl-delay`` (a fetch-scheduler
concern, not a corpus gate), ``Sitemap`` records, percent-encoding
normalization (canonicalize URLs first —
:func:`hive_scripts_spark.functions.urls.canonical_url`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: schema of the per-host rules table emitted by robots_rules
RULES_SCHEMA = (
    "host string, rules array<struct<pat: string, spec: int, "
    "allow: boolean>>"
)


def build_rules_fn():
    """Return the pure-Python ``(payload, agent) -> [(like_pattern,
    specificity, allow), …]`` compiler as a NESTED function, so worker
    closures capture it by value (cloudpickle serializes nested
    functions whole — the off-repo-driver rule) and tests can exercise
    the exact code the executors run."""

    def rules_for(payload: str, agent: str):
        agent = agent.strip().lower()
        groups: list[tuple[set, list]] = []
        collecting_ua = False
        # a UTF-8 BOM (common in real robots.txt files) would glue
        # itself to the first directive name and silently void the
        # whole file (unknown key -> group never opens -> allow-all)
        payload = payload.lstrip("﻿")
        for raw in payload.splitlines():
            line = raw.split("#", 1)[0].strip()
            if not line or ":" not in line:
                continue
            key, _, val = line.partition(":")
            key = key.strip().lower()
            val = val.strip()
            if key == "user-agent":
                if not collecting_ua:
                    groups.append((set(), []))
                    collecting_ua = True
                groups[-1][0].add(val.lower())
            elif key in ("allow", "disallow"):
                collecting_ua = False
                # empty value = no rule (the allow-all idiom); rules
                # before any user-agent line are invalid -> ignored
                if val and groups:
                    groups[-1][1].append((val, key == "allow"))
            else:
                collecting_ua = False

        selected = [rules for agents, rules in groups if agent in agents]
        if not selected:
            selected = [rules for agents, rules in groups if "*" in agents]

        out = []
        for rules in selected:
            for pattern, allow in rules:
                if not pattern.startswith(("/", "*")):
                    pattern = "/" + pattern
                anchored = pattern.endswith("$")
                body = pattern[:-1] if anchored else pattern
                like = []
                for ch in body:
                    if ch == "*":
                        like.append("%")
                    elif ch in ("%", "_", "\\"):
                        like.append("\\" + ch)
                    else:
                        like.append(ch)
                if not anchored:
                    like.append("%")
                # specificity = octets of the original pattern (RFC
                # 9309 §2.2.2 "most octets"); the trailing $ counts,
                # keeping /a$ more specific than /a
                out.append(("".join(like), len(pattern), allow))
        return out

    return rules_for


def robots_rules(
    df: DataFrame,
    host_col: str = "host",
    payload_col: str = "payload",
    agent: str = "*",
) -> DataFrame:
    """Compile (host, robots.txt payload) rows into the per-host rule
    table :data:`RULES_SCHEMA` for ``agent``.

    Map-only (one output row per input row, no shuffle at any scale);
    a NULL payload yields an empty rule array (allow-all — the
    no-robots/404 contract). Feed one row per host — duplicate fetches
    of the same host should be deduped upstream (e.g. keep the latest
    by fetch time with ``incremental.merge_upsert``)."""
    rules_for = build_rules_fn()
    src = df.select(
        F.col(host_col).alias("host"), F.col(payload_col).alias("payload")
    )

    def compile_rules(batches):
        import pandas as pd

        for pdf in batches:
            # isinstance guard covers both None and the pandas-NaN
            # form a null string column can take inside the UDF
            rules = [
                rules_for(payload, agent)
                if isinstance(payload, str)
                else []
                for payload in pdf["payload"]
            ]
            yield pd.DataFrame({"host": pdf["host"], "rules": rules})

    return src.mapInPandas(compile_rules, RULES_SCHEMA)


def _url_path_query(url: Column) -> Column:
    """``path?query`` of an absolute URL — the robots match subject
    (RFC matches the path, and every real implementation includes the
    query). Empty path reads as ``/``; non-URLs yield ``/`` (they have
    no path to disallow)."""
    from hive_scripts_spark.functions.urls import _URL_RE

    path = F.regexp_extract(url, _URL_RE, 4)
    query = F.regexp_extract(url, _URL_RE, 5)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    return F.when(query == "", path).otherwise(
        F.concat(path, F.lit("?"), query)
    )


#: SQL type of one compiled rule array (the RULES_SCHEMA value side)
_RULES_ARRAY_T = "array<struct<pat: string, spec: int, allow: boolean>>"


def apply_robots(
    docs: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
    broadcast_rules: bool = True,
    decision_col: str = "robots_allowed",
    validate_rules: bool = True,
) -> DataFrame:
    """Add ``decision_col`` (boolean) to ``docs``: whether each row's
    ``url_col`` is allowed by the per-host ``rules`` table (from
    :func:`robots_rules`).

    One equi-join on host (broadcast by default — the rules side is
    bounded by host count; pass ``broadcast_rules=False`` to let AQE
    choose when the host set is huge) plus one JVM array fold per
    row; the only other exchange is the rules-side host merge, so the
    corpus side stays map-only. Hosts with no rules row, empty rule
    arrays, and unparseable URLs are allowed (RFC: no robots.txt
    means crawl permitted); duplicate rows collapsing to one
    normalized host combine conservatively — identical refetches
    merge, an empty refetch defers, but DIFFERING non-empty rule sets
    are an error (dedupe upstream by fetch time). The conflict raise
    is IN-PLAN always — a conflicting host aborts at execution time
    whatever the flags (r16 ADVICE: an uncached stream-static rules
    side recompiles per micro-batch, so a plan-build-only check could
    silently under-block a rules source that changed after it). With
    ``validate_rules=True`` (default) the same check ADDITIONALLY runs
    as an EAGER job over the host-count-sized rules side at plan-build
    time, so a bad rules table fails in seconds instead of aborting
    the (possibly 100 TB, mid-write) corpus job at execution; pass
    ``validate_rules=False`` to skip that extra rules-side job.
    Streaming consumers (stream-static join) should ``.cache()`` the
    ``rules`` DataFrame — the static side re-executes its compile +
    merge every micro-batch otherwise (and, with validation on, once
    more up front)."""
    existing = {c.lower() for c in docs.columns}
    for c in ("__robots_host", "__robots_path", "__robots_rules"):
        # case-insensitive: withColumn resolves names that way under
        # the spark.sql.caseSensitive=false default
        if c in existing:
            raise ValueError(f"apply_robots: column {c!r} already exists")
    from hive_scripts_spark.functions.urls import normalize_host, url_host

    # the docs side joins on url_host() output; the rules side routes
    # through the SAME normalize_host expression — a rules table fed
    # raw fetch metadata ('Example.COM.') would otherwise miss the
    # join and silently allow every URL on the host. Rows whose raw
    # hosts normalize to ''/NULL are dropped (r15 ADVICE): they can
    # never name a real site, but '' is exactly the join key every
    # garbage/relative URL lands on (_url_path_query gives those
    # path '/'), so one malformed rules row would otherwise gate
    # every non-URL in the corpus under its rules. Rows whose raw
    # hosts collapse to one normalized host combine: a plain select
    # would emit duplicate join keys, duplicating every corpus row
    # for the host AND letting a disallowed doc survive
    # filter_by_robots through its empty-rules copy. Combining is
    # CONSERVATIVE (review pass 3): identical refetches collapse and
    # an empty-rules refetch defers to the non-empty one, but two
    # DIFFERING non-empty rule sets raise — RFC 9309's group merge is
    # defined within one robots.txt, not across conflicting fetches,
    # and silently unioning them can under-block (a stale longer
    # Allow outranking the live Disallow). Dedupe upstream by fetch
    # time (merge_upsert) to resolve. The groupBy is an exchange on
    # the host-count-bounded rules side only — the corpus never
    # shuffles.
    distinct_sets = F.array_distinct(F.collect_list("__rules"))
    nonempty = F.filter(distinct_sets, lambda a: F.size(a) > 0)
    grouped = (
        rules.select(
            normalize_host("host").alias("__robots_host"),
            F.col("rules").alias("__rules"),
        )
        .where(
            F.col("__robots_host").isNotNull()
            & (F.col("__robots_host") != "")
        )
        .groupBy("__robots_host")
        .agg(nonempty.alias("__robots_sets"))
    )
    conflict_msg = (
        "conflicting robots rules for host {} (distinct fetches "
        "disagree) — dedupe the rules table upstream, keeping the "
        "latest fetch per host"
    )
    if validate_rules:
        # eager pre-check: surface the conflict BEFORE any corpus job
        # runs. This is an EXTRA early read of the rules side, not a
        # replacement for the in-plan guard below (r16 ADVICE): an
        # uncached stream-static rules side recompiles every
        # micro-batch, and a rules source that changes between this
        # check and corpus execution would otherwise silently resolve
        # a late conflict to an arbitrary fetch — the under-block the
        # in-plan raise exists to prevent.
        # limit(6): the 6th row only proves more than 5 conflicts
        # exist, so the truncation marker never fires on an exactly-5
        # list (ADVICE r17 — '… (first 5 shown)' used to imply more
        # when the list was already exhaustive)
        bad = [
            r["__robots_host"]
            for r in grouped.where(F.size("__robots_sets") > 1)
            .select("__robots_host")
            .limit(6)
            .collect()
        ]
        if bad:
            shown = ", ".join(bad[:5])
            if len(bad) > 5:
                shown += ", … (first 5 shown)"
            raise ValueError(
                "apply_robots: " + conflict_msg.format(shown)
            )
    # in-plan guard, active regardless of validate_rules: conflicting
    # fetches for a host raise at execution time. try_element_at in
    # the otherwise arm: NULL (-> empty via the coalesce below) when
    # every fetch for the host was empty-rules; plain element_at
    # throws on the empty array under ANSI.
    merged = F.when(
        F.size("__robots_sets") > 1,
        F.raise_error(
            F.concat(
                F.lit("apply_robots: " + conflict_msg.split("{}")[0]),
                F.col("__robots_host"),
                F.lit(conflict_msg.split("{}")[1]),
            )
        ).cast(_RULES_ARRAY_T),
    ).otherwise(F.try_element_at("__robots_sets", F.lit(1)))
    rules_side = grouped.select(
        "__robots_host",
        F.coalesce(merged, F.lit([]).cast(_RULES_ARRAY_T)).alias(
            "__robots_rules"
        ),
    )
    if broadcast_rules:
        rules_side = F.broadcast(rules_side)

    staged = docs.withColumn(
        "__robots_host", url_host(url_col)
    ).withColumn("__robots_path", _url_path_query(F.col(url_col)))
    joined = staged.join(rules_side, on="__robots_host", how="left")

    path = F.col("__robots_path")
    matched = F.filter(
        F.coalesce(F.col("__robots_rules"), F.lit([]).cast(_RULES_ARRAY_T)),
        lambda r: F.like(path, r["pat"], F.lit("\\")),
    )
    # longest match wins; equal-length tie -> allow wins; no match ->
    # the init struct (spec -1, allow) stands = allowed
    verdict = F.aggregate(
        matched,
        F.struct(
            F.lit(-1).alias("spec"), F.lit(True).alias("allow")
        ),
        lambda acc, r: F.when(
            (r["spec"] > acc["spec"])
            | ((r["spec"] == acc["spec"]) & r["allow"]),
            F.struct(r["spec"].alias("spec"), r["allow"].alias("allow")),
        ).otherwise(acc),
    )
    return (
        joined.withColumn(decision_col, verdict["allow"])
        .drop("__robots_host", "__robots_path", "__robots_rules")
    )


def filter_by_robots(
    docs: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
    broadcast_rules: bool = True,
) -> DataFrame:
    """Keep only the rows :func:`apply_robots` allows (the curation
    gate form); same plan plus one narrow filter."""
    out = apply_robots(
        docs,
        rules,
        url_col=url_col,
        broadcast_rules=broadcast_rules,
        decision_col="__robots_verdict",
    )
    return out.where(F.col("__robots_verdict")).drop("__robots_verdict")
