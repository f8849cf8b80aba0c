"""Text-analysis operators (SURVEY §2.9 — north-star extension).

Language-ID (stopword n-gram heuristic), quality scoring, token counting,
and document fingerprinting over a ``documents(doc_id, text, ...)`` table.
All column expressions are built-in Spark functions (JVM, whole-stage
codegen) — no Python in the hot path — so each operator is one narrow
projection over the scan at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hive_scripts_spark.functions.skew import ensure_parallelism
from hive_scripts_spark.functions.strings import normalize_whitespace

#: tiny per-language stopword anchors for the heuristic language-ID.
#: Deliberately small + deterministic: this is an n-gram/stopword-hit
#: heuristic, not a model. Extend per deployment.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is"),
    "es": ("el", "la", "de", "y", "que", "en", "los"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein"),
    "fr": ("le", "la", "de", "et", "les", "des", "un"),
    "zh": ("的", "是", "了", "在", "和", "有", "我"),
}


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization of normalized text; empty text → empty array."""
    c = F.col(col) if isinstance(col, str) else col
    norm = normalize_whitespace(c)
    return F.when(F.length(norm) == 0, F.array().cast("array<string>")).otherwise(
        F.split(norm, " ")
    )


def token_count(col: Column | str) -> Column:
    """Whitespace token count (the cheap proxy for LLM token budgeting)."""
    return F.size(tokens(col))


def bpe_ish_token_count(col: Column | str) -> Column:
    """BPE-ish sub-word count via regex segmentation: words, numbers, and
    punctuation runs count separately (≈ GPT-style pre-tokenizer split)."""
    c = F.col(col) if isinstance(col, str) else col
    pieces = F.regexp_extract_all(c, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0)
    return F.size(pieces)


def char_classes(col: Column | str) -> dict[str, Column]:
    """Character-class counts used by the quality score."""
    c = F.col(col) if isinstance(col, str) else col
    total = F.length(c)
    alpha = F.length(F.regexp_replace(c, r"[^A-Za-z]", ""))
    digit = F.length(F.regexp_replace(c, r"[^0-9]", ""))
    space = F.length(F.regexp_replace(c, r"[^\s]", ""))
    punct = total - alpha - digit - space
    return {"n_chars": total, "n_alpha": alpha, "n_digit": digit, "n_space": space, "n_punct": punct}


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality features + composite score.

    Features: token count, mean word length, alpha/punct ratios, stopword
    ratio (any language). ``quality_score`` is a deterministic [0,1]
    combination — heuristic, tunable, but stable for regression tests.
    """
    # stage the token array once — it feeds 3+ expressions below, and an
    # unstaged Column would re-tokenize per reference (see dedup.shingle_sets)
    staged = df.select("doc_id", F.col(text_col).alias("__text"), tokens(text_col).alias("__toks"))
    toks = F.col("__toks")
    cc = char_classes(F.col("__text"))
    all_stop = sorted({w for ws in LANG_STOPWORDS.values() for w in ws})
    stop_hits = F.size(F.filter(toks, lambda t: F.lower(t).isin(all_stop)))
    n_tok = F.size(toks)
    safe_tok = F.greatest(n_tok, F.lit(1))
    safe_chars = F.greatest(cc["n_chars"], F.lit(1))
    alpha_ratio = cc["n_alpha"].cast("double") / safe_chars
    punct_ratio = cc["n_punct"].cast("double") / safe_chars
    stop_ratio = stop_hits.cast("double") / safe_tok
    mean_word_len = (
        F.when(n_tok == 0, F.lit(0.0)).otherwise(
            F.aggregate(
                toks, F.lit(0).cast("bigint"), lambda acc, t: acc + F.length(t)
            ).cast("double")
            / safe_tok
        )
    )
    score = F.round(
        F.least(
            F.lit(1.0),
            0.4 * alpha_ratio
            + 0.3 * F.least(stop_ratio * 5, F.lit(1.0))
            + 0.3 * (1 - F.least(punct_ratio * 10, F.lit(1.0))),
        ),
        6,
    )
    return staged.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        F.round(mean_word_len, 6).alias("mean_word_len"),
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        score.alias("quality_score"),
    )


def language_id(
    df: DataFrame, text_col: str = "text", keep_cols: list[str] | None = None
) -> DataFrame:
    """Heuristic language-ID: argmax of per-language stopword hit counts.

    Ties break by language code (deterministic); zero hits → 'und'.
    One projection — the per-language counts are parallel ``filter``
    expressions over the token array, no shuffle, no UDF.

    ``keep_cols`` are carried through the projection so downstream
    stages don't need a re-join on ``doc_id`` (which at scale is a full
    shuffle of two frames derived from the same scan).
    """
    keep = keep_cols or []
    # stage 1: tokenize once; stage 2: per-language hit counts (each a
    # cheap filter over the staged array); stage 3: argmax over the hit
    # attributes (cheap references — no re-count per comparison)
    staged = df.select("doc_id", *keep, F.lower(F.col(text_col)).alias("__lower"))
    toked = staged.select(
        "doc_id",
        *keep,
        F.when(
            F.length(F.trim(F.col("__lower"))) == 0, F.array().cast("array<string>")
        )
        .otherwise(F.split(F.trim(F.regexp_replace("__lower", r"\s+", " ")), " "))
        .alias("__toks"),
    )
    langs = sorted(LANG_STOPWORDS)

    def _hits(words):
        # closure factory keeps the lambda 1-ary (pyspark infers arity)
        return F.size(F.filter(F.col("__toks"), lambda t: t.isin(list(words))))

    counted = toked.select(
        "doc_id",
        *keep,
        *[_hits(LANG_STOPWORDS[lang]).alias(f"hits_{lang}") for lang in langs],
    )
    best = None
    for lang in langs:  # fold: argmax with lang-code tiebreak
        cand = F.struct(F.col(f"hits_{lang}").alias("hits"), F.lit(lang).alias("lang"))
        best = cand if best is None else F.when(cand["hits"] > best["hits"], cand).otherwise(best)
    pred = F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))
    return counted.select(
        "doc_id",
        *keep,
        *[f"hits_{lang}" for lang in langs],
        pred.alias("predicted_lang"),
    )


def doc_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Content fingerprint of normalized text: portable md5 plus a 64-bit
    polynomial rolling hash over tokens (xxhash-combined, Spark-side)."""
    norm = normalize_whitespace(text_col)
    toks = tokens(text_col)
    rolling = F.aggregate(
        toks,
        F.lit(1469598103934665603).cast("decimal(38,0)"),  # FNV offset basis
        lambda acc, t: (acc * 31 + F.xxhash64(t)) % F.lit(2305843009213693951).cast("decimal(38,0)"),
    ).cast("bigint")
    return df.select(
        "doc_id",
        F.md5(norm).alias("content_md5"),
        rolling.alias("rolling_hash"),
    )


def repetition_signals(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Gopher/C4-style within-document repetition features over word
    ``n``-grams: the fraction of gram occurrences that are duplicates and
    the share claimed by the single most-frequent gram. High values mark
    boilerplate / degenerate text a curation pipeline drops.

    Computed entirely map-side: grams are sorted per-doc and run-length
    encoded by ONE ``F.aggregate`` fold (struct accumulator: previous
    gram, current run, best run, distinct-so-far) — no explode, no
    shuffle, no per-doc groupBy. The naïve formulation (explode →
    groupBy(doc, gram) → max) shuffles O(total tokens) rows; this one
    shuffles nothing at any corpus size.

    Each stage (tokens → grams → sorted) is its own projection and the
    fold's accumulator fields are read as lambda *variables* — the
    staged-projection / no-re-extraction rules from PLANS.md's Catalyst
    traps. ``keep_cols`` ride through every projection (same rationale
    as ``language_id(keep_cols=…)`` — a downstream re-join on id would be
    a full extra shuffle at scale).
    """
    keep = [F.col(c) for c in (keep_cols or [])]
    t = F.col("__toks")
    toks = df.select(F.col(id_col), *keep, tokens(text_col).alias("__toks")).where(
        F.size(t) >= n
    )
    grams = toks.select(
        F.col(id_col),
        *keep,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - (n - 1)),
            lambda i: F.concat_ws(" ", *[F.element_at(t, i + k) for k in range(n)]),
        ).alias("__grams"),
    )
    srt = grams.select(
        F.col(id_col),
        *keep,
        F.size("__grams").alias("n_grams"),
        F.array_sort("__grams").alias("__sorted"),
    )
    zero = F.lit(0).cast("bigint")
    init = F.struct(
        F.lit("").alias("prev"),
        zero.alias("run"),
        zero.alias("best"),
        zero.alias("n_distinct"),
    )
    fold = F.aggregate(
        F.col("__sorted"),
        init,
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1).cast("bigint")).alias("run"),
            F.greatest(acc["best"], F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1).cast("bigint"))).alias("best"),
            F.when(x == acc["prev"], acc["n_distinct"]).otherwise(acc["n_distinct"] + 1).alias("n_distinct"),
        ),
        lambda acc: F.struct(acc["best"].alias("best"), acc["n_distinct"].alias("n_distinct")),
    )
    # exact-int inputs → one IEEE double divide each: bit-identical on
    # any engine, no rounding needed. The metrics emit through a
    # GENERATOR (inline_outer) so they are real attributes: a downstream
    # filter like `dup_gram_frac <= 0.10` (the curation gate) cannot be
    # predicate-pushed below this point — pushdown substitutes the WHOLE
    # sort+fold chain into the filter and re-evaluates it per row
    # (measured 8× on the curation pipeline at sf0.1).
    metrics = F.inline_outer(
        F.array(
            F.struct(
                F.col("__f.n_distinct").alias("n_distinct"),
                (
                    (F.col("n_grams") - F.col("__f.n_distinct")).cast("double")
                    / F.col("n_grams").cast("double")
                ).alias("dup_gram_frac"),
                (
                    F.col("__f.best").cast("double")
                    / F.col("n_grams").cast("double")
                ).alias("top_gram_frac"),
            )
        )
    )
    return srt.select(F.col(id_col), *keep, "n_grams", fold.alias("__f")).select(
        F.col(id_col), *keep, "n_grams", metrics
    )


def word_entropy(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Unigram Shannon entropy + type-token ratio per document — the
    classic lexical-diversity quality signals (low entropy / low TTR
    marks degenerate or templated text a curation pipeline drops).

    Like :func:`repetition_signals`, computed entirely map-side: tokens
    are sorted per doc and run-length encoded by one ``F.aggregate``
    fold that accumulates ``Σ c·log2(c)`` and the type count, giving
    ``entropy = log2(n) − Σ c·log2(c) / n`` with NO exchange at any
    corpus size (the naïve explode → groupBy(doc, term) → groupBy(doc)
    plan shuffles O(total tokens) rows twice).

    Returns ``(id_col, n_tokens, n_types, ttr, entropy_bits)`` for
    documents with ≥1 token; floats are rounded to 6 decimals (sum
    order differs across engines only at ~1e-14).
    """
    toks = df.select(F.col(id_col), tokens(text_col).alias("__toks")).where(
        F.size("__toks") > 0
    )
    srt = toks.select(
        F.col(id_col),
        F.size("__toks").alias("n_tokens"),
        F.array_sort("__toks").alias("__sorted"),
    )
    zero = F.lit(0).cast("bigint")
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        zero.alias("run"),
        F.lit(0.0).alias("s"),
        zero.alias("types"),
    )

    def _close_run(acc):
        # Σ c·log2(c) contribution of the finished run (0 for run 0/1)
        return F.when(acc["run"] <= 1, acc["s"]).otherwise(
            acc["s"] + acc["run"].cast("double") * F.log2(acc["run"])
        )

    fold = F.aggregate(
        F.col("__sorted"),
        init,
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(acc["prev"].eqNullSafe(x), acc["run"] + 1)
            .otherwise(F.lit(1).cast("bigint"))
            .alias("run"),
            F.when(acc["prev"].eqNullSafe(x), acc["s"])
            .otherwise(_close_run(acc))
            .alias("s"),
            F.when(acc["prev"].eqNullSafe(x), acc["types"])
            .otherwise(acc["types"] + 1)
            .alias("types"),
        ),
        lambda acc: F.struct(
            _close_run(acc).alias("s"), acc["types"].alias("types")
        ),
    )
    n = F.col("n_tokens").cast("double")
    return srt.select(F.col(id_col), "n_tokens", fold.alias("__f")).select(
        F.col(id_col),
        "n_tokens",
        F.col("__f.types").alias("n_types"),
        F.round(F.col("__f.types").cast("double") / n, 6).alias("ttr"),
        F.round(F.log2(n) - F.col("__f.s") / n, 6).alias("entropy_bits"),
    )


def vocabulary(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 1,
    max_df_frac: float = 1.0,
) -> DataFrame:
    """Corpus vocabulary with occurrence and document frequencies — the
    tokenizer-training / feature-selection preprocessing table.
    ``min_df`` drops hapax-style noise; ``max_df_frac`` drops
    stopword-like terms present in more than that fraction of documents.

    Returns ``(term, n_occurrences, doc_freq)``.

    Scale shape: explode → ONE groupBy(term) with map-side partial
    counts (the distinct-doc count is a per-term partial too since the
    input arrives (doc, term)-grouped only within docs — Spark plans a
    two-phase distinct aggregate). The ``max_df`` bound uses a scalar
    total-doc count (table stat, not a data-path collect).
    """
    n_docs = df.where(F.length(normalize_whitespace(text_col)) > 0).count()
    # explode_outer + null-drop: the non-outer form's inferred
    # size-guard re-evaluates the whole tokenize regexp chain per row
    toks = df.select(
        F.col(id_col), F.explode_outer(tokens(text_col)).alias("term")
    ).where(F.col("term").isNotNull())
    vocab = toks.groupBy("term").agg(
        F.count(F.lit(1)).alias("n_occurrences"),
        F.count_distinct(id_col).alias("doc_freq"),
    )
    return vocab.where(
        (F.col("doc_freq") >= min_df)
        & (F.col("doc_freq") <= F.lit(float(max_df_frac)) * n_docs)
    )


def length_histogram(
    df: DataFrame, length_col: str = "n_chars", bucket_width: int = 100
) -> DataFrame:
    """Document-length histogram: ``(bucket, n_docs, sum_chars)`` with
    ``bucket`` = floor(length / width) × width.

    The dataset-shape report every curation run starts from (length
    cliffs reveal truncation bugs and boilerplate bands). One map-side
    partial agg → one exchange over O(buckets) keys at any scale.
    Bucket math stays in exact integer DIV — float division would make
    edge documents engine-dependent.
    """
    bucket = (F.col(length_col).cast("long") - (F.col(length_col).cast("long") % bucket_width))
    return (
        df.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col(length_col).cast("long")).alias("sum_chars"),
        )
    )


#: shared by :func:`pii_signals` (audit) and :func:`pii_redact`
#: (scrub) — ONE definition so the two can never desynchronize;
#: deliberately conservative ASCII classes that behave identically
#: under Java regex (Spark) and RE2 (DuckDB). The x_pii_* oracles
#: embed the same literals.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+"
PII_DIGITS_RE = r"[0-9][0-9][0-9][0-9]+"


def pii_signals(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document PII indicators: email-shaped matches, long digit
    runs, and the text length after redacting both.

    Patterns (:data:`PII_EMAIL_RE` / :data:`PII_DIGITS_RE`) are exactly
    oracle-checkable. Pure JVM projections — the scrub pass a
    training-data exporter runs over every shard.
    """
    email = PII_EMAIL_RE
    digits = PII_DIGITS_RE
    t = F.col(text_col)
    redacted = F.regexp_replace(F.regexp_replace(t, email, "<EMAIL>"), digits, "<NUM>")
    return df.select(
        "doc_id",
        F.size(F.regexp_extract_all(t, F.lit(email), F.lit(0))).cast("long").alias(
            "n_emails"
        ),
        F.size(F.regexp_extract_all(t, F.lit(digits), F.lit(0))).cast("long").alias(
            "n_digit_runs"
        ),
        F.length(redacted).cast("long").alias("redacted_len"),
    )


def pii_redact(df: DataFrame, text_col: str = "text") -> DataFrame:
    """The redaction itself (:func:`pii_signals` audits, this scrubs):
    emails → ``<EMAIL>``, 4+-digit runs → ``<NUM>``, returning the
    redacted text plus the per-doc redaction count — the frame an
    exporter writes in place of the raw shard. Shared patterns with
    the audit (:data:`PII_EMAIL_RE` / :data:`PII_DIGITS_RE`); one
    pure-JVM projection chain, zero shuffle at any scale.

    ``n_redactions`` counts the substitutions actually made: digit
    runs are counted on the EMAIL-REDACTED text, so digits inside a
    matched address (``user1234@…`` → one ``<EMAIL>``) are not
    double-counted — the count reconciles exactly against the
    placeholder markers in ``text_redacted``.
    """
    email = PII_EMAIL_RE
    digits = PII_DIGITS_RE
    t = F.col(text_col)
    # stage the email pass once: __t1 feeds BOTH the digit count and
    # the final replace (two references — CollapseProject keeps the
    # non-cheap regexp staged rather than inlining it twice)
    staged = df.select(
        "doc_id",
        F.regexp_replace(t, email, "<EMAIL>").alias("__t1"),
        F.size(F.regexp_extract_all(t, F.lit(email), F.lit(0)))
        .cast("long")
        .alias("__ne"),
    )
    return staged.select(
        "doc_id",
        F.regexp_replace(F.col("__t1"), digits, "<NUM>").alias("text_redacted"),
        (
            F.col("__ne")
            + F.size(F.regexp_extract_all(F.col("__t1"), F.lit(digits), F.lit(0)))
        )
        .cast("long")
        .alias("n_redactions"),
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Fixed-budget overlapping document chunking — the sequence-prep
    step in front of embedding / RAG indexing / context-window packing.

    Chunk *k* covers tokens ``[k·step, k·step + chunk_tokens)`` with
    ``step = chunk_tokens − overlap``; the final chunk may be short,
    and a doc shorter than one budget yields exactly one chunk. Returns
    ``(id_col, chunk_id, chunk_text, n_tokens)``; empty docs yield no
    rows.

    Scale shape: pure map-only JVM projection — tokenize once, generate
    the start offsets with ``sequence``, slice per start, one
    ``posexplode``. No shuffle at any corpus size; chunk counts are
    data-proportional so no partition inflates more than its text size
    already implies.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(
            f"overlap must be in [0, chunk_tokens); got overlap={overlap}, "
            f"chunk_tokens={chunk_tokens}"
        )
    step = chunk_tokens - overlap
    norm = normalize_whitespace(text_col)
    toked = df.where(F.length(norm) > 0).select(
        F.col(id_col), F.split(norm, " ").alias("__toks")
    )
    t, n = F.col("__toks"), F.size("__toks")
    chunks = F.transform(
        F.sequence(F.lit(0), n - 1, F.lit(step)),
        lambda s: F.struct(
            F.concat_ws(" ", F.slice(t, s + 1, chunk_tokens)).alias(
                "chunk_text"
            ),
            F.least(F.lit(chunk_tokens), n - s).cast("int").alias("n_tokens"),
        ),
    )
    staged = toked.select(
        F.col(id_col), F.posexplode_outer(chunks).alias("chunk_id", "__c")
    )
    return staged.select(
        id_col, "chunk_id", F.col("__c.chunk_text"), F.col("__c.n_tokens")
    )


def html_to_text(
    df: DataFrame,
    html_col: str = "text",
    id_col: str = "doc_id",
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Per-document HTML→text extraction — the step between a crawl
    body (``sources/warc.split_http``) and the documents table the
    text pipeline consumes. stdlib ``html.parser`` (tag-soup tolerant,
    entities decoded), no third-party dependency:

    * ``script`` / ``style`` / ``noscript`` / ``template`` / ``head``
      subtrees drop entirely (markup plumbing, not content);
    * block-level boundaries (``p div li tr h1..h6 br section article
      header footer table ul ol blockquote pre``) become newlines, so
      downstream line-granular operators (``dedup_lines``,
      ``strip_boilerplate``) see the page's visual line structure;
    * whitespace collapses per line, blank lines drop;
    * the first ``<title>`` text lands in its own column, and
      ``n_links`` counts anchors (a standard page-quality signal —
      link farms score high).

    Returns ``(id_col, *keep_cols, title, text, n_links)`` —
    ``keep_cols`` ride through the same Arrow batch (the
    ``language_id(keep_cols=…)`` rationale: a downstream re-join on id
    to recover the crawl metadata a caller needs, uri/source/status,
    would be a full corpus shuffle). Unparseable payloads degrade to
    NULL text (the multimodal decode contract), never fail the job.
    Map-only Arrow batches — zero shuffle at any corpus size; helpers
    live inside the closure (vanilla-pickling rule).
    """
    keep = list(keep_cols or [])
    clash = {id_col.lower(), html_col.lower()} & {c.lower() for c in keep}
    if clash:
        raise ValueError(f"html_to_text: keep_cols duplicate {clash}")
    # resolve id_col/html_col/keep_cols against df case-insensitively
    # (the spark.sql.caseSensitive=false default the rest of the module
    # assumes) so a missing or miscased name raises a descriptive
    # error instead of a raw KeyError from the dtypes lookup (ADVICE
    # r17: keep_cols got this treatment in r16 while id_col/html_col
    # kept the raw-KeyError path)
    dtypes = dict(df.dtypes)
    referenced = {id_col.lower(), html_col.lower()} | {
        c.lower() for c in keep
    }
    by_lower: dict[str, str] = {}
    for c in dtypes:
        prev = by_lower.setdefault(c.lower(), c)
        if prev != c and c.lower() in referenced:
            # two columns differing only by case can coexist under
            # spark.sql.caseSensitive=true; the lowercase mapping is
            # then ambiguous — silently binding to either would route
            # an arbitrary column through the Arrow batch (ADVICE r17).
            # Only REFERENCED names can be ambiguous here (ADVICE r18):
            # an unrelated case-duplicate pair never enters the Arrow
            # batch, so raising on it broke previously-working calls.
            raise ValueError(
                "html_to_text: input schema has columns differing "
                f"only by case ({prev!r} vs {c!r}) matching a "
                "referenced id_col/html_col/keep_cols name — the "
                "module's case-insensitive resolution is ambiguous; "
                "rename one side upstream"
            )
    missing = [c for c in keep if c.lower() not in by_lower]
    if missing:
        raise ValueError(
            f"html_to_text: keep_cols {missing} not in the input "
            f"DataFrame (columns: {sorted(dtypes)})"
        )
    for role, name in (("id_col", id_col), ("html_col", html_col)):
        if name.lower() not in by_lower:
            raise ValueError(
                f"html_to_text: {role} {name!r} not in the input "
                f"DataFrame (columns: {sorted(dtypes)})"
            )
    id_col = by_lower[id_col.lower()]
    html_col = by_lower[html_col.lower()]
    keep = [by_lower[c.lower()] for c in keep]
    kept_schema = "".join(f", {c} {dtypes[c]}" for c in keep)
    out_schema = (
        f"{id_col} {dtypes[id_col]}{kept_schema}, title string, "
        "text string, n_links int"
    )

    def extract(batches):
        import pandas as pd
        from html.parser import HTMLParser

        DROP = {"script", "style", "noscript", "template", "head"}
        BLOCK = {
            "p", "div", "li", "tr", "td", "th", "dt", "dd", "br",
            "h1", "h2", "h3", "h4", "h5", "h6", "section", "article",
            "header", "footer", "table", "ul", "ol", "blockquote",
            "pre",
        }

        class Extractor(HTMLParser):
            def __init__(self):
                super().__init__(convert_charrefs=True)
                self.parts = []
                self.title_parts = []
                self.drop_depth = 0
                self.in_title = False
                self.title_done = False
                self.n_links = 0

            def handle_starttag(self, tag, attrs):
                # title is RCDATA — it cannot legally contain tags, so
                # ANY start tag ends an unclosed <title> (tag-soup
                # guard: otherwise the whole page routes into title)
                if self.in_title and tag != "title":
                    self.in_title = False
                    # lock only if something was captured: an empty or
                    # tag-interrupted first <title> must not shadow a
                    # later real one
                    self.title_done = bool(
                        "".join(self.title_parts).strip()
                    )
                    if not self.title_done:
                        self.title_parts.clear()
                if tag == "body":
                    # <body> implicitly closes an unclosed <head> (the
                    # browser rule) — without this, tag soup that never
                    # writes </head> would drop the entire page
                    self.drop_depth = 0
                if tag in DROP:
                    self.drop_depth += 1
                elif tag == "title" and not self.title_done:
                    # only the FIRST title element is the document
                    # title — later <title>s (inline-SVG icon labels)
                    # are body content, not metadata
                    self.in_title = True
                elif tag == "a" and not self.drop_depth:
                    # links inside dropped subtrees aren't content the
                    # reader sees — don't inflate the quality signal
                    self.n_links += 1
                if tag in BLOCK:
                    self.parts.append("\n")

            def handle_endtag(self, tag):
                if tag in DROP and self.drop_depth:
                    self.drop_depth -= 1
                elif tag == "title" and self.in_title:
                    self.in_title = False
                    self.title_done = bool(
                        "".join(self.title_parts).strip()
                    )
                    if not self.title_done:
                        self.title_parts.clear()
                if tag in BLOCK:
                    self.parts.append("\n")

            def handle_data(self, data):
                # title wins over the drop guard: <title> lives inside
                # <head>, which is itself a dropped subtree
                if self.in_title:
                    self.title_parts.append(data)
                elif not self.drop_depth:
                    # source-formatting line wraps are NOT page line
                    # structure — only BLOCK tags emit '\n', so the
                    # line-granular operators downstream see element
                    # boundaries, not where the author's editor wrapped
                    self.parts.append(
                        data.replace("\n", " ").replace("\r", " ")
                    )

        def one(html):
            if html is None:
                return None, None, None
            try:
                ex = Extractor()
                ex.feed(str(html))
                ex.close()
                lines = [
                    " ".join(ln.split())
                    for ln in "".join(ex.parts).split("\n")
                ]
                text = "\n".join(ln for ln in lines if ln)
                title = " ".join("".join(ex.title_parts).split()) or None
                return title, text, ex.n_links
            except Exception:  # noqa: BLE001 — degrade, never fail
                return None, None, None

        for pdf in batches:
            trip = [one(v) for v in pdf[html_col]]
            out = pd.DataFrame({id_col: pdf[id_col]})
            for c in keep:
                out[c] = pdf[c]
            out["title"] = [t[0] for t in trip]
            out["text"] = [t[1] for t in trip]
            out["n_links"] = pd.array(
                [t[2] for t in trip], dtype="Int32"
            )
            yield out

    return df.select(id_col, *keep, html_col).mapInPandas(
        extract, out_schema
    )


def bigram_logprob_score(
    df: DataFrame,
    k: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Bigram language-model quality score: per document, the mean
    negative log2 of the add-k-smoothed corpus bigram conditional
    ``p(w_i | w_{i-1}) = (c(w_{i-1}, w_i) + k) / (c1(w_{i-1}) + k·V)``
    over the document's token transitions — one LM order above
    :func:`unigram_logprob_score` (context-aware: a doc of common
    words in an improbable ORDER now scores high, the shuffled-text /
    boilerplate-splice failure mode the unigram filter is blind to).
    Documents with fewer than 2 tokens emit no row (no transitions to
    score). ``c1`` counts bigram LEFT contexts (each doc's last token
    is not a context), ``V`` is the corpus vocabulary size.

    Returns ``(id_col, n_bigrams, mean_neg_logprob)`` (rounded 6dp).

    Determinism contract (same as the unigram scorer): ``c2``, ``c1``,
    ``V`` are exact ints; each logprob is one IEEE divide + one log2;
    the per-doc sum folds SEQUENTIALLY in position order after an
    array_sort, and rounds once — engine-portable to the digit.

    Scale shape: bigrams materialize map-side from a per-doc window
    ``lead`` (one exchange on ``id_col``); corpus counts are two
    map-side-combined aggs keyed on (w1, w2) and (w1); the score join
    is keyed on (w1, w2), co-partitioned with the bigram-count
    exchange; V broadcasts as a 1-row frame; one final exchange packs
    per doc. Vocabulary rides the joins, never the plan.
    """
    from pyspark.sql import Window

    norm = normalize_whitespace(text_col)
    toked = df.where(F.length(norm) > 0).select(
        F.col(id_col),
        F.posexplode_outer(F.split(norm, " ")).alias("pos", "w1"),
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    pairs = toked.select(
        id_col, "pos", "w1", F.lead("w1").over(w).alias("w2")
    ).where(F.col("w2").isNotNull())
    c2 = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("__c2"))
    c1 = pairs.groupBy("w1").agg(F.count(F.lit(1)).alias("__c1"))
    vocab = toked.agg(
        F.count_distinct("w1").cast("double").alias("__v")
    )
    scored = (
        pairs.join(c2, ["w1", "w2"])
        .join(c1, "w1")
        .join(F.broadcast(vocab))
        .select(
            id_col,
            "pos",
            F.log2(
                (F.col("__c2").cast("double") + F.lit(float(k)))
                / (F.col("__c1").cast("double") + F.lit(float(k)) * F.col("__v"))
            ).alias("__lp"),
        )
    )
    packed = scored.groupBy(id_col).agg(
        F.array_sort(F.collect_list(F.struct("pos", "__lp"))).alias("__seq")
    )
    ssum = F.aggregate(
        F.col("__seq"), F.lit(0.0), lambda acc, s: acc + s["__lp"]
    )
    return packed.select(
        F.col(id_col),
        F.size("__seq").cast("bigint").alias("n_bigrams"),
        F.round(-ssum / F.size("__seq"), 6).alias("mean_neg_logprob"),
    )


def unigram_logprob_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Unigram language-model quality score: per document, the mean
    negative log2-probability of its tokens under the CORPUS unigram
    distribution — the classic "perplexity filter" stand-in (docs of
    improbable tokens score high → candidates for dropping; a trained
    KenLM swaps in at the same interface).

    Returns ``(id_col, n_tokens, mean_neg_logprob)`` (rounded 6dp).

    Determinism contract (the reason for the shape): the per-doc sum of
    IEEE doubles depends on summation order, so the token log-probs are
    reassembled per document IN POSITION ORDER (collect → array_sort →
    sequential fold) and rounded ONCE at the end — both engines fold the
    identical sequence, so values match the oracle exactly. A plain
    ``groupBy().sum()`` would sum in partition order and hash-flake.

    Scale shape: one exchange for the vocab counts (map-side partial),
    one broadcast of the 1-row total, one (token → term) join keyed on
    the term — co-partitioned with the counts exchange — and one
    exchange to reassemble per doc. Vocabulary rides the join, never the
    plan (no giant map literal).
    """
    norm = normalize_whitespace(text_col)
    # posexplode_OUTER: the non-outer form's inferred size-guard
    # re-evaluates the normalize+split chain per row (split is never
    # empty — worst case [""] — so outer changes only the skipped
    # recompute)
    toked = df.where(F.length(norm) > 0).select(
        F.col(id_col),
        F.posexplode_outer(F.split(norm, " ")).alias("pos", "term"),
    )
    counts = toked.groupBy("term").agg(F.count(F.lit(1)).alias("__c"))
    total = counts.agg(F.sum("__c").cast("double").alias("__total"))
    scored = toked.join(counts, "term").join(F.broadcast(total)).select(
        id_col,
        "pos",
        F.log2(F.col("__c").cast("double") / F.col("__total")).alias("__lp"),
    )
    packed = scored.groupBy(id_col).agg(
        F.array_sort(F.collect_list(F.struct("pos", "__lp"))).alias("__seq")
    )
    ssum = F.aggregate(
        F.col("__seq"), F.lit(0.0), lambda acc, s: acc + s["__lp"]
    )
    return packed.select(
        F.col(id_col),
        F.size("__seq").cast("bigint").alias("n_tokens"),
        F.round(-ssum / F.size("__seq"), 6).alias("mean_neg_logprob"),
    )


def hashed_linear_score(
    df: DataFrame,
    weights: list[float],
    text_col: str = "text",
    id_col: str = "doc_id",
    portable: bool = True,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Model-based quality filter served from plan literals: per doc,
    the mean over tokens of ``weights[h(token) % len(weights)]`` — the
    inference plan of a hashed-bucket linear text classifier (the
    fastText/CCNet-style quality models used for pretraining curation
    reduce to exactly this at serving time: hash the token, look up its
    weight, average, threshold). ``weights`` are MODEL PARAMETERS (a
    trained model's bucket weights — here a caller-supplied stub, the
    same swap-in philosophy as the k-means/KenLM notes) embedded as one
    literal array, so scoring is a zero-shuffle map-side fold at any
    corpus size.

    Returns ``(id, n_tokens, quality_logit)`` (rounded 6dp; positive =
    keep under a 0 threshold). The fold is SEQUENTIAL in token position
    — both engines accumulate the identical operand sequence, so the
    value is bit-identical. ``portable=True`` buckets tokens with the
    md5-prefix idiom (DuckDB-replayable — the grading twin);
    ``portable=False`` uses ``xxhash64`` (~3× cheaper per hash — the
    production form, no oracle).

    Weight literals are interpolated as decimal strings: strtod is
    correctly rounded in both engines, so the same string parses to the
    same double everywhere.
    """
    k = len(weights)
    wlit = F.expr(
        "array(" + ",".join(f"cast({float(w)!r} as double)" for w in weights) + ")"
    )
    if portable:
        def bucket(t):
            return F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast(
                "bigint"
            ) % k
    else:
        def bucket(t):
            return F.pmod(F.xxhash64(t), F.lit(k))

    keep = keep_cols or []
    norm = normalize_whitespace(text_col)
    base = df.where(F.length(norm) > 0).select(
        F.col(id_col), *keep, F.split(norm, " ").alias("__toks")
    )
    ssum = F.aggregate(
        F.col("__toks"),
        F.lit(0.0),
        lambda acc, t: acc + F.element_at(wlit, (bucket(t) + 1).cast("int")),
    )
    return base.select(
        F.col(id_col),
        *keep,
        F.size("__toks").cast("bigint").alias("n_tokens"),
        F.round(ssum / F.size("__toks"), 6).alias("quality_logit"),
    )


def corpus_ngram_topk(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    k: int = 20,
    min_total: int = 2,
) -> DataFrame:
    """Top-k most repeated word n-grams across the WHOLE corpus — the
    C4/RefinedWeb-style global repetition analysis that drives
    boilerplate discovery and line/paragraph-level dedup policy.

    Returns ``(ngram, n_total, n_docs)``: total occurrences and the
    number of distinct documents containing the gram, ordered by
    ``n_total`` desc with the gram string as the deterministic
    tiebreak (the top-k SET is therefore unique — safe to grade).

    Scale shape: two-level aggregation — per-(ngram, doc) counts first
    (one shuffle keyed on the pair, with map-side partial agg soaking
    up within-doc repeats), then the per-ngram rollup (second, much
    smaller shuffle; ``n_docs`` is a plain ``count(*)`` because level 1
    already made (ngram, doc) unique — no count_distinct expand). The
    top-k itself is ``orderBy().limit(k)`` = TakeOrderedAndProject:
    per-partition bounded heaps merged on the driver, never a global
    sort. Gram text leaves the executors only inside the final k rows.
    """
    toks = df.select(
        F.col(id_col),
        F.split(normalize_whitespace(text_col), " ").alias("__toks"),
    )
    t = F.col("__toks")
    # explode_OUTER: the non-outer generator gets an inferred
    # size(...)>0 filter with full expression substitution — the whole
    # n-gram transform would re-evaluate per row (the ≈10× posexplode
    # trap measured on remove_repeated_spans). The where(size>=n) above
    # already guarantees non-empty arrays, so outer changes nothing but
    # the skipped recompute.
    grams = toks.where(F.size(t) >= n).select(
        F.col(id_col),
        F.explode_outer(
            F.transform(
                F.sequence(F.lit(1), F.size(t) - (n - 1)),
                lambda i: F.concat_ws(
                    " ", *[F.element_at(t, i + j) for j in range(n)]
                ),
            )
        ).alias("ngram"),
    )
    per_doc = grams.groupBy("ngram", id_col).agg(
        F.count(F.lit(1)).alias("__c")
    )
    agg = per_doc.groupBy("ngram").agg(
        F.sum("__c").cast("bigint").alias("n_total"),
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
    )
    return (
        agg.where(F.col("n_total") >= min_total)
        .orderBy(F.col("n_total").desc(), F.col("ngram").asc())
        .limit(k)
    )


def quality_gate_report(
    df: DataFrame,
    weights: list[float],
    group_col: str = "source",
    threshold: float = 0.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    portable: bool = True,
) -> DataFrame:
    """Per-group keep/drop report of the hashed-linear quality gate —
    what a curation run publishes per source before committing a
    filter threshold.

    Returns ``(group, n_keep, n_drop, keep_frac, mean_logit)`` where
    keep means ``quality_logit > threshold``. The scoring fold rides
    :func:`hashed_linear_score` with ``keep_cols=[group_col]`` (the
    group label is carried through the projection — no re-join on the
    id at any scale), and the rollup is one groupBy over the handful
    of sources with map-side partials. ``mean_logit`` accumulates the
    6dp-rounded logits as exact decimals (commutative), so the oracle
    replays the value bit-for-bit.

    Denominator contract: empty/whitespace-only documents are OUTSIDE
    the report — :func:`hashed_linear_score` scores only non-empty
    text, so ``n_keep + n_drop`` counts scoreable docs, not corpus
    rows, and a group whose every doc is empty emits no row. Reconcile
    against a raw per-group ``count(*)`` if the empty share matters to
    the threshold decision (empties are typically dropped by the
    length gate before this report is read).
    """
    scored = hashed_linear_score(
        df,
        weights,
        text_col=text_col,
        id_col=id_col,
        portable=portable,
        keep_cols=[group_col],
    )
    keep = (F.col("quality_logit") > threshold).cast("long")
    return scored.groupBy(F.col(group_col).alias("source")).agg(
        F.sum(keep).cast("bigint").alias("n_keep"),
        F.sum(1 - keep).cast("bigint").alias("n_drop"),
        F.round(F.sum(keep) / F.count(F.lit(1)), 6).alias("keep_frac"),
        F.round(
            F.sum(F.col("quality_logit").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("mean_logit"),
    )


def compression_signal(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    level: int = 6,
    parallelism: int | None = None,
) -> DataFrame:
    """Per-document zlib compressibility — the quality signal that
    catches machine-generated and template-stamped text that passes
    word-level repetition gates (the DEFLATE window sees long-range
    byte repeats that n-gram counters miss). Used alongside the Gopher
    repetition thresholds in published curation recipes: an extreme
    ``compression_ratio`` (uncompressed/compressed bytes) in either
    direction is a drop signal — very high = repetitive/templated,
    very low (≈1) = random-ish bytes, not natural language.

    Returns ``(id_col, n_bytes, n_bytes_zlib, compression_ratio)``;
    ``compression_ratio`` is NULL for empty documents.

    Scale shape: Arrow-batched ``mapInPandas`` (compression is genuine
    per-byte CPU — no built-in expression exists), zero shuffle, output
    is 4 narrow columns per doc. ``zlib``/``pandas`` import INSIDE the
    closure: a module-level reference would pickle by reference and
    die on driver-side Python workers that can't import this repo.
    """
    schema = (
        f"{id_col} long, n_bytes bigint, n_bytes_zlib bigint, "
        "compression_ratio double"
    )
    src = df.select(F.col(id_col), F.col(text_col).alias("__text"))
    src = ensure_parallelism(src, parallelism)

    def fold(batches):
        import zlib

        import pandas as pd

        for pdf in batches:
            raw = [
                (t if isinstance(t, str) else "").encode("utf-8")
                for t in pdf["__text"]
            ]
            n_bytes = [len(b) for b in raw]
            n_zlib = [len(zlib.compress(b, level)) for b in raw]
            yield pd.DataFrame(
                {
                    # id_col/level close over plain str/int — pickled by
                    # VALUE, safe off-repo (unlike module references)
                    id_col: pdf[id_col],
                    "n_bytes": n_bytes,
                    "n_bytes_zlib": n_zlib,
                    "compression_ratio": [
                        round(nb / nz, 6) if nb else None
                        for nb, nz in zip(n_bytes, n_zlib)
                    ],
                }
            )

    return src.mapInPandas(fold, schema)


def length_profile(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Per-group token-length profile — the calibration report read
    before setting length-filter thresholds (min-token gates, trim
    percentiles): doc count, p50/p90 token length (continuous
    interpolation — matches ``quantile_cont`` cross-engine, the
    ``g_percentiles``-proven pairing), and the min/max extremes.

    One groupBy over the handful of sources; the token count is a
    map-side projection, so the shuffle carries (group, n) pairs only.
    """
    norm = normalize_whitespace(text_col)
    staged = df.where(F.length(norm) > 0).select(
        F.col(group_col).alias("source"),
        F.size(F.split(norm, " ")).alias("__n"),
    )
    return staged.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.round(F.percentile("__n", F.lit(0.5)), 4).alias("p50_tokens"),
        F.round(F.percentile("__n", F.lit(0.9)), 4).alias("p90_tokens"),
        F.min("__n").cast("bigint").alias("min_tokens"),
        F.max("__n").cast("bigint").alias("max_tokens"),
    )
