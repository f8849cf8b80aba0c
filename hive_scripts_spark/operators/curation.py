"""End-to-end training-data curation: the composition the registry's
``x_curation_full`` query rolls up and the ``curate`` CLI ships.

Stages (each an already-oracle-verified operator):

1. exact dedup (md5 of normalized text, min-id survivor);
2. benchmark decontamination (word-4-gram overlap, benchmark grams
   broadcast) — optional;
3. repetition gate (within-doc dup-2-gram fraction, zero-shuffle fold);
4. quality gate (alpha ratio ≥ 0.5, ≥ 10 tokens);
5. language-ID (stopword-hit argmax).

Shuffle budget at any scale: the dedup groupBy, the decontamination
gram join's per-doc count, and nothing else before the caller's rollup
or write — the contamination flag set and the benchmark gram set
broadcast, repetition/quality/lang-ID are map-only, and ``keep_cols``
threading avoids every re-join on doc_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hive_scripts_spark.functions.strings import normalize_whitespace
from hive_scripts_spark.operators import dedup as D
from hive_scripts_spark.operators import textstats as X


def curate_documents(
    docs: DataFrame,
    benchmark: DataFrame | None = None,
    max_dup_gram_frac: float = 0.10,
    min_alpha_ratio: float = 0.5,
    min_tokens: int = 10,
) -> DataFrame:
    """Run the full curation pipeline; returns the KEPT documents as
    ``(doc_id, text, n_tokens, predicted_lang)`` — the frame a training
    exporter shards and packs. ``benchmark=None`` skips decontamination.
    """
    deduped = (
        docs.select(
            "doc_id", "text", F.md5(normalize_whitespace("text")).alias("__h")
        )
        .groupBy("__h")
        .agg(F.min_by(F.struct("doc_id", "text"), "doc_id").alias("__r"))
        .select(
            F.col("__r.doc_id").alias("doc_id"), F.col("__r.text").alias("text")
        )
    )
    if benchmark is not None:
        flags = D.contamination_overlap(deduped, benchmark, n=4).select("doc_id")
        deduped = deduped.join(F.broadcast(flags), "doc_id", "left_anti")
    kept = X.repetition_signals(deduped, keep_cols=["text"]).where(
        F.col("dup_gram_frac") <= max_dup_gram_frac
    )
    alpha = F.length(F.regexp_replace("text", "[^A-Za-z]", "")).cast(
        "double"
    ) / F.greatest(F.length("text"), F.lit(1))
    toked = kept.select(
        "doc_id", "text", X.tokens("text").alias("__t"), alpha.alias("__alpha")
    )
    gated = toked.where(
        (F.col("__alpha") >= min_alpha_ratio) & (F.size("__t") >= min_tokens)
    )
    lang = X.language_id(
        gated.withColumn("n_tokens", F.size("__t")),
        keep_cols=["n_tokens", "text"],
    )
    return lang.select("doc_id", "text", "n_tokens", "predicted_lang")


def curation_report(curated: DataFrame) -> DataFrame:
    """Per-language rollup of a :func:`curate_documents` result."""
    return curated.groupBy("predicted_lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
    )


def split_leakage_pairs(
    docs: DataFrame,
    pairs: DataFrame,
    key_cols: list[str] | None = None,
    id_col: str = "doc_id",
    val_pct: int = 5,
    test_pct: int = 5,
) -> DataFrame:
    """Eval-contamination check: near-duplicate pairs whose two ends
    land in DIFFERENT train/val/test splits — the leakage that makes a
    held-out set quietly un-held-out (a val doc that is a near-dup of
    a train doc measures memorization, not generalization). Composes
    the hash-stable :func:`~hive_scripts_spark.functions.canonical.
    train_val_test_split` with any near-dup pair frame
    (``(a_id, b_id, …)``, e.g. the MinHash-LSH verifiers).

    Returns the pair frame + ``split_a`` / ``split_b``, filtered to
    ``split_a != split_b``. Plan: the split assignment is a pure
    scan-side projection of the doc keys (no shuffle), so the cost is
    two broadcast-or-keyed joins of the SMALL pair frame against the
    id→split projection — at 100 TB the pair frame (LSH-verified
    near-dups) is orders smaller than the corpus and the corpus is
    touched once, projection-only.
    """
    from hive_scripts_spark.functions.canonical import train_val_test_split

    assigned = train_val_test_split(
        docs, key_cols or [id_col], val_pct=val_pct, test_pct=test_pct
    ).select(F.col(id_col), F.col("split"))
    out = (
        pairs.join(
            assigned.select(
                F.col(id_col).alias("a_id"), F.col("split").alias("split_a")
            ),
            "a_id",
        )
        .join(
            assigned.select(
                F.col(id_col).alias("b_id"), F.col("split").alias("split_b")
            ),
            "b_id",
        )
        .where(F.col("split_a") != F.col("split_b"))
    )
    return out


def split_leakage_report(leaks: DataFrame) -> DataFrame:
    """Rollup of :func:`split_leakage_pairs`: pair counts per ordered
    (split_a, split_b) boundary — the number every training run should
    assert is zero (or route through pair-aware split assignment)."""
    return leaks.groupBy("split_a", "split_b").agg(
        F.count(F.lit(1)).alias("n_pairs")
    )


def cap_per_domain(
    docs: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    cap: int = 1000,
    salts: int = 32,
    keep_rank: bool = False,
) -> DataFrame:
    """Per-registrable-domain document quota: at most ``cap`` docs per
    eTLD+1, picked in portable-md5 order of ``id_col`` — the domain
    balancing a Common-Crawl-derived training mix runs so that one
    SEO-farm or wiki-mirror domain cannot dominate the corpus (the
    C4/Gopher-style per-site cap, applied deterministically instead of
    by ``rand()``: reruns, engines, and any replay agree row-for-row).

    The grouping key is
    :func:`~hive_scripts_spark.functions.urls.url_registered_domain`
    (eTLD+1 approximation; IP-literal hosts bucket whole), so
    ``a.example.com`` and ``b.example.com`` share one quota — per-HOST
    capping would let a subdomain farm multiply its share. Docs whose
    URL has no host ('' — relative or garbage) share the '' bucket and
    are capped like any domain rather than passed through unbounded.

    Scale shape: the pick is
    :func:`~hive_scripts_spark.functions.skew.topk_per_group`, the
    salted two-level EXACT top-k — the very domain the cap exists to
    neutralize is the hot group that would otherwise make the natural
    single-window form a one-task straggler. Salting is
    bit-transparent (result equals the window form), so the oracle
    idiom for anything built on this is the plain
    ``row_number() over (partition by domain order by md5(id), id)``.
    One exchange on (domain, salt) + the bounded level-2 rank; no
    joins. ``keep_rank=True`` retains the 1-based ``pick_order``
    audit column. ``id_col`` must be non-null (enforced — NULLs raise
    at execution) and unique (the caller's contract, as for every
    doc_id here): duplicates make the pick order a non-total order
    with nondeterministic ranks."""
    from hive_scripts_spark.functions.skew import topk_per_group
    from hive_scripts_spark.functions.urls import url_registered_domain

    if cap < 1:
        raise ValueError(f"cap_per_domain: cap must be >= 1, got {cap}")
    existing = {c.lower() for c in docs.columns}
    if "__domain" in existing:
        raise ValueError("cap_per_domain: column '__domain' already exists")
    staged = docs.withColumn("__domain", url_registered_domain(url_col))
    # the pick order (md5(id), id) is a total order ONLY for non-null
    # unique ids (topk_per_group's stated requirement). md5(NULL) is
    # NULL and sorts first, so NULL-id rows would both monopolize the
    # quota and rank nondeterministically — fail loudly instead
    # (r15 review pass 4). Duplicate ids are the caller's contract
    # (every docs table here carries a unique doc_id); they cannot be
    # detected row-locally without an extra pass.
    id_c = F.col(id_col)
    guarded_id = F.when(
        id_c.isNull(),
        F.raise_error(
            F.lit(
                f"cap_per_domain: {id_col!r} contains NULLs — the md5 "
                "pick order requires non-null unique ids"
            )
        ).cast("string"),
    ).otherwise(id_c.cast("string"))
    capped = topk_per_group(
        staged,
        ["__domain"],
        [F.md5(guarded_id), id_c],
        cap,
        salt_from=id_col,
        salts=salts,
        rank_name="pick_order",
    )
    out = capped.drop("__domain")
    return out if keep_rank else out.drop("pick_order")


def domain_report(docs: DataFrame, url_col: str = "url") -> DataFrame:
    """Per-registrable-domain corpus profile: ``(domain, n_docs)``
    sorted nowhere (caller orders) — the before/after audit frame for
    :func:`cap_per_domain` and the quota-sizing input (pick ``cap``
    off this distribution's tail). One map-side-combined exchange on
    the domain key."""
    from hive_scripts_spark.functions.urls import url_registered_domain

    return docs.groupBy(
        url_registered_domain(url_col).alias("domain")
    ).agg(F.count(F.lit(1)).alias("n_docs"))
