"""Deduplication operators (SURVEY §2.9 — north-star extension).

Five dedup strategies over a ``documents(doc_id, text, ...)`` table, each
designed partition-parallel for 100 TB:

* **exact** — hash-groupBy on (normalized) content; one shuffle keyed by
  the content hash, never by the text itself (64-bit keys shuffle ~100×
  less data than raw documents).
* **MinHash + LSH** — shingle → k minhashes → b bands → bucket-join;
  candidate pairs only ever meet inside a band bucket, so the shuffle is
  O(docs × bands), not O(docs²).
* **SimHash** — 64-bit sign-sum signature; near-dups share signatures at
  small Hamming distance (bucketed by rotated prefixes).
* **n-gram Jaccard** — exact verification join over shared shingles
  (used standalone at small n, or as the verify stage after LSH).
* **embedding cosine** — see :mod:`hive_scripts_spark.operators.similarity`.

All hashing is deterministic (seeded md5/xxhash64) — no ``rand()`` — so
results are reproducible run-to-run and testable against oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hive_scripts_spark.functions.strings import normalize_whitespace

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(df: DataFrame, content_cols: list[str], id_col: str = "doc_id") -> DataFrame:
    """Keep the min-id row per exact content group.

    Returns ``(id_col, n_dups)`` — the survivor id and its group size.
    Deterministic survivor choice (min id), unlike ``dropDuplicates``
    whose survivor depends on partition order.
    """
    return df.groupBy(*content_cols).agg(
        F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("n_dups")
    ).select(id_col, "n_dups")


def fingerprint_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup on the md5 of normalized text. At scale, grouping by a
    fixed-width hash instead of the raw text keeps shuffle rows small and
    dodges wide-value skew."""
    norm_hash = F.md5(normalize_whitespace(text_col)).alias("content_hash")
    return (
        df.select(norm_hash, F.col(id_col))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("n_dups"))
        .select(id_col, "content_hash", "n_dups")
    )


# ---------------------------------------------------------------------------
# shingling
# ---------------------------------------------------------------------------


def word_ngrams(text_col, n: int = 3):
    """Array of word n-grams of normalized text (space-joined). Empty/short
    docs yield an empty array."""
    toks = F.split(normalize_whitespace(text_col), " ")
    # slice windows [i, i+n) for i in 1..len-n+1 (1-based F.slice)
    return F.when(F.size(toks) < n, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        )
    )


def shingle_table(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """Exploded distinct (id, shingle) pairs — the input of both the
    Jaccard join and MinHash."""
    return (
        df.select(F.col(id_col), F.explode(word_ngrams(text_col, n)).alias("shingle"))
        .distinct()
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard near-dup (exact pairwise over shared shingles)
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """All pairs with word-n-gram Jaccard ≥ threshold.

    Join strategy: pairs meet **only through shared shingles** (equi-join
    on the shingle), so disjoint documents never pair up — no cross join.
    Shuffle keys are shingle hashes; hot shingles are the skew risk, which
    AQE skew-join splitting handles (enabled in the session factory).
    Returns ``(a_id, b_id, n_common, n_a, n_b, jaccard)`` with a < b.
    """
    sh = shingle_table(df, text_col, id_col, n)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.toDF("a_id", "shingle")
    b = sh.toDF("b_id", "shingle")
    common = (
        a.join(b, "shingle")
        .where(F.col("a_id") < F.col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.toDF("a_id", "n_a")
    sb = sizes.toDF("b_id", "n_b")
    out = (
        common.join(sa, "a_id")
        .join(sb, "b_id")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                6,
            ),
        )
        .where(F.col("jaccard") >= threshold)
    )
    return out.select("a_id", "b_id", "n_common", "n_a", "n_b", "jaccard")


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup
# ---------------------------------------------------------------------------


def _shingle_hash(seed: int):
    """Deterministic 64-bit hash of a shingle under a seed (xxhash64)."""
    return lambda c: F.xxhash64(F.lit(seed), c)


def minhash_signatures(
    shingles: DataFrame, id_col: str = "doc_id", num_hashes: int = 32
) -> DataFrame:
    """Per-doc MinHash signature: for each of ``num_hashes`` seeded hash
    functions, the min hash over the doc's shingles.

    One aggregation job: the k mins compute as k parallel ``min``
    aggregates in the same groupBy (map-side partial agg → shuffle carries
    k longs per doc)."""
    aggs = [
        F.min(F.xxhash64(F.lit(seed), F.col("shingle"))).alias(f"mh_{seed}")
        for seed in range(num_hashes)
    ]
    return shingles.groupBy(id_col).agg(*aggs)


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
) -> DataFrame:
    """Near-dup candidate pairs via banded MinHash LSH, verified by exact
    Jaccard over shingles.

    Pipeline (all DataFrame ops, SURVEY §2.9):
    shingle → minhash (k=num_hashes) → band signatures (r=k/bands rows
    per band, xxhash64-combined) → explode bands → groupBy band bucket →
    candidate pairs → exact-Jaccard verify join.

    Scale: candidates meet only inside (band, bucket) groups; bucket
    sizes are the skew knob — more bands/rows sharpen the S-curve. The
    verify join reuses :func:`ngram_jaccard_pairs` machinery on the
    candidate semi-join, so verification cost is O(candidates), not
    O(docs²).
    """
    rows_per_band = num_hashes // bands
    sh = shingle_table(df, text_col, id_col, n)
    sig = minhash_signatures(sh, id_col, num_hashes)

    band_cols = [
        F.xxhash64(
            *[F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)]
        ).alias(f"band_{b}")
        for b in range(bands)
    ]
    banded = sig.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band"), band_cols[b].alias("bucket"))
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))

    lhs = banded.toDF("a_id", "band", "bucket")
    rhs = banded.toDF("b_id", "band", "bucket")
    candidates = (
        lhs.join(rhs, ["band", "bucket"])
        .where(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
        .distinct()
    )

    # exact verify: Jaccard over shingles, restricted to candidates
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.toDF("a_id", "shingle")
    b = sh.toDF("b_id", "shingle")
    common = (
        candidates.join(a, "a_id")  # (a_id, b_id, shingle of a)
        .join(b, ["b_id", "shingle"])  # keep shingles present in b too
        .groupBy("a_id", "b_id")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    out = (
        common.join(sizes.toDF("a_id", "n_a"), "a_id")
        .join(sizes.toDF("b_id", "n_b"), "b_id")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                6,
            ),
        )
        .where(F.col("jaccard") >= threshold)
    )
    return out.select("a_id", "b_id", "jaccard")


def dedup_keep_min(pairs: DataFrame, df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Resolve near-dup pairs to a survivor set: drop every doc that pairs
    with a smaller id (one pass of min-id propagation — for chains, union
    with iterated passes or connected components; single pass is the
    standard large-scale approximation)."""
    losers = pairs.select(F.col("b_id").alias(id_col)).distinct()
    return df.join(losers, id_col, "left_anti")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 64) -> DataFrame:
    """64-bit SimHash per document.

    Each token hashes to 64 bits; bit *i* of the signature is the sign of
    ``sum over tokens of (bit_i ? +1 : -1)``. Expressed as one projection:
    the per-bit sums are a fold over the token array (JVM higher-order
    functions, no UDF, no shuffle)."""
    toks = F.split(normalize_whitespace(text_col), " ")
    # fold token hashes into a `bits`-slot sum vector; shift amounts must
    # be static ints (shiftright does not take a Column), so the per-bit
    # extraction is an unrolled array of `bits` expressions
    zeros = F.array_repeat(F.lit(0).cast("long"), bits)

    def _bit_vector(t):
        h = F.xxhash64(t)
        return F.array(
            *[F.shiftright(h, i).bitwiseAND(F.lit(1)).cast("long") for i in range(bits)]
        )

    sums = F.aggregate(
        toks,
        zeros,
        lambda acc, t: F.zip_with(acc, _bit_vector(t), lambda a, bit: a + (bit * 2 - 1)),
    )
    sig = F.lit(0).cast("long")
    for i in range(bits):
        sig = sig.bitwiseOR(
            F.when(
                F.get(sums, i) > 0, F.shiftleft(F.lit(1).cast("long"), i)
            ).otherwise(F.lit(0).cast("long"))
        )
    return df.select(F.col(id_col), sig.alias("simhash"))


def simhash_near_pairs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", prefix_bits: int = 16
) -> DataFrame:
    """Candidate near-dup pairs whose SimHash shares one of 4 rotated
    16-bit prefixes (standard 64-bit / ≤3-Hamming blocking scheme);
    verified by exact Hamming distance ≤ 3."""
    sigs = simhash(df, text_col, id_col)
    blocks = sigs.select(
        id_col,
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("block"),
                        F.shiftright(F.col("simhash"), k * prefix_bits)
                        .bitwiseAND(F.lit((1 << prefix_bits) - 1))
                        .alias("key"),
                    )
                    for k in range(64 // prefix_bits)
                ]
            )
        ).alias("bk"),
    ).select(id_col, "simhash", F.col("bk.block").alias("block"), F.col("bk.key").alias("key"))
    a = blocks.toDF("a_id", "a_sig", "block", "key")
    b = blocks.toDF("b_id", "b_sig", "block", "key")
    pairs = (
        a.join(b, ["block", "key"])
        .where(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", "a_sig", "b_sig")
        .distinct()
    )
    hamming = F.bit_count(F.col("a_sig").bitwiseXOR(F.col("b_sig")))
    return pairs.select("a_id", "b_id", hamming.alias("hamming")).where(
        F.col("hamming") <= 3
    )
