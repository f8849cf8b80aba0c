"""Same-sweep A/B for the minhash candidate-verify formulations
(VERDICT r6 item 6 — and the measurement that DECIDED the default).

Compares, in ONE session with alternating reps (load-robust ratios, not
cross-session absolutes):

* "single" — the retired r6 melt formulation (kept INLINE here for the
  comparison): candidates melted to (pair, side) rows onto one scan of
  the shingle-set lineage, arrays reassembled by a pair-keyed groupBy;
* "two"    — the two-join verify (`_verify_pairs_jaccard`, the current
  default): `join(sets as a).join(sets as b)`.

Result (this box, candidates cached so reps isolate the verify stage):
equal at 5k docs (0.52 vs 0.47 s) and 20k (0.75 vs 0.63 s); melt is
3.7× SLOWER at 80k docs / 665k candidates (16.0 vs 4.4 s) — its extra
pair-keyed exchange ships one shingle-array copy per (pair, side) row.
Hence the r7 revert to the two-join form. Usage::

    python tools/verify_ab.py [sf_dir] [reps] [dup_factor]

``dup_factor`` unions N shifted copies of the corpus to scale candidate
volume (identical copies land in the same buckets).
"""

from __future__ import annotations

import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    dup = int(sys.argv[3]) if len(sys.argv) > 3 else 1

    from hive_scripts_spark.operators.dedup import (
        _verify_pairs_jaccard,
        minhash_band_buckets,
        shingle_sets,
    )
    from hive_scripts_spark.session import get_spark

    spark = get_spark("verify-ab")
    spark.sparkContext.setLogLevel("ERROR")

    df = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    if dup > 1:
        # shifted ids keep pairs within each copy (dup× docs, dup× pairs)
        parts = [
            df.select(
                (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
                "text",
            )
            for i in range(dup)
        ]
        base = parts[0]
        for p in parts[1:]:
            base = base.unionByName(p)
        df = base
    df = df.repartition(32).cache()
    n_docs = df.count()

    banded = minhash_band_buckets(df, "text", "doc_id", 3, 32, 8)
    lhs = banded.toDF("a_id", "band", "bucket")
    rhs = banded.toDF("b_id", "band", "bucket")
    # cache the candidate list so each rep measures ONLY the verify
    # stage: single-pass = 1 evaluation of the tokenize→shingle lineage,
    # two-lineage = 2 (one per join side)
    candidates = (
        lhs.join(rhs, ["band", "bucket"])
        .where(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
        .distinct()
        .cache()
    )
    sets = shingle_sets(df, "text", "doc_id", 3)

    # the retired melt formulation, inline (no broadcast hint)
    melted = candidates.select(
        "a_id", "b_id", F.explode(F.array("a_id", "b_id")).alias("__doc")
    )
    paired = (
        sets.toDF("__sid", "__sh")
        .join(melted, F.col("__sid") == F.col("__doc"))
        .groupBy("a_id", "b_id")
        .agg(
            F.min(
                F.when(F.col("__doc") == F.col("a_id"), F.col("__sh"))
            ).alias("a_sh"),
            F.min(
                F.when(F.col("__doc") == F.col("b_id"), F.col("__sh"))
            ).alias("b_sh"),
        )
    )
    single = paired.select(
        "a_id",
        "b_id",
        F.round(
            F.size(F.array_intersect("a_sh", "b_sh")).cast("double")
            / F.size(F.array_union("a_sh", "b_sh")),
            6,
        ).alias("jaccard"),
    ).where(F.col("jaccard") >= 0.5)
    two = _verify_pairs_jaccard(candidates, sets, "doc_id", 0.5)
    n_pairs = single.count()  # warm both lineages' inputs once

    def run(plan) -> float:
        t0 = time.perf_counter()
        plan.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    times: dict[str, list[float]] = {"single": [], "two": []}
    for _ in range(reps):
        times["two"].append(run(two))
        times["single"].append(run(single))
    med = {k: statistics.median(v) for k, v in times.items()}
    print(
        f"docs={n_docs} verified_pairs={n_pairs} reps={reps}\n"
        f"single-pass verify: median {med['single']:.2f}s {sorted(times['single'])}\n"
        f"two-lineage verify: median {med['two']:.2f}s {sorted(times['two'])}\n"
        f"ratio (two/single): {med['two'] / med['single']:.2f}x"
    )
    spark.stop()


if __name__ == "__main__":
    main()
