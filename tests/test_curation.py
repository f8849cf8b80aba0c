"""Unit tests for operators/curation compositions (split-leakage
eval-contamination check — hand-constructed pair sets with known
boundary behavior)."""

from __future__ import annotations


def test_split_leakage_pairs_and_report(spark):
    from pyspark.sql import functions as F

    from hive_scripts_spark.functions.canonical import train_val_test_split
    from hive_scripts_spark.operators.curation import (
        split_leakage_pairs,
        split_leakage_report,
    )

    docs = spark.range(200).select(F.col("id").alias("doc_id"))
    assigned = {
        r["doc_id"]: r["split"]
        for r in train_val_test_split(
            docs, ["doc_id"], val_pct=25, test_pct=25
        ).collect()
    }
    # construct pairs with known boundary behavior from the assignment
    ids = sorted(assigned)
    same, cross = None, None
    for a in ids:
        for b in ids:
            if a >= b:
                continue
            if same is None and assigned[a] == assigned[b]:
                same = (a, b)
            if cross is None and assigned[a] != assigned[b]:
                cross = (a, b)
        if same and cross:
            break
    pairs = spark.createDataFrame(
        [(*same, 0.9), (*cross, 0.8)], "a_id long, b_id long, jaccard double"
    )
    leaks = split_leakage_pairs(
        docs, pairs, key_cols=["doc_id"], val_pct=25, test_pct=25
    )
    got = leaks.collect()
    assert len(got) == 1
    r = got[0]
    assert (r["a_id"], r["b_id"]) == cross
    assert r["split_a"] == assigned[cross[0]]
    assert r["split_b"] == assigned[cross[1]]
    report = split_leakage_report(leaks).collect()
    assert len(report) == 1 and report[0]["n_pairs"] == 1
