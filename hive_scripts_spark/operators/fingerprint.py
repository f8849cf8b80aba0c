"""UC#2 — sampled content-integrity comparison.

Reference behavior (``verizon_automation_script.sh:186-255``): for each
table that passed UC#1, export ``SELECT * [WHERE partition] LIMIT 10`` to a
local directory per side, ``md5sum`` the first output file, and compare the
two hex strings; inconsistent tables land in a CSV report.

Spark-native design (SURVEY §3.2): deterministic hash-mod sampling (both
sides pick the *same* logical rows — ``LIMIT`` without ``ORDER BY`` cannot)
→ canonical row serialization → order-insensitive modular-sum fingerprint
(:mod:`hive_scripts_spark.functions.canonical`) → one tiny frame per side →
broadcast join + equality filter. No local-FS round trip, no
first-file-only bug (SURVEY §2.8.3), immune to row order (§2.8.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hive_scripts_spark.functions.canonical import (
    deterministic_sample,
    limit_sample,
    table_fingerprint,
)


def sampled_fingerprint(
    df: DataFrame,
    key_cols: list[str],
    table_name: str = "",
    partition_cols: list[str] | None = None,
    fraction: float = 0.10,
    hash_cols: list[str] | None = None,
    mode: str = "hash",
    rows: int = 10,
) -> DataFrame:
    """Fingerprint a deterministic sample of ``df``, per partition.

    ``mode='hash'`` (default) takes the deterministic hash-mod
    ``fraction`` sample; ``mode='rows'`` is the reference-literal
    ``LIMIT rows`` (``verizon_automation_script.sh:220``), made
    cross-engine sound by ordering on ``key_cols`` first (Catalyst plans
    it as TakeOrderedAndProject — top-``rows`` per partition then a
    single-reduce merge, no full sort shuffle).

    Returns ``table_name, partition_spec, fingerprint, row_count`` — the
    same record shape as the UC#1 count frames, so the comparison join is
    identical machinery.
    """
    if mode == "rows":
        sample = limit_sample(df, rows, order_cols=key_cols)
    elif mode == "hash":
        sample = deterministic_sample(df, key_cols, fraction=fraction)
    else:
        raise ValueError(f"unknown sample mode: {mode!r} (use 'hash' or 'rows')")
    if partition_cols:
        spec_cols = partition_cols
        fp = table_fingerprint(sample, hash_cols or df.columns, group_by=spec_cols)
        spec = F.concat_ws(
            "/",
            *[
                F.concat_ws("=", F.lit(c), F.col(c).cast("string"))
                for c in partition_cols
            ],
        )
        fp = fp.select(
            F.lit(table_name).alias("table_name"),
            spec.alias("partition_spec"),
            "fingerprint",
            "row_count",
        )
    else:
        fp = table_fingerprint(sample, hash_cols or df.columns).select(
            F.lit(table_name).alias("table_name"),
            F.lit(None).cast("string").alias("partition_spec"),
            "fingerprint",
            "row_count",
        )
    return fp


def fingerprint_reconcile(src_fp: DataFrame, tgt_fp: DataFrame) -> DataFrame:
    """Compare per-(table, partition) fingerprints from the two sides.

    ``status`` is ``consistent`` when both fingerprint and sampled row
    count agree, else ``inconsistent`` (→ the TableDataNotConsistent
    report, ``verizon_automation_script.sh:251-255``).
    """
    src = src_fp.select(
        "table_name",
        "partition_spec",
        F.col("fingerprint").alias("src_fingerprint"),
        F.col("row_count").alias("src_rows"),
    )
    tgt = tgt_fp.select(
        "table_name",
        "partition_spec",
        F.col("fingerprint").alias("tgt_fingerprint"),
        F.col("row_count").alias("tgt_rows"),
    )
    # null-safe on partition_spec (unpartitioned tables carry NULL specs)
    cond = (src["table_name"] == tgt["table_name"]) & src["partition_spec"].eqNullSafe(
        tgt["partition_spec"]
    )
    joined = src.join(F.broadcast(tgt), cond, "full_outer").select(
        F.coalesce(src["table_name"], tgt["table_name"]).alias("table_name"),
        F.coalesce(src["partition_spec"], tgt["partition_spec"]).alias(
            "partition_spec"
        ),
        "src_fingerprint",
        "tgt_fingerprint",
        "src_rows",
        "tgt_rows",
    )
    # Null-safe: an empty sample on both sides yields fingerprint=NULL on
    # both, and NULL==NULL would fall through to 'inconsistent'. A side
    # missing entirely (one-sided NULL from the full outer) still compares
    # unequal under eqNullSafe, so it stays 'inconsistent'.
    ok = F.col("src_fingerprint").eqNullSafe(F.col("tgt_fingerprint")) & F.col(
        "src_rows"
    ).eqNullSafe(F.col("tgt_rows"))
    return joined.select(
        "table_name",
        "partition_spec",
        "src_fingerprint",
        "tgt_fingerprint",
        F.when(ok, F.lit("consistent")).otherwise(F.lit("inconsistent")).alias("status"),
    )
