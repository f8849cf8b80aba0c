"""End-to-end UC#1 → UC#2 validation pipeline (SURVEY §3.1–3.2).

Orchestrates, for a configured list of tables held in two path-prefix
"databases":

1. per-table (and per-partition) row-count reconciliation → matched /
   mismatched report frames (UC#1);
2. for tables whose counts matched: deterministic-sample fingerprint
   comparison → consistent / inconsistent report frame (UC#2);
3. CSV report sinks with headers, under a dated run directory.

Driver-side iteration is over **table names only** (a dozen strings), never
over data — every per-row operation stays a distributed DataFrame job, so
the same code path serves 6 fixture tables or a 100 TB lake.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_scripts_spark.config import JobConfig
from hive_scripts_spark.operators.fingerprint import (
    fingerprint_reconcile,
    sampled_fingerprint,
)
from hive_scripts_spark.operators.profile import schema_diff
from hive_scripts_spark.operators.reconcile import (
    count_reconcile,
    matched,
    mismatched,
    partition_counts,
)
from hive_scripts_spark.sources.readers import load_table
from hive_scripts_spark.sources.sinks import run_output_dir, write_report_csv


@dataclass
class TableSpec:
    """Per-table metadata the reference gets from the Hive metastore."""

    name: str
    partition_cols: list[str] = field(default_factory=list)
    key_cols: list[str] = field(default_factory=list)  # sampling keys; default: all cols


@dataclass
class ValidationResult:
    reconciled: DataFrame  # UC#1 full frame (status per table/partition)
    matched: DataFrame
    mismatched: DataFrame
    consistency: DataFrame | None  # UC#2 frame; None when nothing matched
    schema_drift: DataFrame | None = None  # pre-check: non-ok columns only


def _union_all(frames: list[DataFrame]) -> DataFrame:
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def run_validation(
    spark: SparkSession,
    config: JobConfig,
    table_specs: list[TableSpec],
    output_dir: str | None = None,
    sample_fraction: float = 0.10,
    sample_mode: str = "hash",
    sample_rows: int = 10,
) -> ValidationResult:
    """The flagship: UC#1 count reconciliation then UC#2 fingerprints."""
    src_counts, tgt_counts = [], []
    sources: dict[str, DataFrame] = {}
    targets: dict[str, DataFrame] = {}
    specs = {s.name: s for s in table_specs}

    # path-prefix lake if configured, else the metastore database named
    # in the reference-format DBName key
    src_db = config.source.path or config.source.db_name
    tgt_db = config.target.path or config.target.db_name
    drift_frames = []
    for spec in table_specs:
        src = load_table(spark, src_db, spec.name)
        tgt = load_table(spark, tgt_db, spec.name)
        sources[spec.name], targets[spec.name] = src, tgt
        # schema pre-check: metadata-only; a drifted column makes the
        # row-level comparison meaningless, so surface it alongside
        drift = schema_diff(src, tgt).where(F.col("status") != "ok")
        drift_frames.append(drift.select(F.lit(spec.name).alias("table_name"), "*"))
        src_counts.append(partition_counts(src, spec.partition_cols, spec.name))
        tgt_counts.append(partition_counts(tgt, spec.partition_cols, spec.name))
    schema_drift = _union_all(drift_frames)

    reconciled = count_reconcile(_union_all(src_counts), _union_all(tgt_counts))
    match_df, mismatch_df = matched(reconciled), mismatched(reconciled)

    # UC#2 runs per *table* that has at least one matched partition; the
    # collect is over table names (bounded by config), not data.
    matched_tables = [
        r["table_name"] for r in match_df.select("table_name").distinct().collect()
    ]
    consistency = None
    if matched_tables:
        src_fps, tgt_fps = [], []
        for name in matched_tables:
            spec = specs[name]
            keys = spec.key_cols or sources[name].columns
            src_fps.append(
                sampled_fingerprint(
                    sources[name],
                    keys,
                    name,
                    spec.partition_cols,
                    sample_fraction,
                    mode=sample_mode,
                    rows=sample_rows,
                )
            )
            tgt_fps.append(
                sampled_fingerprint(
                    targets[name],
                    keys,
                    name,
                    spec.partition_cols,
                    sample_fraction,
                    mode=sample_mode,
                    rows=sample_rows,
                )
            )
        fp_all = fingerprint_reconcile(_union_all(src_fps), _union_all(tgt_fps))
        # UC#2 only judges partitions whose counts matched (the reference
        # iterates the matched file — verizon_automation_script.sh:196-206);
        # null-safe on partition_spec for unpartitioned tables
        mk = match_df.select(
            F.col("table_name").alias("m_table"), F.col("partition_spec").alias("m_spec")
        )
        consistency = fp_all.join(
            mk,
            (fp_all["table_name"] == mk["m_table"])
            & fp_all["partition_spec"].eqNullSafe(mk["m_spec"]),
            "left_semi",
        )

    if output_dir:
        out = run_output_dir(output_dir)
        write_report_csv(match_df, f"{out}/MatchedData")
        write_report_csv(mismatch_df, f"{out}/TableMismatchedData")
        write_report_csv(schema_drift, f"{out}/SchemaDrift")
        if consistency is not None:
            write_report_csv(
                consistency.where(F.col("status") == "inconsistent"),
                f"{out}/TableDataNotConsistent",
            )

    return ValidationResult(
        reconciled, match_df, mismatch_df, consistency, schema_drift
    )
