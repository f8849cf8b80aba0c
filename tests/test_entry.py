"""Driver-contract smoke tests: entry() runs, queries()/oracle_sql() keys
line up, every query produces a stable schema at sf0.001."""

import __spark_entry__ as entry_mod


def test_entry_returns_rows(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert set(df.columns) == {
        "table_name",
        "partition_spec",
        "src_count",
        "tgt_count",
        "status",
    }


def test_oracle_keys_subset_of_queries():
    q, o = entry_mod.queries(), entry_mod.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 35
    # the reference surface (s/p/j/a/f/q prefixes) must be fully
    # oracle-checked; only extension ops (x_/g_ sketches, LSH blocking,
    # xxhash64 paths) may be rows-only
    unoracled = {k for k in q if k not in o}
    assert all(k.startswith(("x_", "g_")) for k in unoracled), unoracled


def test_front_order_window_invariants():
    """The driver grades the FIRST 50 registry entries; a malformed
    rotation list would silently shrink or corrupt the graded window."""
    from hive_scripts_spark.plans.registry import FRONT_ORDER, ORACLES, QUERIES

    assert len(FRONT_ORDER) == 50
    assert len(FRONT_ORDER) == len(set(FRONT_ORDER)), "duplicate window entries"
    missing = [n for n in FRONT_ORDER if n not in QUERIES]
    assert not missing, f"window names not registered: {missing}"
    assert list(QUERIES)[:50] == FRONT_ORDER, "window not at registry front"
    # every windowed query is oracled unless documented rows-only
    rows_only = {n for n in FRONT_ORDER if n not in ORACLES}
    assert not rows_only, f"unoracled queries in the graded window: {rows_only}"


def test_no_oracled_query_stales_outside_the_window():
    """Staleness guard (VERDICT r6 item 7): the driver grades 50 of 129
    registry entries per round, so a query can silently drift N rounds
    away from its last green row while the code under it churns — that
    is how x_embed_normalize reached r7 with an r1-only green. Invariant
    pinned here: every oracled query is either (a) green in one of the
    two most recent CORRECTNESS artifacts, or (b) scheduled in the
    CURRENT window (FRONT_ORDER), i.e. its next row arrives this round.
    A failure names the queries two churn-rounds from their last grade
    that the current rotation forgot."""
    import json
    import re
    from pathlib import Path

    from hive_scripts_spark.plans.registry import FRONT_ORDER, ORACLES

    root = Path(__file__).resolve().parents[1]
    artifacts = sorted(root.glob("CORRECTNESS_r*.json"))
    if len(artifacts) < 2:
        return  # not enough history to judge staleness
    latest_round = max(
        int(re.search(r"r(\d+)", p.stem).group(1)) for p in artifacts
    )
    last_green: dict[str, int] = {}
    for p in artifacts:
        rnd = int(re.search(r"r(\d+)", p.stem).group(1))
        for name, row in json.load(open(p)).items():
            if (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            ):
                last_green[name] = max(last_green.get(name, 0), rnd)

    window = set(FRONT_ORDER)
    stale = sorted(
        name
        for name in ORACLES
        if last_green.get(name, 0) < latest_round - 1 and name not in window
    )
    assert not stale, (
        f"oracled queries with no green row since r{latest_round - 1} "
        f"and no slot in the current window: {stale}"
    )


def test_no_query_emits_nested_output_types(spark):
    """The driver's canonicalizer (pandas sort_values + value hash)
    cannot hash list/map/struct cells — that was the r5
    x_embed_quantize harness ERROR. Lock EVERY registered query to flat
    scalar output columns (schema-only check: builds each plan, runs
    nothing)."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    from hive_scripts_spark.plans.registry import QUERIES

    offenders = {}
    for name, fn in QUERIES.items():
        schema = fn(spark, "/root/testdata/sf0.001").schema
        hairy = [
            f.name
            for f in schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        if hairy:
            offenders[name] = hairy
    assert not offenders, offenders
