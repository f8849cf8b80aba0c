"""Skew soak: a deliberately hot key (>=30% of all rows) must route
through the documented mitigation paths, and the paths must actually
ENGAGE — plan-asserted — not merely produce correct values on the
uniform local testdata (which never exercises them).

Protects the 100 TB claims: salted two-phase aggregation spreads the
hot key across reducers, the LSH hot-bucket cap anti-joins degenerate
buckets away, and sessionization stays correct when one user owns a
third of the event stream.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hive_scripts_spark.functions.skew import salted_count, salted_join


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def hot_events(spark):
    # 20k events; user 7777 owns 35% of them, the rest spread over ~1k
    # users. Timestamps step one minute with occasional >30min gaps so
    # sessionization has real session boundaries on the hot user too.
    n = 20_000
    ev = spark.range(n).select(
        F.when(F.col("id") % 20 < 7, F.lit(7777))
        .otherwise((F.col("id") % 997).cast("long"))
        .alias("user_id"),
        F.timestamp_micros(
            F.lit(1_700_000_000_000_000)
            + F.col("id") * 60_000_000
            # each 5000-id block shifts a further hour: a >30min silence
            # for EVERY user at each boundary → real session breaks
            + (F.col("id") / 5000).cast("long") * 3_600_000_000
        ).alias("ts"),
        F.col("id").alias("event_id"),
    )
    return ev.localCheckpoint(eager=True)


def test_fixture_is_actually_skewed(hot_events):
    total = hot_events.count()
    hot = hot_events.where(F.col("user_id") == 7777).count()
    assert hot / total >= 0.30


def test_salted_count_spreads_hot_key_and_matches_plain(hot_events):
    plain = {
        r["user_id"]: r["c"]
        for r in hot_events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    salted = salted_count(hot_events, ["user_id"], salt_from="event_id", salts=16)
    got = {r["user_id"]: r["row_count"] for r in salted.collect()}
    assert got == plain

    # the mitigation must ENGAGE: phase 1 shuffles on (user_id, __salt),
    # so the hot key's rows spread over `salts` reducers instead of one
    plan = _plan(salted)
    salt_partitionings = [
        line
        for line in plan.splitlines()
        if "hashpartitioning" in line and "__salt" in line
    ]
    assert salt_partitionings, f"no (key, __salt) exchange in plan:\n{plan}"


def test_salted_join_replicates_small_side_and_matches_plain(spark, hot_events):
    dim = spark.createDataFrame(
        [(7777, "hot"), (5, "cold"), (6, "cold")], "user_id long, tag string"
    )
    plain = hot_events.join(dim, "user_id").count()
    salted = salted_join(hot_events, dim, "user_id", salt_from="event_id", salts=8)
    assert salted.count() == plain
    # the small side must replicate across salts (explode of the salt
    # sequence) and the join key must carry __salt
    plan = _plan(salted.select("user_id", "tag"))
    assert "explode" in plan and "__salt" in plan


def test_sessionize_correct_under_hot_user(spark, hot_events):
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = hot_events.withColumn(
        "new_session",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
                > 1800 * 1_000_000
            ),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    w2 = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sessions = (
        marked.withColumn("session_id", F.sum("new_session").over(w2))
        .groupBy("user_id", "session_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    got = {
        (r["user_id"], r["session_id"]): r["n_events"] for r in sessions.collect()
    }

    # driver-side brute force on the same 20k rows (test-only collect)
    rows = sorted(
        hot_events.collect(), key=lambda r: (r["user_id"], r["ts"], r["event_id"])
    )
    want: dict[tuple, int] = {}
    prev_user, prev_ts, sid = None, None, 0
    for r in rows:
        if r["user_id"] != prev_user:
            prev_user, sid = r["user_id"], 1
        elif (r["ts"] - prev_ts).total_seconds() > 1800:
            sid += 1
        prev_ts = r["ts"]
        want[(r["user_id"], sid)] = want.get((r["user_id"], sid), 0) + 1
    assert got == want
    # hot user really sessionized (multiple sessions from the planted gaps)
    assert sum(1 for (u, _s) in got if u == 7777) >= 2


@pytest.fixture(scope="module")
def boilerplate_docs(spark):
    # 60 byte-identical "boilerplate" docs (every band bucket hot) plus
    # 3 genuine near-dup pairs and filler uniques
    boiler = "terms of service apply to all users of this site always"
    near = [
        "the quick brown fox jumps over the lazy dog today",
        "pack my box with five dozen liquor jugs again now",
        "how vexingly quick daft zebras jump over fences here",
    ]
    rows = [(i, boiler) for i in range(60)]
    for j, base in enumerate(near):
        rows.append((100 + 2 * j, base + " alpha"))
        rows.append((101 + 2 * j, base + " beta"))
    rows += [(200 + i, f"unique filler document number {i} with distinct words {i * 7} {i * 13}") for i in range(20)]
    return spark.createDataFrame(rows, "doc_id long, text string").localCheckpoint(
        eager=True
    )


def test_minhash_hot_bucket_cap_engages(boilerplate_docs):
    from hive_scripts_spark.operators.dedup import minhash_lsh_pairs

    uncapped = minhash_lsh_pairs(boilerplate_docs, threshold=0.5)
    uncapped_pairs = {(r["a_id"], r["b_id"]) for r in uncapped.collect()}
    # boilerplate clique fully pairs without the cap: 60*59/2 pairs
    boiler_pairs = {p for p in uncapped_pairs if p[0] < 60 and p[1] < 60}
    assert len(boiler_pairs) == 60 * 59 // 2
    near_pairs = {p for p in uncapped_pairs if p[0] >= 100 and p[1] < 200}
    assert near_pairs == {(100, 101), (102, 103), (104, 105)}

    capped = minhash_lsh_pairs(boilerplate_docs, threshold=0.5, max_bucket_size=10)
    # the cap path must be IN the plan (count window over (band, bucket)
    # — the single-shuffle form, see dedup._cap_buckets), and it must
    # drop the degenerate clique
    plan = _plan(capped)
    assert "Window" in plan and "windowspecdefinition(band" in plan, (
        f"hot-bucket count-window cap missing:\n{plan}"
    )
    capped_pairs = {(r["a_id"], r["b_id"]) for r in capped.collect()}
    assert not {p for p in capped_pairs if p[0] < 60 and p[1] < 60}
    # docs whose buckets are NOT hot still pair — recall survives the cap
    assert {p for p in capped_pairs if p[0] >= 100 and p[1] < 200} == {
        (100, 101),
        (102, 103),
        (104, 105),
    }


def test_events_funnel_strict_ordering(spark):
    """Funnel stages advance only on STRICTLY-later events: a purchase
    at the exact click timestamp does not convert."""
    import datetime as dt

    from hive_scripts_spark.plans.registry import QUERIES
    import pyspark.sql.functions as F

    t0 = dt.datetime(2024, 1, 1)

    def ts(mins):
        return t0 + dt.timedelta(minutes=mins)

    rows = [
        # u1 full funnel in order
        (1, ts(0), 1, "view"), (2, ts(1), 1, "click"), (3, ts(2), 1, "purchase"),
        # u2: click BEFORE view -> stalls at view
        (4, ts(1), 2, "click"), (5, ts(2), 2, "view"),
        # u3: purchase at the same instant as click -> not strictly after
        (6, ts(0), 3, "view"), (7, ts(1), 3, "click"), (8, ts(1), 3, "purchase"),
        # u4 never views
        (9, ts(0), 4, "click"), (10, ts(1), 4, "purchase"),
    ]
    ev = spark.createDataFrame(
        [(e, t, u, y, 1.0, "{}") for e, t, u, y in rows],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        ev.write.mode("overwrite").parquet(f"{d}/events.parquet")
        out = QUERIES["x_events_funnel"](spark, d).collect()[0]
    assert (out["n_view"], out["n_click_after_view"], out["n_purchase_after_click"]) == (3, 2, 1)


def test_events_retention_cohort_math(spark):
    import datetime as dt
    import tempfile

    from hive_scripts_spark.plans.registry import QUERIES

    def ev(eid, day, hour, uid):
        return (eid, dt.datetime(2024, 1, day, hour), uid, "view", 1.0, "{}")

    rows = [
        # u1 first seen day 1, returns day 2 (twice -> one distinct day) and day 9 (outside window)
        ev(1, 1, 8, 1), ev(2, 2, 9, 1), ev(3, 2, 15, 1), ev(4, 9, 9, 1),
        # u2 first seen day 2 only
        ev(5, 2, 10, 2),
        # u3 first seen day 1, returns day 8 (offset 7, inclusive bound)
        ev(6, 1, 11, 3), ev(7, 8, 11, 3),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(f"{d}/events.parquet")
        got = {
            r["offset_days"]: r["n_users"]
            for r in QUERIES["x_events_retention"](spark, d).collect()
        }
    # offset 0: all three users; offset 1: u1; offset 7: u3; day-9 excluded
    assert got == {0: 3, 1: 1, 7: 1}


def test_events_hourly_dense_zero_fills_silent_hours(spark):
    import datetime as dt
    import tempfile

    from hive_scripts_spark.plans.extension_queries import x_events_hourly_dense

    rows = [
        (1, dt.datetime(2024, 1, 1, 0, 10), 1, "purchase", 1.0, "{}"),
        (2, dt.datetime(2024, 1, 1, 0, 50), 2, "purchase", 1.0, "{}"),
        # hour 1 silent; hour 2 has a non-purchase event only
        (3, dt.datetime(2024, 1, 1, 2, 5), 1, "view", 1.0, "{}"),
        (4, dt.datetime(2024, 1, 1, 3, 30), 3, "purchase", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(f"{d}/events.parquet")
        got = {
            r["hour"].hour: r["n_events"]
            for r in x_events_hourly_dense(spark, d).collect()
        }
    # spine covers hours 0..3 inclusive, with explicit zeros for 1 and 2
    assert got == {0: 2, 1: 0, 2: 0, 3: 1}


def test_minhash_lsh_soak_on_cloned_corpus(spark):
    """Scale-shaped correctness: 4 shifted clones of every sf0.001 doc
    (2k docs) must each pair with their 3 clones at jaccard 1.0 — a
    corpus where the EXPECTED pair set is provable and candidate volume
    is far above the normal near-dup rate (this shape is what OOM'd the
    forced-broadcast verify formulation; see _verify_pairs_jaccard)."""
    from pyspark.sql import functions as F

    from hive_scripts_spark.operators.dedup import minhash_lsh_pairs

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    clones = docs
    for i in range(1, 4):
        clones = clones.unionByName(
            docs.select(
                (F.col("doc_id") + 10_000_000 * i).alias("doc_id"), "text"
            )
        )
    pairs = minhash_lsh_pairs(clones, parallelism=32).collect()
    got = {(r["a_id"], r["b_id"]) for r in pairs}
    perfect = {
        (r["a_id"], r["b_id"], r["jaccard"]) for r in pairs if r["jaccard"] == 1.0
    }
    n_docs = docs.count()
    # every clone pair must be found (no false negatives within a bucket
    # family: identical docs share every band) = C(4,2) per base doc
    base_ids = [r["doc_id"] for r in docs.select("doc_id").collect()]
    expected_clone_pairs = {
        tuple(sorted((b + 10_000_000 * i, b + 10_000_000 * j)))
        for b in base_ids
        for i in range(4)
        for j in range(i + 1, 4)
    }
    missing = expected_clone_pairs - got
    assert not missing, f"{len(missing)} clone pairs missing of {len(expected_clone_pairs)}"
    assert len(perfect) >= 6 * n_docs


def test_events_outliers_median_mad_hand_computed(spark, tmp_path):
    """Element-based median/MAD on a hand-computed frame: lower median
    at rank (n+1) div 2 with (value, event_id) tiebreaks, outliers
    strictly beyond 3*MAD."""
    from pyspark.sql import functions as F

    from hive_scripts_spark.plans.registry import QUERIES

    rows = [
        # type a: values 1,2,3,4,100 -> median 3 (rn 3 of 5),
        # |v-3| = 2,1,0,1,97 -> sorted 0,1,1,2,97 -> MAD 1
        # outliers: |v-3| > 3 -> only 100
        (1, "a", 1.0), (2, "a", 2.0), (3, "a", 3.0),
        (4, "a", 4.0), (5, "a", 100.0),
        # type b: constant -> median 7, MAD 0, every |v-7|>0 is an
        # outlier -> none (all equal)
        (6, "b", 7.0), (7, "b", 7.0), (8, "b", 7.0),
    ]
    db = tmp_path / "db"
    db.mkdir()
    spark.createDataFrame(
        [(i, t, v) for i, t, v in rows],
        "event_id long, event_type string, value double",
    ).withColumn("ts", F.to_timestamp(F.lit("2026-01-01 00:00:00"))).select(
        "event_id", "ts", F.lit(1).cast("long").alias("user_id"),
        "event_type", "value", F.lit("{}").alias("props"),
    ).write.parquet(str(db / "events.parquet"))

    out = {
        r["event_type"]: r
        for r in QUERIES["x_events_outliers"](spark, str(db)).collect()
    }
    assert out["a"]["median_v"] == 3.0 and out["a"]["mad_v"] == 1.0
    assert out["a"]["n_outliers"] == 1 and out["a"]["n_events"] == 5
    assert out["b"]["median_v"] == 7.0 and out["b"]["mad_v"] == 0.0
    assert out["b"]["n_outliers"] == 0


def test_events_transitions_deterministic_sequence(spark, tmp_path):
    """Equal timestamps: the event_id tiebreak fixes the sequence, so
    transition counts are exact."""
    from pyspark.sql import functions as F

    from hive_scripts_spark.plans.registry import QUERIES

    db = tmp_path / "db"
    db.mkdir()
    # user 1: A -> B -> A (same ts, ordered by event_id); user 2: B -> B
    spark.createDataFrame(
        [(1, 1, "A"), (2, 1, "B"), (3, 1, "A"), (4, 2, "B"), (5, 2, "B")],
        "event_id long, user_id long, event_type string",
    ).withColumn("ts", F.to_timestamp(F.lit("2026-01-01 00:00:00"))).select(
        "event_id", "ts", "user_id", "event_type",
        F.lit(0.0).alias("value"), F.lit("{}").alias("props"),
    ).write.parquet(str(db / "events.parquet"))

    out = {
        (r["prev_type"], r["next_type"]): (r["n_transitions"], r["n_users"])
        for r in QUERIES["x_events_transitions"](spark, str(db)).collect()
    }
    assert out == {("A", "B"): (1, 1), ("B", "A"): (1, 1), ("B", "B"): (1, 1)}
