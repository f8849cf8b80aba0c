"""As-of / range join semantics on hand-built timelines."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from hive_scripts_spark.operators.asof import asof_join, range_join_buckets


def _ts(minute, second=0):
    return datetime(2024, 1, 1, 0, minute, second)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            (1, _ts(10), 7),
            (2, _ts(20), 7),
            (3, _ts(5), 8),   # before any right row for user 8
            (4, _ts(30), 9),  # user with no right rows at all
        ],
        "event_id long, ts timestamp, user_id long",
    )
    right = spark.createDataFrame(
        [
            (101, _ts(8), 7),
            (102, _ts(15), 7),
            (103, _ts(20), 7),   # equal-ts with left id=2 → matches (<=)
            (104, _ts(6), 8),
        ],
        "event_id long, ts timestamp, user_id long",
    )
    return left, right


def test_asof_matches_latest_at_or_before(frames):
    left, right = frames
    out = {r["event_id"]: r for r in asof_join(left, right, "user_id").collect()}
    assert out[1]["r_event_id"] == 101  # ts 8 <= 10
    assert out[2]["r_event_id"] == 103  # equal ts wins over earlier 102
    assert out[3]["r_event_id"] is None  # nothing at or before
    assert out[4]["r_event_id"] is None  # user has no right rows
    assert out[2]["matched_ts"] == _ts(20)


def test_asof_tolerance(frames):
    left, right = frames
    out = {
        r["event_id"]: r["r_event_id"]
        for r in asof_join(
            left, right, "user_id", tolerance_us=60_000_000
        ).collect()
    }
    assert out[1] is None  # 2 min gap > 1 min tolerance
    assert out[2] == 103  # 0 gap


def test_range_join_buckets(spark):
    left = spark.createDataFrame(
        [(1, _ts(10)), (2, _ts(40))], "event_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(11, _ts(9, 30)), (12, _ts(9)), (13, _ts(39)), (14, _ts(41))],
        "event_id long, ts timestamp",
    )
    out = {
        (r["l_id"], r["r_id"])
        for r in range_join_buckets(left, right, window_us=90_000_000).collect()
    }
    # l=1 (t=10m) pairs with right rows within [8.5m, 10m]
    assert (1, 11) in out and (1, 12) in out
    assert (2, 13) in out
    assert (2, 14) not in out  # r after l → excluded (one-sided window)


def test_asof_pins_equal_ts_right_ties(spark):
    """Two right rows tied at the maximal ts: the greatest payload
    (max event_id) must win deterministically — the rule the
    g_asof_last_error oracle replays with (ts desc, event_id desc)."""
    left = spark.createDataFrame(
        [(1, _ts(10), 7)], "event_id long, ts timestamp, user_id long"
    )
    right = spark.createDataFrame(
        [(204, _ts(9), 7), (201, _ts(9), 7), (108, _ts(3), 7)],
        "event_id long, ts timestamp, user_id long",
    )
    for _ in range(3):  # stable across repeated runs
        out = asof_join(left, right, "user_id").collect()
        assert len(out) == 1
        assert out[0]["r_event_id"] == 204
        assert out[0]["matched_ts"] == _ts(9)
