"""Column profiler and drift-detection semantics."""

from pyspark.sql import functions as F

from hive_scripts_spark.operators.profile import profile_drift, profile_table


def _df(spark):
    return spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", None), (3, None, 2.5), (4, "b", 3.5)],
        "id long, s string, x double",
    )


def test_profile_table_metrics(spark):
    prof = {r["column"]: r for r in profile_table(_df(spark)).collect()}
    assert prof["id"]["n_rows"] == 4 and prof["id"]["n_nulls"] == 0
    assert prof["s"]["n_nulls"] == 1 and prof["s"]["n_distinct"] == 2
    assert prof["x"]["n_nulls"] == 1
    assert prof["id"]["min_value"] == "1" and prof["id"]["max_value"] == "4"
    assert prof["s"]["min_value"] == "a" and prof["s"]["max_value"] == "b"


def test_profile_drift_flags_only_changed_columns(spark):
    src = _df(spark)
    tgt = src.withColumn(
        "x", F.when(F.col("id") == 1, 99.0).otherwise(F.col("x"))
    )
    drift = {r["column"]: r["drift"] for r in profile_drift(src, tgt).collect()}
    assert drift["id"] == "" and drift["s"] == ""
    assert "max_value" in drift["x"]  # 99.0 became the new max
    # n_rows unchanged everywhere
    assert "n_rows" not in drift["x"]


def test_profile_drift_row_loss(spark):
    src = _df(spark)
    tgt = src.where("id != 4")
    drift = {r["column"]: r["drift"] for r in profile_drift(src, tgt).collect()}
    assert all("n_rows" in d for d in drift.values())


def test_schema_diff_statuses(spark):
    from hive_scripts_spark.operators.profile import schema_diff

    src = spark.createDataFrame([(1, "a", 1.0)], "id long, s string, x double")
    tgt = spark.createDataFrame([(1, "a", 1)], "id long, s string, x int").withColumn(
        "extra", F.lit(True)
    )
    out = {r["column"]: r["status"] for r in schema_diff(src, tgt).collect()}
    assert out == {
        "id": "ok",
        "s": "ok",
        "x": "type_mismatch",
        "extra": "missing_in_src",
    }
    only_src = schema_diff(src, tgt.drop("s", "extra"))
    assert {r["column"]: r["status"] for r in only_src.collect()}["s"] == "missing_in_tgt"
