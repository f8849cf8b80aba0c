"""UC#1 count-reconciliation operator tests (SURVEY §2.3/2.4)."""

from pyspark.sql import functions as F

from hive_scripts_spark.operators.reconcile import (
    count_reconcile,
    matched,
    mismatched,
    partition_counts,
)


def _emp(spark, drop_dept=None, extra_rows=0):
    rows = [
        (i, f"name{i}", dept, 100.0 * i)
        for i in range(60)
        for dept in [i % 3]
        if dept != drop_dept or i % 7 != 0
    ]
    rows += [(1000 + i, f"extra{i}", 1, 0.0) for i in range(extra_rows)]
    return spark.createDataFrame(rows, "emp_id long, name string, dept_id int, salary double")


def test_partition_counts_single_job(spark):
    df = _emp(spark)
    out = partition_counts(df, ["dept_id"], "emp")
    got = {r["partition_spec"]: r["row_count"] for r in out.collect()}
    assert got == {"dept_id=0": 20, "dept_id=1": 20, "dept_id=2": 20}
    assert out.columns == ["table_name", "partition_spec", "row_count"]


def test_partition_counts_unpartitioned_branch(spark):
    out = partition_counts(_emp(spark), None, "emp").collect()
    assert len(out) == 1
    assert out[0]["partition_spec"] is None
    assert out[0]["row_count"] == 60


def test_multilevel_partitions(spark):
    df = _emp(spark).withColumn("region", F.col("emp_id") % 2)
    out = partition_counts(df, ["dept_id", "region"], "emp")
    specs = {r["partition_spec"] for r in out.collect()}
    assert "dept_id=0/region=0" in specs and len(specs) == 6


def test_count_reconcile_statuses(spark):
    src = partition_counts(_emp(spark), ["dept_id"], "emp")
    # drop some rows in dept 1; add an entire new partition value
    tgt_df = _emp(spark, drop_dept=1).withColumn(
        "dept_id", F.when(F.col("emp_id") == 0, F.lit(9)).otherwise(F.col("dept_id"))
    )
    tgt = partition_counts(tgt_df, ["dept_id"], "emp")
    rec = count_reconcile(src, tgt)
    by_spec = {r["partition_spec"]: r["status"] for r in rec.collect()}
    assert by_spec["dept_id=2"] == "matched"
    assert by_spec["dept_id=1"] == "mismatched"
    assert by_spec["dept_id=9"] == "target_only"
    assert by_spec["dept_id=0"] == "mismatched"  # row 0 moved out to dept 9
    assert matched(rec).count() == 1
    assert mismatched(rec).count() == 3


def test_typed_counts_not_string_equality(spark):
    # '07' vs '7' must compare equal as bigint (SURVEY §2.8.6)
    src = spark.createDataFrame(
        [("t", None, 7)], "table_name string, partition_spec string, row_count long"
    )
    tgt = spark.createDataFrame(
        [("t", None, 7)], "table_name string, partition_spec string, row_count long"
    )
    assert count_reconcile(src, tgt).collect()[0]["status"] == "matched"
