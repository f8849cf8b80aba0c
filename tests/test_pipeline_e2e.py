"""End-to-end UC#1→UC#2 pipeline test (SURVEY §5.2): two deliberately
perturbed database copies; the reports must name exactly the perturbed
tables/partitions — and must NOT flag a reorder-only table."""

import pytest
from pyspark.sql import functions as F

from hive_scripts_spark.config import EndpointConfig, JobConfig
from hive_scripts_spark.pipeline import TableSpec, run_validation


@pytest.fixture(scope="module")
def dbs(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("lake")
    src_dir, tgt_dir = str(base / "source"), str(base / "target")

    emp = spark.range(300).select(
        F.col("id").alias("emp_id"),
        F.concat(F.lit("name"), F.col("id")).alias("name"),
        (F.col("id") % 5).cast("int").alias("dept_id"),
        (F.col("id") * 10.0 + 0.5).alias("salary_amt"),
    )
    dept = spark.createDataFrame(
        [(i, f"dept{i}", f"loc{i % 2}") for i in range(5)],
        "dept_id int, dept_name string, location string",
    )
    salary = spark.range(240).select(
        F.col("id").alias("emp_id"),
        F.concat(F.lit("2024-0"), (F.col("id") % 4 + 1).cast("string")).alias("month"),
        (F.col("id") * 1.25).alias("amount"),
    )
    marks = spark.range(200).select(
        F.col("id").alias("student_id"),
        (F.col("id") % 3).cast("int").alias("term"),
        (F.col("id") % 100).cast("double").alias("score"),
    )

    # source copies
    emp.write.mode("overwrite").parquet(f"{src_dir}/emp.parquet")
    dept.write.mode("overwrite").parquet(f"{src_dir}/dept.parquet")
    salary.write.mode("overwrite").parquet(f"{src_dir}/salary.parquet")
    marks.write.mode("overwrite").parquet(f"{src_dir}/marks.parquet")

    # target perturbations (FIXTURES.md §A):
    # emp: drop 3 rows from partition dept_id=2 → UC#1 count mismatch
    emp.where(~((F.col("dept_id") == 2) & (F.col("emp_id") < 15))).write.mode(
        "overwrite"
    ).parquet(f"{tgt_dir}/emp.parquet")
    # dept: identical → matched, consistent
    dept.write.mode("overwrite").parquet(f"{tgt_dir}/dept.parquet")
    # salary: mutate ONE amount, same row count → UC#1 passes, UC#2 catches
    salary.withColumn(
        "amount",
        F.when(F.col("emp_id") == 7, F.lit(123456.78)).otherwise(F.col("amount")),
    ).write.mode("overwrite").parquet(f"{tgt_dir}/salary.parquet")
    # marks: reorder only → must NOT be flagged anywhere
    marks.orderBy(F.col("student_id").desc()).repartition(5).write.mode(
        "overwrite"
    ).parquet(f"{tgt_dir}/marks.parquet")

    return src_dir, tgt_dir


def test_full_validation(dbs, spark, tmp_path):
    src_dir, tgt_dir = dbs
    cfg = JobConfig(
        source=EndpointConfig(db_name="source", path=src_dir),
        target=EndpointConfig(db_name="target", path=tgt_dir),
        tables=["emp", "dept", "salary", "marks"],
    )
    specs = [
        TableSpec("emp", partition_cols=["dept_id"], key_cols=["emp_id"]),
        TableSpec("dept"),
        TableSpec("salary", partition_cols=["month"], key_cols=["emp_id", "month"]),
        TableSpec("marks", partition_cols=["term"], key_cols=["student_id"]),
    ]
    result = run_validation(
        spark, cfg, specs, output_dir=str(tmp_path / "out"), sample_fraction=1.0
    )

    # UC#1: exactly emp/dept_id=2 mismatches
    mm = {
        (r["table_name"], r["partition_spec"]) for r in result.mismatched.collect()
    }
    assert mm == {("emp", "dept_id=2")}

    # UC#2: exactly salary's mutated month is inconsistent; emp-partition 2
    # never reaches UC#2 (count mismatch), marks is consistent everywhere
    cons = {
        (r["table_name"], r["partition_spec"]): r["status"]
        for r in result.consistency.collect()
    }
    month_of_emp7 = "month=2024-04"  # emp_id 7 → 7 % 4 + 1 = 4
    assert cons[("salary", month_of_emp7)] == "inconsistent"
    flagged = {k for k, v in cons.items() if v == "inconsistent"}
    assert flagged == {("salary", month_of_emp7)}
    assert all(
        v == "consistent" for k, v in cons.items() if k[0] in ("marks", "dept", "emp")
    )

    # report files exist with headers
    import glob

    out_csvs = glob.glob(str(tmp_path / "out" / "*" / "*" / "*.csv"))
    assert out_csvs, "report CSVs written"


def test_full_validation_rows_mode(dbs, spark):
    # reference-literal LIMIT-n sampling (sample_mode='rows'): the
    # key-ordered top-n picks the same logical rows on both sides, so the
    # reorder-only table stays consistent and the mutated row (emp_id=7,
    # inside the first 50 by key) is still caught
    src_dir, tgt_dir = dbs
    cfg = JobConfig(
        source=EndpointConfig(path=src_dir),
        target=EndpointConfig(path=tgt_dir),
        tables=["dept", "salary", "marks"],
        sample_size=50,
        sample_mode="rows",
    )
    specs = [
        TableSpec("dept", key_cols=["dept_id"]),
        TableSpec("salary", key_cols=["emp_id", "month"]),
        TableSpec("marks", key_cols=["student_id", "term"]),
    ]
    result = run_validation(
        spark, cfg, specs, sample_mode=cfg.sample_mode, sample_rows=cfg.sample_size
    )
    status = {
        r["table_name"]: r["status"] for r in result.consistency.collect()
    }
    assert status == {
        "dept": "consistent",
        "salary": "inconsistent",
        "marks": "consistent",
    }


def test_schema_drift_precheck_clean_and_dirty(dbs, spark, tmp_path):
    src_dir, tgt_dir = dbs
    cfg = JobConfig(
        source=EndpointConfig(path=src_dir),
        target=EndpointConfig(path=tgt_dir),
        tables=["dept"],
    )
    res = run_validation(spark, cfg, [TableSpec("dept")])
    assert res.schema_drift.count() == 0  # identical schemas → empty report

    # write a drifted copy of dept on the target side
    import shutil

    drifted = str(tmp_path / "tgt2")
    shutil.copytree(tgt_dir, drifted)
    spark.read.parquet(f"{tgt_dir}/dept.parquet").withColumn(
        "location", F.lit(1)
    ).write.mode("overwrite").parquet(f"{drifted}/dept.parquet")
    cfg2 = JobConfig(
        source=EndpointConfig(path=src_dir),
        target=EndpointConfig(path=drifted),
        tables=["dept"],
    )
    res2 = run_validation(spark, cfg2, [TableSpec("dept")])
    drift = {(r["column"], r["status"]) for r in res2.schema_drift.collect()}
    assert drift == {("location", "type_mismatch")}
