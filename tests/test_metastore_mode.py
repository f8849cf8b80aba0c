"""Metastore-database mode: the reference's actual `use $db` model —
two catalog databases, validation by DBName with no Path keys."""

import pytest
from pyspark.sql import functions as F

from hive_scripts_spark.config import EndpointConfig, JobConfig
from hive_scripts_spark.pipeline import TableSpec, run_validation
from hive_scripts_spark.sources.readers import load_table


@pytest.fixture(scope="module")
def metastore_dbs(spark):
    spark.sql("create database if not exists src_db")
    spark.sql("create database if not exists tgt_db")
    emp = spark.range(200).select(
        F.col("id").alias("emp_id"),
        (F.col("id") % 4).cast("int").alias("dept_id"),
        (F.col("id") * 2.5).alias("salary"),
    )
    emp.write.mode("overwrite").saveAsTable("src_db.emp")
    emp.where("emp_id % 50 != 0 or dept_id != 2").write.mode(
        "overwrite"
    ).saveAsTable("tgt_db.emp")
    yield "src_db", "tgt_db"
    spark.sql("drop database src_db cascade")
    spark.sql("drop database tgt_db cascade")


def test_load_table_db_mode(spark, metastore_dbs):
    src_db, _ = metastore_dbs
    assert load_table(spark, src_db, "emp").count() == 200


def test_validation_against_metastore(spark, metastore_dbs):
    src_db, tgt_db = metastore_dbs
    cfg = JobConfig(
        source=EndpointConfig(db_name=src_db),
        target=EndpointConfig(db_name=tgt_db),
        tables=["emp"],
    )
    result = run_validation(
        spark, cfg, [TableSpec("emp", partition_cols=["dept_id"])],
        sample_fraction=1.0,
    )
    status = {r["partition_spec"]: r["status"] for r in result.reconciled.collect()}
    assert status["dept_id=2"] == "mismatched"
    assert status["dept_id=0"] == "matched"


def test_analyze_table_records_catalog_stats(spark, metastore_dbs):
    """ANALYZE TABLE lands rowCount/sizeInBytes (and column stats) in
    the catalog, and the CBO's plan cost estimate picks the rowCount
    up — the stats half of the 100 TB posture."""
    from hive_scripts_spark.sources.readers import analyze_table

    src_db, _ = metastore_dbs
    rows, size = analyze_table(spark, src_db, "emp")
    assert rows == 200
    assert size and size > 0
    # column stats present: describe <col> shows distinct_count
    desc = {
        r["info_name"]: r["info_value"]
        for r in spark.sql(f"describe extended {src_db}.emp dept_id").collect()
    }
    assert desc.get("distinct_count") not in (None, "NULL")
    # with CBO on, the optimizer's cost view carries the analyzed
    # rowCount (without it only sizeInBytes propagates)
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try:
        cost = (
            spark.table(f"{src_db}.emp")
            ._jdf.queryExecution()
            .optimizedPlan()
            .stats()
            .toString()
        )
    finally:
        spark.conf.set("spark.sql.cbo.enabled", "false")
    assert "rowCount=200" in cost


def test_analyze_subcommand(spark, metastore_dbs, capsys):
    from hive_scripts_spark.__main__ import main

    src_db, _ = metastore_dbs
    rc = main(["analyze", "--db", src_db, "emp"])
    assert rc == 0
    assert "rows=200" in capsys.readouterr().out
