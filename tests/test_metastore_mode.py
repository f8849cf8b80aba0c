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
