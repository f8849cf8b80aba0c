"""Partitioned-layout writes and directory-level partition pruning."""

from pyspark.sql import functions as F

from hive_scripts_spark.operators.reconcile import partition_counts
from hive_scripts_spark.sources.sinks import write_partitioned

SF_DIR = "/root/testdata/sf0.001"


def test_partitioned_write_and_pruning(spark, tmp_path):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    out = str(tmp_path / "li_part")
    write_partitioned(li, out, ["l_returnflag"])

    back = spark.read.parquet(out)
    # directory layout is hive-style
    import os

    dirs = {d for d in os.listdir(out) if d.startswith("l_returnflag=")}
    assert dirs == {"l_returnflag=A", "l_returnflag=N", "l_returnflag=R"}

    # filter on the partition column prunes at the DIRECTORY level
    filtered = back.where(F.col("l_returnflag") == "A")
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "l_returnflag" in plan.split("PartitionFilters")[1][:200]
    assert filtered.count() == li.where("l_returnflag = 'A'").count()

    # partition_counts over the partitioned layout agrees with the flat file
    flat = {
        r["partition_spec"]: r["row_count"]
        for r in partition_counts(li, ["l_returnflag"], "li").collect()
    }
    part = {
        r["partition_spec"]: r["row_count"]
        for r in partition_counts(back, ["l_returnflag"], "li").collect()
    }
    assert flat == part
