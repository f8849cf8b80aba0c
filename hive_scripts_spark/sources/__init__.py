"""Sources & sinks (SURVEY §2.1 S1–S9)."""

from hive_scripts_spark.sources.readers import (
    load_table,
    load_tables,
    read_delimited,
    read_lines,
)
from hive_scripts_spark.sources.partitions import partition_values
from hive_scripts_spark.sources.sinks import write_report_csv

__all__ = [
    "load_table",
    "load_tables",
    "read_delimited",
    "read_lines",
    "partition_values",
    "write_report_csv",
]
