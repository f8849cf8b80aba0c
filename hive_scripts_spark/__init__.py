"""hive_scripts_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the ``Bibek-Sutradhar/hive-scripts`` reference
toolkit, re-expressed Spark-first.

The reference (see ``/root/reference``, surveyed in ``SURVEY.md``) is a
Hive-based cross-cluster table-validation pipeline:

* **UC#1** — per-table / per-partition row-count reconciliation between a
  "source" and a "target" database (``verizon_automation_script.sh:90-183``).
* **UC#2** — sampled content-fingerprint comparison for tables that pass
  UC#1 (``verizon_automation_script.sh:186-255``).
* a delimited-text reformatter (``compare_tables.sh``) and an INI-style
  config loader (``configuration.properties``).

This package rebuilds those semantics natively on Spark DataFrames (one
``groupBy`` job instead of a per-partition query loop, broadcast joins
instead of file ``diff``/``grep``, order-insensitive in-memory fingerprints
instead of ``md5sum`` over CSV exports), and adds the mandated
LLM-data-pipeline operators (dedup, similarity search, text analysis,
multimodal column plumbing) designed for 100 TB scale.
"""

from hive_scripts_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
