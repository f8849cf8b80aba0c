"""Scalar-function surface (SURVEY §2.5) and canonical hashing."""

from hive_scripts_spark.functions.canonical import (
    FINGERPRINT_MOD,
    canonical_row_string,
    deterministic_sample,
    row_hash,
    table_fingerprint,
)
from hive_scripts_spark.functions.strings import (
    normalize_whitespace,
    quote_wrap,
    split_first,
)

__all__ = [
    "FINGERPRINT_MOD",
    "canonical_row_string",
    "deterministic_sample",
    "row_hash",
    "table_fingerprint",
    "normalize_whitespace",
    "quote_wrap",
    "split_first",
]
