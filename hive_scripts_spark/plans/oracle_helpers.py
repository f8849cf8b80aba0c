"""Helpers for building DuckDB oracle SQL that is value-identical to the
Spark queries (same canonical serialization, same portable fingerprint —
see :mod:`hive_scripts_spark.functions.canonical`)."""

from __future__ import annotations

from hive_scripts_spark.functions.canonical import FINGERPRINT_MOD

NULLS = "chr(0)"
SEP = "chr(1)"


def duck_canonical_col(name: str, kind: str) -> str:
    """Canonical string rendering of one column in DuckDB SQL.

    ``kind``: 'str' | 'int' | 'float' | 'ts' — mirrors
    ``canonical._canonical_col``.
    """
    if kind == "float":
        inner = f"cast(cast({name} as decimal(38,9)) as varchar)"
    elif kind == "str":
        inner = name
    else:  # int / ts / date — plain cast
        inner = f"cast({name} as varchar)"
    return f"coalesce({inner}, {NULLS})"


def duck_canonical_row(cols: list[tuple[str, str]]) -> str:
    """``concat_ws(chr(1), ...)`` over columns **sorted by name** (the
    canonical column order)."""
    rendered = [duck_canonical_col(n, k) for n, k in sorted(cols)]
    return f"concat_ws({SEP}, {', '.join(rendered)})"


def duck_row_hash(canonical_expr: str) -> str:
    """md5-prefix 60-bit row hash (portable twin of ``canonical.row_hash``)."""
    return f"cast(('0x' || substr(md5({canonical_expr}), 1, 15)) as bigint)"


def duck_fingerprint(canonical_expr: str) -> str:
    """Order-insensitive modular-sum fingerprint aggregate."""
    return (
        f"cast(sum({duck_row_hash(canonical_expr)}) % {FINGERPRINT_MOD} as bigint)"
    )


def duck_hash_bucket(key_expr: str, buckets: int = 1000) -> str:
    """Deterministic hash-mod sample bucket (twin of
    ``canonical.deterministic_sample``)."""
    return f"(cast(('0x' || substr(md5({key_expr}), 1, 15)) as bigint) % {buckets})"
