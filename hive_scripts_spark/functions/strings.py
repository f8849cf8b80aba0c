"""String scalar functions (SURVEY §2.5 F1–F5).

These are the Spark-expression equivalents of the reference's shell glue:
``cut -d: -f1/-f2`` first-delimiter splits
(``verizon_automation_script.sh:42-43,209-211``), sed quote-wrapping
(``:114,148``) and CR/whitespace normalization (``:164-165,171-174``). All
stay JVM-side (whole-stage codegen) — no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def split_first(col: Column | str, delim: str) -> tuple[Column, Column]:
    """F1/P3: split on the *first* occurrence of ``delim`` only — the
    semantics of ``cut -d{delim} -f1`` / ``-f2`` in the reference (so a
    partition spec ``month=2024=01`` keeps ``2024=01`` intact)."""
    import re as _re

    c = F.col(col) if isinstance(col, str) else col
    parts = F.split(c, _re.escape(delim), 2)
    # F.get (not getItem): out-of-bounds yields NULL under ANSI mode
    key = F.coalesce(F.get(parts, 0), F.lit(""))
    value = F.coalesce(F.get(parts, 1), F.lit(""))
    return key, value


def quote_wrap(col: Column | str) -> Column:
    """F3: wrap in single quotes — ``sed "s/^/'/;s/$/'/"``
    (``verizon_automation_script.sh:114,148``). Obsolete with typed
    literals; kept for report parity."""
    c = F.col(col) if isinstance(col, str) else col
    return F.concat(F.lit("'"), c, F.lit("'"))


def normalize_whitespace(col: Column | str) -> Column:
    """F4/P6: strip ``\\r``, collapse runs of whitespace to one space,
    trim — the reference's ``sed 's/\\r//g'`` + ``sed 's/ \\+/,/g'``
    cleanup layer (``verizon_automation_script.sh:164-165,171-174``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.regexp_replace(c, "\r", ""), "\\s+", " "))
