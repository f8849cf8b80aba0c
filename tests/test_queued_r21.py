"""Queued r21 registration candidate (the ``test_queued_r15.py``
pattern): body + oracle held as literals, parity-verified at sf0.001
AND the driver's grading scale sf0.01, awaiting a future capacity
swap. Grades the last SQL-expressible pytest-only operator in the r15
crawl-hygiene chain:

``x_clean_invisible`` — ``encoding.strip_invisible_col`` (the pure-JVM
two-regex hygiene pass) over five planted arms: clean passthrough,
ZWSP/BOM strip with a kept ZWJ (the default-keep joiner contract —
Persian/Indic/emoji sequences must survive), C0/DEL/C1 strip,
CRLF/VT-to-newline CONVERSION (never deletion — deleting a bare CR
fuses words), and soft-hyphen/RLM strip. The oracle restates both
regex classes in DuckDB RE2 syntax, so the graded value pins the
class BODIES byte-for-byte across engines — an accidental edit to
either deletion class fails the value hash, not just a pytest.
"""

from __future__ import annotations

import math

import duckdb
import pytest

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

CLEAN_NAME = "x_clean_invisible"

CLEAN_ORACLE = r"""
    with armed as (
      select doc_id, cast(doc_id % 5 as int) as arm,
             cast(doc_id as varchar) as i
      from documents
    ), planted as (
      select doc_id,
             case arm
               when 0 then 'plain ' || i
               when 1 then 'zw' || chr(8203) || 'sp ' || chr(8205)
                        || chr(65279) || i
               when 2 then 'ctl' || chr(1) || chr(127) || chr(154)
                        || ' ' || i
               when 3 then 'line1' || chr(13) || chr(10) || 'line2'
                        || chr(11) || 'line3 ' || i
               else 'soft' || chr(173) || 'hyphen rlm' || chr(8207)
                        || ' ' || i
             end as text
      from armed
    )
    select doc_id,
           regexp_replace(
             regexp_replace(text, '\r\n|[\x{0b}\x{0c}\x{0d}]',
                            chr(10), 'g'),
             '[\x{00}-\x{08}\x{0e}-\x{1f}\x{7f}\x{80}-\x{9f}\x{ad}\x{200b}\x{200e}-\x{200f}\x{202a}-\x{202e}\x{2060}\x{2066}-\x{2069}\x{feff}]',
             '', 'g') as text_clean
    from planted
"""


def clean_query(spark, sf_dir):
    """The x_clean_invisible body (verbatim future registration): five
    planted hygiene arms through strip_invisible_col — ZWJ (U+200D)
    deliberately planted in arm 1 and expected to SURVIVE (the
    strip_joiners=False default)."""
    from pyspark.sql import functions as F

    from hive_scripts_spark.operators.encoding import strip_invisible_col
    from hive_scripts_spark.plans.registry import table

    docs = table(spark, sf_dir, "documents")
    i = F.col("doc_id").cast("string")
    arm = F.pmod("doc_id", F.lit(5))
    text = (
        F.when(arm == 0, F.concat(F.lit("plain "), i))
        .when(arm == 1, F.concat(
            F.lit("zw\u200bsp \u200d\ufeff"), i))
        .when(arm == 2, F.concat(F.lit("ctl\x01\x7f\x9a "), i))
        .when(arm == 3, F.concat(
            F.lit("line1\r\nline2\x0bline3 "), i))
        .otherwise(F.concat(
            F.lit("soft\u00adhyphen rlm\u200f "), i))
    )
    planted = docs.select("doc_id", text.alias("text"))
    return planted.select(
        "doc_id", strip_invisible_col("text").alias("text_clean")
    )


def _norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(v)
    return str(v)


def _digest(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("\x01".join(_norm(r[i]) for i in order) for r in rows)


def test_planted_arms_fire(spark):
    """Every interesting branch executes at the grading sf: the ZWJ
    survives, the invisibles vanish, and the CR/VT arms CONVERT to
    newlines instead of fusing words (the r15 review-pass class)."""
    rows = {
        r["doc_id"]: r["text_clean"]
        for r in clean_query(spark, "/root/testdata/sf0.01").collect()
    }
    assert rows[0] == "plain 0"
    assert rows[1] == "zwsp \u200d1"  # ZWSP/BOM gone, ZWJ kept
    assert rows[2] == "ctl 2"
    assert rows[3] == "line1\nline2\nline3 3"
    assert rows[4] == "softhyphen rlm 4"


@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_queued_query_matches_oracle(spark, sf_dir):
    got = clean_query(spark, sf_dir)
    spark_digest = _digest(got.columns, got.collect())
    con = duckdb.connect()
    try:
        for t in TABLES:
            con.execute(
                f"create view {t} as select * from '{sf_dir}/{t}.parquet'"
            )
        rel = con.sql(CLEAN_ORACLE)
        duck_digest = _digest(rel.columns, rel.fetchall())
    finally:
        con.close()
    assert len(spark_digest) == len(duck_digest) > 0
    assert spark_digest == duck_digest
