"""Queued r13 registration candidate: ``x_multimodal_frames``.

Grades the r12 video→frame chain (``extract_frames`` over MJPEG AVI
containers) the same way ``x_multimodal_resize_jpeg`` grades the JPEG
pixel decoder: each document frames as a three-frame MJPEG AVI whose
frames are the four constant-gray JPEG plan literals picked by
``(doc_id + k) % 4``; ``extract_frames(every_n=2)`` samples frames 0
and 2, and the oracle recomputes each sampled frame's md5 / dims from
compile-time constants (the md5 of a 159-byte literal payload is
itself a literal).

The registry sits at 150 = capacity, so this body+oracle is held here
(the ``test_queued_r11.py`` pattern) parity-verified at sf0.001 AND
the driver's grading scale sf0.01; registering it in a future round
pairs with retiring a shortlist query (COVERAGE.md "Registry
capacity"). Both literals move verbatim into
``plans/extension_queries.py`` at that point.
"""

from __future__ import annotations

import math

import duckdb
import pytest

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

NAME = "x_multimodal_frames"

#: md5 of each constant-gray JPEG literal (hashlib over the plan hex —
#: compile-time constants, re-derived in test_queued_frame_md5_literals)
FRAME_MD5 = {
    16: "8b588ab0ebdf80a92b02a1a28b0cbbf3",
    64: "365de6e45ce1170d519ae7714a4138e0",
    100: "7587fc95372b1c5c6f9bda74e7227ddd",
    126: "1f994aa7f5b83bcced1d38c60df8a5bc",
}

#: AVI skeleton for exactly three 159-byte frames: RIFF + hdrl(avih:
#: 3 frames @ 33333 us) + the movi LIST header; each frame is chunked
#: as '00dc' + size + payload + 1 pad byte (159 is odd)
_AVI_HEAD_HEX = (
    "5249464654020000415649204c495354440000006864726c6176696838000000"
    "3582000000000000000000000000000003000000000000000000000000000000"
    "0000000000000000000000000000000000000000000000004c495354fc010000"
    "6d6f7669"
)
_CHUNK_HDR_HEX = "303064639f000000"

_GRAYS = (16, 64, 100, 126)


def queued_query(spark, sf_dir):
    """The x_multimodal_frames body (verbatim future registration)."""
    from pyspark.sql import functions as F

    from hive_scripts_spark.operators import multimodal as M
    from hive_scripts_spark.plans.extension_queries import _JPEG_GRAY_HEX
    from hive_scripts_spark.plans.registry import table

    def frame(k):
        rem = F.pmod(F.col("doc_id") + k, F.lit(4))
        return (
            F.when(rem == 0, F.lit(bytes.fromhex(_JPEG_GRAY_HEX[16])))
            .when(rem == 1, F.lit(bytes.fromhex(_JPEG_GRAY_HEX[64])))
            .when(rem == 2, F.lit(bytes.fromhex(_JPEG_GRAY_HEX[100])))
            .otherwise(F.lit(bytes.fromhex(_JPEG_GRAY_HEX[126])))
        )

    head = F.lit(bytes.fromhex(_AVI_HEAD_HEX))
    ch = F.lit(bytes.fromhex(_CHUNK_HDR_HEX))
    pad = F.lit(b"\x00")
    docs = table(spark, sf_dir, "documents")
    clips = docs.select(
        "doc_id",
        F.concat(
            head, ch, frame(0), pad, ch, frame(1), pad, ch, frame(2), pad
        ).alias("payload"),
    )
    return M.extract_frames(
        clips,
        every_n=2,
        parallelism=min(8, spark.sparkContext.defaultParallelism),
    ).select("doc_id", "frame_index", "width", "height", "frame_md5")


def _md5_case(offset: int) -> str:
    arms = " ".join(
        f"when {i} then '{FRAME_MD5[g]}'" for i, g in enumerate(_GRAYS[:3])
    )
    return (
        f"case cast((doc_id + {offset}) % 4 as int) {arms} "
        f"else '{FRAME_MD5[126]}' end"
    )


QUEUED_ORACLE = f"""
    select doc_id, cast(0 as int) as frame_index,
           cast(8 as int) as width, cast(8 as int) as height,
           {_md5_case(0)} as frame_md5
    from documents
    union all
    select doc_id, cast(2 as int) as frame_index,
           cast(8 as int) as width, cast(8 as int) as height,
           {_md5_case(2)} as frame_md5
    from documents
"""


def _norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(v)
    return str(v)


def _digest(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("\x01".join(_norm(r[i]) for i in order) for r in rows)


def test_queued_frame_md5_literals():
    """The oracle's md5 literals are exactly the md5 of the registered
    JPEG plan literals — re-derived so an edit to either side fails."""
    import hashlib

    from hive_scripts_spark.plans.extension_queries import _JPEG_GRAY_HEX

    for g, want in FRAME_MD5.items():
        assert hashlib.md5(bytes.fromhex(_JPEG_GRAY_HEX[g])).hexdigest() == want


@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_queued_frames_query_matches_oracle(spark, sf_dir):
    got = queued_query(spark, sf_dir)
    spark_digest = _digest(got.columns, got.collect())
    con = duckdb.connect()
    try:
        for t in TABLES:
            con.execute(
                f"create view {t} as select * from '{sf_dir}/{t}.parquet'"
            )
        rel = con.sql(QUEUED_ORACLE)
        duck_digest = _digest(rel.columns, rel.fetchall())
    finally:
        con.close()
    assert spark_digest == duck_digest
