"""Multimodal plumbing tests: binary columns, Arrow-batched decode stub,
frame-sampling plan."""

import pytest

from hive_scripts_spark.operators import multimodal as M


@pytest.fixture(scope="module")
def payloads(spark):
    rows = [(0, "an image payload"), (1, "another payload"), (2, "")]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_binarize_schema(payloads):
    b = M.binarize(payloads, "text")
    assert dict(b.dtypes) == {
        "doc_id": "bigint",
        "payload": "binary",
        "modality": "string",
        "byte_len": "int",
    }
    row = {r["doc_id"]: r for r in b.collect()}
    assert bytes(row[0]["payload"]) == b"an image payload"
    assert row[0]["byte_len"] == 16


def test_decode_meta_deterministic(payloads):
    import hashlib

    out1 = {r["doc_id"]: tuple(r) for r in M.decode_image_meta(M.binarize(payloads, "text")).collect()}
    out2 = {r["doc_id"]: tuple(r) for r in M.decode_image_meta(M.binarize(payloads, "text")).collect()}
    assert out1 == out2  # deterministic fake decode
    d = hashlib.md5(b"an image payload").hexdigest()
    r = out1[0]
    assert r[2] == d
    assert r[3] == 1 + int(d[:4], 16) % 1024
    assert 1 <= r[4] <= 1024


def test_real_decode_is_explicit_stub(payloads):
    with pytest.raises(Exception) as exc_info:
        M.decode_image_meta(M.binarize(payloads, "text"), fake=False).collect()
    assert "NotImplementedError" in str(exc_info.value) or isinstance(
        exc_info.value, NotImplementedError
    )


def test_frame_sample_plan(payloads):
    out = M.frame_sample_plan(payloads, every_n=25)
    rows = out.collect()
    assert len(rows) == 3 * 4  # frames 0,25,50,75 per doc
    assert {r["frame_index"] for r in rows} == {0, 25, 50, 75}
