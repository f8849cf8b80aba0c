"""Streaming curation faces (r8 verdict item 7): the quality-model fold
runs streaming-NATIVE (stateless projection — batch plan executed
incrementally), and the full curation composition runs per micro-batch
under foreachBatch with batch-equal row-local gates."""

import shutil

import pytest

from hive_scripts_spark.operators.curation import curate_documents
from hive_scripts_spark.streaming.curation import (
    read_document_stream,
    streaming_curation_batches,
    streaming_quality_scores,
)

SF_DIR = "/root/testdata/sf0.001"

WEIGHTS = [((i * 2654435761) % 2001 - 1000) / 1000.0 for i in range(64)]


@pytest.fixture()
def doc_dir(tmp_path):
    d = tmp_path / "docs"
    d.mkdir()
    shutil.copy(f"{SF_DIR}/documents.parquet", d / "f0.parquet")
    return str(d)


def test_quality_scores_stream_equals_batch(spark, doc_dir):
    """The hashed-linear fold is stateless, so streaming results must be
    BYTE-identical to the batch operator over the same files — the
    Structured Streaming incremental-execution contract, no
    foreachBatch involved."""
    from hive_scripts_spark.operators.textstats import hashed_linear_score

    stream = streaming_quality_scores(
        read_document_stream(spark, doc_dir), WEIGHTS
    )
    assert stream.isStreaming
    q = (
        stream.writeStream.format("memory")
        .queryName("qscores")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    got = sorted(map(tuple, spark.table("qscores").collect()))
    expected = sorted(
        map(
            tuple,
            hashed_linear_score(
                spark.read.parquet(doc_dir), WEIGHTS
            ).collect(),
        )
    )
    assert got == expected
    assert len(got) > 0


def test_foreachbatch_curation_matches_batch(spark, doc_dir, tmp_path):
    """One micro-batch through the foreachBatch curation handler equals
    the batch pipeline on the same rows (single-batch case: even the
    within-batch-only exact dedup is identical)."""
    docs = spark.read.parquet(doc_dir)
    bench = docs.where("doc_id % 23 = 0")
    corpus_stream = read_document_stream(spark, doc_dir).where(
        "doc_id % 23 <> 0"
    )
    out = str(tmp_path / "curated")
    q = (
        corpus_stream.writeStream.foreachBatch(
            streaming_curation_batches(bench, out_dir=out)
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    got = sorted(
        map(
            tuple,
            spark.read.parquet(out)
            .select("doc_id", "text", "n_tokens", "predicted_lang")
            .collect(),
        )
    )
    expected = sorted(
        map(
            tuple,
            curate_documents(docs.where("doc_id % 23 <> 0"), bench).collect(),
        )
    )
    assert got == expected
    assert len(got) > 0


def test_streaming_curation_batches_arg_validation(spark):
    bench = spark.range(1).selectExpr("id as doc_id", "'x' as text")
    with pytest.raises(ValueError, match="exactly one"):
        streaming_curation_batches(bench)
    with pytest.raises(ValueError, match="exactly one"):
        streaming_curation_batches(
            bench, out_dir="/tmp/x", on_batch=lambda df, i: None
        )
