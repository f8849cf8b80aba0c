"""Streaming faces of the curation ops (r8 verdict item 7).

Which batch curation stages run on a stream, and how:

* **Quality-model scoring** (``textstats.hashed_linear_score``) is a
  stateless projection — a plan-literal weight lookup + sequential
  token fold with no aggregation, window, or join. It therefore runs
  on a streaming DataFrame UNCHANGED: :func:`streaming_quality_scores`
  just applies the batch operator to the stream, and Structured
  Streaming's incremental-execution contract makes per-row results
  byte-identical to batch (the parity test asserts exactly that).
  No ``foreachBatch`` needed — this is the good case.

* **The full curation composition** (``curation.curate_documents``:
  exact dedup → decontamination → repetition gate → quality gate →
  lang-ID) contains a groupBy and a join, so it runs per micro-batch
  under ``foreachBatch`` (:func:`streaming_curation_batches`). The
  per-document gates (decontamination, repetition, quality, lang-ID)
  are row-local, so micro-batch output EQUALS batch output for them;
  **exact dedup is within-batch only** — a duplicate that arrives in a
  later micro-batch survives. Cross-batch dedup is a stateful-stream
  concern and composes upstream via
  :func:`hive_scripts_spark.streaming.stateful.streaming_dedup` keyed
  on the content hash, exactly like the events dedup. This split
  (row-local gates inline, cross-row identity via keyed state) is the
  standard production shape; the alternative — a streaming groupBy on
  content hash — would hold every doc's text in state forever.

* **Mixture weights** (``canonical.temperature_weights``) need window
  functions over a global per-source aggregate; window functions are
  unsupported on streaming frames, and a ``complete``-mode aggregate
  would re-emit the whole table per batch. The meaningful streaming
  form is a PERIODIC SNAPSHOT over the accumulated curated output
  (recompute the tiny per-source aggregate each trigger) — batch
  recomputation on a schedule, not a streaming operator. Recorded
  here as a design decision; no code is the right amount of code.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from hive_scripts_spark.operators.curation import curate_documents
from hive_scripts_spark.operators.textstats import hashed_linear_score


def read_document_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream over a documents parquet directory; schema is
    probed from a batch read (file streams require an explicit schema),
    so the stream survives writer schema evolution exactly like batch.
    """
    schema = spark.read.parquet(path).schema
    return spark.readStream.schema(schema).parquet(path)


def streaming_quality_scores(
    docs: DataFrame,
    weights: list[float],
    text_col: str = "text",
    id_col: str = "doc_id",
    portable: bool = True,
) -> DataFrame:
    """Quality-model inference on a streaming documents frame.

    The batch operator applied verbatim: the hashed-linear fold is
    stateless, so the streaming plan is the batch plan executed
    incrementally — append mode, no watermark, no state store. At
    100 TB-ingest posture this is the shape you want: scoring rides
    the ingest stream map-side, and only the (id, n_tokens, logit)
    triple ever reaches a sink or a downstream gate.
    """
    return hashed_linear_score(
        docs, weights, text_col=text_col, id_col=id_col, portable=portable
    )


def streaming_curation_batches(
    benchmark: DataFrame,
    out_dir: str | None = None,
    on_batch: Callable[[DataFrame, int], None] | None = None,
    **curation_kwargs,
):
    """``foreachBatch`` handler running the full curation pipeline per
    micro-batch against a static benchmark frame.

    Returns a function for ``writeStream.foreachBatch``. Per batch the
    handler runs ``curate_documents(batch, benchmark, **kwargs)`` and
    either writes to ``out_dir/batch_id=N`` (overwrite — the idempotent
    retry recipe, same as ``reconcile_parquet_sink``) or hands the
    curated frame to ``on_batch``.

    Semantics note (see module docstring): all gates are row-local and
    match batch exactly; exact dedup deduplicates WITHIN the
    micro-batch only — compose with ``stateful.streaming_dedup`` on a
    content-hash key upstream for cross-batch identity.
    """
    if (out_dir is None) == (on_batch is None):
        raise ValueError("exactly one of out_dir / on_batch is required")

    def curate_batch(batch_df: DataFrame, batch_id: int) -> None:
        curated = curate_documents(batch_df, benchmark, **curation_kwargs)
        if on_batch is not None:
            on_batch(curated, batch_id)
        else:
            curated.write.mode("overwrite").parquet(
                f"{out_dir}/batch_id={batch_id}"
            )

    return curate_batch
