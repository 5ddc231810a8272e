"""Structured Streaming wrapper around the extraction stage.

The north rule specifies a resumable *batch* pipeline (the reference's
Kafka layer is eventing, not stream computation — SURVEY.md §2.9), so
batch is the primary path.  This module exists for deployments that want
the same extraction semantics applied incrementally: a file/Kafka stream
of transcript turns flows through the identical Arrow-batched extraction
stage, and each micro-batch is committed through the same snapshot store
as the batch pipeline (the streaming analog of the reference's manual-ack
consumer, OcrMessageListener.java:32-59).

Delivery semantics: foreachBatch is at-least-once — a crash after
``store.append`` but before Spark commits the streaming checkpoint
replays the micro-batch.  The sink is made effectively-once by an
idempotent commit: each batch appends under the deterministic run_id
``stream-batch-{batch_id}`` and a replayed batch whose run_id is already
committed is skipped (the standard idempotent-foreachBatch pattern)."""

from __future__ import annotations

from pyspark.sql import SparkSession

from .extract import extract_stage
from .schemas import TRANSCRIPTS_SCHEMA


def stream_extract(
    spark: SparkSession,
    input_path: str,
    store,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
):
    """Incrementally extract from a directory-of-parquet stream of turns.

    Each micro-batch runs the same extract_stage and appends one snapshot
    to ``store``; Spark's streaming checkpoint (source offsets) plus the
    run_id-keyed idempotent append make replayed batches no-ops, so the
    committed results are duplicate-free even though foreachBatch itself
    is at-least-once.
    """
    stream = (
        spark.readStream.schema(TRANSCRIPTS_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_path)
    )
    extracted = extract_stage(stream)

    def commit_batch(batch_df, batch_id: int):
        run_id = f"stream-batch-{batch_id}"
        # idempotent replay guard: a micro-batch that crashed between
        # store.append and the streaming-checkpoint commit re-runs here
        # with the same batch_id — skip if its snapshot already committed.
        # A store without run-id tracking degrades to plain at-least-once
        # append instead of failing the stream on its first micro-batch.
        try:
            if store.has_run(run_id):
                return
        except NotImplementedError:
            pass
        store.append(batch_df, lineage=None, run_id=run_id)

    writer = (
        extracted.writeStream.foreachBatch(commit_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
