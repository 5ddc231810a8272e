"""Structured Streaming wrapper around the extraction stage.

The north rule specifies a resumable *batch* pipeline (the reference's
Kafka layer is eventing, not stream computation — SURVEY.md §2.9), so
batch is the primary path.  This module exists for deployments that want
the same extraction semantics applied incrementally: a file/Kafka stream
of transcript turns flows through the identical Arrow-batched extraction
stage, and each micro-batch is committed through the same snapshot store
as the batch pipeline (exactly-once via checkpoint + atomic snapshot
publish, the streaming analog of the reference's manual-ack consumer,
OcrMessageListener.java:32-59)."""

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
    store's atomic publish give end-to-end exactly-once.
    """
    stream = (
        spark.readStream.schema(TRANSCRIPTS_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_path)
    )
    extracted = extract_stage(stream)

    def commit_batch(batch_df, batch_id: int):
        store.append(batch_df, lineage=None, run_id=f"stream-batch-{batch_id}")

    writer = (
        extracted.writeStream.foreachBatch(commit_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
