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


def stream_dedup_ingest(
    spark: SparkSession,
    input_path: str,
    store,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
):
    """Incremental exact dedup at ingestion: each micro-batch commits one
    row per content digest that is (a) first within the batch — the
    keeper is the minimum (conv_id, turn_idx), deterministic under
    replay — and (b) unseen in any committed snapshot, via a left-anti
    join against the store's digest column.  The committed corpus stays
    duplicate-free across the stream's life without ever rewriting it.

    Scale shape: the anti-join's right side is a column-pruned scan of
    the committed digests only (32-byte strings, never the text), and
    the within-batch dedup is one window over the digest key.  The same
    run_id-keyed idempotent commit as stream_extract makes replays
    no-ops; construct the store with
    ``DirCheckpointStore(root, results_schema=DEDUP_INGEST_SCHEMA)``."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    stream = (
        spark.readStream.schema(TRANSCRIPTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_path)
    )

    def commit_batch(batch_df, batch_id: int):
        run_id = f"dedup-batch-{batch_id}"
        try:
            if store.has_run(run_id):
                return
        except NotImplementedError:
            pass
        # NULL text would digest to NULL; the left-anti join on digest
        # never matches NULL, so the same row would re-commit every
        # micro-batch (unbounded duplicates in a table whose
        # DEDUP_INGEST_SCHEMA declares digest non-nullable).  Drop
        # NULL-text turns: they carry no content to dedup against.
        batch = batch_df.filter(F.col("text").isNotNull()).withColumn(
            "digest", F.md5(F.col("text").cast("binary"))
        )
        w = Window.partitionBy("digest").orderBy("conv_id", "turn_idx")
        firsts = (
            batch.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("digest", "conv_id", "turn_idx", "text")
        )
        seen = store.results(batch_df.sparkSession).select("digest")
        fresh = firsts.join(seen, "digest", "left_anti")
        store.append(fresh, lineage=None, run_id=run_id)

    writer = (
        stream.writeStream.foreachBatch(commit_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
