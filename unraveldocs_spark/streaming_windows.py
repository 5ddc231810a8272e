"""Watermarked, windowed streaming aggregation over extraction results —
the Structured Streaming restatement of the per-conversation rollup
(ProcessOcr.java:185-217) for deployments that consume turns as a stream.

Late turns are tolerated up to the watermark; each emitted row is a
per-conversation per-window status rollup.  State is bounded: the
watermark lets Spark drop window state once event time passes
window_end + delay (the property that matters at 10^12 turns).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .extract import extract_stage
from .schemas import TRANSCRIPTS_SCHEMA


def windowed_rollup_stream(
    spark: SparkSession,
    input_path: str,
    window: str = "1 hour",
    watermark: str = "30 minutes",
) -> DataFrame:
    """readStream(turns) -> extract -> watermark(ts) -> per (conv_id,
    window) status counts with the reference's status ladder."""
    stream = (
        spark.readStream.schema(TRANSCRIPTS_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_path)
    )
    extracted = extract_stage(stream, carry_ts=True)
    agg = (
        extracted.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), F.col("conv_id"))
        .agg(
            F.count(F.lit(1)).alias("total_turns"),
            F.sum(F.when(F.col("status") == "COMPLETED", 1).otherwise(0)).alias(
                "completed"
            ),
            F.sum(F.when(F.col("status") == "FAILED", 1).otherwise(0)).alias("failed"),
        )
    )
    return agg.select(
        F.col("win.start").alias("window_start"),
        F.col("win.end").alias("window_end"),
        "conv_id",
        "total_turns",
        "completed",
        "failed",
        F.when(F.col("completed") == F.col("total_turns"), F.lit("PROCESSED"))
        .when(
            F.col("completed") + F.col("failed") == F.col("total_turns"),
            F.lit("FAILED_OCR"),
        )
        .otherwise(F.lit("PROCESSING"))
        .alias("collection_status"),
    )


def run_windowed_rollup(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_dir: str,
    window: str = "1 hour",
    watermark: str = "30 minutes",
):
    """Run the windowed rollup with an availableNow trigger, appending
    finalized windows to parquet (append mode: only watermark-closed
    windows are emitted — exactly-once per window)."""
    agg = windowed_rollup_stream(spark, input_path, window, watermark)
    return (
        agg.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
