"""Declared (not inferred) schemas — the reference manages its schema via
Flyway migrations (db/migration/V11__create_ocr_data_table.sql:1-11 etc.);
the graft declares Spark schemas the same way (SURVEY.md §1.4)."""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# Input: transcripts table, exactly BASELINE.json input_hint
TRANSCRIPTS_SCHEMA = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("role", StringType(), False),
        StructField("text", StringType(), True),
        StructField("tool", StringType(), True),
        StructField("ts", TimestampType(), False),
    ]
)

SPAN_TYPE = StructType(
    [
        StructField("start", IntegerType(), False),
        StructField("end", IntegerType(), False),
        StructField("kind", StringType(), False),
    ]
)

# Output: per-turn extraction record — analog of the ocr_data row
# (SRC/ocrprocessing/model/OcrData.java:17-66) at (conv_id, turn_idx) grain.
# edited_content/edited_by mirror OcrData's edit lifecycle: an edit NEVER
# overwrites extracted_text (UpdateOcrContentImpl.java:72-78 sets
# editedContent and leaves extractedText intact).
EXTRACTIONS_SCHEMA = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("extracted_text", StringType(), True),
        StructField("spans", ArrayType(SPAN_TYPE), True),
        StructField("status", StringType(), False),
        StructField("error_message", StringType(), True),
        StructField("content_format", StringType(), True),
        StructField("rule", StringType(), False),
        StructField("n_chars", IntegerType(), False),
        StructField("n_words", IntegerType(), False),
        StructField("edited_content", StringType(), True),
        StructField("edited_by", StringType(), True),
    ]
)

# Streaming incremental dedup: one committed row per DISTINCT content
# digest across the stream's life (streaming.stream_dedup_ingest)
DEDUP_INGEST_SCHEMA = StructType(
    [
        StructField("digest", StringType(), False),
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("text", StringType(), True),
    ]
)

# Lineage: one row per task partition per run (north rule: per-partition
# lineage + metrics; analog of OcrMetrics counters, OcrMetrics.java:42-157)
LINEAGE_SCHEMA = StructType(
    [
        StructField("run_id", StringType(), False),
        StructField("partition_id", IntegerType(), False),
        StructField("turns_processed", LongType(), False),
        StructField("bytes_parsed", LongType(), False),
        StructField("completed", LongType(), False),
        StructField("failed", LongType(), False),
        StructField("rule_hits", StringType(), False),  # JSON {rule: count}
        StructField("wall_ms", LongType(), False),
    ]
)

# Conversation rollup — ProcessOcr.updateCollectionStatus (ProcessOcr.java:185-217)
ROLLUP_SCHEMA = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("total_turns", LongType(), False),
        StructField("completed", LongType(), False),
        StructField("failed", LongType(), False),
        StructField("collection_status", StringType(), False),
    ]
)

# Corpus-build export shards (jobs/run_corpus_build.py over
# trainingdata.q_corpus_export_shards): one row per (lang, shard)
CORPUS_SHARDS_SCHEMA = StructType(
    [
        StructField("lang", StringType(), False),
        StructField("shard_id", IntegerType(), False),
        StructField("n_docs", IntegerType(), False),
        StructField("shard_tokens", LongType(), False),
    ]
)

# Corpus-build lineage: one row per language (the corpus pipeline's
# partition-of-record is the language shard group, not a task partition)
CORPUS_LINEAGE_SCHEMA = StructType(
    [
        StructField("lang", StringType(), False),
        StructField("n_shards", LongType(), False),
        StructField("lang_tokens", LongType(), False),
        StructField("lang_docs", LongType(), False),
    ]
)
