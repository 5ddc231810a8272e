"""Driver-facing extraction queries over the TPC-H-ish testdata.

The authoritative extraction correctness gate is pytest (exact per-turn
equality vs the oracle on synthetic transcripts, FIXTURES.md).  These
queries additionally push the *driver's* tables through the real
``mapInPandas`` extraction stage so the DuckDB oracle can verify the full
distributed dispatch end-to-end: a transcripts table is derived
deterministically from ``documents`` (plain payloads only, so every rule
the dispatch picks is SQL-expressible)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .extract import extract_stage
from .pipeline import salted_repartition
from .rollup import conversation_rollup


def derived_transcripts(spark, sf_dir):
    """documents -> transcripts(conv_id, turn_idx, role, text, tool, ts):
    conversation = source, turn order = doc_id order within source."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    w = Window.partitionBy("source").orderBy("doc_id")
    role = (
        F.when(F.col("doc_id") % 5 == 4, F.lit("tool"))
        .when(F.col("doc_id") % 2 == 0, F.lit("user"))
        .otherwise(F.lit("assistant"))
    )
    return d.select(
        F.col("source").alias("conv_id"),
        (F.row_number().over(w) - 1).cast("int").alias("turn_idx"),
        role.alias("role"),
        F.col("text"),
        F.when(role == "tool", F.lit("search")).otherwise(F.lit(None)).alias("tool"),
        F.to_timestamp(F.lit("2026-01-01 00:00:00")).alias("ts"),
    )


def q_extract_turns(spark, sf_dir):
    """Full pipeline slice: derive transcripts -> salted repartition ->
    sortWithinPartitions -> Arrow-batched extraction."""
    t = derived_transcripts(spark, sf_dir)
    out = extract_stage(salted_repartition(t, 16))
    return out.select(
        "conv_id",
        "turn_idx",
        "extracted_text",
        "status",
        "content_format",
        "rule",
        "n_chars",
        "n_words",
    ).orderBy("conv_id", "turn_idx")


SQL_EXTRACT_TURNS = """
WITH t AS (
  SELECT source AS conv_id,
         CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) - 1 AS INT) AS turn_idx,
         CASE WHEN doc_id % 5 = 4 THEN 'tool'
              WHEN doc_id % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
         text
  FROM documents
)
SELECT conv_id, turn_idx,
       CASE WHEN role = 'tool' THEN trim(text) ELSE text END AS extracted_text,
       'COMPLETED' AS status,
       'MARKDOWN' AS content_format,
       CASE WHEN role = 'tool' THEN 'tool_fence' ELSE 'plain' END AS rule,
       CAST(length(CASE WHEN role = 'tool' THEN trim(text) ELSE text END) AS INT) AS n_chars,
       CAST(CASE WHEN trim(text) = '' THEN 0
                 ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS INT) AS n_words
FROM t ORDER BY conv_id, turn_idx
"""


def q_extract_rollup(spark, sf_dir):
    """Conversation rollup over the extraction output
    (ProcessOcr.java:185-217 ladder)."""
    t = derived_transcripts(spark, sf_dir)
    return conversation_rollup(extract_stage(t)).orderBy("conv_id")


SQL_EXTRACT_ROLLUP = """
WITH t AS (SELECT source AS conv_id FROM documents)
SELECT conv_id, COUNT(*) AS total_turns,
       COUNT(*) AS completed, CAST(0 AS BIGINT) AS failed,
       'PROCESSED' AS collection_status
FROM t GROUP BY conv_id ORDER BY conv_id
"""


# rows-only entries (non-SQL-expressible; pytest verifies against the
# pure-Python oracles)

def q_extract_synthetic(spark, sf_dir):
    """Extraction over the full synthetic fixture families (HTML, page
    envelopes, fences, error rows) — the pytest-gated surface."""
    from .generator import transcripts_spark

    t = transcripts_spark(spark, 30, hot_factor=10, include_oversize=False)
    return extract_stage(salted_repartition(t, 16)).select(
        "conv_id", "turn_idx", "status", "rule", "n_chars", "n_words"
    )


def q_simhash_near_dupes(spark, sf_dir):
    from .textanalysis import simhash_near_dupes

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return simhash_near_dupes(d, max_hamming=16)


def q_lang_id(spark, sf_dir):
    """Language-ID via pure column expressions (JVM-side, oracle-checked);
    the pandas-UDF variant (textanalysis.lang_id_stage) is pytest-checked
    equivalent."""
    from .textanalysis import lang_id_expr

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return d.select(
        "doc_id", lang_id_expr(F.col("text")).alias("lang_pred")
    ).orderBy("doc_id")


def q_winnow_fingerprints(spark, sf_dir):
    from .textanalysis import fingerprint_stage

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return fingerprint_stage(d).select("doc_id", "n_fingerprints").orderBy("doc_id")


def q_ann_lsh(spark, sf_dir):
    from .similarity import lsh_topk

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qvec = [float(x) for x in e.filter(F.col("vec_id") == 0).first().embedding]
    return lsh_topk(e.filter(F.col("vec_id") != 0), qvec, k=10, probe_hamming=5)


def q_ann_ivf(spark, sf_dir):
    from .similarity import ivf_topk

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qvec = [float(x) for x in e.filter(F.col("vec_id") == 0).first().embedding]
    return ivf_topk(
        e.filter(F.col("vec_id") != 0), qvec, k=10, n_centroids=16, nprobe=6
    )


def q_multimodal_decode(spark, sf_dir):
    from .multimodal import attach_binary_payload, decode_stage

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return decode_stage(attach_binary_payload(d)).orderBy("doc_id")


def _lang_id_sql() -> str:
    from .textanalysis import lang_id_sql_expr

    return (
        f"SELECT doc_id, {lang_id_sql_expr('text')} AS lang_pred "
        "FROM documents ORDER BY doc_id"
    )


ENTRY_REGISTRY: dict[str, dict] = {
    "extract_turns": {"builder": q_extract_turns, "sql": SQL_EXTRACT_TURNS},
    "extract_rollup": {"builder": q_extract_rollup, "sql": SQL_EXTRACT_ROLLUP},
    "extract_synthetic": {"builder": q_extract_synthetic, "sql": None},
    "simhash_near_dupes": {"builder": q_simhash_near_dupes, "sql": None},
    "lang_id": {"builder": q_lang_id, "sql": _lang_id_sql()},
    "winnow_fingerprints": {"builder": q_winnow_fingerprints, "sql": None},
    "ann_lsh_topk": {"builder": q_ann_lsh, "sql": None},
    "ann_ivf_topk": {"builder": q_ann_ivf, "sql": None},
    "multimodal_decode": {"builder": q_multimodal_decode, "sql": None},
}
