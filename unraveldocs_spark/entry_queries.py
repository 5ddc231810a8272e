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
from .queries import _spark_java_word_count, _sql_java_word_count
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
    out = extract_stage(salted_repartition(t, max(16, spark.sparkContext.defaultParallelism)))
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


SQL_EXTRACT_TURNS = f"""
WITH t AS (
  SELECT source AS conv_id,
         CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) - 1 AS INT) AS turn_idx,
         CASE WHEN doc_id % 5 = 4 THEN 'tool'
              WHEN doc_id % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
         text
  FROM documents
), e AS (
  SELECT conv_id, turn_idx, role,
         CASE WHEN role = 'tool'
              THEN trim(text, ' ' || chr(9) || chr(10) || chr(11) || chr(12) || chr(13))
              ELSE text END AS extracted_text
  FROM t
)
SELECT conv_id, turn_idx, extracted_text,
       'COMPLETED' AS status,
       'MARKDOWN' AS content_format,
       CASE WHEN role = 'tool' THEN 'tool_fence' ELSE 'plain' END AS rule,
       CAST(length(extracted_text) AS INT) AS n_chars,
       {_sql_java_word_count('extracted_text')} AS n_words
FROM e ORDER BY conv_id, turn_idx
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


def q_extract_synthetic(spark, sf_dir):
    """Extraction over the full synthetic fixture families (HTML, page
    envelopes, fences, vision, error rows) through the REAL distributed
    path; the DuckDB oracle is the sequential pure-Python fixture oracle
    emitted as a VALUES table (oracle_sql_gen.extract_synthetic_sql) —
    per-turn text equality, driver-visible."""
    from .generator import transcripts_spark

    t = transcripts_spark(
        spark, 30, hot_factor=10, include_oversize=False, parallelism=8
    )
    spans_str = F.array_join(
        F.transform(
            F.col("spans"),
            lambda s: F.concat_ws(
                ":",
                F.concat_ws("-", s["start"].cast("string"), s["end"].cast("string")),
                s["kind"],
            ),
        ),
        "|",
    )
    return extract_stage(salted_repartition(t, max(16, spark.sparkContext.defaultParallelism))).select(
        "conv_id", "turn_idx", "status", "rule", "extracted_text",
        "error_message", spans_str.alias("spans_str"), "n_chars", "n_words",
    ).orderBy("conv_id", "turn_idx")


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
    """Count + mod-1e9+7 checksum of each doc's winnowing fingerprints
    (the checksum pins the selected hash VALUES, not just how many)."""
    from .textanalysis import fingerprint_stage

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    fp_sum = F.aggregate(
        F.col("fingerprints"),
        F.lit(0).cast("long"),
        lambda acc, x: F.pmod(acc + x, F.lit(1_000_000_007)),
    )
    return (
        fingerprint_stage(d)
        .select("doc_id", "n_fingerprints", fp_sum.alias("fp_sum"))
        .orderBy("doc_id")
    )


def _cos_e4(df):
    return df.select(
        "vec_id", F.round(F.col("cosine") * 10000).cast("bigint").alias("cos_e4")
    )


def q_ann_lsh(spark, sf_dir):
    from .similarity import lsh_topk

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qvec = [float(x) for x in e.filter(F.col("vec_id") == 0).first().embedding]
    return _cos_e4(
        lsh_topk(e.filter(F.col("vec_id") != 0), qvec, k=10, probe_hamming=5)
    )


def q_ann_ivf(spark, sf_dir):
    from .similarity import ivf_topk

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qvec = [float(x) for x in e.filter(F.col("vec_id") == 0).first().embedding]
    return _cos_e4(
        ivf_topk(e.filter(F.col("vec_id") != 0), qvec, k=10, n_centroids=16, nprobe=6)
    )


def q_ann_pq(spark, sf_dir):
    """PQ-compressed ANN: 8x16 product codebook, integer ADC scan over
    the 8-byte code column (similarity.pq_topk)."""
    from .similarity import pq_topk

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qvec = [float(x) for x in e.filter(F.col("vec_id") == 0).first().embedding]
    return pq_topk(e.filter(F.col("vec_id") != 0), qvec, k=10)


def q_pdf_layout(spark, sf_dir):
    """F10 layout parse end-to-end: positioned-run envelopes are derived
    deterministically from document tokens (fixed 40-unit x slots, 12-unit
    line pitch, 0..2 baseline jitter, runs emitted in REVERSE reading
    order), pushed through the real Arrow-batched extraction stage, and
    verified against a DuckDB oracle that re-derives the expected lines
    with window functions — two independent implementations of the
    clustering rules (pdflayout.py)."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = F.slice(F.split(F.trim(F.col("text")), r"\s+"), 1, 12)
    runs = F.reverse(
        F.transform(
            toks,
            lambda tok, i: F.struct(
                (F.lit(10) + (i % 4) * 40).cast("int").alias("x"),
                (
                    F.lit(100)
                    + F.floor(i / 4).cast("int") * 12
                    + ((F.col("doc_id") + i) % 3).cast("int")
                ).cast("int").alias("y"),
                (F.length(tok) * 6).cast("int").alias("w"),
                F.lit(10).alias("h"),
                tok.alias("s"),
            ),
        )
    )
    envelope = F.concat(
        F.lit('{"kind":"layout","runs":'), F.to_json(runs), F.lit("}")
    )
    w = Window.partitionBy("source").orderBy("doc_id")
    t = d.select(
        F.col("source").alias("conv_id"),
        (F.row_number().over(w) - 1).cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        envelope.alias("text"),
        F.lit(None).cast("string").alias("tool"),
        F.to_timestamp(F.lit("2026-01-01 00:00:00")).alias("ts"),
    )
    return (
        extract_stage(salted_repartition(t, max(16, spark.sparkContext.defaultParallelism)))
        .select("conv_id", "turn_idx", "extracted_text", "status", "rule")
        .orderBy("conv_id", "turn_idx")
    )


SQL_PDF_LAYOUT = """
WITH arrd AS (
  SELECT doc_id, source,
         (regexp_split_to_array(trim(text), '\\s+'))[1:12] AS arr
  FROM documents
), toks AS (
  SELECT doc_id, source, u.i - 1 AS ti, arr[CAST(u.i AS INT)] AS tok
  FROM arrd, UNNEST(range(1, len(arr) + 1)) AS u(i)
), runs AS (
  SELECT doc_id, source, ti // 4 AS line, ti % 4 AS pos, tok,
         6 * length(tok) AS w
  FROM toks
), runs2 AS (
  SELECT *, MAX(pos) OVER (PARTITION BY doc_id, line) AS maxpos FROM runs
), lines AS (
  SELECT doc_id, source, line,
         string_agg(tok || CASE WHEN pos < maxpos AND 40 - w > 2
                                THEN ' ' ELSE '' END, '' ORDER BY pos) AS lt
  FROM runs2 GROUP BY doc_id, source, line
), doc_text AS (
  SELECT doc_id, source, string_agg(lt, chr(10) ORDER BY line) AS extracted_text
  FROM lines GROUP BY doc_id, source
)
SELECT source AS conv_id,
       CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) - 1 AS INT) AS turn_idx,
       extracted_text,
       'COMPLETED' AS status,
       'layout' AS rule
FROM doc_text ORDER BY conv_id, turn_idx
"""


def q_multimodal_decode(spark, sf_dir):
    from .multimodal import attach_binary_payload, decode_stage

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return decode_stage(attach_binary_payload(d)).orderBy("doc_id")


def q_multimodal_resize(spark, sf_dir):
    """Aspect-preserving resize plan for image payloads (integer
    arithmetic fit into 224x224) downstream of the decode stage."""
    from .multimodal import attach_binary_payload, decode_stage, resize_plan_stage

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return resize_plan_stage(decode_stage(attach_binary_payload(d))).orderBy(
        "doc_id"
    )


SQL_MULTIMODAL_RESIZE = """
WITH src AS (
  SELECT doc_id,
         CASE WHEN doc_id % 4 = 0 THEN 'image/png' ELSE 'image/jpeg' END AS media_type,
         CAST(octet_length(encode(text)) AS INT) AS n,
         COALESCE(list_aggregate(list_transform(
             range(1, CAST(least(length(text), 64) + 1 AS INT)),
             i -> ascii(substr(text, CAST(i AS INT), 1))), 'sum'), 0) AS checksum
  FROM documents WHERE doc_id % 4 IN (0, 1)
), dims AS (
  SELECT doc_id, media_type,
         CAST(64 + (checksum % 16) * 32 AS INT) AS width,
         CAST(64 + (n % 12) * 32 AS INT) AS height
  FROM src
)
SELECT doc_id, media_type, width, height,
       CAST(greatest(1, (width * 224) // greatest(width, height)) AS INT) AS out_width,
       CAST(greatest(1, (height * 224) // greatest(width, height)) AS INT) AS out_height
FROM dims ORDER BY doc_id
"""


def q_multimodal_features(spark, sf_dir):
    """Byte-class histogram features over binary payloads (the
    feature-extract stand-in), Arrow-batched; emitted as a joined string
    so hashing never depends on list canonicalization."""
    from .multimodal import attach_binary_payload, feature_stage

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return feature_stage(attach_binary_payload(d)).orderBy("doc_id")


def _features_sql() -> str:
    from .multimodal import FEATURE_BINS

    bins = " || '|' || ".join(
        f"CAST(len(list_filter(pfx, a -> a % {FEATURE_BINS} = {c})) AS VARCHAR)"
        for c in range(FEATURE_BINS)
    )
    return f"""
WITH src AS (
  SELECT doc_id,
         list_transform(range(1, CAST(least(length(text), 64) + 1 AS INT)),
                        i -> ascii(substr(text, CAST(i AS INT), 1))) AS pfx
  FROM documents
)
SELECT doc_id, {bins} AS features
FROM src ORDER BY doc_id
"""


def q_frame_sample(spark, sf_dir):
    """Video frame-sampling plan over decoded multimodal payloads: every
    30th frame as (doc_id, frame_no) rows — pure JVM sequence+explode
    downstream of the Arrow decode stage (multimodal.frame_sample_stage)."""
    from .multimodal import attach_binary_payload, decode_stage, frame_sample_stage

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return frame_sample_stage(
        decode_stage(attach_binary_payload(d)), every_n=30
    ).orderBy("doc_id", "frame_no")


SQL_FRAME_SAMPLE = """
WITH src AS (
  SELECT doc_id, CAST(octet_length(encode(text)) AS INT) AS n
  FROM documents WHERE doc_id % 4 = 3
), decoded AS (
  SELECT doc_id, 1 + n % 240 AS n_frames FROM src
)
SELECT doc_id, CAST(u.f AS INT) AS frame_no
FROM decoded, UNNEST(range(0, n_frames, 30)) AS u(f)
ORDER BY doc_id, frame_no
"""


def _lang_id_sql() -> str:
    from .textanalysis import lang_id_sql_expr

    return (
        f"SELECT doc_id, {lang_id_sql_expr('text')} AS lang_pred "
        "FROM documents ORDER BY doc_id"
    )


def _extract_synthetic_sql() -> str:
    from .oracle_sql_gen import extract_synthetic_sql

    return extract_synthetic_sql(n_convs=30, hot_factor=10, include_oversize=False)


def q_encrypted_roundtrip(spark, sf_dir):
    """AES-256-GCM encrypt -> store -> decrypt -> extract roundtrip over
    the synthetic fixture corpus: a deterministic ~60% of turns is
    uploaded encrypted (crypto.should_encrypt, the enableEncryption flag
    of DocumentUploadService.java:20), the payload replaced by the
    {"kind":"encrypted"} envelope (AesEncryptionServiceImpl.java:53-112
    semantics: 12-byte IV, 128-bit tag, ct||tag layout, IV stored base64
    as FileEntry.encryptionIv), and the REAL distributed extraction
    stage decrypts-then-extracts.  Output per turn: the encryption
    metadata plus the md5-56 digest of the extracted text and a
    ``match_plain`` flag comparing it against the extraction of the
    UN-encrypted corpus — 1 everywhere iff the roundtrip is lossless.

    Scale shape: ONE zero-shuffle Arrow stage — each worker encrypts the
    turn, extracts the ciphertext envelope through the shared dispatch
    (which decrypts), extracts the plaintext, and emits the two digests
    side by side; no join, no second pipeline traversal (production
    never retains the plaintext side — the fused compare exists only
    for verification).  The composable ``encrypt_stage``/
    ``extract_stage`` production stages are plan- and parity-tested
    separately (tests/test_crypto.py, tests/test_plans.py)."""
    import hashlib

    import pandas as pd

    from .crypto import encrypt_turn
    from .generator import transcripts_spark
    from .oracle import extract_turn

    t = transcripts_spark(
        spark, 30, hot_factor=10, include_oversize=False, parallelism=8
    )

    def _dg(s):
        if s is None:
            return None
        return int(
            hashlib.md5(s.encode("utf-8", errors="surrogatepass")).hexdigest()[:14],
            16,
        )

    def run(batches):
        cols = (
            "conv_id", "turn_idx", "is_encrypted", "iv_b64", "status",
            "rule", "error_message", "text_digest", "match_plain",
        )
        for pdf in batches:
            out = {c: [] for c in cols}
            for conv_id, turn_idx, role, text, tool in zip(
                pdf["conv_id"], pdf["turn_idx"], pdf["role"],
                pdf["text"], pdf["tool"],
            ):
                if text is not None and not isinstance(text, str):
                    text = None if text != text else str(text)
                if tool is not None and not isinstance(tool, str):
                    tool = None if tool != tool else str(tool)
                turn_idx = int(turn_idx)
                enc_text, is_enc, iv_b64 = encrypt_turn(conv_id, turn_idx, text)
                r_enc = extract_turn(role, tool, enc_text)
                r_plain = extract_turn(role, tool, text)
                dg, dg_plain = _dg(r_enc.extracted_text), _dg(r_plain.extracted_text)
                out["conv_id"].append(conv_id)
                out["turn_idx"].append(turn_idx)
                out["is_encrypted"].append(is_enc)
                out["iv_b64"].append(iv_b64)
                out["status"].append(r_enc.status)
                out["rule"].append(r_enc.rule)
                out["error_message"].append(r_enc.error_message)
                out["text_digest"].append(dg)
                out["match_plain"].append(int(dg == dg_plain))
            yield pd.DataFrame(
                {
                    **out,
                    "turn_idx": pd.array(out["turn_idx"], dtype="int32"),
                    "is_encrypted": pd.array(out["is_encrypted"], dtype="int32"),
                    # nullable Int64 (not object/float64): a 56-bit digest
                    # exceeds float64's 53-bit mantissa, so any float
                    # round-trip silently corrupts the low bits
                    "text_digest": pd.array(out["text_digest"], dtype="Int64"),
                    "match_plain": pd.array(out["match_plain"], dtype="int32"),
                }
            )

    return (
        t.select("conv_id", "turn_idx", "role", "text", "tool")
        .mapInPandas(
            run,
            schema=(
                "conv_id string, turn_idx int, is_encrypted int, "
                "iv_b64 string, status string, rule string, "
                "error_message string, text_digest bigint, match_plain int"
            ),
        )
        .orderBy("conv_id", "turn_idx")
    )


def _encrypted_roundtrip_sql() -> str:
    from .oracle_sql_gen import encrypted_roundtrip_sql

    return encrypted_roundtrip_sql(n_convs=30, hot_factor=10)


_DOCX_STAT_COLS = (
    "n_paragraphs", "n_runs", "n_bold", "n_italic", "n_underline",
    "n_breaks", "n_list_items", "n_headings", "docx_digest", "docx_size",
)


def q_docx_export(spark, sf_dir):
    """DOCX export over the synthetic corpus through the REAL distributed
    path: every non-null turn payload rendered by the faithful writer
    mirror (wordexport.docx_paragraphs — heading styles, bold/size
    header runs, list numbering + 720-twip indents, inline
    bold/italic/underline/br runs; DocxExportServiceImpl.java:22-170)
    and packed into a deterministic binary .docx
    (wordexport.docx_bytes).  Output per turn: paragraph/run/attribute
    counts and the md5-56 digest of the .docx bytes — the writer is
    byte-verified end to end without shipping blobs through the
    compare.  The DuckDB oracle is the sequential pure-Python writer
    emitted as a VALUES table (the extract_synthetic contract).

    Scale shape: one zero-shuffle Arrow stage over the transcripts —
    rendering is embarrassingly parallel, exactly how a 100-TB export
    job runs."""
    import pandas as pd

    from .generator import transcripts_spark
    from .wordexport import docx_stats

    t = transcripts_spark(
        spark, 30, hot_factor=10, include_oversize=False, parallelism=8
    )

    def run(batches):
        for pdf in batches:
            out = {"conv_id": [], "turn_idx": []}
            for c in _DOCX_STAT_COLS:
                out[c] = []
            for conv_id, turn_idx, text in zip(
                pdf["conv_id"], pdf["turn_idx"], pdf["text"]
            ):
                if text is None or not isinstance(text, str):
                    continue
                s = docx_stats(text)
                out["conv_id"].append(conv_id)
                out["turn_idx"].append(int(turn_idx))
                for c in _DOCX_STAT_COLS:
                    out[c].append(s[c])
            # 56-bit digests must never pass through float64 (53-bit
            # mantissa) — pin the dtype instead of trusting inference
            out["docx_digest"] = pd.array(out["docx_digest"], dtype="Int64")
            yield pd.DataFrame(out)

    schema = (
        "conv_id string, turn_idx int, "
        + ", ".join(
            f"{c} {'bigint' if c == 'docx_digest' else 'int'}"
            for c in _DOCX_STAT_COLS
        )
    )
    return (
        t.select("conv_id", "turn_idx", "text")
        .mapInPandas(run, schema=schema)
        .orderBy("conv_id", "turn_idx")
    )


def _docx_export_sql() -> str:
    from .oracle_sql_gen import docx_export_sql

    return docx_export_sql(n_convs=30, hot_factor=10)


def q_encrypted_export(spark, sf_dir):
    """Encrypted-at-rest export sink: per-conversation payload assembly
    (turn-ordered "role: text" lines, JVM-side — the conversation_pack
    assembly) followed by AES-256-GCM shard encryption with a
    conversation-derived IV, emitting the export manifest a consumer
    needs: sizes, the plaintext digest (integrity), the ciphertext
    digest (what's actually stored), the IV, and a decrypt-roundtrip
    verdict.  The at-rest encryption story of crypto.py applied to the
    corpus SINK (the reference encrypts stored uploads; a training-data
    export encrypts stored shards the same way).

    Scale shape: one conv_id Exchange for the assembly groupBy, then a
    zero-shuffle Arrow stage for the cipher work — per-shard crypto is
    embarrassingly parallel."""
    import base64
    import hashlib

    import pandas as pd

    from .crypto import FIXTURE_MASTER_KEY, decrypt_bytes, derive_iv, encrypt_bytes
    from .generator import transcripts_spark

    t = transcripts_spark(
        spark, 30, hot_factor=10, include_oversize=False, parallelism=8
    )
    line = F.concat_ws(": ", "role", "text")
    assembled = (
        t.filter(F.col("text").isNotNull())
        .select("conv_id", "turn_idx", line.alias("line"))
        .groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_turns"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("turn_idx", "line"))),
                    lambda s: s["line"],
                ),
                "\n",
            ).alias("payload"),
        )
    )

    def run(batches):
        cols = ("conv_id", "n_turns", "pt_bytes", "pt_digest",
                "iv_b64", "ct_digest", "roundtrip_ok")
        for pdf in batches:
            out = {c: [] for c in cols}
            for conv_id, n_turns, payload in zip(
                pdf["conv_id"], pdf["n_turns"], pdf["payload"]
            ):
                pt = payload.encode("utf-8", errors="surrogatepass")
                iv = derive_iv("shard:" + conv_id, 0)
                ct = encrypt_bytes(FIXTURE_MASTER_KEY, iv, pt)
                out["conv_id"].append(conv_id)
                out["n_turns"].append(int(n_turns))
                out["pt_bytes"].append(len(pt))
                out["pt_digest"].append(int(hashlib.md5(pt).hexdigest()[:14], 16))
                out["iv_b64"].append(base64.b64encode(iv).decode("ascii"))
                out["ct_digest"].append(int(hashlib.md5(ct).hexdigest()[:14], 16))
                out["roundtrip_ok"].append(
                    int(decrypt_bytes(FIXTURE_MASTER_KEY, iv, ct) == pt)
                )
            out["pt_digest"] = pd.array(out["pt_digest"], dtype="Int64")
            out["ct_digest"] = pd.array(out["ct_digest"], dtype="Int64")
            yield pd.DataFrame(out)

    return (
        assembled.mapInPandas(
            run,
            schema=(
                "conv_id string, n_turns int, pt_bytes int, pt_digest bigint, "
                "iv_b64 string, ct_digest bigint, roundtrip_ok int"
            ),
        )
        .orderBy("conv_id")
    )


def _encrypted_export_sql() -> str:
    from .oracle_sql_gen import encrypted_export_sql

    return encrypted_export_sql(n_convs=30, hot_factor=10)


def _simhash_sql() -> str:
    from .oracle_sql_gen import simhash_near_dupes_sql

    return simhash_near_dupes_sql(max_hamming=16)


def _winnow_sql() -> str:
    from .oracle_sql_gen import winnow_fingerprints_sql

    return winnow_fingerprints_sql()


def _ann_lsh_sql() -> str:
    from .oracle_sql_gen import ann_lsh_topk_sql

    return ann_lsh_topk_sql(k=10, probe_hamming=5)


def _ann_ivf_sql() -> str:
    from .oracle_sql_gen import ann_ivf_topk_sql

    return ann_ivf_topk_sql(k=10, n_centroids=16, nprobe=6)


def _ann_pq_sql() -> str:
    from .oracle_sql_gen import ann_pq_topk_sql

    return ann_pq_topk_sql(k=10)


def _multimodal_sql() -> str:
    from .oracle_sql_gen import multimodal_decode_sql

    return multimodal_decode_sql()


# "sql_fn" entries are generated lazily (extract_synthetic runs the pure
# oracle over ~800 synthetic turns to build its VALUES table)
ENTRY_REGISTRY: dict[str, dict] = {
    "extract_turns": {"builder": q_extract_turns, "sql": SQL_EXTRACT_TURNS},
    "extract_rollup": {"builder": q_extract_rollup, "sql": SQL_EXTRACT_ROLLUP},
    "extract_synthetic": {"builder": q_extract_synthetic, "sql_fn": _extract_synthetic_sql},
    "encrypted_roundtrip": {"builder": q_encrypted_roundtrip, "sql_fn": _encrypted_roundtrip_sql},
    "docx_export": {"builder": q_docx_export, "sql_fn": _docx_export_sql},
    "encrypted_export": {"builder": q_encrypted_export, "sql_fn": _encrypted_export_sql},
    "simhash_near_dupes": {"builder": q_simhash_near_dupes, "sql_fn": _simhash_sql},
    "lang_id": {"builder": q_lang_id, "sql": _lang_id_sql()},
    "pdf_layout": {"builder": q_pdf_layout, "sql": SQL_PDF_LAYOUT},
    "winnow_fingerprints": {"builder": q_winnow_fingerprints, "sql_fn": _winnow_sql},
    "ann_lsh_topk": {"builder": q_ann_lsh, "sql_fn": _ann_lsh_sql},
    "ann_ivf_topk": {"builder": q_ann_ivf, "sql_fn": _ann_ivf_sql},
    "ann_pq_topk": {"builder": q_ann_pq, "sql_fn": _ann_pq_sql},
    "multimodal_decode": {"builder": q_multimodal_decode, "sql_fn": _multimodal_sql},
    "frame_sample": {"builder": q_frame_sample, "sql": SQL_FRAME_SAMPLE},
    "multimodal_resize": {"builder": q_multimodal_resize, "sql": SQL_MULTIMODAL_RESIZE},
    "multimodal_features": {"builder": q_multimodal_features, "sql_fn": _features_sql},
}


# ---------------------------------------------------------------------------
# Conversation context assembly — the transcript-native packing step that
# turns extracted multi-turn conversations into SFT training examples:
# turns concatenated in order as "role: text" lines under a per-
# conversation token budget (greedy prefix in turn order — the oldest
# turns are the context the example needs; overflow truncates the tail).
# ---------------------------------------------------------------------------

_CONV_PACK_BUDGET = 400  # per-conversation token budget (synthetic scale)


def q_conversation_pack(spark, sf_dir):
    """Per-conversation SFT example assembly over the derived
    transcripts: keep turns while the running token total BEFORE the
    turn is under budget (same inclusive-boundary rule as shard
    packing), then emit per-conv kept-turn counts, kept tokens, and the
    md5-56 digest of the assembled "role: text" example — narrow-row
    verification of the full assembly, as exact_substring_dedup does.

    Scale shape: one conv_id-partitioned window (running sum in turn
    order) feeding a groupBy(conv_id) that SHARES the partitioning —
    one Exchange total; assembly is collect_list of already-ordered
    structs, never a driver-side concat."""
    t = derived_transcripts(spark, sf_dir)
    n_tokens = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    w = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    kept = (
        t.select("conv_id", "turn_idx", "role", "text", n_tokens.alias("n_tokens"))
        .withColumn("cum_before", cum_before)
        .filter(F.col("cum_before") < _CONV_PACK_BUDGET)
    )
    line = F.concat_ws(": ", "role", "text")
    return (
        kept.select("conv_id", "turn_idx", "n_tokens", line.alias("line"))
        .groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_turns_kept"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens_kept"),
            F.conv(
                F.substring(
                    F.md5(
                        F.array_join(
                            F.transform(
                                F.array_sort(
                                    F.collect_list(F.struct("turn_idx", "line"))
                                ),
                                lambda s: s["line"],
                            ),
                            "\n",
                        ).cast("binary")
                    ),
                    1,
                    14,
                ),
                16,
                10,
            ).cast("bigint").alias("example_digest"),
        )
        .orderBy("conv_id")
    )


SQL_CONVERSATION_PACK = f"""
WITH t AS (
  SELECT source AS conv_id,
         CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) - 1 AS INT) AS turn_idx,
         CASE WHEN doc_id % 5 = 4 THEN 'tool'
              WHEN doc_id % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
         text,
         len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens
  FROM documents
), cum AS (
  SELECT *, COALESCE(SUM(n_tokens) OVER (
           PARTITION BY conv_id ORDER BY turn_idx
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
  FROM t
), kept AS (
  SELECT conv_id, turn_idx, n_tokens, role || ': ' || text AS line
  FROM cum WHERE cum_before < {_CONV_PACK_BUDGET}
)
SELECT conv_id,
       CAST(COUNT(*) AS INT) AS n_turns_kept,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens_kept,
       ('0x' || substr(md5(string_agg(line, chr(10) ORDER BY turn_idx)), 1, 14))::BIGINT
         AS example_digest
FROM kept GROUP BY conv_id ORDER BY conv_id
"""


ENTRY_REGISTRY["conversation_pack"] = {
    "builder": q_conversation_pack,
    "sql": SQL_CONVERSATION_PACK,
}


# ---------------------------------------------------------------------------
# Preference-pair construction (DPO/RLHF-style) — the transcript-native
# step that turns multi-response conversations into (prompt, chosen,
# rejected) training pairs: each assistant turn is attributed to the
# nearest PRECEDING user turn (tool turns don't break attribution), and
# every prompt with >=2 assistant responses emits one pair — highest-
# reward response chosen, lowest rejected — skipping reward ties.  The
# reward is a deterministic proxy (1000*word_count + n_chars, Java word
# semantics) standing in for a reward-model score; a production
# deployment swaps the expression for a scored column without touching
# the pairing shape.
#
# Roles derive from turn POSITION (turn_idx % 3 == 0 -> user,
# turn_idx % 10 == 7 -> tool, else assistant), not from doc_id parity as
# in derived_transcripts: the driver corpus assigns doc_ids round-robin
# by source, so doc-parity roles are constant per conversation and would
# never produce the user-followed-by-multiple-assistants shape pairing
# operates on.
# ---------------------------------------------------------------------------


def q_preference_pairs(spark, sf_dir):
    """(prompt, chosen, rejected) pair assembly over the derived
    transcripts, digests in place of wide text (driver-schema rule).

    Scale shape: prompt attribution is ONE conv_id-partitioned running
    window (last user turn so far, ignorenulls); pair selection is two
    row_number ranks over (conv_id, prompt_idx) — same partitioning,
    one Exchange — feeding a groupBy on the SAME key (no further
    shuffle).  Two hash Exchanges total regardless of corpus size; no
    self-join, no explode.  Hot conversations are bounded by turns-per-
    conversation, not corpus size, so no salting is needed on the pair
    key (unlike the extraction stage's conv_id salt, where payload
    bytes ride the shuffle)."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    w0 = Window.partitionBy("source").orderBy("doc_id")
    turn_idx = (F.row_number().over(w0) - 1).cast("int")
    t = d.select(
        F.col("source").alias("conv_id"),
        turn_idx.alias("turn_idx"),
        F.col("text"),
    ).withColumn(
        "role",
        F.when(F.col("turn_idx") % 3 == 0, F.lit("user"))
        .when(F.col("turn_idx") % 10 == 7, F.lit("tool"))
        .otherwise(F.lit("assistant")),
    )
    w_ctx = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    user_idx = F.when(F.col("role") == "user", F.col("turn_idx"))
    user_text = F.when(F.col("role") == "user", F.col("text"))
    reward = (
        F.lit(1000).cast("bigint") * _spark_java_word_count(F.col("text"))
        + F.length("text")
    ).cast("bigint")
    resp = (
        t.select("conv_id", "turn_idx", "role", "text")
        .withColumn("prompt_idx", F.last(user_idx, ignorenulls=True).over(w_ctx))
        .withColumn(
            "prompt_text", F.last(user_text, ignorenulls=True).over(w_ctx)
        )
        .filter((F.col("role") == "assistant") & F.col("prompt_idx").isNotNull())
        .withColumn("reward", reward)
    )
    w_c = Window.partitionBy("conv_id", "prompt_idx").orderBy(
        F.col("reward").desc(), F.col("turn_idx").asc()
    )
    w_r = Window.partitionBy("conv_id", "prompt_idx").orderBy(
        F.col("reward").asc(), F.col("turn_idx").desc()
    )
    ranked = resp.withColumn("rn_c", F.row_number().over(w_c)).withColumn(
        "rn_r", F.row_number().over(w_r)
    )

    def pick(rn, col):
        return F.max(F.when(F.col(rn) == 1, F.col(col)))

    def digest56(col):
        return F.conv(
            F.substring(F.md5(col.cast("binary")), 1, 14), 16, 10
        ).cast("bigint")

    g = (
        ranked.groupBy("conv_id", F.col("prompt_idx").cast("int").alias("prompt_idx"))
        .agg(
            F.max("prompt_text").alias("p_text"),
            F.count(F.lit(1)).cast("int").alias("n_responses"),
            pick("rn_c", "turn_idx").cast("int").alias("chosen_idx"),
            pick("rn_r", "turn_idx").cast("int").alias("rejected_idx"),
            pick("rn_c", "reward").alias("chosen_reward"),
            pick("rn_r", "reward").alias("rejected_reward"),
            pick("rn_c", "text").alias("c_text"),
            pick("rn_r", "text").alias("r_text"),
        )
        .filter(
            (F.col("n_responses") >= 2)
            & (F.col("chosen_reward") > F.col("rejected_reward"))
        )
    )
    return g.select(
        "conv_id",
        "prompt_idx",
        digest56(F.col("p_text")).alias("prompt_digest"),
        "n_responses",
        "chosen_idx",
        "rejected_idx",
        "chosen_reward",
        "rejected_reward",
        (F.col("chosen_reward") - F.col("rejected_reward")).alias("margin"),
        digest56(F.col("c_text")).alias("chosen_digest"),
        digest56(F.col("r_text")).alias("rejected_digest"),
    ).orderBy("conv_id", "prompt_idx")


SQL_PREFERENCE_PAIRS = f"""
WITH idx AS (
  SELECT source AS conv_id,
         CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) - 1 AS INT) AS turn_idx,
         text
  FROM documents
), t AS (
  SELECT conv_id, turn_idx,
         CASE WHEN turn_idx % 3 = 0 THEN 'user'
              WHEN turn_idx % 10 = 7 THEN 'tool'
              ELSE 'assistant' END AS role,
         text
  FROM idx
), ctx AS (
  SELECT *,
         last_value(CASE WHEN role = 'user' THEN turn_idx END IGNORE NULLS)
           OVER (PARTITION BY conv_id ORDER BY turn_idx
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prompt_idx,
         last_value(CASE WHEN role = 'user' THEN text END IGNORE NULLS)
           OVER (PARTITION BY conv_id ORDER BY turn_idx
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prompt_text
  FROM t
), resp AS (
  SELECT conv_id, prompt_idx, prompt_text, turn_idx, text,
         CAST(1000 * CAST({_sql_java_word_count('text')} AS BIGINT)
              + length(text) AS BIGINT) AS reward
  FROM ctx WHERE role = 'assistant' AND prompt_idx IS NOT NULL
), ranked AS (
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY conv_id, prompt_idx
                            ORDER BY reward DESC, turn_idx ASC) AS rn_c,
         ROW_NUMBER() OVER (PARTITION BY conv_id, prompt_idx
                            ORDER BY reward ASC, turn_idx DESC) AS rn_r
  FROM resp
), g AS (
  SELECT conv_id, CAST(prompt_idx AS INT) AS prompt_idx,
         MAX(prompt_text) AS p_text,
         CAST(COUNT(*) AS INT) AS n_responses,
         CAST(MAX(CASE WHEN rn_c = 1 THEN turn_idx END) AS INT) AS chosen_idx,
         CAST(MAX(CASE WHEN rn_r = 1 THEN turn_idx END) AS INT) AS rejected_idx,
         MAX(CASE WHEN rn_c = 1 THEN reward END) AS chosen_reward,
         MAX(CASE WHEN rn_r = 1 THEN reward END) AS rejected_reward,
         MAX(CASE WHEN rn_c = 1 THEN text END) AS c_text,
         MAX(CASE WHEN rn_r = 1 THEN text END) AS r_text
  FROM ranked GROUP BY conv_id, prompt_idx
)
SELECT conv_id, prompt_idx,
       ('0x' || substr(md5(p_text), 1, 14))::BIGINT AS prompt_digest,
       n_responses, chosen_idx, rejected_idx, chosen_reward, rejected_reward,
       chosen_reward - rejected_reward AS margin,
       ('0x' || substr(md5(c_text), 1, 14))::BIGINT AS chosen_digest,
       ('0x' || substr(md5(r_text), 1, 14))::BIGINT AS rejected_digest
FROM g
WHERE n_responses >= 2 AND chosen_reward > rejected_reward
ORDER BY conv_id, prompt_idx
"""


ENTRY_REGISTRY["preference_pairs"] = {
    "builder": q_preference_pairs,
    "sql": SQL_PREFERENCE_PAIRS,
}


_BON_MIN_REWARD = 2000  # accept gate: >= 2 words (reward = 1000*wc + chars)


def q_best_of_n(spark, sf_dir):
    """Best-of-n rejection sampling (ReST / RAFT-style distillation) —
    the SFT-side companion of ``preference_pairs``: per prompt, keep
    the argmax-reward response among its n candidates and gate it on
    an absolute reward threshold.  Shares the positional role
    derivation and prompt-attribution window with preference_pairs
    (same deterministic reward proxy 1000*word_count + n_chars
    standing in for a reward-model column), but keeps single-response
    prompts (n >= 1) and emits per-prompt reward statistics instead of
    a chosen/rejected pair.

    Scale shape: identical to preference_pairs — one conv_id
    attribution window, then one (conv_id, prompt_idx) rank sharing
    its Exchange with the groupBy; two hash Exchanges total, no
    self-join, no explode."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    w0 = Window.partitionBy("source").orderBy("doc_id")
    turn_idx = (F.row_number().over(w0) - 1).cast("int")
    t = d.select(
        F.col("source").alias("conv_id"),
        turn_idx.alias("turn_idx"),
        F.col("text"),
    ).withColumn(
        "role",
        F.when(F.col("turn_idx") % 3 == 0, F.lit("user"))
        .when(F.col("turn_idx") % 10 == 7, F.lit("tool"))
        .otherwise(F.lit("assistant")),
    )
    w_ctx = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    user_idx = F.when(F.col("role") == "user", F.col("turn_idx"))
    user_text = F.when(F.col("role") == "user", F.col("text"))
    reward = (
        F.lit(1000).cast("bigint") * _spark_java_word_count(F.col("text"))
        + F.length("text")
    ).cast("bigint")
    resp = (
        t.select("conv_id", "turn_idx", "role", "text")
        .withColumn("prompt_idx", F.last(user_idx, ignorenulls=True).over(w_ctx))
        .withColumn(
            "prompt_text", F.last(user_text, ignorenulls=True).over(w_ctx)
        )
        .filter((F.col("role") == "assistant") & F.col("prompt_idx").isNotNull())
        .withColumn("reward", reward)
    )
    w_b = Window.partitionBy("conv_id", "prompt_idx").orderBy(
        F.col("reward").desc(), F.col("turn_idx").asc()
    )
    ranked = resp.withColumn("rn", F.row_number().over(w_b))

    def digest56(col):
        return F.conv(
            F.substring(F.md5(col.cast("binary")), 1, 14), 16, 10
        ).cast("bigint")

    g = ranked.groupBy(
        "conv_id", F.col("prompt_idx").cast("int").alias("prompt_idx")
    ).agg(
        F.max("prompt_text").alias("p_text"),
        F.count(F.lit(1)).cast("int").alias("n_candidates"),
        F.max(F.when(F.col("rn") == 1, F.col("turn_idx")))
        .cast("int")
        .alias("best_idx"),
        F.max(F.when(F.col("rn") == 1, F.col("reward"))).alias("best_reward"),
        F.max(F.when(F.col("rn") == 1, F.col("text"))).alias("b_text"),
        F.sum("reward").cast("bigint").alias("sum_reward"),
    )
    return g.select(
        "conv_id",
        "prompt_idx",
        digest56(F.col("p_text")).alias("prompt_digest"),
        "n_candidates",
        "best_idx",
        "best_reward",
        F.expr("CAST(sum_reward DIV n_candidates AS BIGINT)").alias(
            "mean_reward"
        ),
        (F.col("best_reward") >= _BON_MIN_REWARD)
        .cast("int")
        .alias("accepted"),
        digest56(F.col("b_text")).alias("best_digest"),
    ).orderBy("conv_id", "prompt_idx")


SQL_BEST_OF_N = f"""
WITH idx AS (
  SELECT source AS conv_id,
         CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) - 1 AS INT) AS turn_idx,
         text
  FROM documents
), t AS (
  SELECT conv_id, turn_idx,
         CASE WHEN turn_idx % 3 = 0 THEN 'user'
              WHEN turn_idx % 10 = 7 THEN 'tool'
              ELSE 'assistant' END AS role,
         text
  FROM idx
), ctx AS (
  SELECT *,
         last_value(CASE WHEN role = 'user' THEN turn_idx END IGNORE NULLS)
           OVER (PARTITION BY conv_id ORDER BY turn_idx
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prompt_idx,
         last_value(CASE WHEN role = 'user' THEN text END IGNORE NULLS)
           OVER (PARTITION BY conv_id ORDER BY turn_idx
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prompt_text
  FROM t
), resp AS (
  SELECT conv_id, prompt_idx, prompt_text, turn_idx, text,
         CAST(1000 * CAST({{wc}} AS BIGINT) + length(text) AS BIGINT) AS reward
  FROM ctx WHERE role = 'assistant' AND prompt_idx IS NOT NULL
), ranked AS (
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY conv_id, prompt_idx
                            ORDER BY reward DESC, turn_idx ASC) AS rn
  FROM resp
), g AS (
  SELECT conv_id, CAST(prompt_idx AS INT) AS prompt_idx,
         MAX(prompt_text) AS p_text,
         CAST(COUNT(*) AS INT) AS n_candidates,
         CAST(MAX(CASE WHEN rn = 1 THEN turn_idx END) AS INT) AS best_idx,
         MAX(CASE WHEN rn = 1 THEN reward END) AS best_reward,
         MAX(CASE WHEN rn = 1 THEN text END) AS b_text,
         CAST(SUM(reward) AS BIGINT) AS sum_reward
  FROM ranked GROUP BY conv_id, prompt_idx
)
SELECT conv_id, prompt_idx,
       ('0x' || substr(md5(p_text), 1, 14))::BIGINT AS prompt_digest,
       n_candidates, best_idx, best_reward,
       CAST(sum_reward // n_candidates AS BIGINT) AS mean_reward,
       CAST(CASE WHEN best_reward >= {_BON_MIN_REWARD} THEN 1 ELSE 0 END AS INT)
         AS accepted,
       ('0x' || substr(md5(b_text), 1, 14))::BIGINT AS best_digest
FROM g
ORDER BY conv_id, prompt_idx
"""


ENTRY_REGISTRY["best_of_n"] = {
    "builder": q_best_of_n,
    "sql_fn": lambda: SQL_BEST_OF_N.format(wc=_sql_java_word_count("text")),
}
