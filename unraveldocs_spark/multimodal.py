"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata, processed via Arrow-batched ``mapInPandas``.

The decode step is STUBBED: the real codec libraries (Pillow, ffmpeg,
torchaudio, ...) are not in this container.  The Spark-side plumbing —
schema, dispatch, batch shape, partitioning — is real and tested; the stub
produces a deterministic fake decode so the pipeline is end-to-end
exercisable.  Set ``require_real_decode=True`` to get the
NotImplementedError a production deployment would replace.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F

try:  # real decoders, if ever present
    from PIL import Image  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False

DECODED_SCHEMA = (
    "doc_id long, media_type string, payload_bytes int, "
    "width int, height int, n_frames int, decode_status string"
)


def attach_binary_payload(docs: DataFrame) -> DataFrame:
    """Derive an opaque binary payload + media_type from the documents
    table (stand-in for a real multimodal ingest; at scale the payload
    column comes from the lake as BinaryType with typed metadata)."""
    kind = (
        F.when(F.col("doc_id") % 4 == 0, F.lit("image/png"))
        .when(F.col("doc_id") % 4 == 1, F.lit("image/jpeg"))
        .when(F.col("doc_id") % 4 == 2, F.lit("audio/wav"))
        .otherwise(F.lit("video/mp4"))
    )
    return docs.select(
        "doc_id",
        kind.alias("media_type"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
    )


def _fake_decode(payload: bytes, media_type: str) -> tuple[int, int, int]:
    """Deterministic stand-in for a codec: dimensions derive from payload
    length and a byte checksum, so results are stable across runs."""
    n = len(payload)
    checksum = sum(payload[:64]) if n else 0
    width = 64 + (checksum % 16) * 32
    height = 64 + (n % 12) * 32
    n_frames = 1 if media_type.startswith("image/") else 1 + (n % 240)
    return width, height, n_frames


def decode_stage(
    payloads: DataFrame, require_real_decode: bool = False
) -> DataFrame:
    """Vectorized decode / feature-extract over binary payloads.

    Per-row failures become decode_status='FAILED' rows, mirroring the
    pipeline-wide row-level error policy (ProcessOcr.java:129-139)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "doc_id": [],
                "media_type": [],
                "payload_bytes": [],
                "width": [],
                "height": [],
                "n_frames": [],
                "decode_status": [],
            }
            for doc_id, mt, payload in zip(
                pdf["doc_id"], pdf["media_type"], pdf["payload"]
            ):
                out["doc_id"].append(doc_id)
                out["media_type"].append(mt)
                data = bytes(payload) if payload is not None else b""
                out["payload_bytes"].append(len(data))
                try:
                    if require_real_decode:
                        if mt.startswith("image/") and _HAS_PIL:
                            raise RuntimeError("real decode path not wired")
                        raise NotImplementedError(
                            f"no codec for {mt} in this environment"
                        )
                    w, h, nf = _fake_decode(data, mt)
                    out["width"].append(w)
                    out["height"].append(h)
                    out["n_frames"].append(nf)
                    out["decode_status"].append("COMPLETED")
                except Exception:
                    out["width"].append(0)
                    out["height"].append(0)
                    out["n_frames"].append(0)
                    out["decode_status"].append("FAILED")
            yield pd.DataFrame(out)

    return payloads.mapInPandas(run, schema=DECODED_SCHEMA)


RESIZE_TARGET = 224


def resize_plan_stage(decoded: DataFrame, target: int = RESIZE_TARGET) -> DataFrame:
    """Aspect-preserving resize plan: fit (width, height) into a
    target x target box with integer arithmetic (exact on any engine).
    The pixel resample itself is the stubbed codec step; the scale
    arithmetic, schema and dispatch are the real Spark-side plumbing —
    all JVM built-ins, no Python."""
    long_side = F.greatest(F.col("width"), F.col("height"))
    out_w = F.greatest(F.lit(1), (F.col("width") * target) / long_side).cast("int")
    out_h = F.greatest(F.lit(1), (F.col("height") * target) / long_side).cast("int")
    return (
        decoded.filter(F.col("decode_status") == "COMPLETED")
        .filter(F.col("media_type").startswith("image/"))
        .select(
            "doc_id",
            "media_type",
            "width",
            "height",
            F.floor(out_w).cast("int").alias("out_width"),
            F.floor(out_h).cast("int").alias("out_height"),
        )
    )


FEATURE_BINS = 8


def feature_stage(payloads: DataFrame, prefix: int = 64) -> DataFrame:
    """Deterministic fake feature extraction over binary payloads: an
    ``FEATURE_BINS``-bin byte-class histogram of the payload prefix
    (byte % bins), Arrow-batched.  Stands in for a real encoder the same
    way _fake_decode stands in for a codec: batch shape, schema and
    partitioning are real; the features are reproducible arithmetic.
    Emitted as a joined string so the oracle hash never depends on list
    canonicalization."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "features": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload) if payload is not None else b""
                bins = [0] * FEATURE_BINS
                for b in data[:prefix]:
                    bins[b % FEATURE_BINS] += 1
                out["doc_id"].append(doc_id)
                out["features"].append("|".join(str(v) for v in bins))
            yield pd.DataFrame(out)

    return payloads.select("doc_id", "payload").mapInPandas(
        run, schema="doc_id long, features string"
    )


def frame_sample_stage(decoded: DataFrame, every_n: int = 30) -> DataFrame:
    """Frame sampling plan for video payloads: emits (doc_id, frame_no)
    rows via sequence+explode — pure JVM, no Python."""
    return (
        decoded.filter(F.col("media_type") == "video/mp4")
        .filter(F.col("n_frames") > 0)
        .select(
            "doc_id",
            F.explode(
                F.sequence(
                    F.lit(0), F.col("n_frames") - 1, F.lit(every_n)
                )
            ).alias("frame_no"),
        )
    )
