"""Structured Streaming path: same extraction semantics, incremental
micro-batches, snapshot-store commits (availableNow trigger)."""

from unraveldocs_spark import generator as G
from unraveldocs_spark.checkpoint import DirCheckpointStore
from unraveldocs_spark.schemas import TRANSCRIPTS_SCHEMA
from unraveldocs_spark.streaming import stream_extract


def test_stream_matches_batch_oracle(spark, tmp_path):
    from unraveldocs_spark import oracle as O

    pdf = G.transcripts_pandas(6, hot_factor=2, include_oversize=False)
    sdf = spark.createDataFrame(pdf, schema=TRANSCRIPTS_SCHEMA)
    input_dir = str(tmp_path / "in")
    sdf.repartition(4).write.parquet(input_dir)

    store = DirCheckpointStore(str(tmp_path / "store"))
    q = stream_extract(
        spark, input_dir, store, str(tmp_path / "ckpt"), trigger_available_now=True
    )
    q.awaitTermination(120)

    got = {(r.conv_id, r.turn_idx): r for r in store.results(spark).collect()}
    rows = list(zip(pdf.conv_id, pdf.turn_idx, pdf.role, pdf.text, pdf.tool))
    expected = O.oracle_rows(rows)
    assert len(got) == len(expected)
    for e in expected:
        r = got[(e["conv_id"], e["turn_idx"])]
        assert r.extracted_text == e["extracted_text"]
        assert r.status == e["status"]

    # multiple snapshots committed (one per micro-batch), all manifest-published
    assert len(store.snapshots()) >= 1
