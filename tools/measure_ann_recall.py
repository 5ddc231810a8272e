"""Recall of the approximate ANN variants against the exact brute-force
top-k, per query — the accuracy half of the speed/accuracy trade the
similarity stack sells.  Writes BENCH/ANN_RECALL.md.

Queries: every 40th vector plays the query role against the rest of the
corpus (deterministic, ~50 queries at sf0.1).

    python tools/measure_ann_recall.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

K = 10
QUERY_STRIDE = 40


def main():
    import numpy as np

    from unraveldocs_spark.session import build_session
    from unraveldocs_spark.similarity import (
        EMB_DIM,
        PQ_KSUB,
        PQ_M,
        _hyperplanes,
        pq_topk,
    )

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = build_session(
        "ann-recall",
        master=f"local[{os.cpu_count()}]",
        shuffle_partitions=32,
        extra_conf={"spark.local.dir": "/dev/shm/ann-recall"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    rows = e.collect()
    vecs = {r.vec_id: np.asarray(r.embedding, dtype=np.float64) for r in rows}
    ids = sorted(vecs)
    mat = np.stack([vecs[i] for i in ids])
    norms = np.linalg.norm(mat, axis=1)
    unit = mat / norms[:, None]

    query_ids = ids[::QUERY_STRIDE]

    # exact ground truth, numpy (cheap driver-side at measurement scale)
    def exact_topk(qid):
        q = unit[ids.index(qid)]
        sims = unit @ q
        order = sorted(
            (i for i in range(len(ids)) if ids[i] != qid),
            key=lambda i: (-sims[i], ids[i]),
        )
        return [ids[i] for i in order[:K]]

    # signature/codebook machinery mirrors similarity.py (measurement-only
    # driver-side re-implementations of the bucketed candidate rules)
    planes16 = _hyperplanes(EMB_DIM, 16)
    sig16 = ((mat @ planes16.T) > 0).astype(np.int64) @ (
        1 << np.arange(16, dtype=np.int64)
    )

    def lsh_candidates(qid, probe_hamming=5):
        qi = ids.index(qid)
        ham = np.array(
            [bin(int(sig16[qi] ^ sig16[j])).count("1") for j in range(len(ids))]
        )
        return {ids[j] for j in range(len(ids)) if ham[j] <= probe_hamming} - {qid}

    seeds = ids[:16]
    cents = np.stack([vecs[s] for s in seeds])
    cents_unit = cents / np.linalg.norm(cents, axis=1, keepdims=True)
    assign = (unit @ cents_unit.T).argmax(axis=1)

    def ivf_candidates(qid, nprobe=6):
        q = unit[ids.index(qid)]
        probe = np.argsort(-(cents_unit @ q))[:nprobe]
        return {
            ids[j] for j in range(len(ids)) if assign[j] in probe
        } - {qid}

    def recall_from_candidates(qid, cand):
        truth = exact_topk(qid)
        q = unit[ids.index(qid)]
        scored = sorted(
            cand, key=lambda v: (-(unit[ids.index(v)] @ q), v)
        )[:K]
        return len(set(scored) & set(truth)) / K

    lsh_r, ivf_r, pq_r, pq_rr = [], [], [], []
    for qid in query_ids:
        truth = set(exact_topk(qid))
        lsh_r.append(recall_from_candidates(qid, lsh_candidates(qid)))
        ivf_r.append(recall_from_candidates(qid, ivf_candidates(qid)))
        # PQ: run the real Spark operator for this query
        qvec = [float(x) for x in vecs[qid]]
        got = [
            r.vec_id
            for r in pq_topk(
                e.filter(f"vec_id <> {qid}"), qvec, k=K
            ).collect()
        ]
        pq_r.append(len(set(got) & truth) / K)
        got_rr = [
            r.vec_id
            for r in pq_topk(
                e.filter(f"vec_id <> {qid}"), qvec, k=K, rerank=100
            ).collect()
        ]
        pq_rr.append(len(set(got_rr) & truth) / K)

    def fmt(xs):
        return f"{100 * sum(xs) / len(xs):.1f}%"

    md = [
        "# ANN recall@10 vs exact brute force (tools/measure_ann_recall.py)",
        "",
        f"{len(query_ids)} queries (every {QUERY_STRIDE}th vector) over "
        f"{len(ids)} vectors at {os.path.basename(sf_dir)}; candidates "
        "re-ranked by exact cosine, so recall isolates CANDIDATE quality.",
        "",
        "| variant | mean recall@10 | notes |",
        "|---|---|---|",
        f"| LSH (16-bit signature, hamming<=5 probe) | {fmt(lsh_r)} | "
        "signature scan / multiprobe bucket join |",
        f"| IVF (16 lists, nprobe=6) | {fmt(ivf_r)} | seed codebook, "
        "no refinement |",
        f"| PQ ADC only (8x16 codebook, integer-e6 luts) | {fmt(pq_r)} | "
        "ranks by COMPRESSED distance — recall bounded by quantization "
        "error |",
        f"| PQ ADC + exact re-rank (shortlist 100) | {fmt(pq_rr)} | "
        "the production path: 8-byte-code scan shortlists, only 100 "
        "vectors read exactly |",
        "",
        "Brute-force `ann_topk` is the exactness baseline (recall 1.0 by "
        "definition) and the correctness oracle for all three.",
        "",
    ]
    with open(os.path.join(REPO, "BENCH", "ANN_RECALL.md"), "w") as f:
        f.write("\n".join(md))
    print("wrote BENCH/ANN_RECALL.md")
    print("\n".join(md[4:12]), file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
