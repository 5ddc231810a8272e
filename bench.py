"""Benchmark harness.

Runs the headline extraction pipeline on a cached synthetic transcripts
table scaled to $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) plus the
headline operator queries, on local[$SPARK_GRAFT_CPUS].  Prints ONE JSON
line:

  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ..., "turns_per_sec": ...,
   "parallelism": N}

Scaling-efficiency evidence (north rule: >=0.8 from N to 4N executors) is
produced by tools/bench_scaling.py, which runs this harness at two
parallelism levels and writes BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
# small sf files: split scans finer so they fan out across local cores
os.environ.setdefault("SPARK_GRAFT_MAX_PARTITION_BYTES", "4m")


def _parse_cores(spec: str) -> set[int]:
    """'0-3,8' -> {0,1,2,3,8}"""
    out: set[int] = set()
    for part in spec.split(","):
        if "-" in part:
            lo, hi = part.split("-")
            out.update(range(int(lo), int(hi) + 1))
        else:
            out.add(int(part))
    return out


def _apply_core_pinning() -> None:
    """Dedicated-core-executor analog for the scaling measurement: pin the
    JVM side (scan/Arrow/shuffle threads — inherited from this process) and
    the forked Python workers (via a PYSPARK_PYTHON shim that resets its
    own affinity) to DISJOINT core sets, so a wide leg's workers never
    fight the JVM for the same cores the way an unpinned local[] does.
    Real executors get dedicated cores from the cluster manager; this
    reproduces that isolation on the shared sandbox box."""
    pin_jvm = os.environ.get("SPARK_GRAFT_PIN_JVM")
    pin_py = os.environ.get("SPARK_GRAFT_PIN_PY")
    if pin_jvm:
        os.sched_setaffinity(0, _parse_cores(pin_jvm))
    if pin_py:
        cores = sorted(_parse_cores(pin_py))
        shim = os.path.join("/tmp", f"pyspark-pin-{os.getpid()}.py")
        with open(shim, "w") as f:
            f.write(
                f"#!{sys.executable}\n"
                "import os, sys\n"
                f"os.sched_setaffinity(0, {set(cores)!r})\n"
                f"os.execv({sys.executable!r}, [{sys.executable!r}] + sys.argv[1:])\n"
            )
        os.chmod(shim, 0o755)
        os.environ["PYSPARK_PYTHON"] = shim


_apply_core_pinning()

# transcripts scale: proportional to the sf of the testdata dir
# (sf0.1 -> 5000 convs x median 100 turns ~= 500k turns + 10x-median hot conv;
#  FIXTURES.md §5 sf-bench)
def _sf_of(path: str) -> float:
    base = os.path.basename(path.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


SF = _sf_of(SF_DIR)
# SPARK_GRAFT_TURNS_MULT scales the transcripts volume (the scaling-
# efficiency run uses a larger input so fixed stage overheads don't
# masquerade as poor scaling at high parallelism)
TURNS_MULT = int(os.environ.get("SPARK_GRAFT_TURNS_MULT", "1"))
N_CONVS = max(50, int(5000 * SF / 0.1)) * TURNS_MULT
MEDIAN_TURNS = 100
HOT_FACTOR = 10

HEADLINE_QUERIES = (
    "pricing_summary",
    "broadcast_star_join",
    "left_join_pending_default",
    "search_filter",
    "search_ranked",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_embedding_cosine",
    "ann_topk",
    "quality_score",
    "token_count",
    "corpus_prep",
    "provider_resolution",
    "pdf_layout",
    "extract_turns",
    "dedup_paragraph",
    "quality_perplexity",
    "dedup_cluster",
    "knn_join",
    "corpus_sample",
    "sessionize",
    "props_extract",
    "corpus_build_full",
    "quality_gopher",
    "quality_repetition",
    "line_dedup",
    "contamination_check",
    "ann_pq_topk",
    "regional_revenue",
    "moving_window_stats",
    "corpus_export_shards",
    "event_type_pivot",
    "fuzzy_search",
    "ai_enrich",
    "delete_reclaim",
    "exact_substring_dedup",
    "search_bm25",
    "encrypted_roundtrip",
    "docx_export",
    "storage_admission",
    "dashboard_kpi",
    "search_phrase",
    "preference_pairs",
    "dsir_importance",
    "ngram_lm_score",
    "bpe_encode",
    "best_of_n",
    "domain_mix",
    "curriculum_order",
    "classifier_trainset",
    "dedup_increment",
)


def _transcripts_cache(spark):
    cache = os.path.join(REPO, ".bench_cache", f"transcripts-sf{SF}-x{TURNS_MULT}")
    marker = os.path.join(cache, "_SUCCESS")
    if not os.path.exists(marker):
        from unraveldocs_spark.generator import transcripts_spark

        df = transcripts_spark(
            spark,
            N_CONVS,
            median_turns=MEDIAN_TURNS,
            hot_factor=HOT_FACTOR,
            include_oversize=False,
            parallelism=CPUS * 2,
        )
        df.write.mode("overwrite").parquet(cache)
    return cache


def main():
    from unraveldocs_spark.extract import extract_stage
    from unraveldocs_spark.pipeline import salted_repartition
    from unraveldocs_spark.session import build_session

    import __spark_entry__ as entry_mod

    spark = build_session(
        "unraveldocs-bench",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(CPUS, 16),
        # tmpfs shuffle dirs: the sandbox's disk serializes concurrent
        # shuffle writers and masks CPU scaling; a real cluster shuffles
        # to per-executor NVMe (this stands in for that)
        extra_conf={"spark.local.dir": "/dev/shm/unraveldocs-bench"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    cache = _transcripts_cache(spark)
    transcripts = spark.read.parquet(cache)
    n_turns = transcripts.count()

    # deep warmup: spin every python worker + compile codegen (untimed)
    extract_stage(transcripts.limit(CPUS * 64).repartition(CPUS * 2)).count()

    # best-of-2: local microbenches are noisy (GC, page cache, turbo)
    extract_sec = float("inf")
    for _ in range(2):
        t0 = time.monotonic()
        extracted = extract_stage(salted_repartition(transcripts, CPUS * 2))
        n_out = extracted.count()
        extract_sec = min(extract_sec, time.monotonic() - t0)
        assert n_out == n_turns, (n_out, n_turns)

    print(f"[bench] extract {n_turns} turns: {extract_sec:.1f}s", file=sys.stderr)

    qfns = entry_mod.queries()
    per_query: dict[str, float] = {"extract_transcripts": round(extract_sec, 3)}
    total = extract_sec
    headline = (
        () if os.environ.get("SPARK_GRAFT_SKIP_QUERIES") else HEADLINE_QUERIES
    )
    for name in headline:
        # best-of-2 per query, matching the extraction protocol: the first
        # run pays whole-stage-codegen compilation (measured ~3-5s of pure
        # JIT on cold plans), which a long-running production session pays
        # once, not per query
        sec = float("inf")
        for _ in range(2):
            t0 = time.monotonic()
            qfns[name](spark, SF_DIR).collect()
            sec = min(sec, time.monotonic() - t0)
        per_query[name] = round(sec, 3)
        total += sec
        print(f"[bench] {name}: {sec:.1f}s", file=sys.stderr)

    # positional-noise guard (VERDICT r5 #7): any query regressed >1.5x vs
    # the previous round's artifact gets re-timed isolated best-of-3 in
    # this same session, and the verdict ships inline in the artifact
    from tools.bench_recheck import previous_bench, recheck_regressions

    prev_name, prev = previous_bench(REPO)
    recheck = recheck_regressions(spark, SF_DIR, qfns, per_query, prev)
    for name, r in recheck.items():
        print(f"[bench] recheck {name}: {r}", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "extraction+operator suite wall time",
                "value": round(total, 3),
                "unit": "sec",
                "queries": per_query,
                "sf": SF,
                "n_turns": n_turns,
                "turns_per_sec": round(n_turns / extract_sec, 1),
                "parallelism": CPUS,
                "recheck_vs": prev_name,
                "recheck": recheck,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
