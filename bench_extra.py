"""Isolated per-query benchmarking + plan capture (guide §1).

Separate from the FROZEN bench.py: this file times individual declared
queries in isolation (best-of-N .collect(), matching the driver protocol,
plus optional noop-sink runs per guide §1.4) and dumps
``.explain("formatted")`` plans to plans/r07/.

Usage:
  python bench_extra.py time  [-n 3] [--sf DIR] name [name ...]
  python bench_extra.py plans [--sf DIR] [--suffix _before] [name ...]
  python bench_extra.py noop  [-n 3] [--sf DIR] name [name ...]

Prints one JSON line: {"mode": ..., "sf": ..., "queries": {name: best_sec}}.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
os.environ.setdefault("SPARK_GRAFT_MAX_PARTITION_BYTES", "4m")


def _session():
    from unraveldocs_spark.session import build_session

    spark = build_session(
        "unraveldocs-bench-extra",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(CPUS, 16),
        extra_conf={"spark.local.dir": "/dev/shm/unraveldocs-bench"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["time", "plans", "noop"])
    ap.add_argument("names", nargs="*")
    ap.add_argument("-n", type=int, default=3)
    ap.add_argument("--sf", default=SF_DIR)
    ap.add_argument("--suffix", default="_before")
    args = ap.parse_args()

    import __spark_entry__ as entry_mod

    qfns = entry_mod.queries()
    names = args.names or list(qfns)
    spark = _session()
    sf_dir = args.sf

    if args.mode == "plans":
        out_dir = os.path.join(REPO, "plans", "r07")
        os.makedirs(out_dir, exist_ok=True)
        for name in names:
            df = qfns[name](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            path = os.path.join(out_dir, f"{name}{args.suffix}.txt")
            with open(path, "w") as fh:
                fh.write(buf.getvalue())
            print(f"[plans] wrote {path}", file=sys.stderr)
        print(json.dumps({"mode": "plans", "n": len(names)}))
        spark.stop()
        return

    per: dict[str, float] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        best = float("inf")
        for _ in range(args.n):
            t0 = time.monotonic()
            df = qfns[name](spark, sf_dir)
            if args.mode == "noop":
                df.write.format("noop").mode("overwrite").save()
            else:
                df.collect()
            best = min(best, time.monotonic() - t0)
        per[name] = round(best, 3)
        print(f"[bench_extra] {name}: {best:.2f}s", file=sys.stderr)
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({"mode": args.mode, "sf": sf_dir, "n": args.n, "queries": per}))
    spark.stop()


if __name__ == "__main__":
    main()
