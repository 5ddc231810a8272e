"""Pins for the scaling-evidence pooling protocol (tools/bench_scaling.py):
every invocation's raw legs append to BENCH/scaling_runs.jsonl and
BASELINE.md reports the pooled best per pair, so a loud-window invocation
cannot displace a quiet window's evidence."""

import json
import os
import sys


sys.path.insert(0, "/root/repo")

from tools import bench_scaling as bs


def _fake_bench(tps):
    return {
        "turns_per_sec": tps,
        "n_turns": 1000,
        "sf": 0.1,
        "queries": {"extract_transcripts": 1.0},
        "value": 1.0,
    }


def _setup(monkeypatch, tmp_path, seed_recs, leg_sequence):
    repo = tmp_path / "repo"
    (repo / "BENCH").mkdir(parents=True)
    log = repo / "BENCH" / "scaling_runs.jsonl"
    with open(log, "w") as fh:
        for r in seed_recs:
            fh.write(json.dumps(r) + "\n")
    monkeypatch.setattr(bs, "REPO", str(repo))
    monkeypatch.setattr(bs, "RUNS_LOG", str(log))
    seq = iter(leg_sequence)
    monkeypatch.setattr(
        bs, "run_bench", lambda cpus, sf, pin=False: _fake_bench(next(seq))
    )
    monkeypatch.setenv("SPARK_GRAFT_SCALING_ROUNDS", "2")
    return repo


SEED = {
    "n": 2,
    "n4": 8,
    "pinned": False,
    "t_n": [25000.0, 24000.0],
    "t_4n": [72000.0, 80000.0],
    "note": "quiet window",
}  # same-window effs 0.72 and 0.833


class TestPooling:
    def test_loud_invocation_cannot_displace_quiet_evidence(
        self, monkeypatch, tmp_path
    ):
        """New run at ~half speed (loud box): pooled best same-window
        stays the seeded 0.833, not the new 0.60."""
        repo = _setup(
            monkeypatch,
            tmp_path,
            [SEED],
            # rounds=2, pair (2,8): n, 4n, n, 4n — loud legs, eff 0.6
            [12000.0, 28800.0, 12500.0, 30000.0],
        )
        monkeypatch.setattr(sys, "argv", ["bench_scaling.py", "2"])
        bs.main()
        md = open(repo / "BENCH" / "BASELINE.md").read()
        assert "**0.833**" in md          # pooled same-window best survives
        assert "| 2 |" in md              # 2 invocations pooled
        assert "quiet window" in md       # seed note listed verbatim
        assert "`[12000.0, 12500.0]`" in md  # loud legs still on record
        # the log now carries both invocations
        recs = bs.load_runs()
        assert len(recs) == 2

    def test_quieter_invocation_raises_the_pool(self, monkeypatch, tmp_path):
        repo = _setup(
            monkeypatch,
            tmp_path,
            [SEED],
            [26000.0, 93600.0, 25000.0, 88000.0],  # effs 0.9, 0.88
        )
        monkeypatch.setattr(sys, "argv", ["bench_scaling.py", "2"])
        bs.main()
        md = open(repo / "BENCH" / "BASELINE.md").read()
        assert "**0.900**" in md
        assert "93,600.0" in md  # pooled wide-leg best

    def test_single_pair_invocation_keeps_other_rows(
        self, monkeypatch, tmp_path
    ):
        other = {
            "n": 4,
            "n4": 16,
            "pinned": True,
            "t_n": [50000.0],
            "t_4n": [170000.0],
        }
        repo = _setup(
            monkeypatch,
            tmp_path,
            [SEED, other],
            [25000.0, 75000.0, 25000.0, 75000.0],
        )
        monkeypatch.setattr(sys, "argv", ["bench_scaling.py", "2"])
        bs.main()
        md = open(repo / "BENCH" / "BASELINE.md").read()
        assert "local[4] -> local[16] (core-pinned)" in md
        assert "**0.850**" in md  # 170000/(4*50000) survives untouched

    def test_superunity_windows_excluded_from_criterion(
        self, monkeypatch, tmp_path
    ):
        """A same-window ratio >1.0 (narrow leg contended) is excluded:
        the criterion is the best PHYSICAL ratio; raw legs stay listed."""
        repo = _setup(
            monkeypatch,
            tmp_path,
            [],
            [20000.0, 88000.0, 25000.0, 80000.0],  # effs 1.1, 0.8
        )
        monkeypatch.setattr(sys, "argv", ["bench_scaling.py", "2"])
        bs.main()
        md = open(repo / "BENCH" / "BASELINE.md").read()
        assert "**0.800**" in md          # best physical window
        assert "1.100" not in md.split("Raw per-leg")[0]
        assert "`[1.1, 0.8]`" in md       # raw section keeps real values
