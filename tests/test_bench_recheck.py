"""Verdict ladder of the suite-bench positional-noise guard
(tools/bench_recheck.py): ratio trigger, isolated re-time, and the
absolute materiality floor that keeps sub-second scheduler jitter from
reading as a regression."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.bench_recheck import recheck_regressions  # noqa: E402


class _FakeDF:
    def collect(self):
        return []


def _qfns(names):
    return {n: (lambda spark, sf: _FakeDF()) for n in names}


def test_verdict_ladder(monkeypatch):
    prev = {"fast": 0.3, "mid": 0.5, "slow": 3.0, "fine": 2.0, "new": None}
    suite = {"fast": 0.5, "mid": 1.2, "slow": 8.0, "fine": 2.1}
    isolated = {"fast": 0.5, "mid": 1.2, "slow": 7.5}

    import tools.bench_recheck as br

    def fake_best_of(fn, reps):
        # fn closes over qfns[name]; recover the name via the order of
        # calls — simpler: pop from a queue in insertion order of the
        # regressed set (dict order of suite is deterministic).
        return isolated[fake_best_of.queue.pop(0)]

    fake_best_of.queue = [
        n
        for n, s in suite.items()
        if prev.get(n) and s > 1.5 * prev[n]
    ]
    monkeypatch.setattr(br, "_best_of", fake_best_of)

    out = recheck_regressions(
        spark=None, sf_dir="", qfns=_qfns(suite), per_query=suite, prev=prev
    )
    # 'fine' never trips the ratio; 'new' has no baseline
    assert set(out) == {"fast", "mid", "slow"}
    # 0.3 -> 0.5 isolated: 1.67x but only +0.2s -> jitter, not signal
    assert out["fast"]["verdict"] == "noise-floor"
    # 0.5 -> 1.2 isolated: 2.4x but +0.7s, still under the 1s floor
    assert out["mid"]["verdict"] == "noise-floor"
    # 3.0 -> 7.5 isolated: 2.5x AND +4.5s -> real
    assert out["slow"]["verdict"] == "regressed"


def test_isolated_retime_under_ratio_is_noise(monkeypatch):
    import tools.bench_recheck as br

    monkeypatch.setattr(br, "_best_of", lambda fn, reps: 3.2)
    out = recheck_regressions(
        spark=None,
        sf_dir="",
        qfns=_qfns(["q"]),
        per_query={"q": 9.0},
        prev={"q": 3.0},
    )
    assert out["q"]["verdict"] == "noise"
    assert out["q"]["best_isolated"] == 3.2


def test_missing_retimer_is_labeled():
    out = recheck_regressions(
        spark=None,
        sf_dir="",
        qfns={},
        per_query={"extract_transcripts": 9.0},
        prev={"extract_transcripts": 3.0},
    )
    assert out["extract_transcripts"]["verdict"] == "no-isolated-retimer"
