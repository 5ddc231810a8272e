"""Pins for the bench positional-noise guard (tools/bench_recheck.py):
ratio + absolute floor verdicts, and the window-inflation control that
separates a loud box from a real code regression."""

import sys


sys.path.insert(0, "/root/repo")

from tools import bench_recheck as br


class _FakeDF:
    def collect(self):
        return []


def _qfns(names):
    return {n: (lambda spark, sf: _FakeDF()) for n in names}


def _run(monkeypatch, per_query, prev, isolated):
    """Drive recheck_regressions with fake isolated timings: the Nth
    _best_of call returns isolated[N] (flagged queries first, then
    controls in selection order)."""
    seq = iter(isolated)
    monkeypatch.setattr(br, "_best_of", lambda fn, reps: next(seq))
    return br.recheck_regressions(
        spark=None,
        sf_dir="",
        qfns=_qfns(set(per_query) | set(prev)),
        per_query=per_query,
        prev=prev,
    )


class TestVerdicts:
    def test_noise_when_isolated_recovers(self, monkeypatch):
        out = _run(monkeypatch, {"q": 3.0}, {"q": 1.0}, [1.2])
        assert out["q"]["verdict"] == "noise"

    def test_noise_floor_below_absolute_delta(self, monkeypatch):
        out = _run(monkeypatch, {"q": 0.9}, {"q": 0.3}, [0.8])
        assert out["q"]["verdict"] == "noise-floor"

    def test_unflagged_queries_not_retimed(self, monkeypatch):
        out = _run(monkeypatch, {"q": 1.1}, {"q": 1.0}, [])
        assert out == {}


class TestWindowInflation:
    def test_loud_window_downgrades_regressed(self, monkeypatch):
        """Flagged 1.6x with controls also running ~1.5x -> the verdict
        becomes window-inflation, not regressed."""
        per_query = {"flagged": 4.8}
        prev = {"flagged": 3.0, "c1": 3.5, "c2": 2.0, "c3": 1.0}
        # flagged isolated 4.9 (1.63x), controls at 1.5x each
        out = _run(
            monkeypatch, per_query, prev, [4.9, 3.5 * 1.5, 2.0 * 1.5, 1.0 * 1.5]
        )
        assert out["flagged"]["verdict"].startswith("window-inflation")
        wi = out["_window_inflation"]
        assert wi["controls"] == ["c1", "c2", "c3"]
        assert wi["median"] == 1.5

    def test_quiet_window_keeps_regressed(self, monkeypatch):
        """Controls at ~1.0x leave a 2x flagged query 'regressed'."""
        per_query = {"flagged": 6.0}
        prev = {"flagged": 3.0, "c1": 3.5, "c2": 2.0, "c3": 1.0}
        out = _run(monkeypatch, per_query, prev, [6.1, 3.6, 2.0, 1.0])
        assert out["flagged"]["verdict"] == "regressed"
        assert out["_window_inflation"]["median"] < 1.1

    def test_controls_exclude_flagged_and_out_of_range(self, monkeypatch):
        per_query = {"flagged": 6.0}
        prev = {"flagged": 3.0, "tiny": 0.2, "huge": 9.0, "c1": 2.5}
        out = _run(monkeypatch, per_query, prev, [6.1, 2.5])
        assert out["_window_inflation"]["controls"] == ["c1"]

    def test_no_controls_leaves_verdicts_alone(self, monkeypatch):
        per_query = {"flagged": 6.0}
        prev = {"flagged": 3.0}
        out = _run(monkeypatch, per_query, prev, [6.1])
        assert out["flagged"]["verdict"] == "regressed"
        assert "_window_inflation" not in out


class TestEdges:
    def test_missing_retimer_is_labeled(self):
        out = br.recheck_regressions(
            spark=None,
            sf_dir="",
            qfns={},
            per_query={"extract_transcripts": 9.0},
            prev={"extract_transcripts": 3.0},
        )
        assert out["extract_transcripts"]["verdict"] == "no-isolated-retimer"

    def test_no_baseline_is_skipped(self, monkeypatch):
        out = _run(monkeypatch, {"new_q": 9.0}, {"new_q": None}, [])
        assert out == {}
