"""PDF layout parse (pdflayout.py): line/span clustering of positioned
runs — pinned rules + permutation/jitter invariance properties."""

from hypothesis import given, settings
from hypothesis import strategies as st

from unraveldocs_spark.oracle import RULE_LAYOUT, extract_turn
from unraveldocs_spark.pdflayout import (
    LINE_TOL,
    SPACE_TOL,
    extract_layout,
    layout_lines,
)


def run(x, y, s, w=None, h=10):
    return {"x": x, "y": y, "w": 6 * len(s) if w is None else w, "h": h, "s": s}


class TestLayoutRules:
    def test_single_line_with_spaces(self):
        runs = [run(10, 100, "hello"), run(50, 100, "world")]
        # gap = 50 - (10 + 30) = 10 > SPACE_TOL -> space
        assert layout_lines(runs) == ["hello world"]

    def test_touching_runs_fuse(self):
        runs = [run(10, 100, "hel"), run(29, 100, "lo")]
        # gap = 29 - (10 + 18) = 1 <= SPACE_TOL -> no space
        assert layout_lines(runs) == ["hello"]

    def test_lines_split_on_y_gap(self):
        runs = [run(10, 100, "top"), run(10, 100 + LINE_TOL + 1, "bottom")]
        assert layout_lines(runs) == ["top", "bottom"]

    def test_jitter_within_tol_same_line(self):
        runs = [run(10, 100, "a"), run(30, 100 + LINE_TOL, "b")]
        assert layout_lines(runs) == ["a b"]

    def test_reading_order_restored(self):
        runs = [
            run(50, 112, "world"),
            run(10, 112, "second"),
            run(60, 100, "line"),
            run(10, 100, "first"),
        ]
        text, spans = extract_layout(runs)
        assert text == "first line\nsecond world"
        assert [k for _, _, k in spans] == ["line", "line"]
        for s, e, _ in spans:
            assert "\n" not in text[s:e]

    def test_empty_runs(self):
        assert extract_layout([]) == ("", [])

    def test_x_tie_broken_by_input_index(self):
        runs = [run(10, 100, "b"), run(10, 100, "a")]
        # same (y, x): input order decides
        assert layout_lines(runs) == ["ba"]


class TestOracleDispatch:
    def test_layout_envelope_routed(self):
        import json

        payload = json.dumps(
            {"kind": "layout", "runs": [
                {"x": 10, "y": 100, "w": 18, "h": 10, "s": "doc"},
                {"x": 40, "y": 101, "w": 24, "h": 10, "s": "text"},
            ]},
            separators=(",", ":"),
        )
        r = extract_turn("user", None, payload)
        assert r.status == "COMPLETED"
        assert r.rule == RULE_LAYOUT
        assert r.extracted_text == "doc text"
        assert r.spans == [(0, 8, "line")]

    def test_malformed_runs_fail_row_not_job(self):
        r = extract_turn("user", None, '{"kind":"layout","runs":[{"s":"x"}]}')
        assert r.status == "FAILED"
        assert r.rule == "error_other"


coord_st = st.integers(0, 500)
word_st = st.text(alphabet="abcdefgh", min_size=1, max_size=8)


@st.composite
def runs_st(draw):
    n = draw(st.integers(1, 12))
    out = []
    for _ in range(n):
        s = draw(word_st)
        out.append(
            {
                "x": draw(coord_st),
                "y": draw(coord_st),
                "w": draw(st.integers(0, 60)),
                "h": 10,
                "s": s,
            }
        )
    return out


class TestLayoutProperties:
    @given(runs_st(), st.randoms())
    @settings(max_examples=200)
    def test_line_grouping_invariant_under_permutation(self, runs, rnd):
        """The LINE PARTITION (which runs share a line) is input-order
        independent; within-line text can differ only for exact (x, y)
        ties, which are broken by input index by design."""
        import collections

        def line_sets(rs):
            # recover the partition by tagging each run's identity
            tagged = [dict(r, s=f"{i}:{r['s']}") for i, r in enumerate(rs)]
            lines = layout_lines(tagged)
            return lines

        base = layout_lines(runs)
        shuffled = runs[:]
        rnd.shuffle(shuffled)
        # order within a line ties on x (then input index), so the output
        # is permutation-invariant exactly when all x are distinct
        xs = [r["x"] for r in runs]
        if len(set(xs)) == len(xs):
            assert collections.Counter(layout_lines(shuffled)) == collections.Counter(base)

    @given(runs_st())
    @settings(max_examples=200)
    def test_all_run_text_present(self, runs):
        text, spans = extract_layout(runs)
        for r in runs:
            assert r["s"] in text
        for s, e, k in spans:
            assert 0 <= s <= e <= len(text) and k == "line"

    @given(runs_st(), st.integers(0, LINE_TOL))
    @settings(max_examples=150)
    def test_uniform_y_shift_is_stable(self, runs, dy):
        """Shifting every run's y by the same amount never changes the
        output text."""
        shifted = [dict(r, y=r["y"] + dy) for r in runs]
        assert extract_layout(shifted)[0] == extract_layout(runs)[0]
