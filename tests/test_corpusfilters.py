"""Crafted micro-corpus pins for the web-corpus filter battery.

DuckDB parity proves Spark and the oracle agree; these tests pin the
INTENDED semantics on hand-built corpora where the right answer is
computed by inspection — C4's >=3-docs drop rule, the Gopher word-count
boundary, contamination fractions, and the PII envelope/redaction."""

import pytest
from pyspark.sql import functions as F

from unraveldocs_spark.trainingdata import (
    _CHUNK_DROP_MIN_DOCS,
    _GOPHER_MIN_WORDS,
    _PARA_WORDS,
    _STOPWORDS,
    q_contamination_check,
    q_line_dedup,
    q_pii_redact,
    q_quality_gopher,
)


def _write_docs(spark, tmp_path, rows):
    """rows: list of (doc_id, text, lang, source).  Returns the sf_dir."""
    df = spark.createDataFrame(
        [(i, t, lang, src, len(t)) for i, t, lang, src in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf = str(tmp_path / "micro")
    df.coalesce(1).write.parquet(f"{sf}/documents.parquet")
    return sf


def _words(prefix, n):
    return " ".join(f"{prefix}{i}" for i in range(n))


class TestLineDedupRule:
    def test_chunk_in_three_docs_dropped_everywhere(self, spark, tmp_path):
        """A 16-word chunk appearing in >=3 documents is dropped from
        EVERY document; a chunk shared by only 2 survives in both."""
        assert _CHUNK_DROP_MIN_DOCS == 3
        boiler = _words("common", _PARA_WORDS)  # chunk shared by docs 0,1,2
        duo = _words("pair", _PARA_WORDS)  # chunk shared by docs 3,4 only
        rows = [
            (0, boiler + " " + _words("a", _PARA_WORDS), "en", "s"),
            (1, boiler + " " + _words("b", _PARA_WORDS), "en", "s"),
            (2, boiler + " " + _words("c", _PARA_WORDS), "en", "s"),
            (3, duo + " " + _words("d", _PARA_WORDS), "en", "s"),
            (4, duo + " " + _words("e", _PARA_WORDS), "en", "s"),
        ]
        sf = _write_docs(spark, tmp_path, rows)
        got = {r.doc_id: r for r in q_line_dedup(spark, sf).collect()}
        for i in (0, 1, 2):
            assert got[i].n_chunks == 2 and got[i].n_kept == 1, got[i]
        for i in (3, 4):
            assert got[i].n_chunks == 2 and got[i].n_kept == 2, got[i]

    def test_exact_duplicate_within_one_doc_counts_once(self, spark, tmp_path):
        """countDistinct(doc_id) — a chunk repeated INSIDE one document
        does not count as multiple documents."""
        rep = _words("rep", _PARA_WORDS)
        rows = [
            (0, rep + " " + rep, "en", "s"),  # same chunk twice, one doc
            (1, _words("x", _PARA_WORDS), "en", "s"),
        ]
        sf = _write_docs(spark, tmp_path, rows)
        got = {r.doc_id: r for r in q_line_dedup(spark, sf).collect()}
        assert got[0].n_kept == 2  # both copies survive: only 1 distinct doc


class TestGopherBoundary:
    def test_word_count_boundary_inclusive(self, spark, tmp_path):
        """Exactly MIN_WORDS passes; one fewer fails (all other gate
        terms held satisfied via stopword-rich, normal-length words)."""
        base = ("the and for with " * 40).split()  # stopword-rich material

        def text(n):
            return " ".join(base[:n])

        rows = [
            (0, text(_GOPHER_MIN_WORDS), "en", "s"),
            (1, text(_GOPHER_MIN_WORDS - 1), "en", "s"),
        ]
        sf = _write_docs(spark, tmp_path, rows)
        got = {r.doc_id: r for r in q_quality_gopher(spark, sf).collect()}
        assert got[0].n_words == _GOPHER_MIN_WORDS
        assert got[0].pass_gate == 1, got[0]
        assert got[1].pass_gate == 0, got[1]

    def test_stopword_floor_counts_distinct(self, spark, tmp_path):
        """One stopword repeated 50x is still ONE distinct stopword —
        the gate needs >= 2 distinct."""
        one_stop = ("the word " * 25).strip()  # 50 words, 1 distinct stopword
        two_stop = ("the and word " * 17).strip()  # 51 words, 2 distinct
        rows = [(0, one_stop, "en", "s"), (1, two_stop, "en", "s")]
        sf = _write_docs(spark, tmp_path, rows)
        got = {r.doc_id: r for r in q_quality_gopher(spark, sf).collect()}
        assert got[0].n_stopwords_distinct == 1 and got[0].pass_gate == 0
        assert got[1].n_stopwords_distinct == 2
        assert "the" in _STOPWORDS and "and" in _STOPWORDS


class TestContaminationFractions:
    def test_half_overlap_is_5000_e4(self, spark, tmp_path):
        """A doc sharing exactly half its distinct bigrams with the
        benchmark doc scores contam_e4 = 5000; benchmark docs themselves
        are excluded from the output."""
        # doc_id 0 is the benchmark (0 % 97 == 0)
        bench_text = "alpha beta gamma"  # bigrams: {alpha beta, beta gamma}
        # candidate: bigrams {alpha beta, zeta eta, eta theta, theta iota}
        # -> craft 4 distinct bigrams, 2 in benchmark
        cand_text = "alpha beta gamma delta"  # bigrams: ab, bg, gd -> 2/3 hit
        rows = [
            (0, bench_text, "en", "s"),
            (1, cand_text, "en", "s"),
            (2, "zeta eta theta", "en", "s"),  # 0 overlap
        ]
        sf = _write_docs(spark, tmp_path, rows)
        got = {r.doc_id: r for r in q_contamination_check(spark, sf).collect()}
        assert 0 not in got  # benchmark doc excluded
        assert got[1].n_shingles == 3 and got[1].n_contaminated == 2
        assert got[1].contam_e4 == 6667
        assert got[2].n_contaminated == 0 and got[2].contam_e4 == 0


class TestPiiRedaction:
    def test_envelope_counts_and_masking(self, spark, tmp_path):
        """doc_id-keyed envelope: emails on %3, ips on %5, phones on %4;
        counts reflect exactly which residues fire, and redaction strips
        every detected span (re-detecting on the redacted text finds 0)."""
        rows = [(i, "plain body text", "en", "s") for i in range(13)]
        sf = _write_docs(spark, tmp_path, rows)
        got = {r.doc_id: r for r in q_pii_redact(spark, sf).collect()}
        for i in range(13):
            assert got[i].n_emails == (1 if i % 3 == 0 else 0), i
            assert got[i].n_ips == (1 if i % 5 == 0 else 0), i
            assert got[i].n_phones == (1 if i % 4 == 0 else 0), i

    def test_redacted_text_has_no_residual_pii(self, spark, tmp_path):
        """Rebuild the envelope expression manually, redact with the same
        patterns, and re-run detection over the REDACTED text: zero."""
        from unraveldocs_spark.trainingdata import (
            _PII_EMAIL_RE,
            _PII_IPV4_RE,
            _PII_PHONE_RE,
        )
        import re

        for i in (0, 3, 4, 5, 12, 60):
            text = "body"
            if i % 3 == 0:
                text += f" contact user{i % 7}@example.com"
            if i % 5 == 0:
                text += f" from 10.{i % 256}.0.{i % 100}"
            if i % 4 == 0:
                text += f" call +{i % 90 + 10}-{i % 900 + 100}-{i % 9000 + 1000}"
            red = re.sub(_PII_EMAIL_RE, "[EMAIL]", text)
            red = re.sub(_PII_IPV4_RE, "[IP]", red)
            red = re.sub(_PII_PHONE_RE, "[PHONE]", red)
            assert not re.search(_PII_EMAIL_RE, red), red
            assert not re.search(_PII_IPV4_RE, red), red
            assert not re.search(_PII_PHONE_RE, red), red
