"""Unit tests pinning the pure-Python semantics to the reference
(file:line citations in the module docstrings)."""

import pytest

from unraveldocs_spark import semantics as S


# --- page selection (PdfPageRange.java:77-132) -----------------------------

class TestPageSelection:
    def test_no_selection_all_pages(self):
        assert S.effective_pages(None, None, None, 4) == [0, 1, 2, 3]

    def test_range_inclusive(self):
        assert S.effective_pages(2, 4, None, 10) == [1, 2, 3]

    def test_range_defaults(self):
        assert S.effective_pages(None, 3, None, 5) == [0, 1, 2]
        assert S.effective_pages(3, None, None, 5) == [2, 3, 4]

    def test_discrete_overrides_range(self):
        assert S.effective_pages(1, 9, [5, 2], 10) == [1, 4]

    def test_discrete_dedupe_sort(self):
        assert S.effective_pages(None, None, [3, 1, 3, 2, 1], 5) == [0, 1, 2]

    def test_validate_discrete_below_one(self):
        with pytest.raises(S.PageSelectionError, match=r"Page numbers must be >= 1, got: 0"):
            S.validate_page_selection(None, None, [0], 5)

    def test_validate_discrete_exceeds(self):
        with pytest.raises(S.PageSelectionError, match=r"Page 9 exceeds total pages \(5\)"):
            S.validate_page_selection(None, None, [1, 9], 5)

    def test_validate_range_messages(self):
        with pytest.raises(S.PageSelectionError, match=r"startPage must be >= 1, got: 0"):
            S.validate_page_selection(0, 3, None, 5)
        with pytest.raises(S.PageSelectionError, match=r"endPage must be >= 1, got: -2"):
            S.validate_page_selection(None, -2, None, 5)
        with pytest.raises(
            S.PageSelectionError, match=r"startPage \(4\) must be <= endPage \(2\)"
        ):
            S.validate_page_selection(4, 2, None, 5)
        with pytest.raises(
            S.PageSelectionError, match=r"startPage \(7\) exceeds total pages \(5\)"
        ):
            S.validate_page_selection(7, None, None, 5)
        with pytest.raises(
            S.PageSelectionError, match=r"endPage \(7\) exceeds total pages \(5\)"
        ):
            S.validate_page_selection(None, 7, None, 5)

    def test_discrete_validation_skips_range_rules(self):
        # discrete mode returns before range checks (PdfPageRange.java:78-89)
        S.validate_page_selection(9, 2, [1], 5)  # no raise


# --- multi-page assembly (PdfTextExtractor.java:95-143) ---------------------

class TestAssembly:
    def test_single_page_no_header(self):
        assert S.assemble_direct_text(["hello"], [0]) == "hello"

    def test_separator_between_contributors(self):
        out = S.assemble_direct_text(["a", "b"], [0, 1])
        assert out == "a\n--- Page 2 ---\nb"

    def test_blank_pages_vanish_direct(self):
        out = S.assemble_direct_text(["a", "   ", None, "d"], [0, 1, 2, 3])
        assert out == "a\n--- Page 4 ---\nd"

    def test_blank_first_page_no_header_for_first_contributor(self):
        out = S.assemble_direct_text(["", "b", "c"], [0, 1, 2])
        assert out == "b\n--- Page 3 ---\nc"

    def test_strip_per_page(self):
        out = S.assemble_direct_text(["  a \n", "\tb\r\n"], [0, 1])
        assert out == "a\n--- Page 2 ---\nb"

    def test_page_numbers_follow_selection(self):
        out = S.assemble_direct_text(["p1", "p2", "p3", "p4"], [0, 3])
        assert out == "p1\n--- Page 4 ---\np4"

    def test_ocr_blank_after_contributor_gets_header(self):
        # OCR path: blank page AFTER a contributor appends header + ""
        # (PdfTextExtractor.java:136-139 has no blank check)
        out = S.assemble_ocr_text(["a", "  ", "c"], [0, 1, 2])
        assert out == "a\n--- Page 2 ---\n\n--- Page 3 ---\nc"

    def test_ocr_blank_before_contributor_skipped(self):
        out = S.assemble_ocr_text(["", "b"], [0, 1])
        assert out == "b"

    def test_ocr_all_blank(self):
        assert S.assemble_ocr_text(["", None], [0, 1]) == ""


class TestPdfLike:
    def test_direct_wins(self):
        text, spans, used_ocr = S.extract_pdf_like(["x", "y"], ["ox", "oy"], None, None, None)
        assert text == "x\n--- Page 2 ---\ny"
        assert not used_ocr
        # "x" at [0,1); separator "\n--- Page 2 ---\n" is 16 chars; "y" at [17,18)
        assert spans == [(0, 1, "page"), (17, 18, "page")]
        assert text[17:18] == "y"

    def test_fallback_when_direct_blank(self):
        text, spans, used_ocr = S.extract_pdf_like(["", "  "], ["ox", "oy"], None, None, None)
        assert text == "ox\n--- Page 2 ---\noy"
        assert used_ocr

    def test_never_mixed_per_page(self):
        # page 1 has direct text -> whole doc uses direct; page 2 blank vanishes
        text, _, used_ocr = S.extract_pdf_like(["x", ""], ["ox", "oy"], None, None, None)
        assert text == "x" and not used_ocr

    def test_selection_applies_to_fallback(self):
        text, _, used_ocr = S.extract_pdf_like(
            ["", "", ""], ["a", "b", "c"], 2, 3, None
        )
        assert text == "b\n--- Page 3 ---\nc"
        assert used_ocr

    def test_invalid_selection_raises(self):
        with pytest.raises(S.PageSelectionError):
            S.extract_pdf_like(["a"], None, 1, 5, None)

    def test_fallback_without_ocr_pages_is_empty(self):
        text, spans, used_ocr = S.extract_pdf_like(["", ""], None, None, None, None)
        assert text == "" and used_ocr and spans == []


# --- fence strip / classification (AiClassificationService.java:152-186) ----

class TestFenceStrip:
    def test_plain_json_untouched(self):
        assert S.strip_code_fences('{"a":1}') == '{"a":1}'

    def test_json_fence(self):
        assert S.strip_code_fences('```json\n{"a":1}\n```') == '{"a":1}'

    def test_bare_fence(self):
        assert S.strip_code_fences("```\nhello\n```") == "hello"

    def test_outer_strip_applied(self):
        assert S.strip_code_fences("  \n```json\n{}\n```  ") == "{}"

    def test_not_fenced_only_stripped(self):
        assert S.strip_code_fences("  text ```inner``` more ") == "text ```inner``` more"

    def test_parse_defaults_on_garbage(self):
        assert S.parse_classification("not json at all") == ("other", ["unclassified"], 0.0)

    def test_parse_fields(self):
        got = S.parse_classification(
            '```json\n{"document_type":"invoice","tags":["a","b"],"confidence":0.9}\n```'
        )
        assert got == ("invoice", ["a", "b"], 0.9)

    def test_parse_missing_fields(self):
        assert S.parse_classification("{}") == ("other", [], 0.5)

    def test_parse_non_numeric_confidence(self):
        assert S.parse_classification('{"confidence": {"x": 1}}') == ("other", [], 0.5)


# --- small string ops --------------------------------------------------------

class TestStringOps:
    def test_truncate(self):
        assert S.truncate_text("x" * 30001) == "x" * 30000
        assert S.truncate_text("x" * 30000) == "x" * 30000

    def test_split_tags(self):
        assert S.split_tags(" a , b ,, c ,") == ["a", "b", "c"]
        assert S.split_tags(None) == []
        assert S.split_tags("  ") == []

    def test_preview(self):
        assert S.text_preview("a" * 200) == "a" * 200
        assert S.text_preview("a" * 201) == "a" * 200 + "..."
        assert S.text_preview(None) is None

    def test_sanitize_logging(self):
        assert S.sanitize_logging("a\r\nb\nc") == "abc"

    def test_sanitize_error_type(self):
        assert S.sanitize_error_type("Connection Timed-Out!") == "connection_timed_out_"
        assert S.sanitize_error_type(None) == "unknown"
        assert len(S.sanitize_error_type("x" * 100)) == 50

    def test_word_count(self):
        assert S.word_count("one  two\tthree\nfour") == 4
        assert S.word_count("  ") == 0
        assert S.word_count(None) == 0
        assert S.word_count("single") == 1

    def test_word_count_java_split_untrimmed(self):
        # Java " a b".split("\\s+") -> ["", "a", "b"]: leading whitespace
        # contributes an empty token (OcrResult.java:83-88 does NOT trim)
        assert S.word_count(" a b") == 3
        # trailing empties are removed by Java split (limit 0)
        assert S.word_count("a b ") == 2
        assert S.word_count("\ta") == 2

    def test_word_count_ascii_whitespace_only(self):
        # Java \s is ASCII: NBSP does not split words...
        assert S.word_count("a b") == 1
        # ...and NBSP is not Java-blank (Character.isWhitespace is false)
        assert S.word_count(" ") == 1
        # \x0B (VT) IS Java \s
        assert S.word_count("a\x0bb") == 2

    def test_java_whitespace_helpers(self):
        assert S.java_is_blank(" \t\r\n\x0b\f")
        assert S.java_is_blank("")
        assert not S.java_is_blank(" ")
        assert not S.java_is_blank("\x85")  # NEL: Python isspace, Java not
        assert S.java_strip("   x ") == "  x"
        assert S.java_strip(" x ") == "x"  # LS is Java whitespace
        assert S.java_trim(" \x1f x \x00") == "x"
        assert S.java_trim(" x") == " x"


# --- rollup ladder (ProcessOcr.java:185-217) --------------------------------

class TestRollup:
    def test_empty_processed(self):
        assert S.rollup_status(0, 0, 0) == "PROCESSED"

    def test_all_completed(self):
        assert S.rollup_status(3, 3, 0) == "PROCESSED"

    def test_mixed_terminal_failed_ocr(self):
        assert S.rollup_status(3, 2, 1) == "FAILED_OCR"
        assert S.rollup_status(3, 0, 3) == "FAILED_OCR"

    def test_inflight_processing(self):
        assert S.rollup_status(3, 2, 0) == "PROCESSING"
        assert S.rollup_status(3, 0, 0) == "PROCESSING"


# --- envelope ----------------------------------------------------------------

class TestEnvelope:
    def test_roundtrip(self):
        import json

        payload = json.dumps(
            {"kind": "pages", "pages": ["a", "b"], "start_page": 1, "end_page": 2},
            separators=(",", ":"),
        )
        env = S.try_parse_envelope(payload)
        assert env is not None
        assert env.kind == "pages" and env.pages == ["a", "b"]
        assert env.start_page == 1 and env.end_page == 2

    def test_non_envelope(self):
        assert S.try_parse_envelope("hello") is None
        assert S.try_parse_envelope(None) is None

    def test_malformed_envelope_falls_through(self):
        assert S.try_parse_envelope('{"kind": broken') is None


class TestVisionShaping:
    """GoogleVisionOcrProvider.java:250-332 selection logic."""

    def test_full_text_wins_over_annotations(self):
        text, conf, lang = S.extract_vision(
            {
                "full_text": {"text": "FULL", "blocks": [{"confidence": 0.8}], "languages": ["en"]},
                "annotations": [{"description": "IGNORED", "score": 0.9, "locale": "fr"}],
            }
        )
        assert text == "FULL" and conf == 0.8 and lang == "en"

    def test_annotation_fallback(self):
        text, conf, lang = S.extract_vision(
            {"annotations": [{"description": "ANN", "score": 0.7, "locale": "es"}]}
        )
        assert text == "ANN" and conf == 0.7 and lang == "es"

    def test_empty_response(self):
        assert S.extract_vision({}) == ("", None, None)

    def test_confidence_is_block_mean(self):
        _, conf, _ = S.extract_vision(
            {"full_text": {"text": "x", "blocks": [{"confidence": 0.5}, {"confidence": 1.0}]}}
        )
        assert conf == 0.75

    def test_no_blocks_falls_to_annotation_score(self):
        _, conf, _ = S.extract_vision(
            {"full_text": {"text": "x", "blocks": []},
             "annotations": [{"description": "d", "score": 0.6}]}
        )
        assert conf == 0.6

    def test_zero_score_gives_none(self):
        _, conf, _ = S.extract_vision(
            {"annotations": [{"description": "d", "score": 0.0}]}
        )
        assert conf is None

    def test_language_fallback_chain(self):
        _, _, lang = S.extract_vision(
            {"full_text": {"text": "x", "languages": []},
             "annotations": [{"description": "d", "locale": "de"}]}
        )
        assert lang == "de"
        _, _, lang2 = S.extract_vision(
            {"annotations": [{"description": "d", "locale": ""}]}
        )
        assert lang2 is None
