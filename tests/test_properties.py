"""Property-based tests (hypothesis) for the pure-Python semantics layer —
invariants that must hold for ANY payload, not just the fixture families."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from unraveldocs_spark import semantics as S
from unraveldocs_spark.domwalk import join_blocks, plain_blocks
from unraveldocs_spark.oracle import extract_turn
from unraveldocs_spark.sanitizer import clean_html

text_st = st.text(alphabet=string.printable, max_size=300)
page_st = st.one_of(st.none(), st.text(alphabet=string.printable + " ", max_size=80))
pages_st = st.lists(page_st, min_size=1, max_size=6)


class TestAssemblyProperties:
    @given(pages_st)
    @settings(max_examples=150)
    def test_direct_no_leading_or_trailing_separator(self, pages):
        out = S.assemble_direct_text(pages, list(range(len(pages))))
        assert not out.startswith("\n--- Page ")
        assert not out.endswith(" ---\n")

    @given(pages_st)
    @settings(max_examples=150)
    def test_direct_contributors_are_stripped(self, pages):
        # Java String.strip() semantics: NBSP is content, not whitespace
        out = S.assemble_direct_text(pages, list(range(len(pages))))
        if out:
            assert out == S.java_strip(out)

    @given(pages_st)
    @settings(max_examples=150)
    def test_blank_only_pages_give_empty(self, pages):
        blanks = [
            p if p is None or S.java_is_blank(p) else "  " for p in pages
        ]
        assert S.assemble_direct_text(blanks, list(range(len(blanks)))) == ""

    @given(pages_st)
    @settings(max_examples=150)
    def test_ocr_and_direct_agree_on_nonblank_pages(self, pages):
        """When every page is non-blank, both assembly paths agree."""
        nonblank = [(p or "") + "x" for p in pages]
        idx = list(range(len(nonblank)))
        assert S.assemble_direct_text(nonblank, idx) == S.assemble_ocr_text(nonblank, idx)

    @given(st.integers(1, 10), st.integers(1, 10), st.integers(1, 12))
    def test_range_selection_within_bounds(self, start, end, total):
        if start <= end <= total:
            pages = S.effective_pages(start, end, None, total)
            assert pages == list(range(start - 1, end))
            assert all(0 <= p < total for p in pages)

    @given(st.lists(st.integers(1, 12), min_size=1, max_size=8), st.integers(12, 20))
    def test_discrete_selection_sorted_unique(self, picks, total):
        pages = S.effective_pages(None, None, picks, total)
        assert pages == sorted(set(pages))
        assert all(0 <= p < total for p in pages)


class TestSanitizerProperties:
    @given(text_st)
    @settings(max_examples=150)
    def test_never_emits_script(self, raw):
        out = clean_html(raw)
        assert "<script" not in out.lower()
        assert "onclick=" not in out.lower()

    @given(text_st)
    @settings(max_examples=100)
    def test_idempotent(self, raw):
        once = clean_html(raw)
        assert clean_html(once) == once

    @given(st.text(alphabet=string.ascii_letters + " .,", max_size=120))
    def test_plain_text_content_preserved(self, raw):
        # tagless input survives modulo entity escaping
        out = clean_html(raw)
        from html import unescape

        assert unescape(out) == raw


class TestDomwalkProperties:
    @given(text_st)
    @settings(max_examples=150)
    def test_plain_blocks_roundtrip(self, raw):
        """plain path is exactly CRLF->LF normalization."""
        text, spans = join_blocks(plain_blocks(raw))
        assert text == raw.replace("\r\n", "\n")

    @given(text_st)
    @settings(max_examples=150)
    def test_spans_are_valid_offsets(self, raw):
        text, spans = join_blocks(plain_blocks(raw))
        for start, end, kind in spans:
            assert 0 <= start <= end <= len(text)

    @given(text_st)
    @settings(max_examples=150)
    def test_spans_sorted_and_disjoint(self, raw):
        """Spans are emitted in document order and never overlap — the
        join_blocks cursor only moves forward (the span-offset contract
        downstream consumers rely on)."""
        _, spans = join_blocks(plain_blocks(raw))
        for (s1, e1, _), (s2, e2, _) in zip(spans, spans[1:]):
            assert s1 <= s2
            assert e1 <= s2


class TestOracleProperties:
    @given(
        st.sampled_from(["user", "assistant", "tool"]),
        st.one_of(st.none(), st.sampled_from(["bash", "search"])),
        st.one_of(st.none(), text_st),
    )
    @settings(max_examples=200)
    def test_total_function_no_exceptions(self, role, tool, text):
        """Any (role, tool, text) produces a well-formed row, never raises
        (the row-level error policy, ProcessOcr.java:129-139)."""
        r = extract_turn(role, tool, text)
        assert r.status in ("COMPLETED", "FAILED")
        if r.status == "FAILED":
            assert r.error_message and r.extracted_text is None
        else:
            assert r.extracted_text is not None
            for s, e, _ in r.spans:
                assert 0 <= s <= e <= len(r.extracted_text)
            for (s1, e1, _), (s2, e2, _) in zip(r.spans, r.spans[1:]):
                assert s1 <= s2 and e1 <= s2  # document order, disjoint

    @given(st.one_of(st.none(), text_st))
    @settings(max_examples=200)
    def test_deterministic(self, text):
        a = extract_turn("user", None, text)
        b = extract_turn("user", None, text)
        assert (a.extracted_text, a.status, a.spans) == (
            b.extracted_text,
            b.status,
            b.spans,
        )


class TestRollupProperties:
    @given(st.integers(0, 50), st.integers(0, 50), st.integers(0, 50))
    def test_ladder_total(self, completed, failed, pending):
        total = completed + failed + pending
        status = S.rollup_status(total, completed, failed)
        if total == 0 or completed == total:
            assert status == "PROCESSED"
        elif pending == 0:
            assert status == "FAILED_OCR"
        else:
            assert status == "PROCESSING"


class TestSinglePassEquivalence:
    """The extraction fast path (clean tree -> walk) must be equivalent to
    the string path (clean -> serialize -> reparse -> walk) for arbitrary
    tag soup — guards the single-parse optimization."""

    tags = ["p", "b", "em", "ul", "li", "h1", "h3", "div", "span", "script",
            "nav", "unknown", "br", "a", "pre"]

    @st.composite
    def html_soup(draw):
        parts = []
        for _ in range(draw(st.integers(1, 8))):
            choice = draw(st.integers(0, 3))
            if choice == 0:
                parts.append(draw(st.text(alphabet="ab <>&;cd \n\t", max_size=20)))
            else:
                tag = draw(st.sampled_from(TestSinglePassEquivalence.tags))
                inner = draw(st.text(alphabet="xy z&<", max_size=15))
                if draw(st.booleans()):
                    parts.append(f"<{tag}>{inner}</{tag}>")
                else:
                    parts.append(f"<{tag}>{inner}")  # unclosed
        return "".join(parts)

    @given(html_soup())
    @settings(max_examples=300, deadline=None)
    def test_tree_walk_equals_string_roundtrip(self, soup):
        from unraveldocs_spark.domwalk import html_blocks, html_blocks_from_body
        from unraveldocs_spark.sanitizer import clean_html, clean_tree

        fast = join_blocks(html_blocks_from_body(clean_tree(soup)))
        slow = join_blocks(html_blocks(clean_html(soup)))
        assert fast == slow


class TestFastParserDifferential:
    """The regex fast scanner must build the same DOM as the stdlib
    html.parser reference for arbitrary tag soup."""

    @staticmethod
    def tree_repr(el):
        from unraveldocs_spark.htmldom import Element, TextNode

        if isinstance(el, TextNode):
            return ("#text", el.whole_text)
        return (el.tag, tuple(el.attrs), tuple(
            TestFastParserDifferential.tree_repr(c) for c in el.children
        ))

    soup_alpha = "abc <>/&;\"'= \n\t-!xyz"

    @given(st.text(alphabet=soup_alpha, max_size=60))
    @settings(max_examples=500, deadline=None)
    def test_random_soup(self, soup):
        from unraveldocs_spark.htmldom import (
            parse_body_fragment,
            parse_body_fragment_stdlib,
        )

        fast = self.tree_repr(parse_body_fragment(soup))
        ref = self.tree_repr(parse_body_fragment_stdlib(soup))
        assert fast == ref, soup

    @given(st.lists(st.sampled_from([
        "<p>", "</p>", "<b>x</b>", "<ul><li>a<li>b</ul>", "<br>", "<br/>",
        "<script>if(a<b){x&&y}</script>", "<style>p{}</style>",
        "<!-- c -->", "<!doctype html>", "<a href='u?a=1&amp;b=2'>t</a>",
        '<div class="x" id=y data-z>', "<P CLASS=UP>", "text & more",
        "&lt;tag&gt;", "<unclosed", "< notag>", "</>", "<em>e", "&#65;&#x42;",
        "<td colspan=2>", "<input type=text value='a b'/>",
        # raw-text (cdata) close-tag edge shapes — ADVICE r1 regressions
        "</scripty>", "</script extra>", "</script", "</ script >",
        "<script>", "</style2>", "x&nbsp;y",
    ]), min_size=1, max_size=8))
    @settings(max_examples=400, deadline=None)
    def test_structured_soup(self, parts):
        from unraveldocs_spark.htmldom import (
            parse_body_fragment,
            parse_body_fragment_stdlib,
        )

        soup = "".join(parts)
        fast = self.tree_repr(parse_body_fragment(soup))
        ref = self.tree_repr(parse_body_fragment_stdlib(soup))
        assert fast == ref, soup

    # pinned regressions: the fast scanner's raw-text handling must only
    # close a <script>/<style> at a COMPLETE matching end tag, exactly
    # like stdlib cdata mode (ADVICE r1, htmldom.py raw-text fix)
    CDATA_SHAPES = [
        "<script></scripty>x</script>after",
        "<script>a</script extra>b</script>c",
        "<script>x</script",          # unterminated close tag -> dropped
        "<script>x",                   # unterminated raw text -> dropped
        "<script></ script >tail",
        "<script></SCRIPT\t>tail",
        "<style>p{}</styleX></style>done",
        "<script>if(a<b){x&&y}</scripty></script>z",
        "<p>k</p><script></scriptt></script><p>m</p>",
    ]

    def test_cdata_close_tag_shapes_pinned(self):
        from unraveldocs_spark.htmldom import (
            parse_body_fragment,
            parse_body_fragment_stdlib,
        )

        for soup in self.CDATA_SHAPES:
            fast = self.tree_repr(parse_body_fragment(soup))
            ref = self.tree_repr(parse_body_fragment_stdlib(soup))
            assert fast == ref, soup

    def test_cdata_nonmatching_close_stays_inside(self):
        """'</scripty>x' must stay INSIDE the script (discarded by text
        walks), not leak into body text."""
        from unraveldocs_spark.domwalk import extract_main_content

        text, _ = extract_main_content(
            "<p>a</p><script></scripty>x</script><p>b</p>"
        )
        assert text == "a\nb"

    def test_nbsp_preserved_in_extracted_text(self):
        """jsoup normaliseWhitespace collapses only ASCII whitespace:
        &nbsp; (U+00A0) survives into extracted text."""
        from unraveldocs_spark.domwalk import extract_main_content
        from unraveldocs_spark.htmldom import normalize_whitespace

        assert normalize_whitespace("a \t\xa0 b") == "a \xa0 b"
        text, _ = extract_main_content("<p>a&nbsp;b</p>")
        assert text == "a\xa0b"
        # NBSP-only paragraph is not whitespace-only: it is kept
        text, _ = extract_main_content("<p>&nbsp;</p><p>x</p>")
        assert text == "\xa0\nx"
