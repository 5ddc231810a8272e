"""DOM-walk tests — pinned to DocxExportServiceImpl.java:22-159 traversal
semantics plus the graft's link-density boilerplate rule."""

from unraveldocs_spark.domwalk import (
    extract_main_content,
    html_blocks,
    is_html,
    join_blocks,
    plain_blocks,
)


class TestDetection:
    def test_literal_substrings(self):
        # DocxExportServiceImpl.java:41-44 — literal <p>/<h3>/<ul>/<li>
        assert is_html("<p>x</p>")
        assert is_html("text with <h3>h</h3>")
        assert is_html("<ul><li>a</li></ul>")
        assert not is_html("<h1>not detected</h1>")  # h1 alone doesn't trigger
        assert not is_html('<p class="x">attr breaks literal match</p>')
        assert not is_html(None)
        assert not is_html("plain text")


class TestBlocks:
    def test_headings(self):
        blocks = html_blocks("<p>x</p><h1>One</h1><h3>Three</h3><h6>Six</h6>")
        assert ("heading", "One") in blocks
        assert ("heading", "Three") in blocks
        assert ("heading", "Six") in blocks

    def test_paragraph_inline(self):
        blocks = html_blocks("<p>Hello <b>World</b> and <em>em</em></p>")
        assert blocks == [("paragraph", "Hello World and em")]

    def test_br_is_line_break(self):
        blocks = html_blocks("<p>line1<br>line2</p>")
        assert blocks == [("paragraph", "line1\nline2")]

    def test_list_items(self):
        blocks = html_blocks("<ul><li>a</li><li>b <b>bold</b></li></ul>")
        assert blocks == [("list_item", "a"), ("list_item", "b bold")]

    def test_ol_items(self):
        blocks = html_blocks("<ol><li>one</li><li>two</li></ol>")
        assert blocks == [("list_item", "one"), ("list_item", "two")]

    def test_non_li_children_of_ul_ignored(self):
        # processElement ul/ol branch only handles direct <li> children
        blocks = html_blocks("<ul><p>stray</p><li>a</li></ul>")
        assert blocks == [("list_item", "a")]

    def test_unknown_container_recurses(self):
        blocks = html_blocks("<section><p>inner</p><h2>h</h2></section>")
        assert blocks == [("paragraph", "inner"), ("heading", "h")]

    def test_unknown_leaf_is_other(self):
        blocks = html_blocks("<p>x</p><customtag>leaf text</customtag>")
        assert ("other", "leaf text") in blocks

    def test_span_and_nested_p_recurse_inline(self):
        blocks = html_blocks("<p>a <span>b <b>c</b></span> d</p>")
        assert blocks == [("paragraph", "a b c d")]

    def test_whitespace_normalized(self):
        blocks = html_blocks("<p>  a\n\n   b\t c  </p>")
        assert blocks == [("paragraph", "a b c")]

    def test_code_kind(self):
        blocks = html_blocks("<p>x</p><pre>code here</pre>")
        assert ("code", "code here") in blocks

    def test_empty_blocks_dropped(self):
        blocks = html_blocks("<p></p><p>x</p><p>   </p>")
        assert blocks == [("paragraph", "x")]


class TestBoilerplate:
    def test_nav_skipped(self):
        blocks = html_blocks("<nav><p>Home | About</p></nav><p>content</p>")
        assert blocks == [("paragraph", "content")]

    def test_header_footer_aside_skipped(self):
        html = (
            "<header><p>site hdr</p></header><p>real</p>"
            "<footer><p>c</p></footer><aside><p>ads</p></aside>"
        )
        assert html_blocks(html) == [("paragraph", "real")]

    def test_link_dense_short_block_dropped(self):
        html = '<p><a href="http://a">Home</a> <a href="http://b">About</a></p><p>body text</p>'
        assert html_blocks(html) == [("paragraph", "body text")]

    def test_link_dense_long_block_kept(self):
        words = " ".join(f"w{i}" for i in range(25))
        html = f'<p><a href="http://a">{words}</a></p>'
        blocks = html_blocks(html)
        assert len(blocks) == 1 and blocks[0][0] == "paragraph"

    def test_low_link_density_kept(self):
        html = '<p>This sentence has one <a href="http://a">link</a> in plenty of surrounding prose.</p>'
        assert len(html_blocks(html)) == 1


class TestTextDensity:
    """The Boilerpipe-style text-density rule (words per 80-char wrapped
    line), gated on link density > 0.33 — north-star 'text-density +
    link-density heuristics'."""

    def test_large_link_farm_dropped(self):
        # >= 20 words of anchor text passes the link-list rule, but long
        # low-word-density anchors (URL-ish tokens) fail text density
        anchors = "".join(
            f'<a href="http://x/{i}">download-release-{i:02d}-linux-x86-64</a> '
            for i in range(20)
        )
        html = f"<p>{anchors}</p><p>real body text</p>"
        assert html_blocks(html) == [("paragraph", "real body text")]

    def test_dense_anchor_text_kept(self):
        # same link density but high word density (prose-like anchors)
        words = " ".join(f"w{i}" for i in range(30))
        html = f'<p><a href="http://a">{words}</a></p>'
        assert len(html_blocks(html)) == 1

    def test_zero_link_prose_never_dropped(self):
        # the link gate guarantees long-word prose is untouched
        html = "<p>supercalifragilisticexpialidocious antidisestablishmentarianism</p>"
        blocks = html_blocks(html)
        assert len(blocks) == 1 and blocks[0][0] == "paragraph"

    def test_threshold_boundary(self):
        from unraveldocs_spark.domwalk import _is_boilerplate_block

        # exactly 4 words/line at ld > 0.33 is KEPT (strict <)
        text = "a b c d" + " " * 73  # 80 chars -> 1 line, 4 words
        assert not _is_boilerplate_block(text.rstrip() + " " * 73, 40)
        # 3 words on one line with ld > 0.33 is dropped
        assert _is_boilerplate_block("aa bb cc", 5)
        # same 3 words with no link chars is kept
        assert not _is_boilerplate_block("aa bb cc", 0)


class TestPlainAndJoin:
    def test_plain_split_crlf(self):
        blocks = plain_blocks("a\r\nb\nc")
        assert blocks == [("paragraph", "a"), ("paragraph", "b"), ("paragraph", "c")]

    def test_plain_keeps_empty_lines(self):
        assert plain_blocks("a\n\nb") == [
            ("paragraph", "a"),
            ("paragraph", ""),
            ("paragraph", "b"),
        ]

    def test_join_spans(self):
        text, spans = join_blocks([("heading", "Hi"), ("paragraph", "Body")])
        assert text == "Hi\nBody"
        assert spans == [(0, 2, "heading"), (3, 7, "paragraph")]
        assert text[spans[1][0] : spans[1][1]] == "Body"

    def test_extract_main_content_plain(self):
        text, spans = extract_main_content("one\ntwo")
        assert text == "one\ntwo"
        assert [k for _, _, k in spans] == ["paragraph", "paragraph"]

    def test_extract_main_content_html(self):
        text, spans = extract_main_content("<p>Hello <b>World</b></p>")
        assert text == "Hello World"
        assert spans == [(0, 11, "paragraph")]
