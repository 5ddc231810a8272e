"""Sanitizer tests — pinned to the reference's safelist
(UpdateOcrContentImpl.java:45-51) and its unit assertions
(UpdateOcrContentImplTest.java:107-153)."""

from unraveldocs_spark.sanitizer import clean_html, sanitize_content


class TestSafelist:
    def test_script_stripped_bold_kept(self):
        # UpdateOcrContentImplTest.java:133-153
        out = clean_html("<p>Text</p><script>alert('xss')</script><b>Bold</b>")
        assert "<script>" not in out
        assert "alert" not in out  # script data content discarded
        assert "<b>Bold</b>" in out
        assert "<p>Text</p>" in out

    def test_event_handler_attributes_stripped(self):
        out = clean_html('<div onclick="evil()" style="color:red">hi</div>')
        assert "onclick" not in out
        assert '<div style="color:red">hi</div>' == out

    def test_javascript_href_stripped(self):
        out = clean_html('<a href="javascript:alert(1)" title="t">x</a>')
        assert "javascript" not in out
        assert out == '<a title="t">x</a>'

    def test_allowed_protocols(self):
        assert clean_html('<a href="https://e.com">x</a>') == '<a href="https://e.com">x</a>'
        assert clean_html('<a href="mailto:a@b.c">x</a>') == '<a href="mailto:a@b.c">x</a>'
        # relaxed() grants ftp on a[href]; addProtocols is additive
        assert clean_html('<a href="ftp://e.com">x</a>') == '<a href="ftp://e.com">x</a>'
        # relative URLs rejected (no relative-protocol registered)
        assert clean_html('<a href="/local">x</a>') == "<a>x</a>"

    def test_a_extra_attributes_kept(self):
        out = clean_html('<a href="http://e" target="_blank" rel="noopener" id="z">x</a>')
        assert out == '<a href="http://e" target="_blank" rel="noopener">x</a>'

    def test_added_tags_kept(self):
        for tag in ("span", "div", "br", "hr", "pre", "code", "mark", "sub", "sup", "u", "s"):
            if tag in ("br", "hr"):
                assert f"<{tag}>" in clean_html(f"a<{tag}>b")
            else:
                assert clean_html(f"<{tag}>x</{tag}>") == f"<{tag}>x</{tag}>"

    def test_style_only_on_span_p_div(self):
        assert clean_html('<span style="a:b">x</span>') == '<span style="a:b">x</span>'
        assert clean_html('<b style="a:b">x</b>') == "<b>x</b>"

    def test_disallowed_tag_keeps_children_text(self):
        # jsoup Cleaner traverses children of unsafe elements
        assert clean_html("<unknown>keep <b>me</b></unknown>") == "keep <b>me</b>"

    def test_style_element_content_discarded(self):
        assert clean_html("<style>p{color:red}</style><p>t</p>") == "<p>t</p>"

    def test_relaxed_table_kept(self):
        out = clean_html('<table width="5"><tr><td colspan="2">c</td></tr></table>')
        assert "<table" in out and 'colspan="2"' in out

    def test_text_escaping(self):
        assert clean_html("a < b & c") == "a &lt; b &amp; c"


class TestSanitizeContent:
    def test_markdown_byte_identical(self):
        # UpdateOcrContentImplTest.java:107-130
        md = "# Heading\n\n**Bold text** with [link](https://example.com)"
        assert sanitize_content(md, "MARKDOWN") is md

    def test_html_dispatched(self):
        assert "<script>" not in sanitize_content("<script>x</script><b>b</b>", "HTML")

    def test_none_html(self):
        assert sanitize_content(None, "HTML") is None
