"""DOCX writer mirror (wordexport.py) vs the reference's
DocxExportServiceImpl.java:22-170 semantics: paragraph/run structure,
rendering attributes (bold/size/indent/numbering/underline), and the
deterministic binary container."""

import zipfile
from io import BytesIO

from unraveldocs_spark.wordexport import (
    BULLET_NUM_ID,
    DECIMAL_NUM_ID,
    LIST_INDENT_TWIPS,
    docx_bytes,
    docx_paragraphs,
    docx_stats,
    document_xml,
)


class TestParagraphPlan:
    def test_heading_emits_empty_bold_attribute_run_then_text(self):
        # Java: headerRun = header.createRun(); setBold; setFontSize —
        # never given text; renderChildren then adds the text run.
        for tag, size in (("h1", 20), ("h2", 18), ("h3", 16), ("h6", 16)):
            [p] = docx_paragraphs(f"<p></p><{tag}>Title</{tag}>")[1:]
            assert p.style == "Heading" + tag[1:]
            assert p.runs[0].bold and p.runs[0].font_size == size
            assert p.runs[0].text == ""  # the empty attribute run
            assert p.runs[1].text == "Title" and not p.runs[1].bold

    def test_list_items_numbering_and_indent(self):
        paras = docx_paragraphs("<ul><li>a</li><li>b</li></ul><ol><li>c</li></ol>")
        assert [p.num_id for p in paras] == [
            BULLET_NUM_ID, BULLET_NUM_ID, DECIMAL_NUM_ID,
        ]
        assert all(p.indent_left == LIST_INDENT_TWIPS for p in paras)
        assert [p.runs[0].text for p in paras] == ["a", "b", "c"]

    def test_inline_attributes_and_break(self):
        [p] = docx_paragraphs(
            "<p>x <strong>bb</strong><em>ii</em><u>uu</u><br>y</p>"
        )
        kinds = [(r.bold, r.italic, r.underline, r.br, r.text) for r in p.runs]
        assert kinds == [
            (False, False, False, False, "x "),
            (True, False, False, False, "bb"),
            (False, True, False, False, "ii"),
            (False, False, True, False, "uu"),
            (False, False, False, True, ""),
            (False, False, False, False, "y"),
        ]

    def test_plain_text_preserves_empty_lines(self):
        # Java splits on \r?\n with limit 0 (DocxExportServiceImpl.java:28):
        # interior empty lines become empty paragraphs (no trim), but
        # TRAILING empty strings are dropped — 'a\r\n\r\nb\n' is exactly
        # ['a', '', 'b'], never a fourth trailing paragraph.
        paras = docx_paragraphs("a\r\n\r\nb\n")
        assert [p.runs[0].text for p in paras] == ["a", "", "b"]
        assert all(p.style is None and p.num_id is None for p in paras)

    def test_plain_text_drops_trailing_newlines_like_java_split(self):
        # Java: "x\n\n\n".split("\r?\n") == ["x"]; "".split(...) == [""]
        # (no match on empty input); "\n\n".split(...) == [] (every token
        # empty, all trailing empties dropped).
        assert [p.runs[0].text for p in docx_paragraphs("x\n\n\n")] == ["x"]
        assert [p.runs[0].text for p in docx_paragraphs("")] == [""]
        assert docx_paragraphs("\n\n") == []

    def test_unknown_container_recurses_unknown_leaf_falls_back(self):
        paras = docx_paragraphs("<p></p><div><p>in</p></div><footer>leaf</footer>")
        texts = [[r.text for r in p.runs] for p in paras]
        assert texts == [[], ["in"], ["leaf"]]

    def test_nested_span_and_p_recurse_inline(self):
        [p] = docx_paragraphs("<p>a<span>b<strong>c</strong></span></p>")
        assert [r.text for r in p.runs] == ["a", "b", "c"]
        assert [r.bold for r in p.runs] == [False, False, True]


class TestContainer:
    def test_docx_bytes_deterministic_and_valid_zip(self):
        html = "<h1>T</h1><p>body &amp; more</p><ul><li>x</li></ul>"
        b1, b2 = docx_bytes(html), docx_bytes(html)
        assert b1 == b2
        with zipfile.ZipFile(BytesIO(b1)) as z:
            names = z.namelist()
            assert names == [
                "[Content_Types].xml", "_rels/.rels",
                "word/_rels/document.xml.rels", "word/document.xml",
                "word/numbering.xml",
            ]
            doc = z.read("word/document.xml").decode()
        assert '<w:pStyle w:val="Heading1"/>' in doc
        assert '<w:sz w:val="40"/>' in doc  # 20pt -> 40 half-points
        assert '<w:ind w:left="720"/>' in doc
        assert f'<w:numId w:val="{BULLET_NUM_ID}"/>' in doc
        assert "body &amp; more" in doc  # escaped text round-trips

    def test_xml_escaping(self):
        doc = document_xml(docx_paragraphs("a < b & c > d"))
        assert "a &lt; b &amp; c &gt; d" in doc

    def test_stats_account_for_every_attribute(self):
        s = docx_stats(
            "<h2>H</h2><p><b>b</b><i>i</i><u>u</u><br></p>"
            "<ol><li>1</li><li>2</li></ol>"
        )
        assert s["n_headings"] == 1
        assert s["n_list_items"] == 2
        # heading attribute run + 'H' + b/i/u/br + two list runs
        assert s["n_bold"] == 2  # attribute run + <b>
        assert s["n_italic"] == 1
        assert s["n_underline"] == 1
        assert s["n_breaks"] == 1
        assert s["n_paragraphs"] == 4
        assert s["docx_size"] > 0
