"""HTML safelist sanitizer — a Python equivalent of the reference's
``Jsoup.clean(content, HTML_SAFELIST)`` where ``HTML_SAFELIST`` is
``Safelist.relaxed()`` plus extra tags/attributes/protocols
(SRC/ocrprocessing/impl/UpdateOcrContentImpl.java:45-51).

Semantics mirrored from jsoup's Cleaner:
- allowed elements are copied with only their allowed attributes;
- a DISALLOWED element is dropped but its children are still traversed and
  attach to the nearest allowed ancestor (so ``<unknown>text</unknown>``
  keeps ``text``);
- raw data content of <script>/<style> is discarded entirely;
- URL attributes must match an allowed protocol (relative URLs are
  rejected because the reference registers no relative-protocol marker);
- output is serialized compactly (deviation: jsoup pretty-prints by
  default; the reference's pinned assertions
  (UpdateOcrContentImplTest.java:133-153) constrain content, not
  indentation).

Markdown payloads bypass sanitization byte-identically
(UpdateOcrContentImpl.sanitizeContent:98-103).
"""

from __future__ import annotations

from .htmldom import DATA_ELEMENTS, Element, TextNode, parse_body_fragment, serialize

# Safelist.relaxed() per jsoup (org/jsoup/safety/Safelist.java) ...
_RELAXED_TAGS = frozenset(
    "a b blockquote br caption cite code col colgroup dd div dl dt em h1 h2 "
    "h3 h4 h5 h6 i img li ol p pre q small span strike strong sub sup table "
    "tbody td tfoot th thead tr u ul".split()
)
# ... plus UpdateOcrContentImpl.java:46 additions
EXTRA_TAGS = frozenset("span div br hr pre code mark sub sup u s".split())
ALLOWED_TAGS = _RELAXED_TAGS | EXTRA_TAGS

# relaxed() attribute map per jsoup
_RELAXED_ATTRS: dict[str, frozenset] = {
    "a": frozenset(("href",)),
    "blockquote": frozenset(("cite",)),
    "col": frozenset(("span", "width")),
    "colgroup": frozenset(("span", "width")),
    "img": frozenset(("align", "alt", "height", "src", "title", "width")),
    "ol": frozenset(("start", "type")),
    "q": frozenset(("cite",)),
    "table": frozenset(("summary", "width")),
    "td": frozenset(("abbr", "axis", "colspan", "rowspan", "width")),
    "th": frozenset(("abbr", "axis", "colspan", "rowspan", "scope", "width")),
    "ul": frozenset(("type",)),
}
# UpdateOcrContentImpl.java:47-50 additions
_EXTRA_ATTRS = {
    "a": frozenset(("href", "title", "target", "rel")),
    "span": frozenset(("style",)),
    "p": frozenset(("style",)),
    "div": frozenset(("style",)),
}
ALLOWED_ATTRS: dict[str, frozenset] = {
    tag: _RELAXED_ATTRS.get(tag, frozenset()) | _EXTRA_ATTRS.get(tag, frozenset())
    for tag in set(_RELAXED_ATTRS) | set(_EXTRA_ATTRS)
}

# protocols: relaxed() defines a/blockquote/cite/q cite and img src;
# UpdateOcrContentImpl.java:51 REPLACES nothing but adds a[href] http/https/
# mailto on top of relaxed()'s ftp/http/https/mailto — jsoup addProtocols is
# additive, so the union applies.
ALLOWED_PROTOCOLS: dict[tuple[str, str], frozenset] = {
    ("a", "href"): frozenset(("ftp", "http", "https", "mailto")),
    ("blockquote", "cite"): frozenset(("http", "https")),
    ("q", "cite"): frozenset(("http", "https")),
    ("img", "src"): frozenset(("http", "https")),
}


def _protocol_ok(tag: str, attr: str, value: str) -> bool:
    protocols = ALLOWED_PROTOCOLS.get((tag, attr))
    if protocols is None:
        return True
    v = value.strip().lower()
    for proto in protocols:
        if v.startswith(proto + ":"):
            return True
    return False


def _clean_element(src: Element, dest: Element) -> None:
    dest_children = dest.children
    for child in src.children:
        if isinstance(child, TextNode):
            # merge with a preceding text node (dropping a disallowed tag
            # between two text runs must splice them, as jsoup's cleaned
            # document would render them — one normalized run)
            if dest_children and isinstance(dest_children[-1], TextNode):
                dest_children[-1].whole_text += child.whole_text
            else:
                dest.append(TextNode(child.whole_text))
            continue
        tag = child.tag
        if tag in DATA_ELEMENTS:
            continue  # script/style content discarded wholesale
        if tag in ALLOWED_TAGS:
            if child.attrs:
                allowed = ALLOWED_ATTRS.get(tag)
                kept_attrs = (
                    [
                        (k, v)
                        for k, v in child.attrs
                        if k in allowed and _protocol_ok(tag, k, v)
                    ]
                    if allowed
                    else []
                )
            else:
                kept_attrs = []
            new_el = Element(tag, kept_attrs)
            dest.append(new_el)
            if child.children:
                _clean_element(child, new_el)
        else:
            # disallowed element: skip the tag, keep traversing children
            _clean_element(child, dest)


def clean_tree(html: str) -> Element:
    """Parse + safelist-clean, returning the cleaned body Element.

    Callers that immediately walk the DOM (the extraction path) use this
    to avoid the serialize -> re-parse round trip; ``clean_html`` is the
    string view of the same tree, so both are semantically identical."""
    body = parse_body_fragment(html)
    clean_body = Element("body")
    _clean_element(body, clean_body)
    return clean_body


def clean_html(html: str | None) -> str | None:
    """Jsoup.clean(html, HTML_SAFELIST) equivalent."""
    if html is None:
        return None
    out: list[str] = []
    serialize(clean_tree(html), out)
    return "".join(out)


def sanitize_content(content: str | None, content_format: str) -> str | None:
    """UpdateOcrContentImpl.sanitizeContent (UpdateOcrContentImpl.java:98-103):
    HTML is safelist-cleaned; MARKDOWN (or anything else) passes through
    byte-identically."""
    if content_format == "HTML":
        return clean_html(content)
    return content
