"""Double-encoded HTML entity repair.

Mirrors ``decodeHTMLEntities`` (/root/reference/converter/markdown.go:127-171):

* Passthrough unless the string contains ``&lt;`` or ``&#`` (trigger guard,
  markdown.go:129-131; pinned by fuzz invariant fuzz_test.go:361-367).
* One single-pass replacement per named entity (12 entries,
  markdown.go:29-42).  The reference iterates a Go map (random order); the
  only order-sensitive entry is ``&amp;`` (its output ``&`` can re-expose a
  literal entity spelling such as ``&amp;lt;`` → ``&lt;``).  We fix a
  deterministic order with ``&amp;``/``&#38;`` LAST so already-escaped
  entities stay escaped — the conventional non-recursive decode.
* Numeric entities (hex ``&#xNN;``, decimal ``&#NNN;``) decode only for
  ``0 < val < 127`` (markdown.go:24,149,163; boundary pinned by
  markdown_test.go:999-1001: 126 decodes, 127 does not).
"""

from __future__ import annotations

import re

# markdown.go:29-42 — &amp;/&#38; deliberately ordered last (see module doc).
HTML_ENTITY_ITEMS: tuple[tuple[str, str], ...] = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&#x27;", "'"),
    ("&#34;", '"'),
    ("&#60;", "<"),
    ("&#62;", ">"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
    ("&#38;", "&"),
)

MAX_ASCII_CODE_POINT = 127  # markdown.go:22-24

_HEX_ENTITY = re.compile(r"&#x([0-9a-fA-F]+);")
_DEC_ENTITY = re.compile(r"&#(\d+);")


def _decode_hex(m: re.Match) -> str:
    val = int(m.group(1), 16)
    if 0 < val < MAX_ASCII_CODE_POINT:
        return chr(val)
    return m.group(0)


def _decode_dec(m: re.Match) -> str:
    val = int(m.group(1), 10)
    if 0 < val < MAX_ASCII_CODE_POINT:
        return chr(val)
    return m.group(0)


def decode_html_entities(html: str) -> str:
    if "&lt;" not in html and "&#" not in html:
        return html
    for entity, char in HTML_ENTITY_ITEMS:
        html = html.replace(entity, char)
    html = _HEX_ENTITY.sub(_decode_hex, html)
    html = _DEC_ENTITY.sub(_decode_dec, html)
    return html
