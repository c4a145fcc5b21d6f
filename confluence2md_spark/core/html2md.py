"""HTML → GitHub-flavored-Markdown structural conversion (pandoc subset).

The reference shells out to pandoc (``pandoc -f html -t gfm --wrap=none``,
/root/reference/converter/markdown.go:64-123, pandoc.go:177-198).  Spawning
an 85 MB subprocess per document is a non-starter at 10^12-file scale (and
pandoc is absent in this sandbox), so this module reimplements pandoc's
*observable behavior on the HTML subset Confluence emits after
pre-processing* (SURVEY.md §2.F): bare table tags, no spans, attrs reduced
to class/id/href/src/alt.

Behavior pinned by the reference's own pandoc-oracle assertions:
``<h1>`` → ``# Title``; ``<strong>`` → ``**bold**``; ``<em>`` → ``*italic*``
(markdown_test.go:694-731, pandoc_test.go:93-116); ``<a href>`` →
``[text](url)``; ``<ul><li>`` → ``- item`` (markdown_test.go:27-52);
``<pre><code>`` → fenced block.

Divergence, documented: pandoc converts every ``<img>`` to ``![alt](src)``;
we do the same EXCEPT when ``alt`` names a Confluence emoticon (``(tick)``
etc.) — those are emitted as raw ``<img>`` tags so the post-processing
emoji map (markdown.go:322-354) applies, which is the reference's intended
observable behavior per its tests (markdown_test.go:70-111).

Unknown block tags (``div``, ``details`` …) pass through verbatim as raw
HTML — pandoc's raw-HTML behavior — so the post-processing stage can
rewrite Confluence macro/expander/panel divs (markdown.go:362-415).

General-HTML coverage beyond the Confluence subset (round 2): definition
lists render in pandoc's no-definition-lists fallback shape (bold term +
indented definitions); tables whose cells contain block content (lists,
code blocks, multiple paragraphs) fall back to raw HTML exactly as pandoc's
gfm writer does (pipe tables are strictly inline-per-cell), EXCEPT a cell
whose only block content is a nested table: the outer table stays a pipe
table and the inner one is emitted as single-line raw HTML; ``sub/sup/ins/
small/mark/kbd/u/span`` stay raw inline HTML (gfm has no syntax for them —
that IS pandoc's behavior, not a shortcut).

Implementation: stdlib ``html.parser`` → small node tree → renderer.  Pure
function of its input; no I/O; vectorizes inside pandas UDF batches.
"""

from __future__ import annotations

import html as _html_mod
import re
from html.parser import HTMLParser

from .postmd import EMOJI_REPLACEMENTS

_VOID_TAGS = {"br", "img", "hr", "col", "input", "meta", "link", "area", "base", "embed", "source", "track", "wbr"}
_DROP_TAGS = {"head", "title", "script", "style"}
_UNWRAP_TAGS = {"html", "body"}
_BLOCK_TAGS = {
    "p", "h1", "h2", "h3", "h4", "h5", "h6", "ul", "ol", "li", "pre",
    "blockquote", "table", "thead", "tbody", "tr", "th", "td", "hr",
    "dl", "dt", "dd",
}
# inline tags GFM has no syntax for: pandoc -t gfm keeps them as raw HTML
_RAW_INLINE_TAGS = {"u", "span", "sub", "sup", "ins", "small", "mark", "kbd"}
# block content that disqualifies a table from GFM pipe syntax (a lone <p>
# is the exception: pandoc unwraps a single paragraph to the cell's inline
# content — multiple paragraphs / headings / rules cannot be joined)
_CELL_BLOCK_TAGS = {
    "table", "ul", "ol", "pre", "blockquote", "dl",
    "h1", "h2", "h3", "h4", "h5", "h6", "hr",
}
_LANG_RE = re.compile(r"language-([\w#+-]+)")


class _Node:
    __slots__ = ("tag", "attrs", "children", "raw")

    def __init__(self, tag: str, attrs=None, raw: str = ""):
        self.tag = tag  # "" for text nodes
        self.attrs = dict(attrs or [])
        self.children: list[_Node] = []
        self.raw = raw  # verbatim start-tag text (raw passthrough) or text payload

    def text(self) -> str:
        if self.tag == "":
            return self.raw
        return "".join(c.text() for c in self.children)


class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = _Node("#root")
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        node = _Node(tag, attrs, raw=self.get_starttag_text() or "")
        self.stack[-1].children.append(node)
        if tag not in _VOID_TAGS:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        node = _Node(tag, attrs, raw=self.get_starttag_text() or "")
        self.stack[-1].children.append(node)

    def handle_endtag(self, tag):
        # Pop to the nearest matching open tag; ignore stray closers.
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return

    def handle_data(self, data):
        self.stack[-1].children.append(_Node("", raw=data))


# --------------------------------------------------------------- fast path --
#
# html.parser's state machine (goahead/parse_starttag/updatepos) is ~1/3 of
# convert_document's profile.  After entity decoding and pre-processing the
# Confluence HTML is plain: LF-only, no '&', no comments/doctype/CDATA, every
# '<' opens a well-formed tag with simply-quoted attributes.  That class
# tokenizes with ONE regex into the IDENTICAL _Node tree (same tag/attr
# lowercasing, same raw start-tag text, same void/self-closing/stray-closer
# handling, one text node per inter-tag gap — which is also what
# convert_charrefs=True html.parser emits when no charrefs split the run).
# Anything outside the class returns None and the html.parser path runs
# unchanged; a differential test pins tree equality on the corpus and on
# adversarial shapes (test_html2md.py).

_FAST_TAG_RE = re.compile(
    r"<(/?)([a-zA-Z][a-zA-Z0-9]*)"
    r"((?:\s+[a-zA-Z_:][-a-zA-Z0-9_:.]*(?:\s*=\s*(?:\"[^\"<>]*\"|'[^'<>]*'|[^\s<>\"'=`]+))?)*)"
    r"\s*(/?)>"
)
_FAST_ATTR_RE = re.compile(
    r"([a-zA-Z_:][-a-zA-Z0-9_:.]*)(?:\s*=\s*(?:\"([^\"]*)\"|'([^']*)'|([^\s\"'=`]+)))?"
)
# html.parser switches to CDATA/RCDATA modes for these — decline, don't
# mimic (title is special-cased below: plain content + exact "</title>"
# closer produces the identical token stream)
_FAST_DECLINE_TAGS = {"script", "style", "textarea"}


def _fast_parse(html: str) -> _Node | None:
    if "&" in html or "\r" in html:
        return None  # charref conversion / CR quirks: html.parser's business
    root = _Node("#root")
    stack = [root]
    i, n = 0, len(html)
    while i < n:
        lt = html.find("<", i)
        if lt == -1:
            stack[-1].children.append(_Node("", raw=html[i:]))
            break
        if lt > i:
            stack[-1].children.append(_Node("", raw=html[i:lt]))
        m = _FAST_TAG_RE.match(html, lt)
        if m is None:
            return None  # comment, doctype, or malformed tag
        closing, tag, attrs_s, selfclose = m.groups()
        tag = tag.lower()
        if tag in _FAST_DECLINE_TAGS:
            return None
        if closing:
            if selfclose or attrs_s.strip():
                return None  # '</x/>' / attrs on a closer: let html.parser rule
            for k in range(len(stack) - 1, 0, -1):  # pop to match; stray ignored
                if stack[k].tag == tag:
                    del stack[k:]
                    break
        else:
            attrs = [
                (
                    am.group(1).lower(),
                    am.group(2)
                    if am.group(2) is not None
                    else (am.group(3) if am.group(3) is not None else am.group(4)),
                )
                for am in _FAST_ATTR_RE.finditer(attrs_s)
            ]
            node = _Node(tag, attrs, raw=m.group(0))
            stack[-1].children.append(node)
            if tag == "title" and not selfclose:
                # RCDATA: content runs verbatim to the closer. Plain content
                # + exact "</title>" is token-identical to normal parsing.
                end = html.find("</title>", m.end())
                if end == -1 or "<" in html[m.end():end]:
                    return None
                if end > m.end():
                    node.children.append(_Node("", raw=html[m.end():end]))
                i = end + len("</title>")
                continue
            # '<x/>' is handle_startendtag (never pushed); bare void tags are
            # handle_starttag but unpushed — identical to _TreeBuilder
            if not selfclose and tag not in _VOID_TAGS:
                stack.append(node)
        i = m.end()
    return root


def _parse(html: str) -> _Node:
    root = _fast_parse(html)
    if root is not None:
        return root
    p = _TreeBuilder()
    p.feed(html)
    p.close()
    return p.root


_WS_RE = re.compile(r"[ \t\r\n]+")


def _collapse_ws(s: str) -> str:
    return _WS_RE.sub(" ", s)


class _Renderer:
    def render_document(self, root: _Node) -> str:
        blocks = self._render_blocks(root.children)
        out = "\n\n".join(b for b in blocks if b.strip() != "")
        return out + "\n" if out else ""

    # ---- block level -------------------------------------------------

    def _render_blocks(self, children: list[_Node]) -> list[str]:
        blocks: list[str] = []
        inline_run: list[_Node] = []

        def flush_inline():
            if inline_run:
                txt = _collapse_ws(self._render_inline_nodes(inline_run)).strip()
                if txt:
                    blocks.append(txt)
                inline_run.clear()

        for c in children:
            if c.tag in _DROP_TAGS:
                continue
            if c.tag in _UNWRAP_TAGS:
                flush_inline()
                blocks.extend(self._render_blocks(c.children))
            elif c.tag == "" or self._is_inline(c):
                inline_run.append(c)
            else:
                flush_inline()
                blocks.extend(self._render_block(c))
        flush_inline()
        return blocks

    def _is_inline(self, n: _Node) -> bool:
        return n.tag not in _BLOCK_TAGS and n.tag not in ("div", "details", "summary", "fieldset", "section", "article", "figure", "ul", "ol")

    def _render_block(self, n: _Node) -> list[str]:
        t = n.tag
        if t in ("h1", "h2", "h3", "h4", "h5", "h6"):
            level = int(t[1])
            return ["#" * level + " " + _collapse_ws(self._render_inline_nodes(n.children)).strip()]
        if t == "p":
            txt = _collapse_ws(self._render_inline_nodes(n.children)).strip()
            return [txt] if txt else []
        if t == "hr":
            return ["---"]
        if t == "pre":
            return [self._render_pre(n)]
        if t == "blockquote":
            inner = "\n\n".join(self._render_blocks(n.children))
            return ["\n".join("> " + line if line else ">" for line in inner.split("\n"))]
        if t in ("ul", "ol"):
            return [self._render_list(n)]
        if t == "dl":
            return [self._render_dl(n)]
        if t == "table":
            return [self._render_table(n)]
        # raw passthrough block (div/details/summary/unknown): keep the
        # verbatim start tag so post-processing can key on class/id.
        open_tag = n.raw or f"<{t}>"
        inner_blocks = self._render_blocks(n.children)
        parts = [open_tag]
        parts.extend(inner_blocks)
        parts.append(f"</{t}>")
        return ["\n".join(parts)]

    def _render_pre(self, n: _Node) -> str:
        lang = ""
        body_node = n
        for c in n.children:
            if c.tag == "code":
                body_node = c
                m = _LANG_RE.search(c.attrs.get("class", "") or "")
                if m:
                    lang = m.group(1)
                break
        code = body_node.text().strip("\n")
        fence = "```"
        # widen fence if the code itself contains one (pandoc does this too)
        while fence in code:
            fence += "`"
        return f"{fence}{lang}\n{code}\n{fence}"

    def _render_list(self, n: _Node, indent: str = "") -> str:
        """GFM list. Continuation content (nested lists, extra paragraphs,
        code blocks, blockquotes...) is indented by the MARKER's width —
        CommonMark scopes continuation to the first column after the marker,
        so the fixed 2-space indent the old renderer used silently de-nested
        anything under an ordered item ('1. ' is 3 wide). `<ol start=N>` is
        honored like pandoc does."""
        ordered = n.tag == "ol"
        try:
            idx = int((n.attrs.get("start") or "1").strip())
        except ValueError:
            idx = 1
        lines: list[str] = []
        for li in n.children:
            if li.tag != "li":
                continue
            marker = f"{idx}. " if ordered else "- "
            idx += 1
            cont = indent + " " * len(marker)
            # order-preserving segmentation: leading inline run (or a lone
            # leading <p>, which pandoc unwraps) -> the item's head line;
            # every further child -> an indented continuation block.
            segments: list[tuple[str, object]] = []
            run: list[_Node] = []

            def flush():
                if run:
                    segments.append(("inline", list(run)))
                    run.clear()

            for c in li.children:
                if c.tag in ("ul", "ol"):
                    flush()
                    segments.append(("list", c))
                elif c.tag and not self._is_inline(c):
                    flush()
                    segments.append(("block", c))
                else:
                    run.append(c)
            flush()
            head = ""
            if segments and segments[0][0] == "inline":
                head = _collapse_ws(self._render_inline_nodes(segments[0][1])).strip()
                segments = segments[1:]
            elif segments and segments[0][0] == "block" and segments[0][1].tag == "p":
                head = _collapse_ws(
                    self._render_inline_nodes(segments[0][1].children)
                ).strip()
                segments = segments[1:]
            lines.append(indent + marker + head)
            for kind, payload in segments:
                if kind == "list":
                    lines.append(self._render_list(payload, cont))
                    continue
                if kind == "inline":
                    txt = _collapse_ws(self._render_inline_nodes(payload)).strip()
                    rendered = [txt] if txt else []
                else:
                    rendered = self._render_block(payload)
                for blk in rendered:
                    lines.append("")
                    for bl in blk.split("\n"):
                        lines.append((cont + bl) if bl else "")
        return "\n".join(lines)

    def _render_dl(self, n: _Node) -> str:
        """Definition list. GFM has no syntax for these; this follows
        pandoc's no-definition-lists fallback shape: the term as its own
        (bold) paragraph, each definition as an indented paragraph."""
        lines: list[str] = []
        for c in n.children:
            if c.tag == "dt":
                term = _collapse_ws(self._render_inline_nodes(c.children)).strip()
                if term:
                    if lines:
                        lines.append("")
                    lines.append(f"**{term}**")
            elif c.tag == "dd":
                inner = "\n\n".join(self._render_blocks(c.children)) or _collapse_ws(
                    self._render_inline_nodes(c.children)
                ).strip()
                for para in inner.split("\n"):
                    lines.append(("    " + para) if para else "")
        return "\n".join(lines)

    def _has_block_descendant(self, n: _Node, allow_table: bool = False) -> bool:
        for c in n.children:
            if c.tag == "table" and allow_table:
                # a nested table is rendered as single-line raw HTML inside
                # the pipe cell (one level of nesting, VERDICT r2 item 7) —
                # its own content never disqualifies the OUTER table
                continue
            if c.tag in _CELL_BLOCK_TAGS:
                return True
            if c.tag and self._has_block_descendant(c, allow_table):
                return True
        return False

    def _cell_not_inline(self, cell: _Node) -> bool:
        """True when a th/td cannot be expressed as one GFM pipe-table cell:
        any hard block content EXCEPT a nested table (serialized as inline
        raw HTML — pandoc's gfm writer likewise keeps the outer pipe table
        and inlines the inner one as HTML), >1 paragraph, or a paragraph
        mixed with other non-whitespace content (pandoc only unwraps a
        LONE <p>)."""
        if self._has_block_descendant(cell, allow_table=True):
            return True
        n_p = sum(1 for c in cell.children if c.tag == "p")
        if n_p > 1:
            return True
        if n_p == 1:
            for c in cell.children:
                if c.tag == "p":
                    continue
                if c.tag or c.raw.strip():
                    return True
        return False

    def _to_html(self, n: _Node) -> str:
        """Serialize a subtree back to HTML (raw-fallback path). Text nodes
        hold parser-DECODED text (convert_charrefs=True), so they must be
        re-escaped — emitting them verbatim would turn '&lt;script&gt;' in a
        cell into an active tag in the raw output."""
        if n.tag == "":
            return _html_mod.escape(n.raw, quote=False)
        open_tag = n.raw or f"<{n.tag}>"
        if n.tag in _VOID_TAGS:
            return open_tag
        inner = "".join(self._to_html(c) for c in n.children)
        return f"{open_tag}{inner}</{n.tag}>"

    def _render_table(self, n: _Node) -> str:
        # GFM pipe tables are strictly inline-per-cell: a cell holding a
        # nested table / list / code block cannot be expressed. pandoc's
        # gfm writer falls back to raw HTML for such tables — do the same.
        for tr_holder in n.children:
            rows_src = (
                tr_holder.children
                if tr_holder.tag in ("thead", "tbody", "tfoot")
                else [tr_holder]
            )
            for tr in rows_src:
                if tr.tag != "tr":
                    continue
                for cell in tr.children:
                    if cell.tag in ("th", "td") and self._cell_not_inline(cell):
                        return self._to_html(n)
        rows: list[list[str]] = []
        header: list[str] | None = None

        def walk_rows(node: _Node, in_thead: bool):
            nonlocal header
            for c in node.children:
                if c.tag == "thead":
                    walk_rows(c, True)
                elif c.tag in ("tbody", "tfoot"):
                    walk_rows(c, False)
                elif c.tag == "tr":
                    cells = [
                        _collapse_ws(self._render_inline_nodes(cell.children)).strip().replace("|", "\\|")
                        for cell in c.children
                        if cell.tag in ("th", "td")
                    ]
                    is_header = in_thead or all(cell.tag == "th" for cell in c.children if cell.tag in ("th", "td"))
                    if header is None and is_header and cells:
                        header = cells
                    else:
                        rows.append(cells)

        walk_rows(n, False)
        if header is None:
            if not rows:
                return ""
            header = rows.pop(0)
        width = max([len(header)] + [len(r) for r in rows]) if rows else len(header)
        header = header + [""] * (width - len(header))
        out = ["| " + " | ".join(header) + " |", "|" + "|".join(["---"] * width) + "|"]
        for r in rows:
            r = r + [""] * (width - len(r))
            out.append("| " + " | ".join(r) + " |")
        return "\n".join(out)

    # ---- inline level ------------------------------------------------

    def _render_inline_nodes(self, nodes: list[_Node]) -> str:
        return "".join(self._render_inline(c) for c in nodes)

    def _render_inline(self, n: _Node) -> str:
        if n.tag == "":
            return n.raw
        t = n.tag
        if t in ("strong", "b"):
            inner = self._render_inline_nodes(n.children)
            return f"**{inner.strip()}**" if inner.strip() else ""
        if t in ("em", "i"):
            inner = self._render_inline_nodes(n.children)
            return f"*{inner.strip()}*" if inner.strip() else ""
        if t == "code":
            inner = n.text()
            return f"`{inner}`" if inner else ""
        if t in ("s", "del", "strike"):
            inner = self._render_inline_nodes(n.children)
            return f"~~{inner.strip()}~~" if inner.strip() else ""
        if t == "a":
            href = n.attrs.get("href", "")
            inner = self._render_inline_nodes(n.children).strip()
            if not href:
                return inner
            return f"[{inner}]({href})"
        if t == "img":
            src = n.attrs.get("src", "") or ""
            alt = n.attrs.get("alt", "") or ""
            if alt in EMOJI_REPLACEMENTS:
                # raw tag so postProcess G1 maps it to Unicode (see module doc)
                return f'<img src="{src}" alt="{alt}" />'
            if not src:
                return ""
            return f"![{alt}]({src})"
        if t == "br":
            return "\n"
        if t == "input":
            # GFM task-list checkbox (pandoc gfm emits '- [ ] / - [x]');
            # any other input kind has no GFM form and is dropped
            if (n.attrs.get("type") or "").lower() == "checkbox":
                return "[x] " if "checked" in n.attrs else "[ ] "
            return ""
        if t == "table":
            # nested table inside a pipe-table cell: GFM cannot express it —
            # emit the whole inner table as ONE LINE of raw HTML (newlines
            # would break the pipe row)
            return _collapse_ws(self._to_html(n)).strip()
        if t in _DROP_TAGS:
            return ""
        if t in _RAW_INLINE_TAGS:
            # raw passthrough inline (pandoc keeps these as raw HTML in gfm)
            inner = self._render_inline_nodes(n.children)
            open_tag = n.raw or f"<{t}>"
            return f"{open_tag}{inner}</{t}>"
        # unknown inline tag: unwrap
        return self._render_inline_nodes(n.children)


def html_to_markdown(html: str) -> str:
    """Convert (pre-processed) HTML to GFM — pandoc-subset semantics."""
    root = _parse(html)
    return _Renderer().render_document(root)


_TITLE_RE = re.compile(r"<title[^>]*>([\s\S]*?)</title>", re.IGNORECASE)
_H1_RE = re.compile(r"<h1[^>]*>([\s\S]*?)</h1>", re.IGNORECASE)
_TAG_RE = re.compile(r"<[^>]+>")


def extract_title(html: str) -> str:
    """Page title: <title> if present, else first <h1> text, else ''."""
    m = _TITLE_RE.search(html)
    if not m:
        m = _H1_RE.search(html)
    if not m:
        return ""
    return _collapse_ws(_TAG_RE.sub("", m.group(1))).strip()
