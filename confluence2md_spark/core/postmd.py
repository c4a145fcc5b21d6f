"""Markdown post-processing: clean Confluence artifacts from converted GFM.

Order-exact port of ``postProcessMarkdown`` + ``balanceDetailsTags``
(/root/reference/converter/markdown.go:321-551).  Every rule cites its
source lines; the cascade order is semantic (e.g. the 3×``</div>`` →
``</details>`` collapse must run before generic ``</div>`` removal,
markdown.go:431-434).
"""

from __future__ import annotations

import re

from .entities import HTML_ENTITY_ITEMS

# G1 — emoticon images → Unicode (markdown.go:322-337).  Trailing spaces are
# part of the replacement values in the reference.
EMOJI_REPLACEMENTS: dict[str, str] = {
    "(tick)": "\u2705 ",
    "(error)": "\u274c ",
    "(blue star)": "\U0001f6a7",
    "(warning)": "\u26a0\ufe0f ",
    "(info)": "\u2139\ufe0f ",
    "(question)": "\u2753 ",
    "(plus)": "\u2795 ",
    "(minus)": "\u2796 ",
    "(on)": "\U0001f4a1 ",
    "(off)": "\u2b55 ",
    "(star)": "\u2b50 ",
    "(thumbs up)": "\U0001f44d ",
    "(thumbs down)": "\U0001f44e ",
}

_IMG_ALT = re.compile(r'<img[^>]*alt="([^"]*)"[^>]*/?>')

_SECTION1 = re.compile(r'<div class="Section1">\s*')
_TOC_MACRO = re.compile(r'<div class="toc-macro[^"]*"[^>]*>\s*')

# G3 — info macros (markdown.go:362-387)
_MACROS = (
    (re.compile(r'<div class="confluence-information-macro confluence-information-macro-tip"[^>]*>\s*'), "\n> **Tip:** "),
    (re.compile(r'<div class="confluence-information-macro confluence-information-macro-note"[^>]*>\s*'), "\n> **Note:** "),
    (re.compile(r'<div class="confluence-information-macro confluence-information-macro-warning"[^>]*>\s*'), "\n> **Warning:** "),
    (re.compile(r'<div class="confluence-information-macro confluence-information-macro-information"[^>]*>\s*'), "\n> **Info:** "),
)

_AUI_ICON = re.compile(r'<span class="aui-icon[^"]*"[^>]*></span>\s*')
_MACRO_BODY = re.compile(r'<div class="confluence-information-macro-body">\s*')
_PANEL = re.compile(r'<div class="panel"[^>]*>\s*')
_PANEL_CONTENT = re.compile(r'<div class="panelContent"[^>]*>\s*')

# G6 — expanders (markdown.go:399-409)
_EXPANDER = re.compile(r'<div id="expander-\d+"[^>]*>\s*')
_EXPANDER_CONTROL = re.compile(r'<div id="expander-control-\d+"[^>]*>\s*')
_EXPAND_ICON_TEXT = re.compile(r'<span class="expand-control-icon">[^<]*</span><span class="expand-control-text">([^<]*)</span>\s*')
_EXPAND_TEXT = re.compile(r'<span class="expand-control-text">([^<]*)</span>\s*')
_EXPAND_ICON = re.compile(r'<span class="expand-control-icon">[^<]*</span>\s*')
_EXPANDER_CONTENT = re.compile(r'<div id="expander-content-\d+"[^>]*>\s*')
_NESTED_DETAILS = re.compile(r"</summary>\s*\n\s*<details>\s*\n")
_DETAILS_FENCE = re.compile(r"<details>\s*\n```")

# G7 — code panels (markdown.go:411-418)
_CODE_PANEL = re.compile(r'<div class="code panel[^"]*"[^>]*>\s*')
_CODE_CONTENT = re.compile(r'<div class="codeContent[^"]*"[^>]*>\s*')
_CODE_HEADER = re.compile(r'<div class="codeHeader[^"]*"[^>]*>\s*')
_FENCE_ATTRS = re.compile(r"```\s*\{[^}]*\}")

# G8 — HTML links → Markdown (markdown.go:420-429)
_HTML_LINK = re.compile(r'<a\s+href="([^"]*)"[^>]*>([^<]*)</a>')
_HTML_LINK_U = re.compile(r'<a\s+href="([^"]*)"[^>]*><u>([^<]*)</u></a>')
_U_TAG = re.compile(r"</?u>")

# G9 — closing-div collapse (markdown.go:431-437)
_DIV3 = re.compile(r"</div>\s*</div>\s*</div>\s*")
_DIV2 = re.compile(r"</div>\s*</div>\s*")
_SPAN_ANY = re.compile(r"</?span[^>]*>")

# G11 — escaped tags (markdown.go:444-479)
_ESC_BR = re.compile(r"\\<br\\?/?>")
_ESC_P = re.compile(r"\\</?p\\?>")
_ESC_DIV = re.compile(r"\\</?div[^>]*\\?>")
_ESC_SPAN = re.compile(r"\\</?span[^>]*\\?>")
_ESC_IMG = re.compile(r'\\<img[^>]*src="([^"]*)"[^>]*(?:alt="([^"]*)"|)[^>]*\\?>')
_IMG_SRC = re.compile(r'src="([^"]*)"')
_IMG_ALT_ATTR = re.compile(r'alt="([^"]*)"')
_ESC_ANY = re.compile(r"\\<[^>]*\\?>")

# G12 — nested list fix (markdown.go:481-483).  NOTE: no MULTILINE — Go RE2
# ``^`` anchors to start of text by default; the second pattern covers
# interior lines.
_NESTED_LIST_START = re.compile(r"^(\s*)- - ")
_NESTED_LIST = re.compile(r"\n(\s*)- - ")

# G13 — residual HTML (markdown.go:485-491)
_STRAY_BR = re.compile(r"<br\s*/?>")
_EMPTY_DIV = re.compile(r"<div[^>]*>\s*</div>")

_MULTI_NEWLINE = re.compile(r"\n{3,}")

# G16 — text emoji shortcodes (markdown.go:510-526)
TEXT_EMOJIS: dict[str, str] = {
    ":celebration:": "\U0001f389",
    ":thumbsup:": "\U0001f44d",
    ":thumbsdown:": "\U0001f44e",
    ":check:": "\u2705",
    ":cross:": "\u274c",
    ":warning:": "\u26a0\ufe0f",
    ":info:": "\u2139\ufe0f",
    ":question:": "\u2753",
    ":star:": "\u2b50",
    ":fire:": "\U0001f525",
    ":rocket:": "\U0001f680",
    ":sparkles:": "\u2728",
}


def _img_emoji(m: re.Match) -> str:
    alt = m.group(1)
    repl = EMOJI_REPLACEMENTS.get(alt)
    if repl is not None:
        return repl
    if "expand-control-image" in m.group(0):
        return ""
    return m.group(0)


def _escaped_img(m: re.Match) -> str:
    whole = m.group(0)
    src_m = _IMG_SRC.search(whole)
    alt_m = _IMG_ALT_ATTR.search(whole)
    src = src_m.group(1) if src_m else ""
    alt = alt_m.group(1) if (alt_m and alt_m.group(1)) else "image"
    if src == "":
        return ""
    return f"![{alt}]({src})"


def balance_details_tags(md: str) -> str:
    """Remove orphaned ``</details>`` (markdown.go:532-551).

    Removes the LAST occurrence and recounts each iteration — removal can
    splice surrounding chars into a new tag (fuzz_test.go:377-380;
    markdown_test.go:838-847 pins ``<</details>/details>`` → ``""``).
    """
    while True:
        open_count = md.count("<details>")
        close_count = md.count("</details>")
        if close_count <= open_count:
            break
        last = md.rfind("</details>")
        if last == -1:
            break
        md = md[:last] + md[last + len("</details>"):]
    return md


def post_process_markdown(md: str) -> str:
    # Literal guards (`'lit' in md`): each guard literal is a NECESSARY
    # substring of any match of the guarded pattern, so a miss skips the
    # rule without changing semantics — converted markdown rarely carries
    # the Confluence div/span/escape artifacts these rules target.

    # G1 (markdown.go:322-354)
    if "<img" in md:
        md = _IMG_ALT.sub(_img_emoji, md)

    # G2 (markdown.go:356-360)
    if "Section1" in md:
        md = _SECTION1.sub("", md)
    if "toc-macro" in md:
        md = _TOC_MACRO.sub("", md)

    # G3 (markdown.go:362-387)
    if "confluence-information-macro" in md:
        for pat, repl in _MACROS:
            md = pat.sub(repl, md)

    # G4 (markdown.go:389-393)
    if "aui-icon" in md:
        md = _AUI_ICON.sub("", md)
    if "confluence-information-macro-body" in md:
        md = _MACRO_BODY.sub("", md)

    # G5 (markdown.go:395-397)
    if '<div class="panel"' in md:
        md = _PANEL.sub("\n> ", md)
    if "panelContent" in md:
        md = _PANEL_CONTENT.sub("", md)

    # G6 (markdown.go:399-409) — original rule order preserved exactly
    if "expander-" in md:
        md = _EXPANDER.sub("\n<details>\n", md)
        md = _EXPANDER_CONTROL.sub("<summary>", md)
    if "expand-control" in md:
        md = _EXPAND_ICON_TEXT.sub(r"\1", md)
        md = _EXPAND_TEXT.sub(r"\1", md)
        md = _EXPAND_ICON.sub("", md)
    if "expander-" in md:
        md = _EXPANDER_CONTENT.sub("</summary>\n", md)
    if "</summary>" in md:
        md = _NESTED_DETAILS.sub("</summary>\n\n", md)
    if "<details>" in md:
        md = _DETAILS_FENCE.sub("\n```", md)

    # G7 (markdown.go:411-418)
    if "code panel" in md:
        md = _CODE_PANEL.sub("", md)
    if "codeContent" in md:
        md = _CODE_CONTENT.sub("", md)
    if "codeHeader" in md:
        md = _CODE_HEADER.sub("", md)
    if "```" in md:
        md = md.replace("``` syntaxhighlighter-pre", "```")
        md = _FENCE_ATTRS.sub("```", md)

    # G8 (markdown.go:420-429)
    if "<a" in md:
        md = _HTML_LINK.sub(r"[\2](\1)", md)
        md = _HTML_LINK_U.sub(r"[\2](\1)", md)
    if "<u>" in md or "</u>" in md:
        md = _U_TAG.sub("", md)

    # G9 (markdown.go:431-437)
    if "</div>" in md:
        md = _DIV3.sub("\n</details>\n\n", md)
        md = _DIV2.sub("\n\n", md)
        md = md.replace("</div>", "")
    if "span" in md:
        md = _SPAN_ANY.sub("", md)

    # G10 — entity cleanup, 2nd pass (markdown.go:439-442)
    if "&" in md:
        for entity, char in HTML_ENTITY_ITEMS:
            md = md.replace(entity, char)

    # G11 (markdown.go:444-479)
    if "\\<" in md:
        md = _ESC_BR.sub("\n", md)
        md = _ESC_P.sub("\n", md)
        md = _ESC_DIV.sub("", md)
        md = _ESC_SPAN.sub("", md)
        md = _ESC_IMG.sub(_escaped_img, md)
        md = _ESC_ANY.sub("", md)

    # G12 (markdown.go:481-483)
    if "- - " in md:
        md = _NESTED_LIST_START.sub(r"\1  - ", md)
        md = _NESTED_LIST.sub(r"\n\1  - ", md)

    # G13 (markdown.go:485-491)
    if "<br" in md:
        md = _STRAY_BR.sub("\n", md)
    if "<div" in md:
        md = _EMPTY_DIV.sub("", md)
    if "</div>" in md:  # '&lt;/div&gt;' decoded by G10 has no '<div'
        md = md.replace("</div>", "")

    # G14 (markdown.go:493-504)
    md = _MULTI_NEWLINE.sub("\n\n", md)
    md = "\n".join(line.rstrip(" \t") for line in md.split("\n"))
    md = md.strip() + "\n"

    # G15 (markdown.go:506-507)
    md = balance_details_tags(md)

    # G16 (markdown.go:509-526)
    for code, emoji in TEXT_EMOJIS.items():
        md = md.replace(code, emoji)

    return md
