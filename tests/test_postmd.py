"""Ports of postProcessMarkdown / balanceDetailsTags tests
(/root/reference/converter/markdown_test.go:70-260, 357-390, 581-692,
807-863, 919-947)."""

import pytest

from confluence2md_spark.core import balance_details_tags, post_process_markdown


@pytest.mark.parametrize(
    "inp,expect",
    [
        ('<img src="test" alt="(tick)" />', "✅"),
        ('<img src="test" alt="(error)" class="emoticon"/>', "❌"),
        ('<img alt="(blue star)" src="test.png">', "\U0001f6a7"),
        ("Great job! :celebration:", "Great job! \U0001f389"),
        ("Thanks :thumbsup:", "Thanks \U0001f44d"),
    ],
)
def test_emojis(inp, expect):
    assert expect in post_process_markdown(inp)


@pytest.mark.parametrize(
    "inp,expect",
    [
        (
            '<div class="confluence-information-macro confluence-information-macro-tip"><div class="confluence-information-macro-body">This is a tip</div></div>',
            "> **Tip:**",
        ),
        (
            '<div class="confluence-information-macro confluence-information-macro-note"><div class="confluence-information-macro-body">This is a note</div></div>',
            "> **Note:**",
        ),
        (
            '<div class="confluence-information-macro confluence-information-macro-warning"><div class="confluence-information-macro-body">This is a warning</div></div>',
            "> **Warning:**",
        ),
        (
            '<div class="confluence-information-macro confluence-information-macro-information"><div class="confluence-information-macro-body">Info content</div></div>',
            "> **Info:**",
        ),
    ],
)
def test_macros(inp, expect):
    assert expect in post_process_markdown(inp)


@pytest.mark.parametrize(
    "inp,expect",
    [
        ('<a href="https://example.com">Example</a>', "[Example](https://example.com)"),
        ('<a href="https://example.com" class="external-link" rel="nofollow">Example</a>', "[Example](https://example.com)"),
        ('<a href="https://example.com"><u>Example</u></a>', "[Example](https://example.com)"),
    ],
)
def test_links(inp, expect):
    assert expect in post_process_markdown(inp)


def test_html_entities():
    result = post_process_markdown('Tom &amp; Jerry &lt;3 &gt; love &quot;cheese&quot;')
    for expect in ["Tom & Jerry", "<3", ">", '"cheese"']:
        assert expect in result


def test_section1_cleanup():
    result = post_process_markdown('<div class="Section1">\n# Heading\nContent here\n</div>')
    assert "Section1" not in result
    assert "# Heading" in result


def test_toc_cleanup():
    result = post_process_markdown('<div class="toc-macro rbtoc1234567">\n- [Heading 1](#heading-1)\n- [Heading 2](#heading-2)\n</div>')
    assert "toc-macro" not in result
    assert "[Heading 1]" in result


def test_whitespace_normalization():
    assert "\n\n\n" not in post_process_markdown("Line 1\n\n\n\n\nLine 2")


def test_trailing_newline():
    # fuzz invariant (fuzz_test.go:251-253)
    for s in ["x", "", "a\nb", "# Heading"]:
        out = post_process_markdown(s)
        assert out.endswith("\n")


def test_escaped_html():
    assert r"\<br\>" not in post_process_markdown(r"Text\<br\>more text")
    out = post_process_markdown(r'\<div class="test"\>content\</div\>')
    assert r"\<div" not in out and r"\</div" not in out
    out = post_process_markdown(r"\<p\>paragraph\</p\>")
    assert r"\<p\>" not in out and r"\</p\>" not in out


def test_escaped_images():
    result = post_process_markdown(r'\<img src="test.png" alt="Test Image"\>')
    assert r"\<img" not in result
    assert "![" in result


def test_expander_sections():
    inp = '<div id="expander-123"><div id="expander-control-123"><span class="expand-control-icon">+</span><span class="expand-control-text">Click to expand</span></div><div id="expander-content-123">Hidden content here</div></div>'
    result = post_process_markdown(inp)
    assert "<details>" in result
    assert "<summary>" in result and "</summary>" in result
    assert "Click to expand" in result


def test_panel_divs():
    result = post_process_markdown('<div class="panel" style="border-width: 1px;"><div class="panelContent">Panel content here</div></div>')
    assert ">" in result
    assert "Panel content here" in result


def test_code_blocks():
    assert "syntaxhighlighter-pre" not in post_process_markdown("``` syntaxhighlighter-pre\ncode here\n```")
    assert "code panel" not in post_process_markdown('<div class="code panel pdl"><div class="codeContent panelContent pdl">code</div></div>')


def test_aui_icons():
    result = post_process_markdown('<span class="aui-icon aui-icon-small aui-iconfont-approve"></span> Approved')
    assert "aui-icon" not in result
    assert "Approved" in result


def test_nested_list_fix():
    assert "- - " not in post_process_markdown("- - Item 1\n- - Item 2")


def test_br_cleanup():
    assert "<br" not in post_process_markdown("Line 1<br>Line 2<br/>Line 3<br />Line 4")


@pytest.mark.parametrize(
    "inp,expect",
    [
        ("<details>\nContent\n</details>", "<details>\nContent\n</details>"),
        ("Content\n</details>", "Content\n"),
        ("<details>\nContent\n</details>\n</details>\n</details>", "<details>\nContent\n</details>\n\n"),
        # edge cases (markdown_test.go:807-863)
        ("Just plain text without any details tags", "Just plain text without any details tags"),
        ("<details>Content without closing", "<details>Content without closing"),
        ("<details>First</details><details>Second</details>", "<details>First</details><details>Second</details>"),
        ("<details><details>Nested</details></details>", "<details><details>Nested</details></details>"),
        ("<details>Content</details></details>More text</details>", "<details>Content</details>More text"),
        ("<</details>/details>", ""),
        ("<</details>/details></details>", ""),
        ("Hello</details>World", "HelloWorld"),
    ],
)
def test_balance_details(inp, expect):
    assert balance_details_tags(inp) == expect


def test_all_text_emojis():
    cases = {
        ":thumbsup:": "\U0001f44d", ":thumbsdown:": "\U0001f44e", ":star:": "⭐",
        ":fire:": "\U0001f525", ":rocket:": "\U0001f680", ":warning:": "⚠️",
        ":check:": "✅", ":cross:": "❌", ":celebration:": "\U0001f389",
        ":sparkles:": "✨", ":info:": "ℹ️", ":question:": "❓",
    }
    for code, emoji in cases.items():
        assert emoji in post_process_markdown(code)


def test_fuzz_invariants():
    # fuzz_test.go:241-266
    seeds = [
        "", " ", "\n", "# Heading", "Plain text",
        '<img class="expand-control-image" src="expand.png">',
        "</div></div></div>", "<div>Open", "</div>Orphan",
        "</span>orphan", "日本語", "Émoji 🎉",
        "</details>" * 100, "<details>" * 100, "<br>" * 100,
        "Line with trailing spaces   ", "Line with trailing tabs\t\t",
    ]
    for s in seeds:
        out = post_process_markdown(s)
        assert out == "" or out.endswith("\n")
        assert len(out) <= len(s) * 10 + 1000
        assert out.count("</details>") <= out.count("<details>")
