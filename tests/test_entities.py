"""Ports of decodeHTMLEntities tests
(/root/reference/converter/markdown_test.go:392-468, 977-1018)."""

import pytest

from confluence2md_spark.core import decode_html_entities


@pytest.mark.parametrize(
    "inp,expect",
    [
        ("plain text without entities", "plain text without entities"),
        ("&lt;div&gt;content&lt;/div&gt;", "<div>content</div>"),
        ("&lt;Tom &amp; Jerry&gt;", "<Tom & Jerry>"),
        ("&#60;&quot;quoted&quot;&#62;", '<"quoted">'),
        ("&lt;&apos;apostrophe&apos;&gt;", "<'apostrophe'>"),
        ("&#x3C;tag&#x3E;", "<tag>"),
        ("&#60;tag&#62;", "<tag>"),
        ("&#x3c;lower&#x3e;", "<lower>"),
        ("&lt;p&gt;Hello &amp; &#x27;world&#x27;&lt;/p&gt;", "<p>Hello & 'world'</p>"),
        ("&lt;word&nbsp;word&gt;", "<word word>"),
        ("&#200;", "&#200;"),
        ("&#xC8;", "&#xC8;"),
        # edge cases (markdown_test.go:977-1018)
        ("&lt;test&gt;", "<test>"),
        ("&lt;&gt;&amp;", "<>&"),
        ("&unknown; &lt;test&gt;", "&unknown; <test>"),
        ("&#126; &#127; &#128;", "~ &#127; &#128;"),
        ("&#65; &#66; &#67;", "A B C"),
    ],
)
def test_decode_html_entities(inp, expect):
    assert decode_html_entities(inp) == expect


def test_passthrough_without_trigger():
    # fuzz invariant (fuzz_test.go:361-367): no &lt; / &# → identity
    for s in ["", "plain", "& standalone ampersand", "&gt; only gt", "&quot;q&quot;"]:
        assert decode_html_entities(s) == s


def test_overflow_and_invalid():
    for s in ["&#999999999999;", "&#;", "&#x;", "&#xG;", "&#0;", "&#x0;", "&"]:
        # must not raise; oversized/invalid stay undecoded
        out = decode_html_entities(s)
        assert "\x00" not in out
