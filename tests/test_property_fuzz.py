"""Property-based fuzzing of the transform chain with hypothesis —
the reference's 6 Go fuzz targets (converter/fuzz_test.go) as generated-input
properties instead of fixed seed corpora. Derandomized + bounded so the
suite stays deterministic and fast.
"""

from __future__ import annotations

from hypothesis import given, settings, HealthCheck, strategies as st

from confluence2md_spark.core import (
    balance_details_tags,
    convert_document,
    decode_html_entities,
    is_confluence_mime,
    post_process_markdown,
    pre_process_html,
)

_SETTINGS = dict(
    max_examples=150,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow],
    deadline=None,
)

# Text skewed toward the interesting alphabet (tags, entities, markdown).
_fragments = st.sampled_from(
    [
        "<details>", "</details>", "</div>", "<div class=\"panel\">",
        "&lt;", "&#60;", "&amp;", "&#x3C;", "&#999;", "<span>", "</span>",
        "# H", "[a](b)", "![i](s)", "(tick)", ":rocket:", "<p>", "</p>",
        "<td>x<br>y</td>", "\n", " ", "=3D", "Date:", "MIME-Version:",
        "Exported From Confluence", "\\<br\\>", "- - item",
    ]
)
_texts = st.lists(_fragments | st.text(max_size=12), max_size=25).map("".join)


@given(_texts)
@settings(**_SETTINGS)
def test_no_panic_and_trailing_newline(s):
    # fuzz_test.go:16-118 — never raises; output always ends with \n.
    out = post_process_markdown(s)
    assert isinstance(out, str)
    assert out.endswith("\n")


@given(_texts)
@settings(**_SETTINGS)
def test_no_output_blowup(s):
    # fuzz_test.go invariant: |out| <= 10*|in| + 1000.
    out = post_process_markdown(s)
    assert len(out) <= 10 * len(s) + 1000


@given(_texts)
@settings(**_SETTINGS)
def test_details_never_overclosed(s):
    # fuzz_test.go:377-380 — after post-processing, closers <= openers.
    out = post_process_markdown(s)
    assert out.count("</details>") <= out.count("<details>")


@given(_texts)
@settings(**_SETTINGS)
def test_balance_never_grows(s):
    # fuzz_test.go:541-598 — balancing only removes text.
    assert len(balance_details_tags(s)) <= len(s)


@given(st.text(alphabet=st.characters(exclude_characters="&"), max_size=200))
@settings(**_SETTINGS)
def test_entity_passthrough_without_trigger(s):
    # markdown.go:129-131 / fuzz_test.go:361-367 — no '&lt;'/'&#' -> no-op.
    assert decode_html_entities(s) == s


@given(_texts)
@settings(**_SETTINGS)
def test_preprocess_total(s):
    out = pre_process_html(s)
    assert isinstance(out, str)
    # div balancing never leaves more closers than openers
    assert out.count("</div>") <= s.count("</div>")


@given(_texts)
@settings(**_SETTINGS)
def test_detect_and_convert_total(s):
    # whole-document entry points never raise on arbitrary input and the
    # status taxonomy is closed.
    is_confluence_mime(s)
    r = convert_document(s)
    assert r.status in {
        "ok", "not_confluence", "parse_error", "not_multipart",
        "no_boundary", "no_html_part",
    }
