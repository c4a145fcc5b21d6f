"""Ports of IsConfluenceMIME / ExtractHTMLFromMIME tests
(/root/reference/converter/mime_test.go)."""

from confluence2md_spark.core import (
    extract_html_from_mime,
    is_confluence_mime,
    split_mime,
)

VALID = """Date: Wed, 7 Jan 2026 01:29:00 +0000 (UTC)
Message-ID: <1234567890.123.1234567890123@test>
Subject: Exported From Confluence
MIME-Version: 1.0
Content-Type: multipart/related;
\tboundary="----=_Part_123_456789.123456789"

------=_Part_123_456789.123456789
Content-Type: text/html; charset=UTF-8
Content-Transfer-Encoding: quoted-printable

<html><head><title>Test</title></head><body><h1>Hello World</h1></body></html>
------=_Part_123_456789.123456789--
"""


def test_is_confluence_mime_valid():
    assert is_confluence_mime(VALID)


def test_is_confluence_mime_plain_text():
    assert not is_confluence_mime("This is just plain text.\nNot a MIME message at all.\n")


def test_is_confluence_mime_partial_headers():
    # mime_test.go:303-364
    only_date = "Date: Wed, 7 Jan 2026 01:29:00 +0000 (UTC)\nContent-Type: text/plain\n\nSome content\n"
    assert not is_confluence_mime(only_date)
    missing_subject = "Date: Wed, 7 Jan 2026 01:29:00 +0000 (UTC)\nMIME-Version: 1.0\nContent-Type: text/plain\n\nSome content\n"
    assert not is_confluence_mime(missing_subject)
    wrong_subject = "Date: Wed, 7 Jan 2026 01:29:00 +0000 (UTC)\nMIME-Version: 1.0\nSubject: Random Email Subject\n\nSome content\n"
    assert not is_confluence_mime(wrong_subject)


def test_is_confluence_mime_headers_after_limit():
    # headers appearing after the 10-line scan window must NOT count
    # (fuzz_test.go:568)
    content = "X-Header: value\n" * 15 + "Date: x\nMIME-Version: 1.0\nSubject: Exported From Confluence\n"
    assert not is_confluence_mime(content)


def test_extract_html_basic():
    status, html = extract_html_from_mime(VALID)
    assert status == "ok"
    assert "<h1>Hello World</h1>" in html


def test_extract_html_quoted_printable():
    # mime_test.go:106-138 — =3D decodes to '='
    content = VALID.replace(
        "<html><head><title>Test</title></head><body><h1>Hello World</h1></body></html>",
        "<html><body>Test =3D Value</body></html>",
    )
    status, html = extract_html_from_mime(content)
    assert status == "ok"
    assert "Test = Value" in html


def test_extract_html_qp_soft_linebreak():
    content = VALID.replace(
        "<html><head><title>Test</title></head><body><h1>Hello World</h1></body></html>",
        "<html><body>long li=\nne</body></html>",
    )
    status, html = extract_html_from_mime(content)
    assert status == "ok"
    assert "long line" in html


def test_extract_html_no_transfer_encoding():
    # mime_test.go:235-264 — body read as-is
    content = """Date: Wed, 7 Jan 2026 01:29:00 +0000 (UTC)
Subject: Exported From Confluence
MIME-Version: 1.0
Content-Type: multipart/related;
\tboundary="----=_Part_1"

------=_Part_1
Content-Type: text/html; charset=UTF-8

<html><body><h1>Direct Content</h1></body></html>
------=_Part_1--
"""
    status, html = extract_html_from_mime(content)
    assert status == "ok"
    assert "Direct Content" in html


def test_extract_html_multiple_parts():
    # mime_test.go:266-301 — base64 image part before the HTML part
    content = """Date: Wed, 7 Jan 2026 01:29:00 +0000 (UTC)
Subject: Exported From Confluence
MIME-Version: 1.0
Content-Type: multipart/related;
\tboundary="----=_Part_1"

------=_Part_1
Content-Type: image/png
Content-Transfer-Encoding: base64

iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mNk+M9QDwADhgGAWjR9awAAAABJRU5ErkJggg==
------=_Part_1
Content-Type: text/html; charset=UTF-8
Content-Transfer-Encoding: quoted-printable

<html><body><h1>After Image Part</h1></body></html>
------=_Part_1--
"""
    status, html = extract_html_from_mime(content)
    assert status == "ok"
    assert "After Image Part" in html
    # the pipeline also surfaces the attachment part (reference skips it)
    status, parts = split_mime(content)
    assert status == "ok"
    assert [p.media_type for p in parts] == ["image/png", "text/html"]
    assert parts[0].transfer_encoding == "base64"
    assert parts[0].body.startswith(b"\x89PNG")


def test_error_taxonomy():
    # mime_test.go:140-233
    non_multipart = "Date: Wed, 7 Jan 2026 01:29:00 +0000 (UTC)\nMIME-Version: 1.0\nSubject: Test\nContent-Type: text/plain; charset=UTF-8\n\nThis is not a multipart message.\n"
    assert extract_html_from_mime(non_multipart)[0] == "not_multipart"

    no_boundary = "Date: Wed, 7 Jan 2026 01:29:00 +0000 (UTC)\nMIME-Version: 1.0\nSubject: Test\nContent-Type: multipart/related\n\nThis has no boundary.\n"
    assert extract_html_from_mime(no_boundary)[0] == "no_boundary"

    invalid = "This is not a valid MIME message at all.\nNo headers, no structure.\n"
    assert extract_html_from_mime(invalid)[0] == "parse_error"

    no_html = """Date: Wed, 7 Jan 2026 01:29:00 +0000 (UTC)
Subject: Exported From Confluence
MIME-Version: 1.0
Content-Type: multipart/related;
\tboundary="----=_Part_1"

------=_Part_1
Content-Type: text/plain; charset=UTF-8

Just plain text, no HTML
------=_Part_1--
"""
    assert extract_html_from_mime(no_html)[0] == "no_html_part"


def test_fuzz_seeds_no_crash():
    # fuzz_test.go:446-538 — malformed inputs must never raise
    seeds = [
        "",
        "Date: Wed, 7 Jan 2026 01:29:00 +0000\nMIME-Version: 1.0\n\n",
        "Just plain text\nNo MIME here\n",
        "Date: Wed, 7 Jan 2026\n",
        "Content-Type: text/html\n\nContent",
        'Content-Type: multipart/related; boundary=\n\nBody',
        "Content-Type: multipart/related\n\nNo boundary param",
        "Content-Type: text/plain\n\nPlain content",
        "Content-Type: application/json\n\n{}",
        'Date: Wed, 7 Jan 2026\nContent-Type: multipart/related; boundary="test"\n\n--test\nContent-Type: text/html\n\n<html>',
        "\x00\x01\x02\x03",
        "Header: value\n\n\x00\x01\x02",
        "Header: " + "x" * 10000 + "\n\nBody",
        "Subject: 日本語\n\nBody",
        'Content-Type: multipart/related; boundary=""\n\n',
        'Content-Type: multipart/related; boundary="---"\n\n------\n',
    ]
    for s in seeds:
        status, _ = extract_html_from_mime(s)
        assert isinstance(status, str)
        assert isinstance(is_confluence_mime(s), bool)
