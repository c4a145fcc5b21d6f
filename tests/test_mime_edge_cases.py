"""MIME edge cases from the reference fixtures not covered by the basic
suite: folded (continuation) headers (mime_test.go:75-76), base64 attachment
parts (mime_test.go:266-301), filename via Content-Disposition vs
Content-Type name param, charset fallbacks."""

from __future__ import annotations

import base64
import hashlib

from confluence2md_spark.core import extract_html_from_mime, split_mime

_HDR = (
    "Date: Wed, 01 Jan 2025 00:00:00 +0000\n"
    "MIME-Version: 1.0\n"
    "Subject: Exported From Confluence\n"
)


def test_folded_content_type_header():
    # Content-Type folded across two lines (RFC 822 continuation; the
    # reference fixture folds exactly like this, mime_test.go:75-76).
    msg = (
        _HDR
        + 'Content-Type: multipart/related;\n boundary="BOUND"\n\n'
        + "--BOUND\n"
        + "Content-Type: text/html;\n charset=\"UTF-8\"\n\n"
        + "<html><body><p>folded ok</p></body></html>\n"
        + "--BOUND--\n"
    )
    status, html = extract_html_from_mime(msg)
    assert status == "ok"
    assert "folded ok" in html


def test_base64_attachment_part_decoded_and_hashed():
    payload = b"\x89PNG\r\n\x1a\nfakebytes"
    b64 = base64.b64encode(payload).decode()
    msg = (
        _HDR
        + 'Content-Type: multipart/related; boundary="BOUND"\n\n'
        + "--BOUND\n"
        + 'Content-Type: text/html; charset="UTF-8"\n\n'
        + "<html><body>x</body></html>\n"
        + "--BOUND\n"
        + 'Content-Type: image/png; name="pic.png"\n'
        + "Content-Transfer-Encoding: base64\n\n"
        + b64
        + "\n--BOUND--\n"
    )
    status, parts = split_mime(msg)
    assert status == "ok"
    img = [p for p in parts if p.media_type == "image/png"][0]
    assert img.body == payload  # decoded, not the b64 text
    assert img.filename == "pic.png"
    assert img.body_sha256 == hashlib.sha256(payload).hexdigest()
    # the reference skips this part for html extraction (mime.go:69)
    assert extract_html_from_mime(msg)[0] == "ok"


def test_filename_from_content_disposition():
    msg = (
        _HDR
        + 'Content-Type: multipart/related; boundary="B"\n\n'
        + "--B\n"
        + "Content-Type: application/pdf\n"
        + 'Content-Disposition: attachment; filename="spec.pdf"\n\n'
        + "PDFDATA\n"
        + "--B--\n"
    )
    status, parts = split_mime(msg)
    assert status == "ok"
    assert parts[0].filename == "spec.pdf"


def test_unknown_charset_falls_back_to_utf8():
    msg = (
        _HDR
        + 'Content-Type: multipart/related; boundary="B"\n\n'
        + "--B\n"
        + 'Content-Type: text/html; charset="x-nonexistent-charset"\n\n'
        + "<html><body>fallback</body></html>\n"
        + "--B--\n"
    )
    status, html = extract_html_from_mime(msg)
    assert status == "ok"
    assert "fallback" in html


def test_first_html_part_wins():
    # mime.go:69: FIRST text/html part is the page; later ones ignored.
    msg = (
        _HDR
        + 'Content-Type: multipart/related; boundary="B"\n\n'
        + "--B\nContent-Type: text/html\n\n<html><body>first</body></html>\n"
        + "--B\nContent-Type: text/html\n\n<html><body>second</body></html>\n"
        + "--B--\n"
    )
    status, html = extract_html_from_mime(msg)
    assert status == "ok"
    assert "first" in html and "second" not in html
