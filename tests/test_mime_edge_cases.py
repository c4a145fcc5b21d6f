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


def _slow_split(content):
    """The email-module path with the fast path disabled."""
    import confluence2md_spark.core.mimeparse as mp

    saved = mp._split_mime_fast
    mp._split_mime_fast = lambda c: None
    try:
        return mp.split_mime(content)
    finally:
        mp._split_mime_fast = saved


def _assert_paths_agree(content):
    import confluence2md_spark.core.mimeparse as mp

    fast = mp._split_mime_fast(content) if content and mp._looks_like_message(content) else None
    slow = _slow_split(content)
    if fast is None:  # fast path declined — slow path is authoritative
        return False
    assert fast[0] == slow[0], (fast[0], slow[0])
    assert len(fast[1]) == len(slow[1])
    for a, b in zip(fast[1], slow[1]):
        for attr in (
            "part_index", "media_type", "transfer_encoding", "charset",
            "filename", "headers", "body",
        ):
            assert getattr(a, attr) == getattr(b, attr), (attr, getattr(a, attr), getattr(b, attr))
    return True


def test_fast_path_differential_on_corpus():
    """The str.split fast parser must agree with the email-module parser
    field-for-field, byte-for-byte on every corpus document (it claims the
    whole multipart class the corpus generates)."""
    import duckdb

    from confluence2md_spark.sources.corpus import duckdb_raw_files_cte

    con = duckdb.connect()
    con.execute(
        "create view documents as select * from "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    rows = con.execute(
        f"WITH raw_files AS ({duckdb_raw_files_cte()}) "
        "SELECT content FROM raw_files WHERE lang = 'confluence'"
    ).fetchall()
    assert rows
    claimed = sum(_assert_paths_agree(c) for (c,) in rows)
    assert claimed == len(rows)  # fast path must take ALL corpus docs


def test_fast_path_differential_on_adversarial_shapes():
    """Tricky shapes: either the fast path declines (slow path authoritative)
    or it matches exactly — asserted for both outcomes."""
    hdr = "MIME-Version: 1.0\n"
    shapes = [
        # folded header -> must decline
        hdr + 'Content-Type: multipart/related;\n boundary="B"\n\n--B\nContent-Type: text/html\n\n<p>x</p>\n--B--\n',
        # CR line endings -> must decline
        hdr.replace("\n", "\r\n") + 'Content-Type: multipart/related; boundary="B"\r\n\r\n--B\r\n\r\nx\r\n--B--\r\n',
        # boundary-prefixed body line -> must decline
        hdr + 'Content-Type: multipart/related; boundary="B"\n\n--B\nContent-Type: text/plain\n\n--Bx in body\n--B--\n',
        # missing terminator -> must decline
        hdr + 'Content-Type: multipart/related; boundary="B"\n\n--B\nContent-Type: text/plain\n\nbody\n',
        # unquoted boundary + trailing whitespace after delimiter -> may claim
        hdr + "Content-Type: multipart/related; boundary=B\n\n--B \nContent-Type: text/plain\n\nbody\n--B--\n",
        # empty part body
        hdr + 'Content-Type: multipart/related; boundary="B"\n\n--B\nContent-Type: text/plain\n\n\n--B--\n',
        # part with no headers
        hdr + 'Content-Type: multipart/related; boundary="B"\n\n--B\n\njust a body\n--B--\n',
        # base64 + filename in both places
        hdr + 'Content-Type: multipart/related; boundary="B"\n\n--B\nContent-Type: image/png; name="n.png"\nContent-Disposition: attachment; filename="f.png"\nContent-Transfer-Encoding: base64\n\naGVsbG8=\n--B--\n',
        # preamble and epilogue text
        hdr + 'Content-Type: multipart/related; boundary="B"\n\npreamble\n--B\nContent-Type: text/plain\n\nbody\n--B--\nepilogue\n',
        # charset/media-type case-insensitivity
        hdr + 'Content-Type: MULTIPART/Related; boundary="B"\n\n--B\nContent-Type: TEXT/Html; Charset="UTF-8"\n\n<p>x</p>\n--B--\n',
        # not multipart at all
        hdr + "Content-Type: text/plain\n\nhello\n",
    ]
    for s in shapes:
        _assert_paths_agree(s)


# -------------------------------------------------- conversion budget ----

_BUDGET_DOC = (
    _HDR
    + 'Content-Type: multipart/related; boundary="BOUND"\n\n'
    + "--BOUND\n"
    + "Content-Type: text/html; charset=\"UTF-8\"\n\n"
    + "<html><head><title>Budget</title></head><body><p>fine</p></body></html>\n"
    + "--BOUND--\n"
)


def test_convert_budget_size_cap_quarantines_deterministically():
    """Reference parity (markdown.go:19-20 semantics): an over-cap document
    quarantines as over_budget instead of stalling the batch — and the
    size guard is deterministic (same input, same status, sha kept)."""
    from confluence2md_spark.core.convert import convert_document

    r = convert_document(_BUDGET_DOC, max_bytes=10)
    assert r.status == "over_budget"
    assert r.content_sha256 == hashlib.sha256(_BUDGET_DOC.encode()).hexdigest()
    assert r.markdown == ""
    # same doc without the cap converts normally
    ok = convert_document(_BUDGET_DOC)
    assert ok.status == "ok" and "fine" in ok.markdown


def test_convert_budget_timeout_checks_stage_boundaries():
    """timeout_s=0 trips the first stage-boundary check: the document
    quarantines as over_budget rather than producing partial markdown."""
    from confluence2md_spark.core.convert import convert_document

    r = convert_document(_BUDGET_DOC, timeout_s=0.0)
    assert r.status == "over_budget"
    assert r.markdown == ""
    # generous budget: converts normally
    ok = convert_document(_BUDGET_DOC, timeout_s=120.0)
    assert ok.status == "ok"
