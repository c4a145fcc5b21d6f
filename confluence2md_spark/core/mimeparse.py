"""MIME decomposition for Confluence ``.doc`` exports.

Mirrors ``ExtractHTMLFromMIME`` (/root/reference/converter/mime.go:25-87)
but generalizes it: the reference walks parts and returns only the first
``text/html`` body; the KG pipeline also needs the non-HTML parts
(attachments → ``has_attachment`` triples), so :func:`split_mime` returns
every part as a record and :func:`extract_html_from_mime` reproduces the
reference's exact selection/decoding/error semantics on top of it.

Error taxonomy (string codes, never exceptions — rows are quarantined, not
crashed):
  ``ok``             HTML part found and decoded
  ``parse_error``    not parseable as an RFC-822 message (mime.go:33-36)
  ``not_multipart``  Content-Type is not multipart/* (mime.go:44-46)
  ``no_boundary``    multipart without boundary param (mime.go:48-51)
  ``no_html_part``   no text/html part in the message (mime.go:86)

Python's ``email`` package implements the same RFC-2045/822 family as Go's
``net/mail``/``mime/multipart`` (folded headers, boundary split,
quoted-printable soft line breaks / ``=3D`` escapes — pinned by
mime_test.go:75-76, 106-138, 235-264).
"""

from __future__ import annotations

import base64
import hashlib
import quopri
from dataclasses import dataclass, field
from email import message_from_string
from email.message import Message


@dataclass
class MimePart:
    part_index: int
    media_type: str  # lowercased, e.g. "text/html", "image/png"
    transfer_encoding: str  # lowercased, "" if absent
    charset: str
    filename: str
    headers: dict[str, str] = field(default_factory=dict)
    body: bytes = b""

    @property
    def body_sha256(self) -> str:
        return hashlib.sha256(self.body).hexdigest()


def _decode_part_body(payload: bytes, transfer_encoding: str) -> bytes:
    """Decode per Content-Transfer-Encoding.

    The reference applies quoted-printable iff the header says so
    (case-insensitive, mime.go:73) and otherwise passes bytes through
    (mime_test.go:235-264).  The KG pipeline additionally decodes base64
    attachment parts the reference skips (mime_test.go:275-280 fixture).
    """
    enc = transfer_encoding.lower()
    if enc == "quoted-printable":
        try:
            return quopri.decodestring(payload)
        except Exception:
            return payload
    if enc == "base64":
        try:
            return base64.b64decode(payload, validate=False)
        except Exception:
            return payload
    return payload


def _looks_like_message(content: str) -> bool:
    """Reject inputs Go's mail.ReadMessage would reject.

    ``email.message_from_string`` never raises — it happily treats arbitrary
    text as a headerless body — so we reproduce Go's strictness: the first
    non-empty line must look like a ``Key: value`` header (mime.go:33-36,
    mime_test.go:221-233 expects plain text to error).
    """
    for line in content.splitlines():
        if not line.strip():
            return False  # blank line before any header → no header block
        head = line.split(":", 1)
        if len(head) != 2:
            return False
        key = head[0]
        # RFC 5322 header field name: printable US-ASCII minus colon/space.
        return bool(key) and all(33 <= ord(c) <= 126 and c != ":" for c in key)
    return False


def split_mime(content: str) -> tuple[str, list[MimePart]]:
    """Parse one MIME document into (status, parts).

    Parts are returned in document order with 0-based ``part_index``
    (the explode source for the ``mime_parts`` table).
    """
    if not content or not _looks_like_message(content):
        return "parse_error", []
    try:
        msg: Message = message_from_string(content)
    except Exception:
        return "parse_error", []

    ctype = msg.get_content_type()  # defaults to text/plain when absent
    if not ctype.startswith("multipart/"):
        return "not_multipart", []
    if msg.get_boundary() in (None, ""):
        return "no_boundary", []

    parts: list[MimePart] = []
    idx = 0
    for sub in msg.walk():
        if sub is msg or sub.is_multipart():
            continue
        payload = sub.get_payload(decode=False)
        raw = payload.encode("utf-8", "surrogateescape") if isinstance(payload, str) else (payload or b"")
        enc = (sub.get("Content-Transfer-Encoding") or "").strip()
        body = _decode_part_body(raw, enc)
        parts.append(
            MimePart(
                part_index=idx,
                media_type=sub.get_content_type().lower(),
                transfer_encoding=enc.lower(),
                charset=(sub.get_content_charset() or ""),
                filename=(sub.get_filename() or sub.get_param("name") or ""),
                headers={k: str(v) for k, v in sub.items()},
                body=body,
            )
        )
        idx += 1
    return "ok", parts


def extract_html_from_mime(content: str) -> tuple[str, str]:
    """(status, html) — reference-exact selection.

    First part whose media type is exactly ``text/html`` wins (mime.go:69);
    QP decoded iff declared (mime.go:73-75); decoded with the declared
    charset (default UTF-8, errors replaced — Go reads bytes as-is,
    mime.go:77-82).
    """
    status, parts = split_mime(content)
    if status != "ok":
        return status, ""
    for p in parts:
        if p.media_type == "text/html":
            charset = p.charset or "utf-8"
            try:
                return "ok", p.body.decode(charset, errors="replace")
            except LookupError:
                return "ok", p.body.decode("utf-8", errors="replace")
    return "no_html_part", ""
