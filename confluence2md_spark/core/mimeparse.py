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
import re as _re
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


# --------------------------------------------------------------- fast path --
#
# The ``email`` package costs ~40% of convert_document (cProfile, BASELINE
# notes): FeedParser state machine + Message.get_param re-tokenizes headers
# per access.  The overwhelmingly common shape — LF line endings, unfolded
# ``Key: value`` headers, one flat multipart with a quoted/plain boundary
# token, parts with plain parameter syntax — needs none of that machinery.
# ``_split_mime_fast`` handles exactly that shape with str.split/regex and
# returns None for ANYTHING it is not byte-for-byte sure about (folded
# headers, CR, nested multipart, RFC-2231 params, boundary-prefixed body
# lines, missing part blank line), in which case the email-module path runs
# unchanged.  Equivalence is pinned by a differential test over the corpus,
# the edge-case fixtures, and fuzz inputs (test_mime_edge_cases.py).

_HDR_RE = _re.compile(r"^([\x21-\x39\x3b-\x7e]+):\s*(.*)$")  # name w/o ':'
_PARAM_RE = _re.compile(r';\s*([A-Za-z0-9_-]+)\s*=\s*(?:"([^"\\]*)"|([^\s;"]+))')
_CT_RE = _re.compile(r"^\s*([A-Za-z0-9_-]+/[A-Za-z0-9._+-]+)\s*(;.*)?$", _re.S)


def _parse_header_block(lines: list[str], i: int) -> tuple[dict, list[tuple[str, str]], int] | None:
    """Parse ``Key: value`` lines from index i until a blank line; returns
    (lower-key dict, ordered (key, value) items, index past the blank line)
    or None when any line needs the slow path (folding, malformed)."""
    low: dict[str, str] = {}
    items: list[tuple[str, str]] = []
    while i < len(lines):
        line = lines[i]
        if line == "":
            return low, items, i + 1
        m = _HDR_RE.match(line)
        if not m or line[0] in " \t":
            return None
        k, v = m.group(1), m.group(2)
        if k.lower() in low:
            return None  # duplicate header: email keeps both; slow path
        low[k.lower()] = v
        items.append((k, v))
        i += 1
    return None  # no blank line terminating the block


def _ct_params(raw_ct: str) -> tuple[str, dict[str, str]] | None:
    """(media_type_lower, params) from a Content-Type value, or None for
    syntax the fast path must not guess at (RFC 2231 ``name*=``, comments,
    backslash escapes)."""
    if "(" in raw_ct or "*" in raw_ct or "\\" in raw_ct:
        return None
    m = _CT_RE.match(raw_ct)
    if not m:
        return None
    params: dict[str, str] = {}
    rest = m.group(2) or ""
    consumed = 0
    for pm in _PARAM_RE.finditer(rest):
        params[pm.group(1).lower()] = pm.group(2) if pm.group(2) is not None else pm.group(3)
        consumed = pm.end()
    if rest[consumed:].strip(" \t\n;"):
        return None  # unparsed residue → slow path
    return m.group(1).lower(), params


def _split_mime_fast(content: str) -> tuple[str, list[MimePart]] | None:
    if "\r" in content:
        return None
    lines = content.split("\n")
    parsed = _parse_header_block(lines, 0)
    if parsed is None:
        return None
    low, _, body_start = parsed
    raw_ct = low.get("content-type")
    if raw_ct is None:
        return "not_multipart", []
    ct = _ct_params(raw_ct)
    if ct is None:
        return None
    media_type, params = ct
    if not media_type.startswith("multipart/"):
        return "not_multipart", []
    boundary = params.get("boundary")
    if boundary in (None, ""):
        return "no_boundary", []
    delim, close = "--" + boundary, "--" + boundary + "--"

    # Split the body into parts on exact delimiter lines.  Any line merely
    # PREFIXED with the delimiter (transport padding aside) goes slow-path —
    # the email package has its own tolerance rules there.
    part_line_ranges: list[tuple[int, int]] = []
    cur_start: int | None = None
    closed = False
    for i in range(body_start, len(lines)):
        line = lines[i]
        stripped = line.rstrip(" \t")
        if stripped == delim:
            if cur_start is not None:
                part_line_ranges.append((cur_start, i))
            cur_start = i + 1
        elif stripped == close:
            if cur_start is not None:
                part_line_ranges.append((cur_start, i))
            cur_start = None
            closed = True
            break
        elif line.startswith(delim):
            return None
    if not closed:
        return None  # email tolerates a missing terminator; don't guess
    if not part_line_ranges:
        return None

    parts: list[MimePart] = []
    for idx, (s, e) in enumerate(part_line_ranges):
        sub = _parse_header_block(lines, s)
        if sub is None:
            return None
        slow, sitems, sbody = sub
        if sbody > e:
            return None
        raw_pct = slow.get("content-type")
        if raw_pct is None:
            p_media, p_params = "text/plain", {}
        else:
            pct = _ct_params(raw_pct)
            if pct is None:
                return None
            p_media, p_params = pct
        if p_media.startswith("multipart/") or p_media.startswith("message/"):
            return None  # nested structure: email walks recursively
        cd = slow.get("content-disposition")
        filename = ""
        if cd is not None:
            cdp = _ct_params("x/x" + ("; " + cd.split(";", 1)[1] if ";" in cd else ""))
            if cdp is None:
                return None
            filename = cdp[1].get("filename", "")
        if not filename:
            filename = p_params.get("name", "")
        enc = slow.get("content-transfer-encoding", "").strip()
        payload = "\n".join(lines[sbody:e])
        body = _decode_part_body(
            payload.encode("utf-8", "surrogateescape"), enc
        )
        parts.append(
            MimePart(
                part_index=idx,
                media_type=p_media,
                transfer_encoding=enc.lower(),
                charset=p_params.get("charset", "").lower(),
                filename=filename,
                headers={k: v for k, v in sitems},
                body=body,
            )
        )
    return "ok", parts


def split_mime(content: str) -> tuple[str, list[MimePart]]:
    """Parse one MIME document into (status, parts).

    Parts are returned in document order with 0-based ``part_index``
    (the explode source for the ``mime_parts`` table).
    """
    if not content or not _looks_like_message(content):
        return "parse_error", []
    fast = _split_mime_fast(content)
    if fast is not None:
        return fast
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
