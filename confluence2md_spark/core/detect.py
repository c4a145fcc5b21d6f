"""Confluence MIME export detection.

Mirrors ``IsConfluenceMIME`` (/root/reference/converter/mime.go:93-126):
scan at most the first 10 lines; the file is a Confluence export iff some
line starts with ``Date:``, some line starts with ``MIME-Version:``, and some
line contains ``Exported From Confluence``.  Prefix-match for the two
headers, substring-match for the marker — exactly the reference predicate
(mime.go:110-117), including the conjunction (mime.go:125).
"""

from __future__ import annotations

MIME_HEADER_SCAN_LIMIT = 10  # mime.go:17-22


def is_confluence_mime(content: str) -> bool:
    """True iff ``content`` looks like a MIME-encoded Confluence export.

    Operates on the in-memory string (the engine carries file bytes in the
    ``content`` column; there is no filesystem here, unlike mime.go:94-98).
    """
    if not content:
        return False
    has_date = False
    has_mime_version = False
    has_confluence_subject = False
    # splitlines() mirrors bufio.Scanner line semantics closely enough for
    # header lines (no \r\n vs \n distinction matters for prefix tests).
    for i, line in enumerate(content.splitlines()):
        if i >= MIME_HEADER_SCAN_LIMIT:
            break
        if line.startswith("Date:"):
            has_date = True
        if line.startswith("MIME-Version:"):
            has_mime_version = True
        if "Exported From Confluence" in line:
            has_confluence_subject = True
    return has_date and has_mime_version and has_confluence_subject
