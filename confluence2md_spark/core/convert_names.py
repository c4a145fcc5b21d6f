"""Output-name mapping (A5).

Mirrors ``generateOutputPath`` semantics (/root/reference/main.go:260-272):
``.doc`` → ``.md`` on the basename, and every ``+`` becomes ``-``.
Expressed both as a pure function (tests/goldens) and as the regex pair the
Spark layer runs JVM-side via ``regexp_replace`` (SURVEY.md §2.A5).
"""

from __future__ import annotations

import re

DOC_TO_MD_PATTERN = r"\.doc$"
PLUS_PATTERN = r"\+"

_DOC_RE = re.compile(DOC_TO_MD_PATTERN)


def output_name(path: str) -> str:
    out = _DOC_RE.sub(".md", path)
    return out.replace("+", "-")
