"""Pure-Python transform semantics (no Spark imports).

Each module mirrors one stage of the reference pipeline
(/root/reference/converter/{mime.go,markdown.go}); regexes are compiled once
at import so executors pay compile cost once per Python worker, not per row
(the reference recompiles every pattern per call — markdown.go:194,340)."""

from .detect import is_confluence_mime
from .entities import decode_html_entities
from .mimeparse import MimePart, split_mime, extract_html_from_mime
from .prehtml import pre_process_html
from .html2md import html_to_markdown
from .postmd import post_process_markdown, balance_details_tags
from .convert import convert_html_to_markdown, convert_document

__all__ = [
    "is_confluence_mime",
    "decode_html_entities",
    "MimePart",
    "split_mime",
    "extract_html_from_mime",
    "pre_process_html",
    "html_to_markdown",
    "post_process_markdown",
    "balance_details_tags",
    "convert_html_to_markdown",
    "convert_document",
]
