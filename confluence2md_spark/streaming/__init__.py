"""Structured Streaming surface: incremental corpus ingest -> pages/triples.

The reference is a batch CLI (no streaming operators exist there —
SURVEY.md §2.J21); this module is the target-side extension that lets the
same per-document transforms run incrementally as new repo exports land."""

from .incremental import incremental_pages, run_incremental_build

__all__ = ["incremental_pages", "run_incremental_build"]
