"""Golden end-to-end fixtures: full Markdown output for representative
corpus documents, pinned as exact strings (SURVEY.md §5.2 item 3). Any
transform-semantics regression in the C->G chain fails here with a diff."""

from __future__ import annotations

import duckdb
import pytest

from confluence2md_spark.core import convert_document
from confluence2md_spark.sources.corpus import duckdb_raw_files_cte


@pytest.fixture(scope="module")
def contents():
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM '/root/testdata/sf0.001/documents.parquet'"
    )
    rows = con.execute(
        f"WITH raw_files AS ({duckdb_raw_files_cte()}) "
        "SELECT doc_id, content FROM raw_files WHERE doc_id IN (0, 1, 12)"
    ).fetchall()
    return {r[0]: r[1] for r in rows}


def test_golden_doc0(contents):
    # doc 0: QP-encoded part (%7==0), MIME attachment (%4==0), URL
    # attachment (%6==0), Notes section (%3==0), title 'Page 0'.
    r = convert_document(contents[0])
    assert r.status == "ok"
    md = r.markdown
    text0 = (
        "the fast key order sort table scan merge part window small hash "
        "scan join order batch batch batch stream spark window window dup"
    )
    expected = f"""# Page 0

{text0}

QP test: a = b

See [Page 1](/wiki/spaces/src0/pages/1/Page-1) and [Page 2](/wiki/spaces/src0/pages/2/Page-2).

## Details

By User 0

[spec-0.pdf](/download/attachments/0/spec-0.pdf)

### Notes

Additional notes.
"""
    assert md == expected
    assert r.authors == [("user0", "User 0")]
    assert [a[0] for a in r.attachments] == ["att-0.png"]


def test_golden_doc1_minimal(contents):
    # doc 1: 7bit, no attachment, no Notes.
    r = convert_document(contents[1])
    assert r.status == "ok"
    lines = r.markdown.splitlines()
    assert lines[0] == "# Page 1"
    assert "### Notes" not in r.markdown
    assert "QP test" not in r.markdown
    assert r.markdown.endswith("\n")
    assert "[Page 8](/wiki/spaces/" in r.markdown  # (1*7+1) % 500
    assert "[Page 5](/wiki/spaces/" in r.markdown  # (1*3+2) % 500


def test_golden_doc12_attachment_only_mime(contents):
    # doc 12: %4==0 (MIME attachment), %6==0 (URL attachment), %3==0 Notes.
    r = convert_document(contents[12])
    assert r.status == "ok"
    assert [a[0] for a in r.attachments] == ["att-12.png"]
    assert "[spec-12.pdf](/download/attachments/12/spec-12.pdf)" in r.markdown
    assert "### Notes" in r.markdown
