"""Mention extraction + resolution (SURVEY §2.I I1 completion: anchor-text
mentions, not just titles)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from confluence2md_spark.operators.mentions import extract_mentions, resolve_mentions

PAGES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("status", StringType()),
        StructField("title", StringType()),
        StructField("markdown", StringType()),
        StructField(
            "authors",
            ArrayType(
                StructType(
                    [
                        StructField("username", StringType()),
                        StructField("display_name", StringType()),
                    ]
                )
            ),
        ),
    ]
)


def _pages(spark, rows):
    return spark.createDataFrame(rows, PAGES_SCHEMA)


@pytest.fixture(scope="module")
def pages(spark):
    md = (
        "# Alpha Guide\n\n"
        "See [Beta Overview](/wiki/spaces/S/pages/2/Beta-Overview) and "
        "[beta overviw](/wiki/spaces/S/pages/999/x).\n\n"
        "Get [spec.pdf](/download/attachments/1/spec.pdf) or "
        "[ext](https://example.com/a).\n"
    )
    return _pages(
        spark,
        [
            (1, "ok", "Alpha Guide", md, [("u1", "User One")]),
            (2, "ok", "Beta Overview", "# Beta Overview\n", []),
            (3, "ok", "Beta Overview", "# Beta Overview\n", []),  # dup title
            (4, "quarantined", "bad", "[x](/wiki/spaces/S/pages/1/y)", []),
        ],
    )


def test_extract_mentions_kinds_and_positions(pages):
    m = extract_mentions(pages).collect()
    by = {(r["doc_id"], r["kind"], r["pos"]): r for r in m}
    # document-order link sequence across kinds link/attachment/url
    assert by[(1, "link", 0)]["surface"] == "Beta Overview"
    assert by[(1, "link", 1)]["surface"] == "beta overviw"
    assert by[(1, "attachment", 2)]["surface"] == "spec.pdf"
    assert by[(1, "url", 3)]["target_raw"] == "https://example.com/a"
    assert by[(1, "userlink", 0)]["target_raw"] == "u1"
    assert by[(1, "title", 0)]["surface"] == "Alpha Guide"
    # quarantined pages contribute nothing
    assert not any(r["doc_id"] == 4 for r in m)
    # context preserves the raw markdown span for link mentions
    assert by[(1, "link", 0)]["context"].startswith("[Beta Overview](")


def test_resolve_exact_picks_canonical_min_over_dup_titles(spark, pages):
    cmap = spark.createDataFrame(
        [(1, 1), (2, 2), (3, 2)], ["doc_id", "canon_id"]
    )  # 3 aliases to 2
    res = {
        (r["doc_id"], r["pos"]): r
        for r in resolve_mentions(extract_mentions(pages), pages, cmap).collect()
    }
    r = res[(1, 0)]
    assert r["target_page"] == 2 and r["method"] == "exact"


def test_resolve_fuzzy_tier_catches_near_titles(spark, pages):
    # 'beta overviw' (typo) has no exact title match; word-token Jaccard vs
    # 'Beta Overview' is 1/3 < 0.8, so resolution correctly REFUSES it at
    # the default threshold but finds it (deterministically — token-blocked
    # inverted index, not probabilistic banding) at a permissive one.
    m = extract_mentions(pages)
    strict = resolve_mentions(m, pages, threshold=0.8).filter(F.col("pos") == 1).count()
    assert strict == 0
    loose = {
        (r["doc_id"], r["pos"]): r
        for r in resolve_mentions(m, pages, threshold=0.3).collect()
    }
    r = loose[(1, 1)]
    assert r["method"] == "fuzzy" and r["target_page"] in (2, 3)


def test_resolution_never_merges_pages_via_shared_anchor(spark):
    # Two distinct pages both link to surface 'Common Term' which matches a
    # third page's title: both mentions resolve to page 3, and pages 1/2
    # remain distinct targets themselves (no component merge side effect).
    md = "[Common Term](/wiki/spaces/S/pages/3/Common-Term)"
    pages = _pages(
        spark,
        [
            (1, "ok", "One", md, []),
            (2, "ok", "Two", md, []),
            (3, "ok", "Common Term", "# Common Term\n", []),
        ],
    )
    res = resolve_mentions(extract_mentions(pages), pages).collect()
    assert {(r["doc_id"], r["target_page"]) for r in res} == {(1, 3), (2, 3)}

def test_fuzzy_scores_against_best_alias_title(spark):
    """Two DISTINCT normalized titles aliased to ONE canonical page: the
    fuzzy tier must score the surface against EACH title and keep the max,
    not an arbitrary survivor of a pre-score (snorm, target_page) dedup
    (ADVICE r2). Surface 'old release notes 2024' has Jaccard 0.75 vs
    'Release Notes 2024' but 0.167 vs its alias 'Release Archive Dump' —
    both candidates share the token 'release', so the old code could keep
    the wrong token set and drop the match at threshold 0.7."""
    md = "[old release notes 2024](/wiki/spaces/S/pages/9/x)"
    pages = _pages(
        spark,
        [
            (1, "ok", "One", md, []),
            (2, "ok", "Release Notes 2024", "# A\n", []),
            (3, "ok", "Release Archive Dump", "# B\n", []),
        ],
    )
    cmap = spark.createDataFrame([(2, 2), (3, 2)], ["doc_id", "canon_id"])
    res = [
        r
        for r in resolve_mentions(
            extract_mentions(pages), pages, cmap, threshold=0.7
        ).collect()
        if r["doc_id"] == 1 and r["method"] == "fuzzy"
    ]
    assert len(res) == 1 and res[0]["target_page"] == 2
