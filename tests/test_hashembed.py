"""Feature-hashing embeddings (functions/hashembed.py): portable-hash
bucket agreement with DuckDB, determinism, and the text->vector->cosine
ANN bridge on a planted near-dup pair."""

from __future__ import annotations

import math

import duckdb

from confluence2md_spark.functions.hashembed import (
    DIM,
    dense_rows,
    hashed_tf,
    hashed_tf_sql_duck,
)


def _poly(tok: str) -> int:
    h = 0
    for ch in tok:
        h = (h * 31 + ord(ch)) % 2147483647
    return h


DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy cat"),  # near-dup of 0
    (2, "completely different words about spark pipelines and parquet"),
    (3, "single"),
]


def _df(spark):
    return spark.createDataFrame(DOCS, "doc_id LONG, text STRING")


def test_buckets_match_reference_hash(spark):
    rows = hashed_tf(_df(spark)).collect()
    want = {}
    for doc_id, text in DOCS:
        for tok in text.strip().lower().split():
            key = (doc_id, _poly(tok) % DIM)
            want[key] = want.get(key, 0) + 1
    got = {(r["doc_id"], r["bucket"]): r["tf"] for r in rows}
    assert got == want


def test_duckdb_twin_matches(spark):
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", DOCS)
    want = sorted(
        tuple(r) for r in con.execute(hashed_tf_sql_duck()).fetchall()
    )
    got = sorted(
        (r["doc_id"], r["bucket"], r["tf"])
        for r in hashed_tf(_df(spark)).collect()
    )
    assert got == want


def _cos(a, b):
    dot = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return dot / (na * nb)


def test_ann_bridge_planted_neardup(spark):
    vecs = dense_rows(hashed_tf(_df(spark)).collect())
    assert set(vecs) == {0, 1, 2, 3}
    sim_dup = _cos(vecs[0], vecs[1])
    assert sim_dup > 0.85
    assert sim_dup > _cos(vecs[0], vecs[2]) + 0.3
    assert sim_dup > _cos(vecs[1], vecs[2]) + 0.3
