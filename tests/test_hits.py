"""HITS hubs & authorities (operators/graph.py hits_micros): python
mirror of the exact integer half-steps, structural sanity on a
hub/authority-shaped graph, and twin agreement. sf oracle equality runs
in test_entry_contract."""

from __future__ import annotations

import pytest

from confluence2md_spark.operators.graph import hits_micros, hits_sql_duck

# two hubs (h1, h2) pointing at shared authorities (x, y, z); a stray
# edge so the graph isn't perfectly bipartite
_EDGES = [
    ("h1", "x"),
    ("h1", "y"),
    ("h1", "z"),
    ("h2", "x"),
    ("h2", "y"),
    ("x", "y"),
]


def _mirror(edge_list, iters):
    e = sorted(set(edge_list))
    nodes = sorted({v for p in e for v in p})
    auth = {v: 1_000_000 for v in nodes}
    hub = {v: 1_000_000 for v in nodes}
    for _ in range(iters):
        raw = {v: 0 for v in nodes}
        for s, d in e:
            raw[d] += hub[s]
        mx = max(raw.values())
        auth = {v: raw[v] // (mx // 1_000_000) for v in nodes}
        raw = {v: 0 for v in nodes}
        for s, d in e:
            raw[s] += auth[d]
        mx = max(raw.values())
        hub = {v: raw[v] // (mx // 1_000_000) for v in nodes}
    return auth, hub


def test_hits_matches_python_mirror(spark):
    edges = spark.createDataFrame(_EDGES, ["subj", "obj"])
    rows = hits_micros(edges, iters=4).collect()
    got_a = {r["page"]: r["auth_micros"] for r in rows}
    got_h = {r["page"]: r["hub_micros"] for r in rows}
    want_a, want_h = _mirror(_EDGES, 4)
    assert got_a == want_a
    assert got_h == want_h
    # structure: y (in-degree 3) is the top authority; h1 (out-degree 3,
    # all to authorities) is the top hub; pure-sink z has zero hub mass
    assert got_a["y"] == max(got_a.values())
    assert got_h["h1"] == max(got_h.values())
    assert got_h["z"] == 0


def test_hits_topk_order(spark):
    edges = spark.createDataFrame(_EDGES, ["subj", "obj"])
    rows = hits_micros(edges, iters=4, topk=3).collect()
    want_a, _ = _mirror(_EDGES, 4)
    want = sorted(want_a.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    assert [(r["page"], r["auth_micros"]) for r in rows] == want


def test_hits_twin(spark):
    duckdb = pytest.importorskip("duckdb")
    edges = spark.createDataFrame(_EDGES, ["subj", "obj"])
    got = [
        tuple(r) for r in hits_micros(edges, iters=4, topk=10).collect()
    ]
    vals = ", ".join(f"('{a}', '{b}')" for a, b in _EDGES)
    sql = hits_sql_duck(
        f"SELECT * FROM (VALUES {vals}) AS t(subj, obj)", iters=4, topk=10
    )
    twin = [tuple(r) for r in duckdb.connect().execute(sql).fetchall()]
    assert got == twin
