"""Weighted PageRank (operators/graph.py): python-mirror exactness,
reduction to the unweighted variant at uniform weights, and duplicate
edge-weight summing. sf oracle equality runs in test_entry_contract."""

from __future__ import annotations

from confluence2md_spark.operators.graph import (
    pagerank_micros,
    weighted_pagerank_micros,
)


def _mirror(edge_list, iters):
    ew = {}
    for s, d, w in edge_list:
        ew[(s, d)] = ew.get((s, d), 0) + w
    nodes = sorted({v for s, d in ew for v in (s, d)})
    outw = {}
    for (s, _), w in ew.items():
        outw[s] = outw.get(s, 0) + w
    r = {v: 1_000_000 for v in nodes}
    for _ in range(iters):
        sums = {v: 0 for v in nodes}
        for (s, d), w in ew.items():
            sums[d] += r[s] * w // outw[s]
        r = {v: 150_000 + sums[v] * 850_000 // 1_000_000 for v in nodes}
    return r


def test_weighted_pagerank_matches_python_mirror(spark):
    edge_list = [
        (1, 2, 3),
        (1, 3, 1),
        (2, 3, 2),
        (3, 1, 5),
        (3, 1, 2),  # duplicate edge: weights must sum (7 total)
        (2, 4, 1),
    ]
    edges = spark.createDataFrame(edge_list, ["subj", "obj", "w"])
    got = {
        r["page"]: r["rank_micros"]
        for r in weighted_pagerank_micros(edges, iters=5).collect()
    }
    assert got == _mirror(edge_list, 5)
    # 1 gets 7/9 of 3's mass plus nothing else; heavier than 4's trickle
    assert got[1] > got[4]


def test_uniform_weights_equal_unweighted(spark):
    edge_list = [(1, 2), (1, 3), (2, 3), (3, 1), (2, 4), (4, 1)]
    unweighted = spark.createDataFrame(edge_list, ["subj", "obj"])
    weighted = spark.createDataFrame(
        [(s, d, 1) for s, d in edge_list], ["subj", "obj", "w"]
    )
    a = {
        r["page"]: r["rank_micros"]
        for r in pagerank_micros(unweighted, iters=5).collect()
    }
    b = {
        r["page"]: r["rank_micros"]
        for r in weighted_pagerank_micros(weighted, iters=5).collect()
    }
    assert a == b
