"""Link prediction (operators/linkpred.py): python mirror of the exact
integer Adamic-Adar arithmetic, structural sanity, the middle-degree cap,
and twin agreement. sf oracle equality runs in test_entry_contract."""

from __future__ import annotations

import math

import pytest

from confluence2md_spark.operators.linkpred import (
    link_prediction,
    link_prediction_sql_duck,
)

# a small graph with an obvious missing link: x and y share middles m1, m2
# (and m1 also bridges to the hub h, which touches everything)
_EDGES = [
    ("x", "m1"),
    ("x", "m2"),
    ("y", "m1"),
    ("y", "m2"),
    ("m1", "h"),
    ("x", "h"),
    ("y", "h"),
    ("z", "h"),
    ("z", "m2"),
]


def _mirror(edge_list, max_degree, topk):
    und = sorted({tuple(sorted(p)) for p in edge_list if p[0] != p[1]})
    adj: dict[str, set[str]] = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    scores: dict[tuple[str, str], list[int]] = {}
    for z, nbrs in adj.items():
        d = len(nbrs)
        if d < 2 or d > max_degree:
            continue
        term = 10**12 // math.floor(10**6 * math.log(d))
        ns = sorted(nbrs)
        for i in range(len(ns)):
            for j in range(i + 1, len(ns)):
                cn, aa = scores.setdefault((ns[i], ns[j]), [0, 0])
                scores[(ns[i], ns[j])] = [cn + 1, aa + term]
    rows = [
        (a, b, cn, aa)
        for (a, b), (cn, aa) in scores.items()
        if (a, b) not in set(und)
    ]
    rows.sort(key=lambda r: (-r[3], r[0], r[1]))
    return rows[:topk]


def test_linkpred_matches_python_mirror(spark):
    edges = spark.createDataFrame(_EDGES, ["subj", "obj"])
    got = [tuple(r) for r in link_prediction(edges, topk=50).collect()]
    assert got == _mirror(_EDGES, 64, 50)
    # structure: the two 3-common-neighbor pairs are predicted, no
    # existing edge appears, and z's low degree (big 1/ln term) puts
    # (h, m2) — whose middles include z — above (x, y)
    pairs = [r[:2] for r in got]
    assert pairs[0] == ("h", "m2")
    assert ("x", "y") in pairs
    assert not set(pairs) & {tuple(sorted(p)) for p in _EDGES}


def test_linkpred_degree_cap_drops_hub_middles(spark):
    edges = spark.createDataFrame(_EDGES, ["subj", "obj"])
    # h has degree 4: capping at 3 removes every wedge through the hub
    got = [
        tuple(r)
        for r in link_prediction(edges, max_degree=3, topk=50).collect()
    ]
    assert got == _mirror(_EDGES, 3, 50)
    # the (x, y) wedge through h is gone: cn drops from 3 (uncapped) to 2
    cn = {r[:2]: r[2] for r in got}
    assert cn[("x", "y")] == 2


def test_linkpred_degree_one_node_never_divides_by_zero(spark):
    """Planted pendant node (degree 1): ln(1)=0, so if the integer AA
    term is ever projected for it the DIV raises DIVIDE_BY_ZERO under
    ANSI mode — the exact plan-dependent failure the round-4 driver hit.
    The d >= 2 filter in link_prediction makes the projection safe
    regardless of where Catalyst evaluates it, and the pendant cannot be
    a middle, so results are unchanged."""
    edges = spark.createDataFrame(
        _EDGES + [("pendant", "h")], ["subj", "obj"]
    )
    got = [tuple(r) for r in link_prediction(edges, topk=50).collect()]
    assert got == _mirror(_EDGES + [("pendant", "h")], 64, 50)
    # the pendant shows up in predictions only via middles, never as one
    assert any("pendant" in r[:2] for r in got)


def test_linkpred_twin(spark):
    duckdb = pytest.importorskip("duckdb")
    edges = spark.createDataFrame(_EDGES, ["subj", "obj"])
    got = [tuple(r) for r in link_prediction(edges, topk=50).collect()]
    vals = ", ".join(f"('{a}', '{b}')" for a, b in _EDGES)
    sql = link_prediction_sql_duck(
        f"SELECT * FROM (VALUES {vals}) AS t(subj, obj)", topk=50
    )
    twin = [tuple(r) for r in duckdb.connect().execute(sql).fetchall()]
    assert got == twin
