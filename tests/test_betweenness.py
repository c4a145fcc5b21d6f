"""Seeded betweenness (operators/betweenness.py): brute-force Brandes
mirror in flooring micros, depth raise, DuckDB twin agreement. The
sf-graph oracle equality runs in check_contract."""

from __future__ import annotations

from collections import defaultdict, deque

import duckdb
import pytest

from confluence2md_spark.operators.betweenness import (
    MICROS,
    betweenness_micros,
    betweenness_sql_duck,
)


def _brute(edges, seeds):
    """Brandes dependency accumulation, floor-micros, per-seed BFS."""
    adj = defaultdict(set)
    for a, b in edges:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    bc = defaultdict(int)
    for s in seeds:
        if s not in adj:
            continue
        dist = {s: 0}
        sigma = {s: 1}
        levels = defaultdict(list)
        levels[0].append(s)
        q = deque([s])
        while q:
            v = q.popleft()
            for u in sorted(adj[v]):
                if u not in dist:
                    dist[u] = dist[v] + 1
                    levels[dist[u]].append(u)
                    q.append(u)
                if dist[u] == dist[v] + 1:
                    sigma[u] = sigma.get(u, 0) + sigma[v]
        delta = defaultdict(int)
        for lvl in sorted(levels, reverse=True):
            if lvl == 0:
                break
            for w in levels[lvl]:
                for v in adj[w]:
                    if dist.get(v) == lvl - 1:
                        delta[v] += (sigma[v] * (MICROS + delta[w])) // sigma[w]
        for v, d in delta.items():
            if v != s:
                bc[v] += d
    return dict(bc)


def _df(spark, edges):
    return spark.createDataFrame(
        [(f"n{a:03d}", f"n{b:03d}") for a, b in edges], ["subj", "obj"]
    )


def _seed_df(spark, seeds):
    return spark.createDataFrame([(f"n{s:03d}",) for s in seeds], ["page"])


# a barbell: two triangles joined by a 3-hop bridge — the bridge nodes
# carry all cross-cluster shortest paths
BARBELL = [
    (0, 1), (1, 2), (0, 2),          # triangle A
    (10, 11), (11, 12), (10, 12),    # triangle B
    (2, 5), (5, 6), (6, 10),         # bridge 2-5-6-10
]


def _check(spark, edges, seeds):
    got = {
        r["page"]: r["betweenness_micros"]
        for r in betweenness_micros(_df(spark, edges), _seed_df(spark, seeds)).collect()
    }
    want = _brute(edges, seeds)
    full = {
        f"n{n:03d}": want.get(n, 0)
        for n in {x for e in edges for x in e if e[0] != e[1]}
    }
    assert got == full


def test_barbell_bridge_dominates(spark):
    seeds = [0, 10]
    _check(spark, BARBELL, seeds)
    got = {
        r["page"]: r["betweenness_micros"]
        for r in betweenness_micros(
            _df(spark, BARBELL), _seed_df(spark, seeds)
        ).collect()
    }
    # bridge interior nodes outrank every triangle node
    assert got["n005"] > got["n001"] and got["n006"] > got["n011"]


def test_multi_path_sigma_split(spark):
    # diamond: two equal shortest paths split dependency in halves
    e = [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4)]
    _check(spark, e, [0])


def test_decimal_ladder_matches_bigint_path(spark):
    got_i = {
        r["page"]: r["betweenness_micros"]
        for r in betweenness_micros(
            _df(spark, BARBELL), _seed_df(spark, [0, 10])
        ).collect()
    }
    got_d = {
        r["page"]: r["betweenness_micros"]
        for r in betweenness_micros(
            _df(spark, BARBELL), _seed_df(spark, [0, 10]), use_decimal=True
        ).collect()
    }
    assert got_i == got_d


def test_depth_raise(spark):
    e = [(i, i + 1) for i in range(15)]
    with pytest.raises(RuntimeError):
        betweenness_micros(_df(spark, e), _seed_df(spark, [0]), max_depth=3)


def test_duckdb_twin_matches_brute():
    con = duckdb.connect()
    rows = [(f"n{a:03d}", f"n{b:03d}") for a, b in BARBELL]
    con.execute("CREATE TABLE ed (subj VARCHAR, obj VARCHAR)")
    con.executemany("INSERT INTO ed VALUES (?, ?)", rows)
    sql = betweenness_sql_duck(
        "SELECT subj, obj FROM ed",
        "page IN ('n000', 'n010')",
        max_depth=6,
    )
    got = dict(con.execute(sql).fetchall())
    want = _brute(BARBELL, [0, 10])
    full = {
        f"n{n:03d}": want.get(n, 0)
        for n in {x for e in BARBELL for x in e}
    }
    assert got == full


def test_spark_matches_twin_random(spark):
    import random

    rng = random.Random(7)
    e = list({(rng.randrange(25), rng.randrange(25)) for _ in range(60)})
    e = [p for p in e if p[0] != p[1]]
    seeds = [0, 5, 7]
    con = duckdb.connect()
    con.execute("CREATE TABLE ed (subj VARCHAR, obj VARCHAR)")
    con.executemany(
        "INSERT INTO ed VALUES (?, ?)",
        [(f"n{a:03d}", f"n{b:03d}") for a, b in e],
    )
    sql = betweenness_sql_duck(
        "SELECT subj, obj FROM ed",
        "page IN ('n000', 'n005', 'n007')",
        max_depth=12,
    )
    want = dict(con.execute(sql).fetchall())
    got = {
        r["page"]: r["betweenness_micros"]
        for r in betweenness_micros(_df(spark, e), _seed_df(spark, seeds)).collect()
    }
    assert got == want
