"""SCC (operators/scc.py): planted cycle/DAG structures, a brute-force
closure mirror, non-convergence raise, and DuckDB twin agreement. The
sf-graph oracle equality runs in check_contract."""

from __future__ import annotations

import duckdb
import pytest

from confluence2md_spark.operators.scc import scc, scc_sql_duck


def _brute_scc(edges):
    """Reference: transitive closure + mutual-reach minimum."""
    nodes = sorted({n for e in edges for n in e if e[0] != e[1]})
    reach = {n: {n} for n in nodes}
    changed = True
    while changed:
        changed = False
        for s, t in edges:
            if s == t:
                continue
            new = reach[t] - reach[s]
            if new:
                reach[s] |= new
                changed = True
    out = {}
    for v in nodes:
        mut = [u for u in reach[v] if v in reach[u]]
        out[v] = min(mut)
    return out


def _edges_df(spark, edges):
    return spark.createDataFrame(
        [(f"n{a:03d}", f"n{b:03d}") for a, b in edges], ["subj", "obj"]
    )


def _named(mapping):
    return {f"n{a:03d}": f"n{b:03d}" for a, b in mapping.items()}


# one 4-cycle, one 2-cycle, a DAG tail off the 4-cycle, an isolated chain,
# and a cross edge BETWEEN the two cycles (reach without mutual reach)
CYCLE4 = [(0, 1), (1, 2), (2, 3), (3, 0)]
CYCLE2 = [(10, 11), (11, 10)]
TAIL = [(3, 20), (20, 21)]
CHAIN = [(30, 31), (31, 32)]
CROSS = [(2, 10)]
ALL = CYCLE4 + CYCLE2 + TAIL + CHAIN + CROSS


def test_cycles_collapse_dag_stays_singleton(spark):
    got = {r["page"]: r["scc_id"] for r in scc(_edges_df(spark, ALL)).collect()}
    assert got == _named(_brute_scc(ALL))
    # the cross edge must NOT merge the two cycles
    assert got["n010"] == got["n011"] == "n010"
    assert got["n000"] == got["n003"] == "n000"
    assert got["n020"] == "n020" and got["n021"] == "n021"


def test_nested_cycles_one_component(spark):
    # figure-eight: two cycles sharing node 1 are ONE SCC
    e = [(0, 1), (1, 0), (1, 2), (2, 3), (3, 1)]
    got = {r["page"]: r["scc_id"] for r in scc(_edges_df(spark, e)).collect()}
    assert got == _named(_brute_scc(e))
    assert set(got.values()) == {"n000"}


def test_pure_dag_all_singletons(spark):
    e = [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4)]
    got = {r["page"]: r["scc_id"] for r in scc(_edges_df(spark, e)).collect()}
    assert got == {f"n{i:03d}": f"n{i:03d}" for i in range(5)}


def test_raises_when_budget_exhausted(spark):
    e = [(i, i + 1) for i in range(8)] + [(8, 0)]  # 9-cycle: needs depth
    with pytest.raises(RuntimeError):
        scc(_edges_df(spark, e), max_rounds=2)


def test_duckdb_twin_matches_brute():
    con = duckdb.connect()
    rows = [(f"n{a:03d}", f"n{b:03d}") for a, b in ALL]
    con.execute("CREATE TABLE ed (subj VARCHAR, obj VARCHAR)")
    con.executemany("INSERT INTO ed VALUES (?, ?)", rows)
    got = dict(con.execute(scc_sql_duck("SELECT subj, obj FROM ed")).fetchall())
    assert got == _named(_brute_scc(ALL))


def test_spark_matches_twin_on_random_graph(spark):
    import random

    rng = random.Random(42)
    e = list({(rng.randrange(40), rng.randrange(40)) for _ in range(120)})
    got = {r["page"]: r["scc_id"] for r in scc(_edges_df(spark, e)).collect()}
    assert got == _named(_brute_scc([p for p in e if p[0] != p[1]]))
