"""Strongly connected components of the directed KG link graph.

Every components path so far (operators/components.py, and the curation
queries built on it) works on the UNDIRECTED alias/link graph; links_to
is directed, and the directed notion — mutual reachability — is what a
KG consumer means by "these pages form a self-referential cluster":
2-cycles (A links B links A) and longer citation loops collapse to one
strongly connected component, while a hub that only points outward stays
a singleton no matter how many links it emits. The reference stops at
edge extraction (converter/markdown.go emits links only); SCC belongs to
SURVEY §2's graph-analytics family alongside PageRank / HITS / k-core.

Algorithm: distributed forward-backward coloring (the standard
iterative/MapReduce SCC scheme — Orzan's coloring, also the shape of
FW-BW-Trim in the multistep literature). Each OUTER round on the active
subgraph:

  1. forward min-label fixpoint: color(v) = min id over active nodes that
     reach v (including v). Within one SCC every member provably gets the
     same color — the minimal node r that reaches any member reaches all
     of them — and that color is r itself iff r is in the SCC.
  2. backward mark within the color class: starting from the roots
     (color(v) == v), propagate "reaches its root" ACROSS REVERSED edges
     restricted to same-colored endpoints. Any intermediate node on a
     member→root path is itself in the SCC (root reaches it via the
     member, it reaches the root), so the same-color restriction loses
     nothing, and every marked node is mutually reachable with its root.
  3. emit marked nodes as (page, scc_id = color); remove them from the
     active set. Unmarked color classes re-color next round against the
     shrunken graph.

Every inner iteration is one node-id-keyed join + groupBy-min (the
hash-min CC / seed-distance loop shape); nothing but (id, id) pairs ever
shuffles and nothing is collected to the driver. Each outer round
removes at least the SCC of the minimum active node (it is always a
root), and on real link graphs — shallow, with many independent root
color classes per round — the peel finishes in a handful of outer
rounds. `max_rounds` bounds the TOTAL inner-iteration budget and the
loop RAISES if unconverged: a silent truncation would mislabel nodes,
and the DuckDB twin (exact transitive closure + mutual-reach minimum via
one recursive CTE) is exact at any depth, so a converged Spark answer
must match it bit-for-bit.

Lineage discipline: every inner step localCheckpoints eagerly (each
fixpoint references the previous relation twice, so a lazy loop doubles
the logical plan per step — the seed_distance/hits lesson), and
superseded checkpoints are released immediately.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from confluence2md_spark.operators.graph import _release_local_checkpoint


def _ckpt_swap(df: DataFrame, prev: DataFrame | None) -> tuple[DataFrame, DataFrame]:
    new = df.localCheckpoint(eager=True)
    if prev is not None:
        _release_local_checkpoint(prev)
    return new, new


def scc(
    edges: DataFrame,
    src: str = "subj",
    dst: str = "obj",
    max_rounds: int = 64,
) -> DataFrame:
    """(page, scc_id) for every node of the directed simple graph induced
    by `edges`; scc_id is the minimum page id of the component. Ordered
    by page. Raises RuntimeError if the coloring peel exhausts
    `max_rounds` total inner iterations before the active set empties.
    """
    e_all = (
        edges.filter(F.col(src) != F.col(dst))
        .select(F.col(src).alias("s"), F.col(dst).alias("t"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e_all.select(F.col("s").alias("page"))
        .unionByName(e_all.select(F.col("t").alias("page")))
        .distinct()
    )
    active, _ = _ckpt_swap(nodes, None)
    done: DataFrame | None = None
    budget = max_rounds
    try:
        while True:
            if active.count() == 0:
                break
            ae = (
                e_all.join(active.withColumnRenamed("page", "s"), "s", "semi")
                .join(active.withColumnRenamed("page", "t"), "t", "semi")
                .select("s", "t")
                .localCheckpoint(eager=True)
            )
            # 1. forward min-color fixpoint over the active subgraph.
            color = active.select("page", F.col("page").alias("color"))
            color, cprev = _ckpt_swap(color, None)
            while True:
                budget -= 1
                if budget < 0:
                    raise RuntimeError(
                        f"scc coloring did not converge in {max_rounds} "
                        "total inner iterations"
                    )
                cand = (
                    ae.join(
                        color.select(
                            F.col("page").alias("s"), F.col("color").alias("cu")
                        ),
                        "s",
                    )
                    .groupBy("t")
                    .agg(F.min("cu").alias("cand"))
                )
                nxt = color.join(
                    cand.withColumnRenamed("t", "page"), "page", "left"
                ).select(
                    "page",
                    F.least(
                        F.col("color"), F.coalesce("cand", F.col("color"))
                    ).alias("color"),
                )
                nxt, _ = _ckpt_swap(nxt, None)
                changed = (
                    nxt.alias("n")
                    .join(color.alias("o"), "page")
                    .filter(F.col("n.color") != F.col("o.color"))
                    .count()
                )
                _release_local_checkpoint(color)
                color, cprev = nxt, nxt
                if changed == 0:
                    break
            # 2. backward mark within the color class, seeded at roots.
            mark = color.select(
                "page", "color", (F.col("page") == F.col("color")).alias("m")
            )
            mark, mprev = _ckpt_swap(mark, None)
            while True:
                budget -= 1
                if budget < 0:
                    raise RuntimeError(
                        f"scc backward mark did not converge in {max_rounds} "
                        "total inner iterations"
                    )
                cand = (
                    ae.join(
                        mark.filter(F.col("m")).select(
                            F.col("page").alias("t"), F.col("color").alias("ct")
                        ),
                        "t",
                    )
                    .select(F.col("s").alias("page"), F.col("ct").alias("color"))
                    .distinct()
                    .withColumn("_hit", F.lit(True))
                )
                nxt = mark.join(cand, ["page", "color"], "left").select(
                    "page",
                    "color",
                    (F.col("m") | F.coalesce("_hit", F.lit(False))).alias("m"),
                )
                nxt, _ = _ckpt_swap(nxt, None)
                changed = (
                    nxt.alias("n")
                    .join(mark.alias("o"), "page")
                    .filter(F.col("n.m") != F.col("o.m"))
                    .count()
                )
                _release_local_checkpoint(mark)
                mark, mprev = nxt, nxt
                if changed == 0:
                    break
            emitted = (
                mark.filter(F.col("m"))
                .select("page", F.col("color").alias("scc_id"))
                .localCheckpoint(eager=True)
            )
            done = emitted if done is None else done.unionByName(emitted)
            done, _ = _ckpt_swap(done, None)
            nxt_active = active.join(emitted, "page", "anti")
            nxt_active, _ = _ckpt_swap(nxt_active, None)
            _release_local_checkpoint(active)
            _release_local_checkpoint(ae)
            _release_local_checkpoint(color)
            _release_local_checkpoint(mark)
            _release_local_checkpoint(emitted)
            active = nxt_active
        if done is None:
            # no non-self-loop edges: the induced graph has no nodes, so
            # the answer is the empty relation (matches the DuckDB twin,
            # whose recursive CTE yields nothing) — typed off the input.
            return nodes.select("page", F.col("page").alias("scc_id")).limit(0)
        out = done.orderBy("page").localCheckpoint(eager=True)
        _release_local_checkpoint(done)
        return out
    finally:
        _release_local_checkpoint(e_all)
        _release_local_checkpoint(active)


def scc_sql_duck(edges_cte_body: str) -> str:
    """DuckDB oracle twin: exact transitive closure via one recursive CTE
    (UNION set semantics guarantees termination), then
    scc_id(u) = min({u} ∪ {v : u →* v AND v →* u}). Exact at any graph
    depth — no round count to match, so a converged scc() result must
    equal it bit-for-bit."""
    return f"""WITH RECURSIVE
e AS MATERIALIZED (
  SELECT DISTINCT subj AS s, obj AS t FROM ({edges_cte_body}) WHERE subj <> obj
),
reach(s, t) AS (
  SELECT s, t FROM e
  UNION
  SELECT r.s, e.t FROM reach r JOIN e ON r.t = e.s
),
nodes AS (SELECT DISTINCT s AS page FROM e UNION SELECT DISTINCT t FROM e),
mutual AS (
  SELECT a.s AS u, a.t AS v FROM reach a JOIN reach b ON a.s = b.t AND a.t = b.s
)
SELECT n.page, LEAST(n.page, coalesce(min(m.v), n.page)) AS scc_id
FROM nodes n LEFT JOIN mutual m ON m.u = n.page
GROUP BY n.page
ORDER BY n.page"""
