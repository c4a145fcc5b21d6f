"""Connected components I3 (SURVEY.md §2.I) — hash-min label propagation as
iterative DataFrame joins (no GraphFrames jar in this sandbox or guaranteed
on a customer cluster).

Each iteration: every vertex takes min(own label, neighbors' labels); stop at
fixpoint. Converges in O(graph diameter) iterations (alias graphs from
title/LSH linking are near-cliques — diameter 1-2; `max_iter` bounds
pathological chains). `localCheckpoint()` after every iteration truncates
lineage so the DAG stays O(1) deep regardless of iteration count
(SURVEY.md §4.3).
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _driver_union_find(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Small-graph path: collect the edge list, run union-find on the driver,
    broadcast the labels back. The alias graph is SPARSE relative to the
    corpus (pairs ∝ duplicated pages, ~0.1-10% of rows — 3.1k pairs at 36k
    docs, ~128k at 1.28M): under `driver_max_edges` a driver pass replaces
    O(diameter) iterative join jobs (each a full shuffle + fixpoint-probe
    job) with ONE collect over an already-materialized relation. Same
    contract: component = min vertex id, every vertex labeled."""
    spark = edges.sparkSession
    id_type = dict(edges.dtypes)[src]
    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for a, b in edges.select(src, dst).collect():
        if a not in parent:
            parent[a] = a
        if b not in parent:
            parent[b] = b
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by MIN root so the final label IS the component min
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    import pandas as pd

    # Arrow path: a pandas frame ships to the JVM as Arrow batches — the
    # list-of-tuples route pickles row-by-row and is the serial hot spot at
    # ~100k+ labels.
    ids = list(parent)
    pdf = pd.DataFrame({"id": ids, "component": [find(x) for x in ids]})
    return spark.createDataFrame(pdf, schema=f"id {id_type}, component {id_type}")


def _star_contraction(
    edges: DataFrame, src: str, dst: str, max_iter: int, on_max_iter: str
) -> DataFrame:
    """Alternating large-star / small-star contraction (Kiveris et al.,
    'Connected Components in MapReduce and Beyond' — public algorithm):
    converges in O(log n) ROUNDS on ANY graph, including long chains where
    hash-min needs O(diameter). Each round is two phases; each phase is one
    groupBy + one join over the (shrinking) edge set:

      large-star(u): connect every neighbor v > u to m = min(N(u) ∪ {u})
      small-star(u): connect every neighbor v ≤ u, and u itself, to m

    At the fixpoint the edge set is a star forest rooted at component
    minima; labels read off as (child -> root), roots/isolated map to self.
    Convergence detect: (count, folded-hash-sum) pair stable across a
    round — hashes folded into [0, 2^31) before the sum so ANSI mode
    cannot overflow below ~2^31 edges per partition aggregate."""
    e0 = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
    )
    vertices = (
        e0.select(F.col("u").alias("id"))
        .unionByName(e0.select(F.col("v").alias("id")))
        .distinct()
        .localCheckpoint()
    )

    def sym(df: DataFrame) -> DataFrame:
        return df.unionByName(
            df.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )

    def with_min(df: DataFrame) -> DataFrame:
        s = sym(df)
        mins = (
            s.groupBy("u")
            .agg(F.min("v").alias("mn"))
            .select("u", F.least("mn", "u").alias("m"))
        )
        return s.join(mins, "u")

    def signature(df: DataFrame):
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.pmod(F.xxhash64("u", "v"), F.lit(2**31))).alias("h"),
        ).first()
        return (row["n"], row["h"])

    e = e0.distinct().localCheckpoint()
    sig = signature(e)
    converged = False
    for _ in range(max_iter):
        sm = with_min(e)
        large = sm.filter(F.col("v") > F.col("u")).select(
            F.col("v").alias("u"), F.col("m").alias("v")
        )
        e_l = large.filter(F.col("u") != F.col("v")).distinct().localCheckpoint(eager=False)
        sm2 = with_min(e_l)
        small = sm2.filter(F.col("v") <= F.col("u")).select(
            F.col("v").alias("u"), F.col("m").alias("v")
        ).unionByName(sm2.select("u", F.col("m").alias("v")))
        e = small.filter(F.col("u") != F.col("v")).distinct().localCheckpoint(eager=False)
        new_sig = signature(e)
        if new_sig == sig:
            converged = True
            break
        sig = new_sig
    if not converged:
        msg = (
            f"star-contraction did not stabilize within max_iter={max_iter} "
            f"rounds; components converge in O(log n) rounds, so this "
            f"indicates an input far larger than max_iter accounts for."
        )
        if on_max_iter == "warn":
            warnings.warn(msg, RuntimeWarning, stacklevel=2)
        else:
            raise RuntimeError(msg)
    child_root = e.groupBy("u").agg(F.min("v").alias("root"))
    return vertices.join(
        child_root.withColumnRenamed("u", "id"), "id", "left"
    ).select("id", F.coalesce("root", F.col("id")).alias("component"))


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
    on_max_iter: str = "raise",
    driver_max_edges: int | None = None,
    distributed_algorithm: str | None = None,
) -> DataFrame:
    """(id, component) for every vertex appearing in `edges`;
    component = min vertex id in the component.

    Hybrid strategy: alias graphs are tiny relative to the corpus, so when
    the edge count is under `driver_max_edges` (~32 MB of id pairs) the
    labels come from a driver-side union-find — one collect job instead of
    O(diameter) shuffle+probe iterations (measured 2.6-3.3 s -> ~0.4 s at
    3.1k pairs on a fresh JVM). Past the cap — a corpus whose DUPLICATE
    set alone is tens of millions of pages — a distributed algorithm takes
    over (`driver_max_edges=0` forces it): `distributed_algorithm=
    "hashmin"` (default; O(diameter) iterations — right for the near-clique
    alias graphs this pipeline produces) or `"starstar"` (alternating
    large-star/small-star contraction, O(log n) rounds on ANY graph — the
    choice when the diameter is unknown or adversarial).

    Fixpoint guard (distributed path): hash-min needs O(diameter)
    iterations; if labels are STILL changing when `max_iter` is exhausted
    the result would be silently wrong (some vertices not yet carrying
    their component's min). That case `raise`s by default
    (`on_max_iter="warn"` downgrades to a warning for exploratory use).
    Alias graphs from title/LSH linking are near-cliques (diameter 1-2),
    so hitting the guard means the input is not the graph this operator
    was sized for — fail loudly, never return a wrong map.

    `driver_max_edges` / `distributed_algorithm` default from the env
    (KG_CC_DRIVER_MAX_EDGES / KG_CC_ALGO) so an end-to-end job can be forced
    onto a specific path without threading parameters through every caller
    — how the x256 stress exercises the distributed paths (BASELINE.md).
    """
    import os

    if driver_max_edges is None:
        driver_max_edges = int(os.environ.get("KG_CC_DRIVER_MAX_EDGES", 2_000_000))
    if distributed_algorithm is None:
        distributed_algorithm = os.environ.get("KG_CC_ALGO", "hashmin")
    if driver_max_edges and edges.limit(driver_max_edges + 1).count() <= driver_max_edges:
        return _driver_union_find(edges, src, dst)
    if distributed_algorithm == "starstar":
        # O(log n)-round star contraction — the choice for graphs whose
        # diameter is unknown or adversarial (hash-min is O(diameter))
        return _star_contraction(edges, src, dst, max_iter, on_max_iter)
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    sym = (
        e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .persist()  # reused every iteration; materializes with the first job
    )

    labels = sym.select(F.col("src").alias("id")).distinct().withColumn(
        "component", F.col("id")
    )

    converged = False
    for _ in range(max_iter):
        msgs = sym.join(labels, sym.src == labels.id).select(
            F.col("dst").alias("id"), F.col("component")
        )
        # eager=False: the checkpoint materializes as part of the
        # convergence-check job below — ONE job per iteration, not two.
        new_labels = (
            labels.select("id", "component")
            .unionByName(msgs)
            .groupBy("id")
            .agg(F.min("component").alias("component"))
        ).localCheckpoint(eager=False)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            converged = True
            break
    sym.unpersist()
    if not converged:
        msg = (
            f"connected_components did not reach fixpoint within "
            f"max_iter={max_iter} iterations (labels were still changing); "
            f"the component labels would be WRONG for long-chain graphs. "
            f"Raise max_iter (components converge in O(graph diameter))."
        )
        if on_max_iter == "warn":
            warnings.warn(msg, RuntimeWarning, stacklevel=2)
        else:
            raise RuntimeError(msg)
    return labels
