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


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
    on_max_iter: str = "raise",
) -> DataFrame:
    """(id, component) for every vertex appearing in `edges`;
    component = min vertex id in the component.

    Fixpoint guard: hash-min needs O(diameter) iterations; if labels are
    STILL changing when `max_iter` is exhausted the result would be silently
    wrong (some vertices not yet carrying their component's min). That case
    `raise`s by default (`on_max_iter="warn"` downgrades to a warning for
    exploratory use). Alias graphs from title/LSH linking are near-cliques
    (diameter 1-2), so hitting the guard means the input is not the graph
    this operator was sized for — fail loudly, never return a wrong map.
    """
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
