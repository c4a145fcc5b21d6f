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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """(id, component) for every vertex appearing in `edges`;
    component = min vertex id in the component."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    sym = (
        e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .persist()  # reused every iteration; materializes with the first job
    )

    labels = sym.select(F.col("src").alias("id")).distinct().withColumn(
        "component", F.col("id")
    )

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
            break
    sym.unpersist()
    return labels
