"""Distributed global row numbering (rank without the single-partition
window anti-pattern).

`row_number() OVER (ORDER BY ...)` with no PARTITION BY collapses the
whole relation into ONE task in Spark — the canonical scale-killer for
global ranking (quantile binning, calibration curves, top-p corpus
selection by score). The distributed-native equivalent here is the
classic three-step:

  1. `repartitionByRange` on the order keys (a range shuffle — the same
     machinery a global orderBy uses, every partition gets a disjoint
     key range in partition-id order);
  2. a per-partition row census (numPartitions rows — collected to the
     driver, bounded by cluster width, never by data) turned into
     exclusive prefix offsets;
  3. `row_number()` windowed WITHIN each range partition (parallel)
     plus the broadcast offset.

The ranked relation is persisted between the census pass and the final
pass — range-partitioner boundaries come from a SAMPLING job, so an
unpersisted recompute could place rows differently than the census saw
(the offsets would then be wrong, not just slow). The result is
independent of where the sampled boundaries land as long as both passes
see the same placement, which the persist guarantees; at warehouse
scale use StorageLevel MEMORY_AND_DISK for the same guarantee without
OOM risk.

Determinism contract: the order keys must be a total order (tie-free —
append a unique id as the last key). Given that, the assigned ranks
equal the single-partition window's ranks exactly, which is what the
pytest pins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def global_row_number(
    df: DataFrame,
    order_cols: list[str],
    rn_col: str = "rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """Adds `rn_col` = 1-based global rank under ORDER BY `order_cols`
    (which must be tie-free). Scale shape: one range shuffle + one
    numPartitions-row collect + per-partition windows; no single-task
    stage anywhere. The returned relation is localCheckpoint-materialized
    so the internal persist can be released eagerly."""
    spark = df.sparkSession
    n_parts = num_partitions or max(
        2, spark.sparkContext.defaultParallelism // 2
    )
    cols = [F.col(c) for c in order_cols]
    d = (
        df.repartitionByRange(n_parts, *cols)
        .withColumn("_part", F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    try:
        census = {
            r["_part"]: r["c"]
            for r in d.groupBy("_part").agg(F.count(F.lit(1)).alias("c")).collect()
        }
        offsets, acc = [], 0
        for p in sorted(census):
            offsets.append((p, acc))
            acc += census[p]
        off_df = spark.createDataFrame(
            offsets or [(0, 0)], ["_part", "_off"]
        )
        w = Window.partitionBy("_part").orderBy(*cols)
        out = (
            d.join(F.broadcast(off_df), "_part")
            .withColumn(
                rn_col,
                (F.row_number().over(w) + F.col("_off")).cast("bigint"),
            )
            .drop("_part", "_off")
            .localCheckpoint(eager=True)
        )
    finally:
        d.unpersist()
    return out


def select_top_fraction(
    df: DataFrame,
    order_cols: list[str],
    keep_micros: int,
    rn_col: str = "rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """Keep the best `keep_micros`/1e6 fraction of rows under ORDER BY
    `order_cols` (tie-free; put the best rows FIRST — e.g. rank by
    negated score) — the corpus-selection step the learned-filter stacks
    run after scoring ("keep the top 30% by classifier margin",
    FineWeb-Edu's threshold cut). The cut is exact integer arithmetic on
    the distributed global rank:

        keep  iff  rn * 1_000_000 <= n * keep_micros

    so the selected set is bit-stated by a twin row_number query — no
    float thresholds, no approximate percentile boundary. One range
    shuffle + a broadcast 1-row count; no single-task stage."""
    ranked = global_row_number(
        df, order_cols, rn_col=rn_col, num_partitions=num_partitions
    )
    n_rel = ranked.agg(F.count(F.lit(1)).cast("bigint").alias("_n"))
    return (
        ranked.crossJoin(F.broadcast(n_rel))
        .filter(
            F.col(rn_col) * F.lit(1_000_000) <= F.col("_n") * F.lit(keep_micros)
        )
        .drop("_n")
    )
