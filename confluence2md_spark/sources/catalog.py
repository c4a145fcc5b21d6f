"""Catalog seam: parquet locally, Iceberg on a real cluster.

On a cluster with the Iceberg runtime this becomes
``spark.read.table(f"{namespace}.{name}")`` / ``df.writeTo(...).append()``
with partition transforms (``bucket(N, repo)`` for raw_files,
``pred``/``repo`` for edges).  The sandbox has no Iceberg jars
(SURVEY.md §0), so tables are partitioned parquet under a warehouse dir with
the identical schema — every consumer goes through this seam, so swapping the
backend is a two-function change.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

_ICEBERG = os.environ.get("KG_USE_ICEBERG", "") == "1"
_NAMESPACE = os.environ.get("KG_NAMESPACE", "kg")


def load_table(spark: SparkSession, warehouse: str, name: str) -> DataFrame:
    if _ICEBERG:
        return spark.read.table(f"{_NAMESPACE}.{name}")
    return spark.read.parquet(os.path.join(warehouse, name))


def write_table(
    df: DataFrame,
    warehouse: str,
    name: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> str:
    """Write a stage table; returns its path (the checkpoint manifest key)."""
    if _ICEBERG:
        writer = df.writeTo(f"{_NAMESPACE}.{name}")
        if mode == "overwrite":
            writer.createOrReplace()
        else:
            writer.append()
        return f"{_NAMESPACE}.{name}"
    path = os.path.join(warehouse, name)
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)
    return path
