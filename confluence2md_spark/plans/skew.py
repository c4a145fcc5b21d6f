"""K1 — salted repartition for hot-key skew ahead of heavy UDF stages.

AQE's skew handling only splits skewed JOIN partitions; a skewed
`repartition(repo)` feeding the Python convert stage would still put a
10^9-file repo into one partition (SURVEY.md §4.3). Remedy: census the key
distribution, broadcast the hot set, and salt ONLY hot keys so cold keys keep
locality (useful for downstream per-repo aggregation) while hot repos fan out
across `salt_buckets` partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hot_keys(df: DataFrame, key: str, hot_fraction: float = 0.05) -> list:
    """Keys holding more than `hot_fraction` of all rows (driver-side list;
    the census is one map-side-combined groupBy, the list is tiny)."""
    total = df.count()
    if total == 0:
        return []
    thresh = max(1, int(total * hot_fraction))
    rows = df.groupBy(key).count().filter(F.col("count") > thresh).select(key).collect()
    return [r[0] for r in rows]


def salted_repartition(
    df: DataFrame,
    key: str,
    num_partitions: int,
    salt_buckets: int = 32,
    hot: list | None = None,
    hot_fraction: float = 0.05,
    salt_source: str | None = None,
) -> DataFrame:
    """Repartition on (key, salt) where salt spreads only hot keys.

    `salt_source`: a column whose hash supplies the salt (e.g. `path`), so
    the salt is deterministic per row — retries land in the same partition.
    """
    if hot is None:
        hot = hot_keys(df, key, hot_fraction)
    if not hot:
        return df.repartition(num_partitions, F.col(key))
    src = F.xxhash64(F.col(salt_source)) if salt_source else F.xxhash64(*[F.col(c) for c in df.columns if c != key][:1])
    salt = F.when(F.col(key).isin(hot), F.pmod(src, F.lit(salt_buckets))).otherwise(F.lit(0))
    return df.repartition(num_partitions, F.col(key), salt.alias("__salt"))
