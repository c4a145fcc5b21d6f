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


def layout_census(probe_df: DataFrame, key: str, hot: list) -> dict:
    """Physical-layout stats from a CHEAP projection of the same frame
    (content-pruned — caller passes e.g. df.select(key)): per-partition row
    counts and the hot-key concentration across partitions."""
    agg = (
        probe_df.groupBy(F.spark_partition_id().alias("pid"))
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.count_if(F.col(key).isin(hot) if hot else F.lit(False)).alias("hot_rows"),
        )
        .collect()
    )
    rows = [r["rows"] for r in agg]
    hot_rows = [r["hot_rows"] for r in agg]
    total = sum(rows) or 1
    total_hot = sum(hot_rows)
    return {
        "n_partitions": len(rows),
        "max_rows": max(rows) if rows else 0,
        "mean_rows": total / max(len(rows), 1),
        "hot_concentration": (max(hot_rows) / total_hot) if total_hot else 0.0,
        "total": total,
    }


def key_layout_census(
    probe_df: DataFrame, key: str, hot_fraction: float = 0.05
) -> tuple[list, dict]:
    """hot_keys + layout_census fused into ONE job (r6): a per-(partition,
    key) groupBy collects a tiny relation (n_partitions × |keys| rows for
    low-cardinality keys like repo buckets) from which both the hot set and
    the layout stats derive driver-side. The separate helpers above cost
    three driver round-trips (count, per-key census, per-partition census)
    over the same probe projection; at one fixed job-latency each, the fused
    form is the difference between ~3 s and ~1 s of pure scheduling on the
    bench corpus. Semantics are identical (same hot threshold, same stats)."""
    agg = (
        probe_df.groupBy(F.spark_partition_id().alias("pid"), F.col(key).alias("k"))
        .count()
        .collect()
    )
    total = sum(r["count"] for r in agg)
    if total == 0:
        return [], {
            "n_partitions": 0,
            "max_rows": 0,
            "mean_rows": 0.0,
            "hot_concentration": 0.0,
            "total": 0,
        }
    thresh = max(1, int(total * hot_fraction))
    by_key: dict = {}
    by_pid: dict = {}
    for r in agg:
        by_key[r["k"]] = by_key.get(r["k"], 0) + r["count"]
        by_pid[r["pid"]] = by_pid.get(r["pid"], 0) + r["count"]
    hot = [k for k, c in by_key.items() if c > thresh]
    hot_set = set(hot)
    hot_by_pid: dict = {}
    for r in agg:
        if r["k"] in hot_set:
            hot_by_pid[r["pid"]] = hot_by_pid.get(r["pid"], 0) + r["count"]
    rows = list(by_pid.values())
    total_hot = sum(hot_by_pid.values())
    census = {
        "n_partitions": len(rows),
        "max_rows": max(rows),
        "mean_rows": total / len(rows),
        "hot_concentration": (max(hot_by_pid.values()) / total_hot) if total_hot else 0.0,
        "total": total,
    }
    return hot, census


def needs_rebalance(census: dict, num_partitions: int, skew_factor: float = 1.5) -> bool:
    """True when the existing layout would starve or skew the next stage:
    too few partitions, imbalanced partition sizes, or a hot key clustered
    into few partitions (the Iceberg bucket(repo) failure mode)."""
    if census["n_partitions"] < max(2, num_partitions // 2):
        return True
    if census["max_rows"] > skew_factor * census["mean_rows"]:
        return True
    fair_share = 1.0 / census["n_partitions"]
    return census["hot_concentration"] > 2.0 * fair_share


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
