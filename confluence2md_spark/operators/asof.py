"""As-of (time-travel) join — the temporal operator Spark's DataFrame API
lacks natively: for each left row, the latest right row (same key) whose
timestamp is <= the left timestamp. Event analytics uses it constantly
(attribute a purchase to the most recent prior view; join a trade to the
prevailing quote).

Implementation is the UNION + carry-forward-window form, not a range join:
tag both sides, union them, and per key sort by (ts, side) with
``last(value, ignorenulls=True)`` over an unbounded-preceding window — the
prevailing right-side values ride along to each left row. Scale shape: ONE
shuffle keyed on the join key and one sort within partitions — no range
predicate, so no O(|L|·|R|) explosion and no interval blow-up on skewed
keys; AQE's skew handling applies to the single exchange like any other.
Right rows order BEFORE left rows at equal timestamps (side 0 < 1), giving
inclusive (<=) semantics — the same default as DuckDB's ASOF JOIN, which
the contract query uses as an algorithmically independent oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join: every left row, plus `value_cols` from the latest
    right row with right_ts <= left_ts on the same `key` (nulls when no
    such row). Assumes (key, ts) unique per side — ties across sides
    resolve inclusively (the equal-ts right row wins).

    The carried values travel as ONE struct through a single
    ``last(ignorenulls=True)``: carrying each column independently would
    stitch fields of DIFFERENT right rows together whenever a newer right
    row has a legitimately-NULL value column (its null would be skipped and
    that field would carry from an older row — ADVICE r3)."""
    carried = [f"{c}{suffix}" for c in value_cols]
    l_tagged = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*left.columns).alias("_l"),
        F.lit(None).cast(right.select(*value_cols).schema).alias("_r"),
    )
    r_tagged = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(
            l_tagged.schema["_l"].dataType
        ).alias("_l"),
        F.struct(*value_cols).alias("_r"),
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = l_tagged.unionByName(r_tagged).select(
        "_side",
        "_l",
        F.last("_r", ignorenulls=True).over(w).alias("_r"),
    )
    return u.filter(F.col("_side") == 1).select(
        "_l.*", *[F.col(f"_r.{c}").alias(n) for c, n in zip(value_cols, carried)]
    )
