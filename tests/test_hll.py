"""Portable HyperLogLog (functions/hll.py): twin equality, accuracy band,
small-range (linear-counting) branch, and the map-side scale shape."""

from __future__ import annotations

import duckdb

from confluence2md_spark.functions.hll import (
    M_REGS,
    hll_distinct_portable,
    hll_distinct_portable_sql_duck,
)


def test_hll_twin_equality_and_error_band(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    got = [
        tuple(r)
        for r in hll_distinct_portable(orders, "o_custkey", ["o_orderpriority"])
        .orderBy("o_orderpriority")
        .collect()
    ]
    con = duckdb.connect()
    con.sql(f"CREATE VIEW orders AS SELECT * FROM '{sf_dir}/orders.parquet'")
    want = [
        tuple(r)
        for r in con.sql(
            hll_distinct_portable_sql_duck("orders", "o_custkey", ["o_orderpriority"])
        ).fetchall()
    ]
    assert got == want and len(got) == 5
    exact = dict(
        con.sql(
            "SELECT o_orderpriority, count(DISTINCT o_custkey) FROM orders GROUP BY 1"
        ).fetchall()
    )
    for grp, est_micros in got:
        err = abs(est_micros / 1e6 - exact[grp]) / exact[grp]
        # deterministic fixed-hash estimate; 3x the 1.04/sqrt(m) band as
        # the hard ceiling, and the measured values sit inside 1x
        assert err < 3 * 1.04 / M_REGS**0.5, (grp, est_micros, exact[grp])


def test_hll_small_range_linear_counting(spark):
    # 5 distinct keys << m: most registers empty -> the linear-counting
    # branch must fire, and m*ln(m/V) with V >= m-5 is within 1 of exact
    df = spark.createDataFrame(
        [(k, "g") for k in range(5) for _ in range(3)], "k LONG, grp STRING"
    )
    [(grp, est_micros)] = hll_distinct_portable(df, "k", ["grp"]).collect()
    assert grp == "g"
    assert abs(est_micros / 1e6 - 5) < 1.0


def test_hll_shuffle_is_register_bounded(spark, sf_dir):
    """The groupBy(group, reg) partial-agg means at most m rows per group
    reach the final fold — the plan must show a partial HashAggregate
    before the exchange (map-side combine), the HLL scale story."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    plan = (
        hll_distinct_portable(orders, "o_custkey", ["o_orderpriority"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the (group, reg) PARTIAL aggregate must sit BELOW its Exchange
    # (map-side combine): everything after the deepest Exchange in the
    # string rendering is upstream of every shuffle, and it must contain
    # a partial-mode HashAggregate keyed on reg. (The first cut of this
    # test only asserted "some HashAggregate somewhere after the first
    # Exchange", which virtually any groupBy plan satisfies — review
    # finding: vacuous.)
    below_last_exchange = plan[plan.rindex("Exchange"):]
    assert "partial" in below_last_exchange.lower(), "no map-side combine"
    assert "reg" in below_last_exchange, "pre-shuffle agg not register-keyed"


def test_sampled_quantiles_track_exact(spark, sf_dir):
    """events_quantiles_sampled (deterministic 25% hash sample) must track
    the exact quantiles within the 1/sqrt(n_sample) rank band — here
    pinned as a relative-value tolerance on the contract corpus."""
    import __spark_entry__ as e

    sampled = {
        r["event_type"]: r
        for r in e.queries()["events_quantiles_sampled"](spark, sf_dir).collect()
    }
    exact = {
        r["event_type"]: r
        for r in e.queries()["events_value_quantiles"](spark, sf_dir).collect()
    }
    assert set(sampled) == set(exact)
    for et, srow in sampled.items():
        xrow = exact[et]
        # sf0.001 has ~190 events per type -> ~47 sampled at 25%
        assert srow["n_sample"] > 20  # the 25% sample actually sampled
        for p in ("p25", "p50", "p75"):
            spread = xrow["p75"] - xrow["p25"]
            assert abs(srow[p] - xrow[p]) <= max(0.5 * spread, 1e-9), (
                et, p, srow[p], xrow[p])
