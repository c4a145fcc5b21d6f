"""Portable HyperLogLog distinct-count sketch with an EXACT DuckDB twin.

`approx_count_distinct` is Spark's HLL++ — engine-specific register
layout, so its contract can only ever be a sigma bound (the
approx_distinct_customers bounded check). This module is the same idea
as operators/portable_dedup.py applied to cardinality sketching: define
the sketch over the repo's engine-portable polynomial hash and all-integer
register arithmetic (Flajolet et al. 2007 HLL, the pre-++ formulation),
so BOTH engines compute identical registers, an identical scaled harmonic
sum, and an identical integer estimate — the driver can hash-verify the
ESTIMATE itself, not just bound it.

Integer contract (no floats cross an engine boundary):
- hash h = polynomial fingerprint of CAST(key AS STRING), in [0, 2^31-1)
- register index = h % m  (m = 2^p registers), value v = h // m < 2^25
- rho(v) = 26 - length(bin(v)) for v > 0 else 26  (leading-zero rank via
  binary-string length — pure integer/string ops, no log2 float edge)
- register M_j = max rho; scaled harmonic sum S = sum_j 2^(26 - M_j),
  absent registers contributing 2^26 each (M_j = 0)
- raw estimate (micro-units): (ALPHA_MICROS * m^2 * 2^26) DIV S
- small-range (linear counting) when raw <= 2.5m * 1e6 and V = #zero
  registers > 0: m * (floor(1e6*ln(m)) - floor(1e6*ln(V))) — the repo's
  established floor-ln-micros device (small-integer args, engines agree)

Scale shape: one map-side projection (hash/idx/rho), one groupBy on
(group, register) — at most m rows per group survive the partial agg, so
the shuffle is ~m * n_groups rows regardless of input size — then one
m-row-per-group fold. That is the whole point of HLL at 100 TB: the
exact distinct would shuffle every key; this shuffles 64 longs per group.

The fixed-hash estimate is deterministic, so the standard 1.04/sqrt(m)
error is an expectation over hash seeds, not a per-corpus guarantee;
tests pin the measured error on the contract corpus (~13% at m=64).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textstats import (
    FINGERPRINT_DUCK,
    FINGERPRINT_SPARK,
    MERSENNE31,
    PORTABLE_MIX_A,
    PORTABLE_MIX_B,
)

P_BITS = 6
M_REGS = 1 << P_BITS          # 64 registers
_MERSENNE = MERSENNE31
_MIX_A = PORTABLE_MIX_A
_MIX_B = PORTABLE_MIX_B

# Flajolet et al. 2007 bias-correction constants, integer micros
_ALPHA_MICROS = {16: 673_000, 32: 697_000, 64: 709_340}


def _params(p: int) -> tuple[int, int, int, int]:
    """(m, w_plus_1, alpha_micros, lc_cut_micros) derived from p — every
    register-width constant follows p, so non-default precisions stay
    correct (review finding: the first cut fixed these to p=6, so any
    other p silently mis-estimated in BOTH engines)."""
    if not 4 <= p <= 16:
        raise ValueError(f"p={p} outside [4, 16]")
    m = 1 << p
    w_plus_1 = 32 - p  # hash is 31 bits; value part is 31 - p bits wide
    if m >= 128:
        alpha = int(1_000_000 * 0.7213 / (1 + 1.079 / m))
    else:
        alpha = _ALPHA_MICROS[m]
    return m, w_plus_1, alpha, 2_500_000 * m


def hll_distinct_portable(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    p: int = P_BITS,
) -> DataFrame:
    """(group_cols..., hll_est_micros): portable-HLL distinct-count
    estimate of key_col per group, in micro-units (DIV 1e6 for the count).
    Hash-exact against hll_distinct_portable_sql_duck. NULL keys are
    dropped before hashing (count-DISTINCT semantics ignore NULLs; an
    unfiltered NULL would otherwise occupy a phantom register)."""
    m, _W_PLUS_1, alpha_micros, _LC_CUT_MICROS = _params(p)
    df = df.filter(F.col(key_col).isNotNull())
    raw_h = FINGERPRINT_SPARK.format(t=f"CAST({key_col} AS STRING)")
    # affine post-mix: the polynomial hash of a SHORT key string never
    # fills the high bits (hash("742") ~ 2^20), which inflates every
    # rho by the missing bit-width and wrecks the estimate (measured
    # 1600x). One multiply by a large odd constant mod the Mersenne
    # prime is a permutation of [0, M) that scatters short keys across
    # the full 31 bits — identical arithmetic in the twin.
    mixed = f"(({raw_h}) * {_MIX_A} + {_MIX_B}) % {_MERSENNE}"
    proj = df.selectExpr(
        *group_cols,
        f"({mixed}) % {m} AS reg",
        f"CAST(CASE WHEN ({mixed}) DIV {m} = 0 THEN {_W_PLUS_1} "
        f"ELSE {_W_PLUS_1} - length(bin(({mixed}) DIV {m})) END AS BIGINT) AS rho",
    )
    regs = proj.groupBy(*group_cols, "reg").agg(F.max("rho").alias("mj"))
    folded = regs.groupBy(*group_cols).agg(
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {_W_PLUS_1} - CAST(mj AS INT))")).alias("s_present"),
        F.count(F.lit(1)).alias("n_present"),
    )
    s = (F.col("s_present") + (m - F.col("n_present")) * (1 << _W_PLUS_1)).cast("bigint")
    v_zero = (m - F.col("n_present")).cast("bigint")
    # the numerator is precomputed in Python: writing it as a literal
    # product would overflow INT under Spark 4's ANSI literal arithmetic
    numer = alpha_micros * m * m * (1 << _W_PLUS_1)
    raw = F.expr(f"CAST({numer} AS BIGINT) DIV s_total")
    lc = F.expr(
        f"{m} * (CAST(floor(1000000 * ln({m})) AS BIGINT) "
        f"- CAST(floor(1000000 * ln(v_zero)) AS BIGINT))"
    )
    return (
        folded.withColumn("s_total", s)
        .withColumn("v_zero", v_zero)
        .withColumn("raw", raw)
        .select(
            *group_cols,
            F.when(
                (F.col("raw") <= _LC_CUT_MICROS) & (F.col("v_zero") > 0), lc
            )
            .otherwise(F.col("raw"))
            .cast("bigint")
            .alias("hll_est_micros"),
        )
    )


def hll_distinct_portable_sql_duck(
    rel: str,
    key_col: str,
    group_cols: list[str],
    p: int = P_BITS,
) -> str:
    """DuckDB twin: identical hash, registers, and integer estimate."""
    m, _W_PLUS_1, alpha_micros, _LC_CUT_MICROS = _params(p)
    g = ", ".join(group_cols)
    numer = alpha_micros * m * m * (1 << _W_PLUS_1)
    hash_of = FINGERPRINT_DUCK.format(t=f"CAST({key_col} AS VARCHAR)")
    mixed = f"(({hash_of}) * {_MIX_A} + {_MIX_B}) % {_MERSENNE}"
    return f"""
WITH proj AS (
  SELECT {g}, ({mixed}) % {m} AS reg,
         CASE WHEN ({mixed}) // {m} = 0 THEN {_W_PLUS_1}
              ELSE {_W_PLUS_1} - length(bin(({mixed}) // {m})) END AS rho
  FROM {rel} WHERE {key_col} IS NOT NULL
),
regs AS (SELECT {g}, reg, max(rho) AS mj FROM proj GROUP BY {g}, reg),
folded AS (
  SELECT {g},
         sum(1::BIGINT << ({_W_PLUS_1} - mj)) AS s_present,
         count(*) AS n_present
  FROM regs GROUP BY {g}
),
est AS (
  SELECT {g},
         s_present + ({m} - n_present) * (1::BIGINT << {_W_PLUS_1}) AS s_total,
         {m} - n_present AS v_zero
  FROM folded
)
SELECT {g},
       CAST(CASE WHEN {numer}::BIGINT // s_total <= {_LC_CUT_MICROS} AND v_zero > 0
            THEN {m} * (CAST(floor(1000000 * ln({m})) AS BIGINT)
                        - CAST(floor(1000000 * ln(v_zero)) AS BIGINT))
            ELSE {numer}::BIGINT // s_total
       END AS BIGINT) AS hll_est_micros
FROM est ORDER BY {g}"""
