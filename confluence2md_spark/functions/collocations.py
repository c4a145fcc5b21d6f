"""Collocation mining: pointwise mutual information (PMI) of adjacent
token bigrams over the corpus (Church & Hanks 1990) — the standard
"which word pairs co-occur far more than chance" signal used for
phrase detection, tokenizer-vocabulary seeding, and boilerplate
discovery in training-data pipelines. The reference CLI stops at
conversion; corpus statistics are mandate-added analytics, so the
DuckDB twin is the spec.

Exact-integer contract: with c1/c2 = unigram counts, c12 = bigram
count, T = total tokens, B = total bigrams,

    pmi ≈ ln( (c12/B) / ((c1/T)(c2/T)) )

is stated as a SUM OF PER-TERM FLOORS, each in micros:

    pmi_micros = ln_m(c12) + 2·ln_m(T) − ln_m(B) − ln_m(c1) − ln_m(c2)
    ln_m(x)    = CAST(floor(1e6 · ln(x)) AS BIGINT)

Flooring each ln term independently (rather than the ratio once) makes
the value an integer sum both engines compute bit-identically — the
same floor-ln-micros device as BM25 / NB / Adamic-Adar; the ≤5-micro
deviation from true PMI is irrelevant for ranking collocations.
All counts are >= 1 where ln is taken (a bigram's words exist; B >= 1
whenever any bigram exists), so ln is never applied to 0.

Tokenization is the corpus-wide rule shared by every text_* contract
(functions/textstats.py): whitespace split of trim(lower(text)).

Scale shape: one explode→groupBy per of {bigrams, unigrams} — two
shuffles keyed on short token strings with map-side partial
aggregation; the unigram joins onto the bigram relation are keyed on
single words (NOT broadcast — a 100 TB corpus vocabulary outgrows any
driver); totals are two 1-row broadcast relations; the final top-k is
TakeOrderedAndProject. Document text never shuffles — only tokens and
counts do. `min_count` prunes the bigram tail BEFORE the unigram
joins, which is both the classic PMI-noise guard (hapax pairs score
absurdly high) and the volume cap for the join stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from confluence2md_spark.functions.textstats import TOKENS_SQL_DUCK, tokens_col

_LN_M = "CAST(floor(1000000 * ln({x})) AS BIGINT)"


def pmi_bigrams(
    docs: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    topk: int = 40,
) -> DataFrame:
    """(w1, w2, n_pair, pmi_micros): the `topk` adjacent-token bigrams
    with count >= `min_count`, ranked by (pmi_micros desc, w1, w2)."""
    toks = docs.select(tokens_col(F.col(text_col)).alias("t"))
    bigrams = toks.select(
        F.explode(
            F.expr(
                "transform(slice(t, 1, size(t) - 1),"
                " (x, i) -> struct(x AS w1, t[i + 1] AS w2))"
            )
        ).alias("bg")
    ).select("bg.w1", "bg.w2")
    uni = (
        toks.select(F.explode("t").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    totals = toks.agg(
        F.sum(F.size("t")).cast("bigint").alias("tot_t"),
        F.sum(F.size("t") - F.lit(1)).cast("bigint").alias("tot_b"),
    )
    pair_counts = (
        bigrams.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pair"))
        .filter(F.col("n_pair") >= min_count)
    )
    scored = (
        pair_counts.join(uni.select(F.col("w").alias("w1"), F.col("c").alias("c1")), "w1")
        .join(uni.select(F.col("w").alias("w2"), F.col("c").alias("c2")), "w2")
        .crossJoin(F.broadcast(totals))
        .select(
            "w1",
            "w2",
            "n_pair",
            F.expr(
                f"{_LN_M.format(x='n_pair')} + 2 * {_LN_M.format(x='tot_t')}"
                f" - {_LN_M.format(x='tot_b')} - {_LN_M.format(x='c1')}"
                f" - {_LN_M.format(x='c2')}"
            )
            .cast("bigint")
            .alias("pmi_micros"),
        )
    )
    return scored.orderBy(
        F.desc("pmi_micros"), F.asc("w1"), F.asc("w2")
    ).limit(topk)


def pmi_bigrams_sql_duck(
    docs: str = "documents",
    text_col: str = "text",
    min_count: int = 5,
    topk: int = 40,
) -> str:
    """DuckDB twin: identical tokenization, identical per-term floors."""
    toks = TOKENS_SQL_DUCK.format(t=text_col)
    ln_m = "CAST(floor(1000000 * ln({x})) AS BIGINT)"
    return f"""
WITH toks AS (SELECT {toks} AS t FROM {docs}),
big AS (
  SELECT t[g.i] AS w1, t[g.i + 1] AS w2
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS i) g
),
uni AS (SELECT w, CAST(count(*) AS BIGINT) AS c
        FROM (SELECT unnest(t) AS w FROM toks) GROUP BY w),
totals AS (SELECT CAST(sum(len(t)) AS BIGINT) AS tot_t,
                  CAST(sum(len(t) - 1) AS BIGINT) AS tot_b FROM toks),
pair_counts AS (
  SELECT w1, w2, CAST(count(*) AS BIGINT) AS n_pair
  FROM big GROUP BY w1, w2 HAVING count(*) >= {min_count}
)
SELECT p.w1, p.w2, p.n_pair,
       CAST({ln_m.format(x='p.n_pair')} + 2 * {ln_m.format(x='t.tot_t')}
            - {ln_m.format(x='t.tot_b')} - {ln_m.format(x='u1.c')}
            - {ln_m.format(x='u2.c')} AS BIGINT) AS pmi_micros
FROM pair_counts p
JOIN uni u1 ON p.w1 = u1.w
JOIN uni u2 ON p.w2 = u2.w
CROSS JOIN totals t
ORDER BY pmi_micros DESC, p.w1 ASC, p.w2 ASC LIMIT {topk}"""
