"""BM25 keyword retrieval over the documents table (driver mandate:
training-data pipeline operators; the lexical complement to similarity.py's
embedding ANN — corpus curation pipelines use both for targeted sampling).

Scale shape (the plan a 100-TB corpus needs):

* The corpus is FILTERED to query-term postings before any aggregation: the
  (distinct) query-term list is broadcast and hash-joined against the
  exploded token stream, so the per-(doc, term) tf aggregation shuffles only
  matching postings — for a q-term query set that is O(q * df), not O(total
  tokens). Documents never shuffle whole; only (doc_id, dl, term) triples.
* Document frequency and the (N, avgdl) corpus stats are tiny relations
  (|vocab ∩ query terms| rows and 1 row) — both re-enter via broadcast, so
  the only non-broadcast exchanges are the postings aggregation and the
  final per-query top-k.
* Top-k per query is a rank-over-window on the scored candidates, which
  Spark executes as WindowGroupLimit (partial top-k before the exchange)
  — candidates per query are bounded by sum of df, never N.

Determinism contract (hash-exact vs the DuckDB oracle): per-(query, term,
doc) BM25 contributions are rounded to floor-micros BIGINT first and then
summed — integer sums are order-independent, so the aggregation is immune
to partial-aggregation order, and ranking ties on the integer score break
by doc_id. idf = ln((N - df + 0.5) / (df + 0.5) + 1.0) (the Robertson-
Sparck-Jones "+1" form that keeps idf positive) with ONE fixed evaluation
order mirrored token-for-token in the SQL twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.textstats import TOKENS_SQL_DUCK, tokens_col

# Default query set for the contract query: fixed literal phrases over the
# corpus vocabulary (queries are DATA here — the operator takes any list).
DEFAULT_QUERIES: list[tuple[int, str]] = [
    (1, "hash join"),
    (2, "window agg stream"),
    (3, "spark table scan"),
    (4, "slow merge"),
]

K1 = 1.2
B = 0.75


def bm25_postings(
    docs: DataFrame,
    terms_df: DataFrame,
    text_col: str = "text",
    max_df_frac: float | None = None,
) -> DataFrame:
    """(doc_id, dl, term, tf, df, n_docs_corpus, avgdl) query-term postings.

    Broadcast-semi-joins the term list against the exploded token stream
    BEFORE aggregating, so tf shuffles O(q * df) rows, never O(total
    tokens). `max_df_frac` is the stopword guard (VERDICT r3 item 8): a
    query term present in more than `max_df_frac * N` documents would make
    the downstream scored relation O(N) per such term while contributing
    ~zero idf — its postings are dropped right after df is known, before
    any scoring join. The cut is deterministic (a pure df threshold) and
    mirrored in the SQL twin, so oracles stay exact."""
    toks = tokens_col(F.col(text_col))
    docs_tok = docs.select("doc_id", F.size(toks).alias("dl"), toks.alias("toks"))

    # 1-row corpus stats; re-enters via broadcast (stays one lazy plan — no
    # collect, so the contract query is a single DataFrame).
    stats = docs_tok.agg(
        F.count(F.lit(1)).alias("n_docs_corpus"),
        (F.sum("dl") / F.count(F.lit(1))).alias("avgdl"),
    )
    postings = (
        docs_tok.select("doc_id", "dl", F.explode("toks").alias("term"))
        .join(F.broadcast(terms_df), "term")
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    out = postings.join(F.broadcast(dfreq), "term").crossJoin(F.broadcast(stats))
    if max_df_frac is not None:
        out = out.filter(F.col("df") <= max_df_frac * F.col("n_docs_corpus"))
    return out


def bm25_topk(
    docs: DataFrame,
    queries: list[tuple[int, str]] | None = None,
    text_col: str = "text",
    k1: float = K1,
    b: float = B,
    topk: int = 10,
    max_df_frac: float | None = None,
) -> DataFrame:
    """(q, doc_id, score_micros, rank): BM25 top-k docs per query.

    `queries`: [(query_id, "term term ...")]; terms are matched against the
    same whitespace tokenization every other text operator uses.
    `max_df_frac` drops query terms with df > frac*N before scoring (the
    stopword guard — see bm25_postings).
    """
    if queries is None:
        queries = DEFAULT_QUERIES
    spark = docs.sparkSession
    qterms = []
    for qid, qtext in queries:
        for term in qtext.strip().lower().split():
            qterms.append((qid, term))
    if not qterms:
        # schema inference fails on an empty list (ADVICE r2 ivf_topk class
        # of bug) — return an empty, correctly-typed result instead
        return spark.createDataFrame(
            [], "q long, doc_id long, score_micros long, rank int"
        )
    qterms_df = spark.createDataFrame(qterms, ["q", "term"])
    terms_df = qterms_df.select("term").distinct()

    scored = bm25_postings(docs, terms_df, text_col, max_df_frac).join(
        F.broadcast(qterms_df), "term"
    )
    idf = F.log(
        (F.col("n_docs_corpus") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    tf_part = (F.col("tf") * (k1 + 1.0)) / (
        F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
    )
    contrib = F.floor(idf * tf_part * 1_000_000).cast("bigint")
    totals = (
        scored.select("q", "doc_id", contrib.alias("c"))
        .groupBy("q", "doc_id")
        .agg(F.sum("c").alias("score_micros"))
    )
    w = Window.partitionBy("q").orderBy(
        F.col("score_micros").desc(), F.col("doc_id").asc()
    )
    return (
        totals.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select("q", "doc_id", "score_micros", "rank")
    )


def bm25_sql_duck(
    docs: str = "documents",
    queries: list[tuple[int, str]] | None = None,
    k1: float = K1,
    b: float = B,
    topk: int = 10,
    max_df_frac: float | None = None,
) -> str:
    """DuckDB twin — same tokenization, same fixed-order arithmetic, same
    floor-micros-then-integer-sum discipline, same (score desc, doc_id)
    ties, same df-cap cut when `max_df_frac` is set."""
    if queries is None:
        queries = DEFAULT_QUERIES
    df_cut = (
        f"WHERE d.df <= {max_df_frac} * s.n_docs_corpus"
        if max_df_frac is not None
        else ""
    )
    qterm_rows = ", ".join(
        f"({qid}, '{term}')"
        for qid, qtext in queries
        for term in qtext.strip().lower().split()
    )
    toks = TOKENS_SQL_DUCK.format(t="text")
    return f"""WITH qterms(q, term) AS (VALUES {qterm_rows}),
docs_tok AS (SELECT doc_id, {toks} AS toks FROM {docs}),
stats AS (
  SELECT count(*) AS n_docs_corpus,
         sum(len(toks)) / CAST(count(*) AS DOUBLE) AS avgdl
  FROM docs_tok
),
postings AS (
  SELECT doc_id, len(toks) AS dl, t.term, count(*) AS tf
  FROM docs_tok, unnest(toks) AS u(term)
  JOIN (SELECT DISTINCT term FROM qterms) t ON u.term = t.term
  GROUP BY doc_id, len(toks), t.term
),
dfreq AS (SELECT term, count(*) AS df FROM postings GROUP BY term),
scored AS (
  SELECT q.q, p.doc_id,
         CAST(floor(
           ln((s.n_docs_corpus - d.df + 0.5) / (d.df + 0.5) + 1.0)
           * ((p.tf * ({k1} + 1.0)) / (p.tf + {k1} * (1.0 - {b} + {b} * p.dl / s.avgdl)))
           * 1000000) AS BIGINT) AS c
  FROM postings p
  JOIN dfreq d ON p.term = d.term
  JOIN qterms q ON p.term = q.term
  CROSS JOIN stats s
  {df_cut}
),
totals AS (
  SELECT q, doc_id, CAST(sum(c) AS BIGINT) AS score_micros
  FROM scored GROUP BY q, doc_id
)
SELECT q, doc_id, score_micros,
       CAST(row_number() OVER (PARTITION BY q ORDER BY score_micros DESC, doc_id) AS INTEGER) AS rank
FROM totals
QUALIFY rank <= {topk}"""
