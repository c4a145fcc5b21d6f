"""Graph analytics over the constructed KG (beyond triple extraction:
once the edge table exists, ranking its nodes is the first query a KG
consumer runs — e.g. pick canonical-page importance for curation weights).

PageRank here is EXACT-INTEGER power iteration: ranks live as BIGINT
"micros" (1.0 == 1_000_000) and every step uses integer division only —
    contrib(u)   = rank(u) DIV outdeg(u)
    rank'(v)     = 150_000 + (Σ contrib) * 850_000 DIV 1_000_000
so there is NO floating point anywhere: the result is bit-identical under
any partitioning / aggregation order and a DuckDB oracle can state it
exactly (unrolled one CTE per iteration — SQL recursion can't aggregate in
the recursive term, and a fixed small iteration count is the point: this is
the deterministic-contract variant of the algorithm, not a convergence
study). Classic simplifications, mirrored in both engines: simple graph
(distinct edges), dangling-node mass leaks (no redistribution).

Scale shape: each iteration is (edges ⋈ ranks on src) -> groupBy(dst) —
one shuffle per iteration keyed on node ids (never strings longer than the
id), with edges/outdeg persisted once and reused across iterations (and
unpersisted before returning — long-lived sessions like the contract driver
would otherwise leak cached blocks across queries). Lineage is truncated
with localCheckpoint every `checkpoint_every` iterations, the same
discipline as the connected-components loop — without it an iters=20 run
on a 10^12-edge graph carries an unbounded 20-join plan into every stage
resubmission.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DAMPING_MICROS = 850_000
BASE_MICROS = 1_000_000 - DAMPING_MICROS  # (1 - d) in micros


def _release_local_checkpoint(df: DataFrame) -> None:
    """Drop the cached blocks behind a localCheckpoint-ed DataFrame.
    Dataset.unpersist only covers CacheManager entries; a local checkpoint
    registers its RDD directly, reachable via the LogicalRDD node. Only
    call on checkpoints that nothing downstream will read again."""
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        pass  # best-effort: a leaked cache block is preferable to a crash


def pagerank_micros(
    edges: DataFrame,
    src: str = "subj",
    dst: str = "obj",
    iters: int = 5,
    topk: int | None = None,
    checkpoint_every: int = 5,
) -> DataFrame:
    """(page, rank_micros) after `iters` exact-integer power iterations.

    `edges` is any (src, dst) relation; duplicates are dropped. If `topk`
    is set, returns the top-k by (rank desc, page asc). Every
    `checkpoint_every` iterations the ranks relation is localCheckpoint-ed
    (eager) so the logical plan stays O(checkpoint_every) joins deep no
    matter how many iterations run.
    """
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
        .persist()
    )
    nodes = (
        e.select(F.col("src").alias("page"))
        .unionByName(e.select(F.col("dst").alias("page")))
        .distinct()
        .persist()
    )
    try:
        outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
        ranks = nodes.select(
            "page", F.lit(1_000_000).cast("bigint").alias("rank_micros")
        )
        prev_ckpt: DataFrame | None = None
        for i in range(iters):
            contrib = (
                e.join(ranks.withColumnRenamed("page", "src"), "src")
                .join(outdeg, "src")
                .select(
                    F.col("dst").alias("page"),
                    F.expr("rank_micros DIV d").alias("c"),
                )
            )
            sums = contrib.groupBy("page").agg(F.sum("c").alias("c"))
            ranks = nodes.join(sums, "page", "left").select(
                "page",
                (
                    F.lit(BASE_MICROS)
                    + F.expr(f"coalesce(c, 0) * {DAMPING_MICROS} DIV 1000000")
                )
                .cast("bigint")
                .alias("rank_micros"),
            )
            if (i + 1) % checkpoint_every == 0 and (i + 1) < iters:
                ranks = ranks.localCheckpoint(eager=True)
                if prev_ckpt is not None:  # superseded — release its blocks
                    _release_local_checkpoint(prev_ckpt)
                prev_ckpt = ranks
        if topk is not None:
            ranks = ranks.orderBy(F.desc("rank_micros"), F.asc("page")).limit(topk)
        # materialize before dropping the caches the plan depends on; this
        # final checkpoint is the RESULT and stays alive for the consumer
        ranks = ranks.localCheckpoint(eager=True)
        if prev_ckpt is not None:
            _release_local_checkpoint(prev_ckpt)
    finally:
        e.unpersist()
        nodes.unpersist()
    return ranks


def pagerank_sql_duck(
    edges_cte_body: str, iters: int = 5, topk: int = 20
) -> str:
    """DuckDB twin: `edges_cte_body` is a SELECT yielding (subj, obj);
    iterations are unrolled one CTE each with the identical integer
    arithmetic (// is flooring division; all values non-negative, matching
    Spark's DIV)."""
    parts = [
        f"e AS (SELECT DISTINCT subj AS src, obj AS dst FROM ({edges_cte_body}))",
        "nodes AS (SELECT src AS page FROM e UNION SELECT dst FROM e)",
        "outdeg AS (SELECT src, count(*) AS d FROM e GROUP BY src)",
        "r0 AS (SELECT page, CAST(1000000 AS BIGINT) AS rank_micros FROM nodes)",
    ]
    for i in range(iters):
        parts.append(
            f"""r{i + 1} AS (
  SELECT n.page,
         CAST({BASE_MICROS} + COALESCE(s.c, 0) * {DAMPING_MICROS} // 1000000 AS BIGINT) AS rank_micros
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS page, CAST(sum(r.rank_micros // o.d) AS BIGINT) AS c
    FROM e JOIN r{i} r ON e.src = r.page JOIN outdeg o ON e.src = o.src
    GROUP BY e.dst
  ) s ON n.page = s.page
)"""
        )
    return (
        "WITH " + ",\n".join(parts) + f"""
SELECT page, rank_micros FROM r{iters}
ORDER BY rank_micros DESC, page ASC LIMIT {topk}"""
    )


def weighted_pagerank_micros(
    edges: DataFrame,
    src: str = "subj",
    dst: str = "obj",
    weight: str = "w",
    iters: int = 5,
    topk: int | None = None,
    checkpoint_every: int = 5,
) -> DataFrame:
    """PageRank with integer edge weights (e.g. the canonical edge
    table's n_sources multiplicity — a link asserted by more source
    pages carries proportionally more mass):

        contrib(u -> v) = rank(u) * w(u, v) DIV W(u)     (W = out-weight)
        rank'(v)        = 150_000 + (Σ contrib) * 850_000 DIV 1_000_000

    Same exact-integer discipline as pagerank_micros (DIV-only, dangling
    mass leaks, bit-identical under any aggregation order); per-edge
    multiplication keeps int64 headroom (rank ~1e6-scale × bounded
    multiplicity). Duplicate (src, dst) rows are summed into one weighted
    edge. One node-id-keyed shuffle per iteration; localCheckpoint
    lineage discipline as the unweighted loop."""
    e = (
        edges.select(
            F.col(src).alias("src"),
            F.col(dst).alias("dst"),
            F.col(weight).cast("bigint").alias("w"),
        )
        .groupBy("src", "dst")
        .agg(F.sum("w").alias("w"))
        .persist()
    )
    nodes = (
        e.select(F.col("src").alias("page"))
        .unionByName(e.select(F.col("dst").alias("page")))
        .distinct()
        .persist()
    )
    try:
        outw = e.groupBy("src").agg(F.sum("w").alias("tw"))
        ranks = nodes.select(
            "page", F.lit(1_000_000).cast("bigint").alias("rank_micros")
        )
        prev_ckpt: DataFrame | None = None
        for i in range(iters):
            contrib = (
                e.join(ranks.withColumnRenamed("page", "src"), "src")
                .join(outw, "src")
                .select(
                    F.col("dst").alias("page"),
                    F.expr("rank_micros * w DIV tw").alias("c"),
                )
            )
            sums = contrib.groupBy("page").agg(F.sum("c").alias("c"))
            ranks = nodes.join(sums, "page", "left").select(
                "page",
                (
                    F.lit(BASE_MICROS)
                    + F.expr(f"coalesce(c, 0) * {DAMPING_MICROS} DIV 1000000")
                )
                .cast("bigint")
                .alias("rank_micros"),
            )
            if (i + 1) % checkpoint_every == 0 and (i + 1) < iters:
                ranks = ranks.localCheckpoint(eager=True)
                if prev_ckpt is not None:
                    _release_local_checkpoint(prev_ckpt)
                prev_ckpt = ranks
        if topk is not None:
            ranks = ranks.orderBy(F.desc("rank_micros"), F.asc("page")).limit(topk)
        ranks = ranks.localCheckpoint(eager=True)
        if prev_ckpt is not None:
            _release_local_checkpoint(prev_ckpt)
    finally:
        e.unpersist()
        nodes.unpersist()
    return ranks


def weighted_pagerank_sql_duck(
    edges_cte_body: str, iters: int = 5, topk: int = 20
) -> str:
    """DuckDB twin: `edges_cte_body` yields (subj, obj, w); identical
    per-edge integer arithmetic, unrolled one CTE per iteration."""
    parts = [
        f"e AS (SELECT subj AS src, obj AS dst, CAST(sum(w) AS BIGINT) AS w "
        f"FROM ({edges_cte_body}) GROUP BY subj, obj)",
        "nodes AS (SELECT src AS page FROM e UNION SELECT dst FROM e)",
        "outw AS (SELECT src, CAST(sum(w) AS BIGINT) AS tw FROM e GROUP BY src)",
        "r0 AS (SELECT page, CAST(1000000 AS BIGINT) AS rank_micros FROM nodes)",
    ]
    for i in range(iters):
        parts.append(
            f"""r{i + 1} AS (
  SELECT n.page,
         CAST({BASE_MICROS} + COALESCE(s.c, 0) * {DAMPING_MICROS} // 1000000 AS BIGINT) AS rank_micros
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS page, CAST(sum(r.rank_micros * e.w // o.tw) AS BIGINT) AS c
    FROM e JOIN r{i} r ON e.src = r.page JOIN outw o ON e.src = o.src
    GROUP BY e.dst
  ) s ON n.page = s.page
)"""
        )
    return (
        "WITH " + ",\n".join(parts) + f"""
SELECT page, rank_micros FROM r{iters}
ORDER BY rank_micros DESC, page ASC LIMIT {topk}"""
    )


def personalized_pagerank_micros(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "subj",
    dst: str = "obj",
    iters: int = 5,
    topk: int | None = None,
    checkpoint_every: int = 5,
) -> DataFrame:
    """Personalized PageRank: restart mass goes only to `seeds` (a
    DataFrame with a `page` column) instead of uniformly to every node —
    the KG-navigation primitive ("what matters near THESE pages") used for
    seed-based corpus expansion and entity-neighborhood curation.

    Same exact-integer discipline as pagerank_micros, with the restart
    vector scaled so total injected mass matches the uniform variant:
        base(v) = (1-d)·1e6 · N DIV |S|   if v ∈ S else 0
        init(v) = 1e6 · N DIV |S|          if v ∈ S else 0
    N and |S| enter via a broadcast 1-row stats relation (no driver
    collect). Dangling mass leaks, duplicates dropped — mirrored exactly
    in the unrolled-CTE DuckDB twin. One node-id-keyed shuffle per
    iteration; lineage localCheckpoint-ed every `checkpoint_every`."""
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
        .persist()
    )
    nodes = (
        e.select(F.col("src").alias("page"))
        .unionByName(e.select(F.col("dst").alias("page")))
        .distinct()
        .persist()
    )
    base_rel = None
    try:
        outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
        stats = (
            nodes.agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"))
            .crossJoin(
                seeds.select("page")
                .distinct()
                .agg(F.count(F.lit(1)).cast("bigint").alias("n_seeds"))
            )
        )
        base_rel = (
            nodes.join(
                seeds.select("page").distinct().withColumn("is_seed", F.lit(1)),
                "page",
                "left",
            )
            .crossJoin(F.broadcast(stats))
            .select(
                "page",
                F.when(
                    F.col("is_seed") == 1,
                    F.expr(f"{BASE_MICROS} * n_nodes DIV n_seeds"),
                )
                .otherwise(F.lit(0))
                .cast("bigint")
                .alias("base_micros"),
                F.when(
                    F.col("is_seed") == 1,
                    F.expr("1000000 * n_nodes DIV n_seeds"),
                )
                .otherwise(F.lit(0))
                .cast("bigint")
                .alias("init_micros"),
            )
            .persist()
        )
        ranks = base_rel.select(
            "page", F.col("init_micros").alias("rank_micros")
        )
        prev_ckpt: DataFrame | None = None
        for i in range(iters):
            contrib = (
                e.join(ranks.withColumnRenamed("page", "src"), "src")
                .join(outdeg, "src")
                .select(
                    F.col("dst").alias("page"),
                    F.expr("rank_micros DIV d").alias("c"),
                )
            )
            sums = contrib.groupBy("page").agg(F.sum("c").alias("c"))
            ranks = base_rel.join(sums, "page", "left").select(
                "page",
                (
                    F.col("base_micros")
                    + F.expr(f"coalesce(c, 0) * {DAMPING_MICROS} DIV 1000000")
                )
                .cast("bigint")
                .alias("rank_micros"),
            )
            if (i + 1) % checkpoint_every == 0 and (i + 1) < iters:
                ranks = ranks.localCheckpoint(eager=True)
                if prev_ckpt is not None:
                    _release_local_checkpoint(prev_ckpt)
                prev_ckpt = ranks
        if topk is not None:
            ranks = ranks.orderBy(F.desc("rank_micros"), F.asc("page")).limit(
                topk
            )
        ranks = ranks.localCheckpoint(eager=True)
        if prev_ckpt is not None:
            _release_local_checkpoint(prev_ckpt)
    finally:
        e.unpersist()
        nodes.unpersist()
        if base_rel is not None:
            base_rel.unpersist()
    return ranks


def personalized_pagerank_sql_duck(
    edges_cte_body: str, seeds_predicate: str, iters: int = 5, topk: int = 20
) -> str:
    """DuckDB twin. `seeds_predicate` is a boolean SQL expression over the
    `page` column selecting the seed set (evaluated on the node list, so
    both engines derive seeds from the same rule)."""
    parts = [
        f"e AS (SELECT DISTINCT subj AS src, obj AS dst FROM ({edges_cte_body}))",
        "nodes AS (SELECT src AS page FROM e UNION SELECT dst FROM e)",
        "outdeg AS (SELECT src, count(*) AS d FROM e GROUP BY src)",
        f"seeds AS (SELECT page FROM nodes WHERE {seeds_predicate})",
        "stats AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM nodes) AS n_nodes, "
        "(SELECT CAST(count(*) AS BIGINT) FROM seeds) AS n_seeds)",
        f"""base AS (
  SELECT n.page,
         CAST(CASE WHEN s.page IS NOT NULL
              THEN {BASE_MICROS} * st.n_nodes // st.n_seeds ELSE 0 END AS BIGINT) AS base_micros,
         CAST(CASE WHEN s.page IS NOT NULL
              THEN 1000000 * st.n_nodes // st.n_seeds ELSE 0 END AS BIGINT) AS init_micros
  FROM nodes n LEFT JOIN seeds s ON n.page = s.page CROSS JOIN stats st
)""",
        "r0 AS (SELECT page, init_micros AS rank_micros FROM base)",
    ]
    for i in range(iters):
        parts.append(
            f"""r{i + 1} AS (
  SELECT b.page,
         CAST(b.base_micros + COALESCE(s.c, 0) * {DAMPING_MICROS} // 1000000 AS BIGINT) AS rank_micros
  FROM base b LEFT JOIN (
    SELECT e.dst AS page, CAST(sum(r.rank_micros // o.d) AS BIGINT) AS c
    FROM e JOIN r{i} r ON e.src = r.page JOIN outdeg o ON e.src = o.src
    GROUP BY e.dst
  ) s ON b.page = s.page
)"""
        )
    return (
        "WITH " + ",\n".join(parts) + f"""
SELECT page, rank_micros FROM r{iters}
ORDER BY rank_micros DESC, page ASC LIMIT {topk}"""
    )
