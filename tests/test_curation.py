"""Curation operators: decontamination, stratified sampling, and the
two-pass distributed prefix sum behind concat-and-chunk packing."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from confluence2md_spark.operators.curation import (
    decontaminate,
    distributed_token_offsets,
    pack_chunks,
    stratified_sample,
)


def test_decontaminate_flags_only_overlapping_docs(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta"),   # contains bench gram
            (2, "one two three four five six seven"),          # disjoint
            (3, "beta gamma delta epsilon zeta end token"),    # contains bench gram
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [("beta gamma delta epsilon zeta",)], "text string"
    )
    got = {r["doc_id"]: r.asDict() for r in decontaminate(docs, bench, n=5).collect()}
    assert got[1]["contaminated"] == 1 and got[1]["n_hit_grams"] == 1
    assert got[2]["contaminated"] == 0 and got[2]["n_hit_grams"] == 0
    assert got[3]["contaminated"] == 1
    # every doc appears, gram counts are n_tokens - n + 1
    assert got[1]["n_grams"] == 3 and got[2]["n_grams"] == 3


def test_decontaminate_plan_broadcasts_bench(spark):
    docs = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("w"), F.col("id").cast("string"), F.lit(" a b c d e")).alias(
            "text"
        ),
    )
    bench = spark.createDataFrame([("a b c d e",)], "text string")
    plan = decontaminate(docs, bench)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # bench side must never shuffle docs


def test_stratified_sample_deterministic_and_rate_shaped(spark):
    docs = spark.range(4000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("zz").alias("lang"),
    )
    a = {r["doc_id"] for r in stratified_sample(docs, {"en": 500_000}).collect()}
    b = {r["doc_id"] for r in stratified_sample(docs, {"en": 500_000}).collect()}
    assert a == b  # byte-reproducible, no RNG state
    # default rate 0 drops the other stratum entirely
    assert all(d % 2 == 0 for d in a)
    # ~50% of 2000 en docs within a loose binomial band
    assert 800 <= len(a) <= 1200
    # monotone: raising a stratum's rate only ADDS docs (hash key is fixed)
    c = {r["doc_id"] for r in stratified_sample(docs, {"en": 800_000}).collect()}
    assert a <= c


def test_distributed_prefix_sum_matches_naive(spark):
    """The two-pass scan must equal a single-node cumsum for every row,
    with streams deliberately spanning many range partitions."""
    rows = [
        (i, ["en", "de", "fr"][i % 3], "tok " * (1 + i % 7)) for i in range(300)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = {
        (r["doc_id"]): (r["n_tokens"], r["start_offset"])
        for r in distributed_token_offsets(docs, num_partitions=16).collect()
    }
    run: dict[str, int] = {}
    for i, lang, text in rows:
        n = len(text.split())
        assert got[i] == (n, run.get(lang, 0)), f"doc {i}"
        run[lang] = run.get(lang, 0) + n
    assert len(got) == 300


def test_pack_chunks_invariants(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = pack_chunks(docs, context_len=64).toPandas()
    assert len(out) == docs.count()
    # per-stream offsets are gapless: sorted by doc_id within lang, each
    # start_offset equals the previous start + n_tokens
    for _, g in out.sort_values("doc_id").groupby("lang"):
        expect = 0
        for _, r in g.iterrows():
            assert r["start_offset"] == expect
            expect += r["n_tokens"]
    # chunk span arithmetic
    spans = (out["start_offset"] + (out["n_tokens"] - 1).clip(lower=0)) // 64 - (
        out["start_offset"] // 64
    ) + 1
    assert (out["n_chunks_spanned"] == spans.where(out["n_tokens"] > 0, 0)).all()
    assert (out["n_chunks_spanned"] >= 1).all()  # sf docs all non-empty


def test_pack_chunks_usable_after_source_unpersisted(spark):
    """Result must be materialized before the internal persist is dropped —
    collecting twice returns identical offsets."""
    docs = spark.createDataFrame(
        [(i, "en", "a b c") for i in range(50)], "doc_id long, lang string, text string"
    )
    out = pack_chunks(docs, context_len=4)
    first = sorted((r["doc_id"], r["start_offset"]) for r in out.collect())
    second = sorted((r["doc_id"], r["start_offset"]) for r in out.collect())
    assert first == second == [(i, 3 * i) for i in range(50)]
