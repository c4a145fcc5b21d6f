"""Structured Streaming smoke: incremental ingest produces the same pages as
the batch path, and a second drained run picks up only new files."""

from __future__ import annotations

import os

from confluence2md_spark.sources.corpus import synth_raw_files
from confluence2md_spark.streaming.incremental import run_incremental_build


def test_incremental_matches_batch(spark, sf_dir, tmp_path):
    src = str(tmp_path / "drop")
    out = str(tmp_path / "pages")
    ckpt = str(tmp_path / "ckpt")

    raw = synth_raw_files(spark, sf_dir)
    first = raw.filter("doc_id < 100")
    first.write.mode("overwrite").parquet(src)

    q = run_incremental_build(spark, src, out, ckpt)
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    # batch-equivalent: pages for confluence rows among doc_id < 100
    from confluence2md_spark.operators.convert import convert_pages

    want = convert_pages(first).select("doc_id", "status", "title").collect()
    got_map = {r["doc_id"]: (r["status"], r["title"]) for r in got.collect()}
    assert len(got_map) == len(want)
    for r in want:
        assert got_map[r["doc_id"]] == (r["status"], r["title"])

    # incremental: append more files, drain again -> only new docs added
    raw.filter("doc_id >= 100 AND doc_id < 150").write.mode("append").parquet(src)
    q2 = run_incremental_build(spark, src, out, ckpt)
    q2.awaitTermination(120)
    got2 = spark.read.parquet(out)
    new_ids = {r["doc_id"] for r in got2.collect()} - set(got_map)
    assert new_ids and all(100 <= i < 150 for i in new_ids)
