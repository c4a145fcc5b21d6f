"""Incremental KG ingest with Structured Streaming.

`readStream` over a parquet drop-directory of raw_files rows -> the SAME
detect + convert operators used by the batch pipeline (mapInPandas works
unchanged on streaming DataFrames) -> append sink partitioned like the batch
tables. Checkpointing rides Spark's streaming checkpoint (offsets + sink
commit log), so restart-resume comes for free here, unlike the batch layer's
manifest protocol (plans/checkpoint.py).

Trigger policy: `availableNow` drains the backlog exactly once (used in
tests and backfills); omit it for continuous micro-batches on a cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.convert import PAGES_SCHEMA, _convert_batches, is_confluence_mime_col
from pyspark.sql import functions as F

RAW_FILES_DDL = (
    "repo string, path string, commit string, lang string, content string, doc_id long"
)


def incremental_pages(spark: SparkSession, source_dir: str) -> DataFrame:
    """Streaming pages DataFrame from a raw_files drop directory."""
    raw = (
        spark.readStream.schema(RAW_FILES_DDL)
        .option("maxFilesPerTrigger", 8)
        .parquet(source_dir)
    )
    conf = raw.filter(is_confluence_mime_col(F.col("content")))
    return conf.select("doc_id", "repo", "path", "commit", "content").mapInPandas(
        _convert_batches, schema=PAGES_SCHEMA
    )


def run_incremental_build(
    spark: SparkSession,
    source_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Drain `source_dir` into a pages parquet sink; returns the query."""
    pages = incremental_pages(spark, source_dir)
    writer = (
        pages.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
