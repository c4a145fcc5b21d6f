"""MIME part decomposition as a first-class table (SURVEY.md §2.C3/C4).

The reference walks multipart parts inside one function call
(/root/reference/converter/mime.go:54-84); here the walk EXPLODES into a
`mime_parts` table — one row per part with the header map preserved
(MapType replaces Go's textproto.MIMEHeader) — so attachments, charset
audits, and part statistics are all ordinary DataFrame queries. Part bodies
are reduced to (sha256, length) inside the UDF; payload bytes never leave
the Python worker (SURVEY.md §4.3 shuffle hygiene).

`select_html_parts` reproduces the reference's selection rule (first part
whose media type is exactly text/html wins, mime.go:69) as a J10 window.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

from ..core.mimeparse import split_mime

MIME_PARTS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("status", StringType()),
        StructField("part_index", IntegerType()),
        StructField("media_type", StringType()),
        StructField("transfer_encoding", StringType()),
        StructField("charset", StringType()),
        StructField("filename", StringType()),
        StructField("headers", MapType(StringType(), StringType())),
        StructField("body_sha256", StringType()),
        StructField("body_bytes", LongType()),
    ]
)


def _parts_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        rows = {k: [] for k in MIME_PARTS_SCHEMA.fieldNames()}
        for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
            status, parts = split_mime(content or "")
            if not parts:
                rows["doc_id"].append(doc_id)
                rows["status"].append(status)
                rows["part_index"].append(-1)
                for k in ("media_type", "transfer_encoding", "charset", "filename", "body_sha256"):
                    rows[k].append("")
                rows["headers"].append({})
                rows["body_bytes"].append(0)
                continue
            for p in parts:
                rows["doc_id"].append(doc_id)
                rows["status"].append(status)
                rows["part_index"].append(p.part_index)
                rows["media_type"].append(p.media_type)
                rows["transfer_encoding"].append(p.transfer_encoding)
                rows["charset"].append(p.charset)
                rows["filename"].append(p.filename)
                rows["headers"].append(p.headers)
                rows["body_sha256"].append(p.body_sha256)
                rows["body_bytes"].append(len(p.body))
        yield pd.DataFrame(rows)


def explode_mime_parts(
    raw_files: DataFrame, num_partitions: int | None = None
) -> DataFrame:
    """raw_files -> mime_parts (one row per MIME part; -1 row for documents
    that fail to split, carrying the error status)."""
    from .convert import is_confluence_mime_col

    df = raw_files
    if "doc_id" not in df.columns:
        df = df.withColumn("doc_id", F.xxhash64("repo", "path", F.col("commit")))
    df = df.filter(is_confluence_mime_col(F.col("content")))
    if num_partitions:
        df = df.repartition(num_partitions)
    return df.select("doc_id", "content").mapInPandas(
        _parts_batches, schema=MIME_PARTS_SCHEMA
    )


def select_html_parts(parts: DataFrame) -> DataFrame:
    """C4: first text/html part per document (reference mime.go:65-86) via
    row_number over part order; documents with no html part are absent
    (quarantined upstream by convert's status)."""
    w = Window.partitionBy("doc_id").orderBy("part_index")
    return (
        parts.filter(F.col("media_type") == "text/html")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
