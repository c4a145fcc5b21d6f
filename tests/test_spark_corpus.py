"""Corpus parity: the Spark-side and DuckDB-side constructions of raw_files
must be byte-identical (sha256 per row) — this underwrites every closed-form
oracle and the K4 content-equality invariant."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from confluence2md_spark.core import convert_document
from confluence2md_spark.sources.corpus import duckdb_raw_files_cte, synth_raw_files


@pytest.fixture(scope="module")
def raw(spark, sf_dir):
    return synth_raw_files(spark, sf_dir).persist()


def test_spark_duckdb_byte_parity(spark, sf_dir, raw):
    spark_rows = {
        r["doc_id"]: (r["h"], r["repo"], r["path"], r["lang"])
        for r in raw.select(
            "doc_id", F.sha2("content", 256).alias("h"), "repo", "path", "lang"
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    duck = con.execute(
        f"WITH raw_files AS ({duckdb_raw_files_cte()}) "
        "SELECT doc_id, lower(sha256(content)), repo, path, lang FROM raw_files"
    ).fetchall()
    assert len(duck) == len(spark_rows) == 500
    for doc_id, h, repo, path, lang in duck:
        assert spark_rows[doc_id] == (h, repo, path, lang)


def test_row_class_statuses(raw):
    rows = raw.select("doc_id", "content").collect()
    for r in rows:
        res = convert_document(r["content"])
        i = r["doc_id"]
        if i % 11 == 3:
            assert res.status == "not_confluence", i
        elif i % 97 == 95:
            assert res.status == "not_multipart", i
        elif i % 97 == 96:
            assert res.status == "no_html_part", i
        else:
            assert res.status == "ok", i
            t = i - 7 if i % 10 == 7 else i
            assert res.title == f"Page {t}"


def test_qp_rows_decode(raw):
    row = raw.filter("doc_id = 0").collect()[0]
    res = convert_document(row["content"])
    assert "QP test: a = b" in res.markdown  # =3D escape decoded
    assert "=3D" not in res.markdown


def test_input_shape(raw):
    # BASELINE.json input_hint: (repo, path, commit, lang, content) (+doc_id)
    assert set(raw.columns) == {"repo", "path", "commit", "lang", "content", "doc_id"}
    assert raw.filter("repo = 'repo-hot'").count() == 300  # 60% hot-repo skew
