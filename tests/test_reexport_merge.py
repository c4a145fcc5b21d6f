"""Re-export retraction merge (sources/catalog.py reexport_merge*): the
rebuild-equivalence property at pipeline level, idempotence, full-subject
retraction, the staged-swap file path, and the Iceberg DELETE+APPEND
branch."""

from __future__ import annotations

from unittest import mock

from pyspark.sql import functions as F

from confluence2md_spark.sources import catalog


def _full_edges(spark, sf_dir):
    from confluence2md_spark.operators.canon import (
        build_canonical_map,
        canonicalize_triples,
    )
    from confluence2md_spark.operators.convert import convert_pages
    from confluence2md_spark.operators.triples import extract_all_triples
    from confluence2md_spark.sources.corpus import synth_raw_files

    raw = synth_raw_files(spark, sf_dir)
    pages = convert_pages(raw.filter("doc_id < 120"))
    cmap = build_canonical_map(pages)
    return canonicalize_triples(extract_all_triples(pages), cmap)


def _stale(full, subjects):
    """Perturb ONLY the re-exported subjects' rows: stale n_sources
    inflation, one missing (newly-added) edge, one planted stale edge."""
    in_s = full.join(subjects, "subj", "semi")
    out_s = full.join(subjects, "subj", "anti")
    first = in_s.orderBy("subj", "pred", "obj").limit(1)
    fake = first.select(
        "subj",
        F.lit("links_to").alias("pred"),
        F.lit("page:999999").alias("obj"),
        *[
            F.col(c)
            for c in full.columns
            if c not in ("subj", "pred", "obj", "n_sources")
        ],
        (F.col("n_sources") * 0 + 1).alias("n_sources"),
    ).select(*full.columns)
    perturbed = (
        in_s.join(first.select("subj", "pred", "obj"), ["subj", "pred", "obj"], "anti")
        .withColumn("n_sources", F.col("n_sources") * 3)
    )
    return out_s.unionByName(perturbed).unionByName(fake)


def _key(rows, cols):
    return {
        (r["subj"], r["pred"], r["obj"]): tuple(
            r[c] for c in cols if c not in ("subj", "pred", "obj")
        )
        for r in rows
    }


def test_reexport_equals_rebuild(spark, sf_dir, tmp_path):
    full = _full_edges(spark, sf_dir).localCheckpoint(eager=True)
    subjects = (
        full.filter(F.xxhash64("subj") % 3 == 0).select("subj").distinct()
    )
    delta = full.join(subjects, "subj", "semi")
    old = _stale(full, subjects)
    assert _key(old.collect(), full.columns) != _key(full.collect(), full.columns)

    merged = catalog.reexport_merge_delta(old, delta, subjects)
    assert _key(merged.collect(), full.columns) == _key(
        full.collect(), full.columns
    )

    # idempotence: re-applying the same re-export is a no-op
    again = catalog.reexport_merge_delta(merged, delta, subjects)
    assert _key(again.collect(), full.columns) == _key(
        full.collect(), full.columns
    )

    # a subject re-exported with an EMPTY delta disappears entirely
    gone = catalog.reexport_merge_delta(
        full, full.limit(0), subjects
    )
    assert gone.join(subjects, "subj", "semi").count() == 0

    # file-level staged swap: old table on disk -> re-export -> rebuilt
    wh = str(tmp_path)
    old.write.partitionBy("pred").parquet(f"{wh}/edges")
    catalog.reexport_merge(spark, wh, delta, subjects)
    got = spark.read.parquet(f"{wh}/edges")
    assert _key(got.collect(), full.columns) == _key(
        full.collect(), full.columns
    )
    import glob

    assert not glob.glob(f"{wh}/edges.bak-*")  # swap left no debris


def test_retract_sql_parses(spark):
    parser = spark._jsparkSession.sessionState().sqlParser()
    parser.parsePlan(catalog.RETRACT_REEXPORTED_SQL.format(ns="kg"))


def test_reexport_iceberg_branch(monkeypatch):
    monkeypatch.setenv("KG_USE_ICEBERG", "1")
    monkeypatch.setenv("KG_NAMESPACE", "testns")
    sp = mock.MagicMock()
    delta, subjects = mock.MagicMock(), mock.MagicMock()
    sp.sql.return_value.collect.return_value = [(4242,)]
    out = catalog.reexport_merge(sp, "/ignored", delta, subjects)
    assert out == "testns.edges"
    subjects.createOrReplaceTempView.assert_called_once_with(
        "reexported_subjects"
    )
    # snapshot recorded BEFORE the retraction; no rollback on success
    assert sp.sql.call_args_list == [
        mock.call(catalog.CURRENT_SNAPSHOT_SQL.format(ns="testns")),
        mock.call(catalog.RETRACT_REEXPORTED_SQL.format(ns="testns")),
    ]
    delta.writeTo.assert_called_once_with("testns.edges")
    delta.writeTo.return_value.append.assert_called_once_with()


def test_reexport_iceberg_rolls_back_on_append_failure(monkeypatch):
    """A crash between the DELETE and the APPEND commits must not durably
    lose the retracted edges: the pre-DELETE snapshot is restored."""
    monkeypatch.setenv("KG_USE_ICEBERG", "1")
    monkeypatch.setenv("KG_NAMESPACE", "testns")
    monkeypatch.setenv("KG_CATALOG", "cat")
    sp = mock.MagicMock()
    sp.sql.return_value.collect.return_value = [(777,)]
    delta, subjects = mock.MagicMock(), mock.MagicMock()
    delta.writeTo.return_value.append.side_effect = RuntimeError("boom")
    try:
        catalog.reexport_merge(sp, "/ignored", delta, subjects)
        raise AssertionError("append failure must propagate")
    except RuntimeError:
        pass
    assert sp.sql.call_args_list == [
        mock.call(catalog.CURRENT_SNAPSHOT_SQL.format(ns="testns")),
        mock.call(catalog.RETRACT_REEXPORTED_SQL.format(ns="testns")),
        mock.call(
            catalog.ROLLBACK_SNAPSHOT_SQL.format(
                catalog="cat", ns="testns", snapshot_id=777
            )
        ),
    ]


def test_snapshot_sql_parses(spark):
    parser = spark._jsparkSession.sessionState().sqlParser()
    parser.parsePlan(catalog.CURRENT_SNAPSHOT_SQL.format(ns="kg"))
