"""SemDeDup (operators/similarity.py semantic_dedup): planted duplicate
groups collapse to one survivor each, the drop ledger verifies exactly,
kept sets are sound within cells, and the output is deterministic. The
sf-fixture bounded audit runs in scripts/check_contract.py."""

from __future__ import annotations

import numpy as np
import pytest

from confluence2md_spark.operators.similarity import semantic_dedup


def _corpus():
    """4 tight groups of 5 near-identical vectors + 10 isolated ones.
    Near-identical members share an argmax cell under ANY centroid set,
    so one-survivor-per-group holds regardless of k-means quality."""
    rng = np.random.default_rng(3)
    rows = []
    vid = 0
    for g in range(4):
        center = np.zeros(16)
        center[4 * g : 4 * g + 4] = 10.0
        for _ in range(5):
            v = center + rng.normal(0, 0.05, 16)
            rows.append((vid, g, [float(x) for x in v]))
            vid += 1
    for j in range(10):
        v = rng.normal(0, 1, 16)
        rows.append((vid, 100 + j, [float(x) for x in v]))
        vid += 1
    return rows


def _cos(a, b):
    a, b = np.asarray(a), np.asarray(b)
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))


@pytest.fixture(scope="module")
def result(spark):
    df = spark.createDataFrame(_corpus(), ["vec_id", "label", "embedding"])
    return [
        tuple(r)
        for r in semantic_dedup(
            df, n_centroids=6, threshold=0.9, lloyd_iters=2
        ).collect()
    ]


def test_one_survivor_per_planted_group(result):
    kept_by_group = {}
    for vid, cell, ccos, keep, dup_of in result:
        if vid < 20 and keep:
            kept_by_group.setdefault(vid // 5, []).append(vid)
    assert sorted(kept_by_group) == [0, 1, 2, 3]
    for g, members in kept_by_group.items():
        assert len(members) == 1, (g, members)


def test_drop_ledger_verifies_exactly(result):
    vecs = {vid: v for vid, _, v in _corpus()}
    kept = {vid: cell for vid, cell, _, keep, _ in result if keep}
    for vid, cell, _, keep, dup_of in result:
        if keep:
            assert dup_of == -1
        else:
            assert dup_of in kept and kept[dup_of] == cell
            assert _cos(vecs[vid], vecs[dup_of]) > 0.9


def test_kept_set_sound_within_cells(result):
    vecs = {vid: v for vid, _, v in _corpus()}
    by_cell = {}
    for vid, cell, _, keep, _ in result:
        if keep:
            by_cell.setdefault(cell, []).append(vid)
    for members in by_cell.values():
        for i, a in enumerate(members):
            for b in members[i + 1 :]:
                assert _cos(vecs[a], vecs[b]) <= 0.9


def test_deterministic_and_total(spark, result):
    df = spark.createDataFrame(_corpus(), ["vec_id", "label", "embedding"])
    again = [
        tuple(r)
        for r in semantic_dedup(
            df, n_centroids=6, threshold=0.9, lloyd_iters=2
        ).collect()
    ]
    assert again == result
    assert sorted(r[0] for r in result) == list(range(30))


def test_overflow_cap_passes_tail_through(spark):
    df = spark.createDataFrame(_corpus(), ["vec_id", "label", "embedding"])
    res = semantic_dedup(
        df, n_centroids=1, threshold=0.9, lloyd_iters=0, max_cluster=10
    ).collect()
    # single cell of 30 with a 10-member budget: at most 10 greedy
    # decisions; the overflow tail must be kept verbatim, never dropped
    dropped = [r for r in res if not r["keep"]]
    assert all(r["dup_of"] != -1 for r in dropped)
    assert len(res) == 30
    assert len(dropped) <= 10
