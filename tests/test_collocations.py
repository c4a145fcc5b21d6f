"""PMI bigram collocations (functions/collocations.py): python mirror of
the per-term floor-ln-micros arithmetic, structural sanity (a glued pair
outranks independent words), and twin agreement. sf oracle equality runs
in test_entry_contract."""

from __future__ import annotations

import math
from collections import Counter

import pytest

from confluence2md_spark.functions.collocations import (
    pmi_bigrams,
    pmi_bigrams_sql_duck,
)

# "san francisco" always glued; filler words independent and frequent
_DOCS = [
    "san francisco is big and big is fine",
    "we like san francisco and san francisco likes us",
    "big and fine and big and fine",
    "san francisco san francisco san francisco",
    "fine big and is is and big fine",
]


def _ln_m(x: int) -> int:
    return math.floor(1_000_000 * math.log(x))


def _mirror(docs, min_count, topk):
    toksets = [d.strip().lower().split() for d in docs]
    uni = Counter(w for t in toksets for w in t)
    big = Counter((t[i], t[i + 1]) for t in toksets for i in range(len(t) - 1))
    tot_t = sum(len(t) for t in toksets)
    tot_b = sum(len(t) - 1 for t in toksets)
    rows = [
        (
            w1,
            w2,
            c,
            _ln_m(c) + 2 * _ln_m(tot_t) - _ln_m(tot_b) - _ln_m(uni[w1]) - _ln_m(uni[w2]),
        )
        for (w1, w2), c in big.items()
        if c >= min_count
    ]
    rows.sort(key=lambda r: (-r[3], r[0], r[1]))
    return rows[:topk]


def test_pmi_matches_python_mirror(spark):
    docs = spark.createDataFrame([(t,) for t in _DOCS], ["text"])
    got = [tuple(r) for r in pmi_bigrams(docs, min_count=2, topk=50).collect()]
    want = _mirror(_DOCS, 2, 50)
    assert got == want
    # the glued pair is the top collocation and scores strictly above
    # any filler-word bigram
    assert got[0][:2] == ("san", "francisco")
    fillers = [r for r in got if r[0] in ("and", "is", "big") and r[1] in ("and", "is", "big", "fine")]
    assert all(got[0][3] > r[3] for r in fillers)


def test_pmi_min_count_prunes(spark):
    docs = spark.createDataFrame([(t,) for t in _DOCS], ["text"])
    got = [tuple(r) for r in pmi_bigrams(docs, min_count=4, topk=50).collect()]
    assert got == _mirror(_DOCS, 4, 50)
    assert all(r[2] >= 4 for r in got)


def test_pmi_twin(spark):
    duckdb = pytest.importorskip("duckdb")
    docs = spark.createDataFrame([(t,) for t in _DOCS], ["text"])
    got = [tuple(r) for r in pmi_bigrams(docs, min_count=2, topk=50).collect()]
    vals = ", ".join("('" + t + "')" for t in _DOCS)
    sql = pmi_bigrams_sql_duck(
        docs=f"(SELECT * FROM (VALUES {vals}) AS t(text))", min_count=2, topk=50
    )
    twin = [tuple(r) for r in duckdb.connect().execute(sql).fetchall()]
    assert got == twin
