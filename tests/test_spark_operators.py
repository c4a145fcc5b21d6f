"""Operator-level Spark tests: MinHash/LSH linking, connected components,
SimHash, ANN recall, salted repartition, multimodal plumbing."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from confluence2md_spark.operators.components import connected_components
from confluence2md_spark.operators.dedup import (
    simhash_near_dup_pairs,
    simhash_signatures,
)
from confluence2md_spark.operators.linking import lsh_candidate_pairs
from confluence2md_spark.operators.multimodal import (
    attach_binary_payload,
    decode_image_meta,
)
from confluence2md_spark.operators.similarity import brute_force_topk, lsh_ann_topk
from confluence2md_spark.plans.skew import hot_keys, salted_repartition


# ------------------------------------------------------------- linking ----

def test_lsh_finds_exact_and_near_dups(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
        (3, "the quick brown fox jumped over the lazy dog"),  # near dup
        (4, "completely different text about spark pipelines"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "title"])
    pairs = {
        (r["src"], r["dst"]): r["jaccard"]
        for r in lsh_candidate_pairs(
            df, id_col="doc_id", text_col="title", threshold=0.5, mode="chars"
        ).collect()
    }
    assert pairs[(1, 2)] == 1.0
    assert (1, 3) in pairs and pairs[(1, 3)] >= 0.5
    assert not any(4 in p for p in pairs)


def test_word_mode_requires_token_identity(spark):
    df = spark.createDataFrame(
        [(1, "Page 1"), (2, "Page 10"), (3, "Page 1")], ["doc_id", "title"]
    )
    pairs = {
        (r["src"], r["dst"])
        for r in lsh_candidate_pairs(
            df, id_col="doc_id", text_col="title", threshold=0.8, mode="words"
        ).collect()
    }
    assert pairs == {(1, 3)}


def test_minhash_word_ngrams_near_dup(spark):
    from confluence2md_spark.operators.dedup import minhash_near_dup_pairs

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5
    rows = [(1, base), (2, base + "lambda mu nu"), (3, "totally different words here " * 10)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = {(r["src"], r["dst"]): r["jaccard"] for r in minhash_near_dup_pairs(df).collect()}
    assert set(pairs) == {(1, 2)}
    assert pairs[(1, 2)] > 0.7


# ---------------------------------------------------------- components ----

def test_cc_chain_and_cycle_and_isolated(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (12, 10), (20, 21)],
        ["src", "dst"],
    )
    comp = {r["id"]: r["component"] for r in connected_components(edges).collect()}
    assert comp[1] == comp[2] == comp[3] == comp[4] == 1
    assert comp[10] == comp[11] == comp[12] == 10
    assert comp[20] == comp[21] == 20


def test_lsh_exact_fallback_survives_dropped_buckets(spark):
    """ADVICE r1: with max_bucket_size=0 every band bucket is dropped, yet
    identical titles must still pair via the exact-hash star fallback."""
    from confluence2md_spark.operators.linking import lsh_candidate_pairs

    rows = [(i, f"Page {i}") for i in range(20)] + [(100, "Page 3"), (101, "Page 3")]
    df = spark.createDataFrame(rows, ["doc_id", "title"])
    pairs = lsh_candidate_pairs(
        df, k=16, bands=4, mode="words", max_bucket_size=0, num_partitions=4
    ).collect()
    got = {(r["src"], r["dst"]) for r in pairs}
    # star edges: min id 3 links to both 100 and 101 (not the 100-101 pair)
    assert (3, 100) in got and (3, 101) in got
    assert all(r["jaccard"] == 1.0 for r in pairs)
    # and without the fallback the same input finds nothing
    none = lsh_candidate_pairs(
        df, k=16, bands=4, mode="words", max_bucket_size=0,
        num_partitions=4, exact_fallback=False,
    ).count()
    assert none == 0


def test_output_name_plus_only_in_basename(spark):
    from confluence2md_spark.operators.convert import output_name_col
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("a+b/docs/page+7.doc",), ("page+1.doc",), ("x/y.doc",)], ["path"]
    )
    out = [r[0] for r in df.select(output_name_col(F.col("path"))).collect()]
    assert out == ["a+b/docs/page-7.md", "page-1.md", "x/y.md"]


def test_ann_lsh_derives_dim_from_data(spark):
    """ADVICE r1: a non-64-d embedding column must not silently collapse
    every vector into bucket 0 (null dot products)."""
    import random

    from confluence2md_spark.operators.similarity import lsh_ann_topk

    rnd = random.Random(7)
    rows = [(i, [rnd.gauss(0, 1) for _ in range(16)]) for i in range(30)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = lsh_ann_topk(df, n_queries=3, k=2, bits=2, tables=4)
    got = out.collect()
    assert len(got) > 0 and all(r["cosine"] is not None for r in got)
    import pytest

    with pytest.raises(AssertionError, match="dim"):
        lsh_ann_topk(df, n_queries=3, k=2, bits=2, tables=4, dim=64)


def test_synth_raw_files_tolerates_braces_in_text(spark, tmp_path):
    """ADVICE r1: corpus text containing literal {}/JSON must not break the
    template substitution."""
    import pandas as pd

    from confluence2md_spark.sources.corpus import synth_raw_files

    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": ['body {"k": 1} and {braces}', "plain", "css { margin: 0 }"],
            "lang": ["en", "en", "en"],
            "source": ["s0", "s1", "s2"],
            "n_chars": [10, 5, 8],
        }
    )
    pdf.to_parquet(str(tmp_path / "documents.parquet"))
    rf = synth_raw_files(spark, str(tmp_path))
    rows = {r["doc_id"]: r["content"] for r in rf.collect()}
    assert len(rows) == 3
    assert '{"k": 1}' in rows[0] and "{braces}" in rows[0]


def test_cc_fixpoint_guard_fires_on_long_chain(spark):
    """A path graph with diameter > max_iter must NOT return silently wrong
    labels: raise by default, warn when asked (VERDICT r1 item 7)."""
    import warnings

    import pytest

    path_edges = spark.createDataFrame(
        [(i, i + 1) for i in range(10)], ["src", "dst"]
    )
    with pytest.raises(RuntimeError, match="fixpoint"):
        connected_components(path_edges, max_iter=2, driver_max_edges=0)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        labels = connected_components(
            path_edges, max_iter=2, on_max_iter="warn", driver_max_edges=0
        )
        labels.collect()
    assert any("fixpoint" in str(w.message) for w in caught)
    # enough iterations -> converges, no guard
    comp = {
        r["id"]: r["component"]
        for r in connected_components(
            path_edges, max_iter=15, driver_max_edges=0
        ).collect()
    }
    assert all(c == 0 for c in comp.values())


def test_canonicalize_broadcasts_alias_only_remnant(spark):
    """The rewrite joins must broadcast ONLY the canon_id != doc_id remnant
    (VERDICT r1 item 1): identity rows rewrite via coalesce, and the plan's
    broadcast side stays proportional to alias count, not corpus size."""
    from confluence2md_spark.operators.canon import alias_only, canonicalize_triples

    cmap = spark.createDataFrame(
        [(i, i if i != 7 else 0) for i in range(100)], ["doc_id", "canon_id"]
    )
    assert alias_only(cmap).count() == 1  # only 7 -> 0
    triples = spark.createDataFrame(
        [("page:7", "links_to", "page:3", "page", "page", 7, "r", 1.0),
         ("page:3", "links_to", "page:7", "page", "page", 3, "r", 1.0)],
        ["subj", "pred", "obj", "subj_type", "obj_type", "doc_id", "repo", "confidence"],
    )
    out = {(r["subj"], r["obj"]) for r in canonicalize_triples(triples, cmap).collect()}
    assert out == {("page:0", "page:3"), ("page:3", "page:0")}


# -------------------------------------------------------------- simhash ---

def test_simhash_deterministic_and_finds_dups(spark):
    rows = [
        (1, "spark window merge join filter scan " * 10),
        (2, "spark window merge join filter scan " * 10),
        (3, "entirely unrelated words banana apple cherry kiwi " * 10),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    sig = {r["doc_id"]: r["simhash"] for r in simhash_signatures(df).collect()}
    sig2 = {r["doc_id"]: r["simhash"] for r in simhash_signatures(df).collect()}
    assert sig == sig2  # deterministic across runs
    assert sig[1] == sig[2] != sig[3]
    pairs = {(r["src"], r["dst"]) for r in simhash_near_dup_pairs(df).collect()}
    assert (1, 2) in pairs


def test_fnv1a_bulk_matches_scalar():
    """Differential twin promised in _fnv1a_bulk's docstring: the padded-
    matrix numpy kernel must be bit-identical to the per-byte scalar
    reference on corpus-ish, adversarial, and empty tokens."""
    from confluence2md_spark.operators.dedup import _fnv1a, _fnv1a_bulk

    toks = [
        "", "a", "spark", "merge-join", "naïve", "日本語テキスト",
        "x" * 300,  # longer than every other token: exercises the mask tail
        "\x00\x01\xff", "UPPER lower MiXeD", "🎉🎊", "tab\there",
    ] + [f"tok{i}" for i in range(100)]
    enc = [t.encode("utf-8") for t in toks]
    bulk = _fnv1a_bulk(enc)
    assert bulk.dtype == np.uint64 and len(bulk) == len(toks)
    for t, h in zip(toks, bulk.tolist()):
        assert h == _fnv1a(t), repr(t)
    assert len(_fnv1a_bulk([])) == 0


def test_simhash_vectorized_matches_scalar_reference():
    """The factorize+reduceat batch path must produce the same signatures
    as a direct per-row scalar simhash built from _fnv1a (the r3 semantics),
    so the banded pair set is unchanged by the vectorization."""
    from confluence2md_spark.operators.dedup import _fnv1a, _simhash64_fnv

    def scalar_simhash(t: str) -> int:
        toks = t.lower().split()
        if not toks:
            return 0
        hs = np.array([_fnv1a(tok) for tok in toks], dtype=np.uint64)
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(np.int32)
        votes = bits.sum(axis=0) * 2 - len(toks)
        sig = int(((votes >= 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())
        return sig - (1 << 64) if sig >= (1 << 63) else sig

    texts = [
        "", "   ", "one", "one one one", "Spark SQL window MERGE join",
        "entirely unrelated words banana apple cherry kiwi",
        "spark window merge join filter scan " * 10,
        "naïve café déjà-vu 日本語 テキスト",
        "a b c d e f g h i j k l m n o p q r s t u v w x y z",
        None,
    ]
    got = _simhash64_fnv(pd.Series(texts)).tolist()
    want = [scalar_simhash(t or "") for t in texts]
    assert got == want


# ----------------------------------------------------------------- ANN ----

def test_lsh_ann_recall_vs_brute(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    brute = brute_force_topk(emb, n_queries=10, k=5).collect()
    ann = lsh_ann_topk(emb, n_queries=10, k=5, bits=4, tables=16).collect()
    bset = {(r["q"], r["neighbor"]) for r in brute}
    aset = {(r["q"], r["neighbor"]) for r in ann}
    # every ANN hit is a real vector pair; recall must be non-trivial
    recall = len(aset & bset) / len(bset)
    assert recall >= 0.7, f"LSH recall {recall}"
    # and ANN cosines agree with brute-force cosines where they overlap
    bcos = {(r["q"], r["neighbor"]): r["cosine"] for r in brute}
    for r in ann:
        key = (r["q"], r["neighbor"])
        if key in bcos:
            assert abs(r["cosine"] - bcos[key]) < 1e-9


# ---------------------------------------------------------------- skew ----

def test_ivf_recall_vs_brute_on_clustered_data(spark):
    """IVF coarse-quantizer ANN (VERDICT r1 item 8). IVF's contract is
    sublinear search on CLUSTERABLE data, so the recall gate uses planted
    Gaussian blobs (the sf embeddings are isotropic noise — measured
    same-label vs diff-label cosine both ~0.000 — where NO coarse
    quantizer can beat fraction-scanned recall; brute force is the honest
    tool there, see similarity.py docstring)."""
    import random

    from confluence2md_spark.operators.similarity import ivf_topk

    rnd = random.Random(11)
    rows = []
    for i in range(400):
        blob = i % 8
        center = [3.0 if d % 8 == blob else 0.0 for d in range(32)]
        rows.append(
            (i, [c + rnd.gauss(0, 0.3) for c in center])
        )
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    brute = brute_force_topk(emb, n_queries=10, k=5).collect()
    ivf = ivf_topk(emb, n_queries=10, k=5, n_centroids=16, n_probe=2).collect()
    bset = {(r["q"], r["neighbor"]) for r in brute}
    iset = {(r["q"], r["neighbor"]) for r in ivf}
    assert len(bset) == 50
    recall = len(bset & iset) / len(bset)
    assert recall >= 0.9, f"IVF recall {recall} < 0.9"
    # determinism of the hash-sampled init: same result twice
    ivf2 = {(r["q"], r["neighbor"]) for r in ivf_topk(
        emb, n_queries=10, k=5, n_centroids=16, n_probe=2
    ).collect()}
    assert iset == ivf2


def test_ivf_empty_inputs(spark):
    """Empty embeddings / no ids below n_queries: empty result, not a
    createDataFrame schema-inference ValueError (ADVICE r2)."""
    from confluence2md_spark.operators.similarity import ivf_topk

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert ivf_topk(empty, n_queries=5, k=3, n_centroids=4).count() == 0
    some = spark.createDataFrame(
        [(100, [1.0, 0.0]), (101, [0.0, 1.0])], ["vec_id", "embedding"]
    )
    assert ivf_topk(some, n_queries=5, k=3, n_centroids=2).count() == 0


def test_hot_keys_and_salted_repartition(spark, sf_dir):
    from confluence2md_spark.sources.corpus import synth_raw_files

    raw = synth_raw_files(spark, sf_dir)
    hot = hot_keys(raw, "repo", hot_fraction=0.2)
    assert hot == ["repo-hot"]
    balanced = salted_repartition(raw, "repo", 8, salt_buckets=8, hot=hot, salt_source="path")
    sizes = [
        r["n"]
        for r in balanced.filter("repo = 'repo-hot'")
        .groupBy(F.spark_partition_id().alias("p"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    ]
    # 300 hot rows must spread across several partitions, none dominating
    assert len(sizes) >= 4
    assert max(sizes) < 300


def test_layout_census_detects_clustering(spark, sf_dir):
    from confluence2md_spark.plans.skew import layout_census, needs_rebalance
    from confluence2md_spark.sources.corpus import synth_raw_files

    raw = synth_raw_files(spark, sf_dir)
    # synth output is round-robin balanced -> no rebalance needed
    c_ok = layout_census(raw.select("repo"), "repo", ["repo-hot"])
    assert not needs_rebalance(c_ok, c_ok["n_partitions"])
    # cluster by repo (the Iceberg bucket(repo) failure mode) -> rebalance
    clustered = raw.repartition(8, "repo")
    c_bad = layout_census(clustered.select("repo"), "repo", ["repo-hot"])
    assert needs_rebalance(c_bad, 8)


def test_numpy_minhash_signatures_match_jvm(spark, sf_dir):
    """r6 internals change: _with_numpy_signatures now computes one flat
    (total_shingles, k) permutation pass with per-row minimum.reduceat
    instead of a per-row Python loop. The docstring's bit-identical claim
    vs minhash_signature_col gets its differential test: same corpus
    shingle sets + an empty-shingle row, exact signature equality."""
    from confluence2md_spark.operators.linking import (
        _with_numpy_signatures,
        minhash_signature_col,
        shingle_hashes_col,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sh = docs.select(
        F.col("doc_id").alias("id"),
        shingle_hashes_col(F.col("text"), mode="word_ngrams").alias("sh"),
    )
    adv = spark.createDataFrame(
        [(100001, ""), (100002, "one two three four five")], ["id", "t"]
    ).select("id", shingle_hashes_col(F.col("t"), mode="word_ngrams").alias("sh"))
    for frame in (sh, adv):
        jvm = {
            r["id"]: list(r["sig"])
            for r in frame.select(
                "id", minhash_signature_col(F.col("sh")).alias("sig")
            ).collect()
        }
        np_ = {
            r["id"]: list(r["sig"])
            for r in _with_numpy_signatures(frame, k=32, seed=42)
            .select("id", "sig")
            .collect()
        }
        assert jvm == np_ and len(jvm) > 0


def test_window_top_order_min_struct_matches_row_number(spark):
    """r6 internals change: window_top_order_per_customer computes rank-1
    per customer as min(struct(-price, orderkey)) instead of row_number
    over a sorted window. Pin the aggregate form against the window form on
    a fixture WITH price ties (the window's tiebreak is orderkey asc)."""
    from pyspark.sql import Window

    rows = [
        (1, 10, 100.0),
        (1, 11, 250.5),
        (1, 12, 250.5),  # tie on max price -> orderkey 11 must win
        (2, 20, 50.0),
        (3, 30, 0.07),
        (3, 31, 0.07),
        (3, 29, 0.07),  # three-way tie -> orderkey 29
    ]
    orders = spark.createDataFrame(rows, ["o_custkey", "o_orderkey", "o_totalprice"])
    cents = lambda c: F.round(c * 100).cast("bigint")  # noqa: E731
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    via_window = [
        tuple(r)
        for r in orders.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select("o_custkey", "o_orderkey", cents(F.col("o_totalprice")).alias("c"))
        .orderBy("o_custkey")
        .collect()
    ]
    s = F.min(
        F.struct((-F.col("o_totalprice")).alias("np"), F.col("o_orderkey").alias("k"))
    ).alias("s")
    via_agg = [
        tuple(r)
        for r in orders.groupBy("o_custkey")
        .agg(s)
        .select("o_custkey", F.col("s.k"), cents(-F.col("s.np")).alias("c"))
        .orderBy("o_custkey")
        .collect()
    ]
    assert via_window == via_agg
    assert via_agg[0][1] == 11 and via_agg[2][1] == 29


def test_fingerprint_numpy_matches_expression(spark, sf_dir):
    """r6 internals change: text_fingerprint's per-character polynomial fold
    moved from a JVM aggregate-over-split to a vectorized numpy Horner loop
    (functions/textstats._polyhash_bulk). The arithmetic is exact int64, so
    values AND arrival order must match the expression form bit-for-bit —
    including nulls, empties, astral-plane unicode, and texts over the
    vectorization width cap."""
    from confluence2md_spark.functions.textstats import FINGERPRINT_SPARK, fingerprint

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    adversarial = spark.createDataFrame(
        [
            (100001, "abc"),
            (100002, ""),
            (100003, None),
            (100004, "a€b\U0001d11e"),
            (100005, "x" * 9000),
        ],
        ["doc_id", "text"],
    )
    for frame in (docs, adversarial):
        old = [
            tuple(r)
            for r in frame.select(
                "doc_id", F.expr(FINGERPRINT_SPARK.format(t="text")).alias("fp")
            )
            .orderBy("doc_id")
            .collect()
        ]
        new = [tuple(r) for r in fingerprint(frame).orderBy("doc_id").collect()]
        assert old == new
    # arrival order (the driver hashes rows in result order): doc_id asc
    ids = [r["doc_id"] for r in fingerprint(docs).collect()]
    assert ids == sorted(ids)


def test_key_layout_census_matches_separate_helpers(spark, sf_dir):
    """r6 internals change: the pipeline's S1 now derives hot keys AND the
    layout census from ONE per-(partition, key) job. Pin it against the
    separate hot_keys + layout_census helpers on both a balanced and a
    clustered layout — hot set and every census stat must agree."""
    from confluence2md_spark.plans.skew import (
        key_layout_census,
        layout_census,
        needs_rebalance,
    )
    from confluence2md_spark.sources.corpus import synth_raw_files

    raw = synth_raw_files(spark, sf_dir)
    for probe in (raw.select("repo"), raw.repartition(8, "repo").select("repo")):
        hot, census = key_layout_census(probe, "repo")
        h2 = hot_keys(probe, "repo")
        c2 = layout_census(probe, "repo", h2)
        assert sorted(hot) == sorted(h2)
        assert census == c2
        assert needs_rebalance(census, census["n_partitions"]) == needs_rebalance(
            c2, c2["n_partitions"]
        )


# ----------------------------------------------------------- multimodal ---

def test_multimodal_plumbing(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20)
    media = attach_binary_payload(docs)
    rows = media.collect()
    assert all(isinstance(r["payload"], (bytes, bytearray)) for r in rows)
    meta = decode_image_meta(media).collect()
    assert len(meta) == 20
    for r in meta:
        assert 64 <= r["width"] < 256 and 64 <= r["height"] < 256
        assert r["format"] in ("png", "jpeg", "webp")
    meta2 = {r["doc_id"]: (r["width"], r["height"], r["format"]) for r in decode_image_meta(media).collect()}
    assert meta2 == {r["doc_id"]: (r["width"], r["height"], r["format"]) for r in meta}


def test_image_header_parse_real_png_jpeg_gif_bytes():
    """Header-only metadata decode on REAL format bytes (VERDICT r3 item 5):
    a complete 1x1 PNG file, a JPEG marker stream with COM before SOF0, a
    GIF89a screen descriptor; corrupt/foreign payloads fall back to the
    labeled fake."""
    import struct
    import zlib

    from confluence2md_spark.operators.multimodal import (
        _fake_decode,
        _parse_image_header,
    )

    # real, complete 1x1 RGBA PNG (signature + IHDR + IDAT + IEND, valid CRCs)
    def chunk(typ, data):
        c = struct.pack(">I", len(data)) + typ + data
        return c + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)

    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 6, 0, 0, 0)
    idat = zlib.compress(b"\x00\x00\x00\x00\x00")
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) + chunk(b"IEND", b"")
    )
    assert _parse_image_header(png) == (1, 1, "png")

    big_png = png[:16] + struct.pack(">II", 3840, 2160) + png[24:]
    assert _parse_image_header(big_png) == (3840, 2160, "png")

    # JPEG: SOI, COM segment, then SOF0 with height=480 width=640
    jpeg = (
        b"\xff\xd8"
        + b"\xff\xfe" + struct.pack(">H", 4) + b"ok"
        + b"\xff\xc0" + struct.pack(">H", 17) + b"\x08"
        + struct.pack(">HH", 480, 640) + b"\x03" + b"\x01\x22\x00\x02\x11\x01\x03\x11\x01"
        + b"\xff\xd9"
    )
    assert _parse_image_header(jpeg) == (640, 480, "jpeg")
    # progressive (SOF2) parses the same way
    assert _parse_image_header(jpeg.replace(b"\xff\xc0", b"\xff\xc2")) == (640, 480, "jpeg")

    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00\x00\x00"
    assert _parse_image_header(gif) == (320, 200, "gif")

    # non-image and truncated payloads -> None (operator uses the fake)
    assert _parse_image_header(b"plain text payload") is None
    assert _parse_image_header(b"\xff\xd8\xff\xda rest is scan data") is None
    assert _parse_image_header(png[:10]) is None
    assert _fake_decode(b"plain text payload")[2] in ("png", "jpeg", "webp")


def test_parse_audio_header_real_bytes():
    """WAV bytes produced by the stdlib `wave` writer (an independent
    producer — not our own packer) and a hand-built FLAC STREAMINFO parse
    to the exact planted metadata; corrupt/foreign payloads -> None."""
    import io
    import struct
    import wave

    from confluence2md_spark.operators.multimodal import (
        _fake_audio_meta,
        _parse_audio_header,
    )

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(44100)
        w.writeframes(b"\x00" * (4 * 441))  # 441 stereo 16-bit frames
    assert _parse_audio_header(buf.getvalue()) == (44100, 2, 16, 441, "wav")

    # WAV with an extra chunk BEFORE fmt (odd-size -> word-aligned skip)
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 8000, 1, 8)
    data = b"data" + struct.pack("<I", 8000)
    junk = b"LIST" + struct.pack("<I", 3) + b"abc\x00"
    wav2 = b"RIFF" + struct.pack("<I", 0) + b"WAVE" + junk + fmt + data
    assert _parse_audio_header(wav2) == (8000, 1, 8, 8000, "wav")

    # FLAC STREAMINFO: 48000 Hz, 2ch, 24-bit, 96000 samples
    packed = (48000 << 44) | (1 << 41) | (23 << 36) | 96000
    flac = (
        b"fLaC" + b"\x80\x00\x00\x22"
        + b"\x10\x00\x10\x00" + b"\x00" * 6
        + struct.pack(">Q", packed) + b"\x00" * 16
    )
    assert _parse_audio_header(flac) == (48000, 2, 24, 96000, "flac")

    assert _parse_audio_header(b"plain text") is None
    assert _parse_audio_header(b"RIFF\x00\x00\x00\x00AVI ") is None
    assert _parse_audio_header(flac[:20]) is None
    assert _fake_audio_meta(b"x")[4] == "fake"


def test_decode_audio_meta_mixes_real_headers_and_fake(spark):
    """Spark operator: header-parsed metadata for real WAV bytes, the
    labeled fake for others, exact integer duration_ms."""
    import io
    import wave

    from confluence2md_spark.operators.multimodal import decode_audio_meta

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(b"\x00" * (2 * 24000))  # 1.5 s mono
    rows = spark.createDataFrame(
        [(1, buf.getvalue()), (2, b"not audio")], "doc_id long, payload binary"
    )
    got = {
        r["doc_id"]: (
            r["sample_rate"], r["channels"], r["bits_per_sample"],
            r["n_samples"], r["duration_ms"], r["format"],
        )
        for r in decode_audio_meta(rows).collect()
    }
    assert got[1] == (16000, 1, 16, 24000, 1500, "wav")
    assert got[2][5] == "fake" and got[2][4] == got[2][3] * 1000 // got[2][0]


def test_decode_image_meta_mixes_real_headers_and_fake(spark):
    """The Spark operator returns header-parsed dims for real image bytes
    and fake dims for everything else, in the same batch."""
    import struct

    png = (
        b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\x0d" + b"IHDR"
        + struct.pack(">II", 800, 600) + b"\x08\x06\x00\x00\x00" + b"\x00" * 4
    )
    rows = spark.createDataFrame(
        [(1, png), (2, b"not an image")], "doc_id long, payload binary"
    )
    got = {r["doc_id"]: (r["width"], r["height"], r["format"])
           for r in decode_image_meta(rows).collect()}
    assert got[1] == (800, 600, "png")
    assert 64 <= got[2][0] < 256  # fake-path dims


def test_multimodal_real_decode_raises(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(1)
    media = attach_binary_payload(docs)
    with pytest.raises(NotImplementedError):
        decode_image_meta(media, real=True)


def test_multimodal_resize_plumbing(spark, sf_dir):
    """Binary-in/binary-out resize: payload size tracks the target dims,
    output is deterministic, one row per input."""
    from confluence2md_spark.operators.multimodal import resize_image

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(10)
    media = attach_binary_payload(docs)
    small = {r["doc_id"]: r["payload"] for r in resize_image(media, 64, 64).collect()}
    big = {r["doc_id"]: r["payload"] for r in resize_image(media, 224, 224).collect()}
    assert len(small) == len(big) == 10
    assert all(len(p) == (64 * 64) // 256 for p in small.values())
    assert all(len(p) == (224 * 224) // 256 for p in big.values())
    again = {r["doc_id"]: r["payload"] for r in resize_image(media, 64, 64).collect()}
    assert again == small
    with pytest.raises(NotImplementedError):
        resize_image(media, real=True)


def test_multimodal_frame_sampling_fanout(spark, sf_dir):
    """1->N fan-out: n_frames rows per input doc, deterministic per-frame
    hashes, monotone timestamps within a doc."""
    from confluence2md_spark.operators.multimodal import sample_video_frames

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(10)
    media = attach_binary_payload(docs)
    frames = sample_video_frames(media, n_frames=4).collect()
    assert len(frames) == 40
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for rows in by_doc.values():
        rows.sort(key=lambda r: r["frame_idx"])
        ts = [r["ts_seconds"] for r in rows]
        assert ts == sorted(ts) and ts[0] == 0.0
        assert all(len(r["frame"]) > 0 for r in rows)
    h1 = {(r["doc_id"], r["frame_idx"]): r["frame_sha256"] for r in frames}
    h2 = {
        (r["doc_id"], r["frame_idx"]): r["frame_sha256"]
        for r in sample_video_frames(media, n_frames=4).collect()
    }
    assert h1 == h2
    with pytest.raises(NotImplementedError):
        sample_video_frames(media, real=True)


def test_multimodal_features_feed_ann(spark, sf_dir):
    """extract_features output plugs straight into the ANN operator."""
    from confluence2md_spark.operators.multimodal import extract_features
    from confluence2md_spark.operators.similarity import brute_force_topk

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(30)
    emb = extract_features(attach_binary_payload(docs), dim=8)
    rows = emb.collect()
    assert all(len(r["embedding"]) == 8 for r in rows)
    assert all(0.0 <= v <= 1.0 for r in rows for v in r["embedding"])
    topk = brute_force_topk(emb, n_queries=3, k=2, id_col="doc_id", vec_col="embedding")
    got = topk.collect()
    assert len(got) > 0 and all(r["rank"] <= 2 for r in got)


def test_cc_driver_union_find_matches_distributed(spark):
    """The small-graph driver union-find path must produce exactly the
    labels of the distributed hash-min path, long chains included (the
    driver path has no diameter limit)."""
    edges = [(i, i + 1) for i in range(10)]          # path 0..10
    edges += [(20, 21), (21, 22), (20, 22)]          # triangle
    edges += [(30, 31)]                              # isolated pair
    df = spark.createDataFrame(edges, ["src", "dst"])
    fast = {
        (r["id"], r["component"]) for r in connected_components(df).collect()
    }
    slow = {
        (r["id"], r["component"])
        for r in connected_components(df, driver_max_edges=0).collect()
    }
    assert fast == slow
    assert {c for _, c in fast} == {0, 20, 30}


def test_cc_star_contraction_matches_other_paths(spark):
    """large/small-star contraction must label exactly like union-find and
    hash-min on a mixed graph (path + triangle + isolated pair)."""
    edges = [(i, i + 1) for i in range(8)]
    edges += [(20, 21), (21, 22), (20, 22), (30, 31)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    want = {
        (r["id"], r["component"]) for r in connected_components(df).collect()
    }
    star = {
        (r["id"], r["component"])
        for r in connected_components(
            df, driver_max_edges=0, distributed_algorithm="starstar"
        ).collect()
    }
    assert star == want


def test_cc_star_contraction_handles_long_chain_in_log_rounds(spark):
    """A diameter-40 path: hash-min cannot converge in 8 iterations (guard
    fires), star contraction labels it correctly in O(log n) rounds."""
    import pytest

    path_edges = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], ["src", "dst"]
    )
    with pytest.raises(RuntimeError, match="fixpoint"):
        connected_components(path_edges, max_iter=8, driver_max_edges=0)
    comp = {
        r["id"]: r["component"]
        for r in connected_components(
            path_edges, max_iter=8, driver_max_edges=0,
            distributed_algorithm="starstar",
        ).collect()
    }
    assert len(comp) == 41 and all(c == 0 for c in comp.values())


def test_cc_paths_agree_on_random_graph(spark):
    """Randomized (seeded) 5k-edge graph: union-find, hash-min and star
    contraction must produce identical labelings."""
    import random

    rnd = random.Random(42)
    edges = list({
        (rnd.randrange(2000), rnd.randrange(2000)) for _ in range(5000)
    })
    df = spark.createDataFrame(edges, ["src", "dst"]).filter("src != dst")
    uf = {(r["id"], r["component"]) for r in connected_components(df).collect()}
    hm = {
        (r["id"], r["component"])
        for r in connected_components(df, driver_max_edges=0, max_iter=40).collect()
    }
    ss = {
        (r["id"], r["component"])
        for r in connected_components(
            df, driver_max_edges=0, distributed_algorithm="starstar"
        ).collect()
    }
    assert uf == hm == ss


def test_exact_dedup_survivors_never_shuffles_text(spark):
    """VERDICT r2 'what's wrong' #1: the survivor pick must shuffle the
    (xxhash64, length) key, never the document text — the physical plan's
    exchanges must not mention the text column, and the result must equal
    the semantic definition (min doc_id per distinct text)."""
    from confluence2md_spark.operators.dedup import exact_dedup_survivors

    rows = [
        (0, "en", "same text"),
        (1, "en", "same text"),
        (2, "de", "same text"),   # dup of 0 -> doc 0 (en) survives
        (3, "de", "anders"),
        (4, "fr", "autre"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "lang", "text"])
    out = exact_dedup_survivors(docs)
    plan = out._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "text#" not in line, f"text is a shuffle key: {line}"
    got = {(r["lang"], r["n_docs"]) for r in out.collect()}
    assert got == {("en", 1), ("de", 1), ("fr", 1)}


def test_langid_scripts_ties_confidence(spark):
    """Language-ID (VERDICT r2 item 9): 9 stopword languages + 3 script
    detections + confidence, pure column arithmetic, deterministic ties."""
    from confluence2md_spark.functions.textstats import predict_language

    rows = [
        (0, "de", "das ist nicht der die das und"),
        (1, "en", "the cat and the dog of the to is"),
        (2, "ja", "ひらがなのテスト 漢字も"),
        (3, "zh", "汉字 文档 测试"),
        (4, "ru", "Привет мир как дела"),
        (5, "und", "zzz qqq xyzzy plugh"),
        (6, "tie", "que que"),  # que ∈ {es, fr, it, pt} -> max code 'pt'
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "lang", "text"])
    got = {r["doc_id"]: (r["predicted_lang"], r["confidence_micros"])
           for r in predict_language(docs).collect()}
    assert got[0][0] == "de"
    assert got[1] == ("en", 777777)  # 7 marker hits / 9 tokens, floor-micros
    assert got[2] == ("ja", 1000000)  # kana outranks the kanji CJK match
    assert got[3] == ("zh", 1000000)
    assert got[4] == ("ru", 1000000)
    assert got[5] == ("und", 0)
    assert got[6][0] == "pt"  # deterministic tie-break: largest lang code
    # determinism: identical second run
    again = {r["doc_id"]: (r["predicted_lang"], r["confidence_micros"])
             for r in predict_language(docs).collect()}
    assert got == again


def test_lsh_multiprobe_sublinear_candidates_high_recall(spark):
    """VERDICT r1 item 8 / r2 wrong #2 closure: with depth sized to the
    corpus (bits=8 here) + radius-1 multi-probe, the per-query candidate
    set is a small fraction of N on clusterable data while recall vs brute
    stays >= 0.9. (On isotropic data every sublinear index degrades to
    fraction-scanned — the planted-blob corpus is the regime LSH serves.)"""
    import random

    from confluence2md_spark.operators.similarity import (
        _lsh_candidates,
        auto_lsh_bits,
        lsh_ann_topk,
    )

    rnd = random.Random(7)
    rows = []
    for i in range(800):
        blob = i % 8
        center = [3.0 if d % 8 == blob else 0.0 for d in range(32)]
        rows.append((i, [c + rnd.gauss(0, 0.3) for c in center]))
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])

    cand = _lsh_candidates(
        emb, n_queries=10, bits=8, tables=4, multiprobe=1, dim=None,
        seed=42, id_col="vec_id", vec_col="embedding",
    )
    per_q = {r["q"]: r["n"] for r in cand.groupBy("q").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert per_q and max(per_q.values()) < 800 * 0.35, (
        f"candidates not sublinear: {per_q}"
    )

    brute = {(r["q"], r["neighbor"]) for r in brute_force_topk(
        emb, n_queries=10, k=5).collect()}
    lsh = {(r["q"], r["neighbor"]) for r in lsh_ann_topk(
        emb, n_queries=10, k=5, bits=8, tables=4, multiprobe=1).collect()}
    recall = len(brute & lsh) / len(brute)
    assert recall >= 0.9, f"multiprobe LSH recall {recall} < 0.9"

    # auto depth grows with N (the property that keeps candidates bounded)
    assert auto_lsh_bits(500) == 4
    assert auto_lsh_bits(10**6) == 14
    assert auto_lsh_bits(10**9) == 16


def test_embedding_near_dup_lsh_matches_exact_on_planted_dups(spark):
    """General (label-free) embedding near-dup: LSH-bucketed self-join +
    exact cosine verify finds >= 90% of the true cosine>=0.95 pairs on
    planted near-duplicate clusters, with zero false pairs (candidates are
    exactly verified)."""
    import random

    import numpy as np

    from confluence2md_spark.operators.similarity import embedding_near_dup_lsh

    rnd = random.Random(5)
    vecs = []
    for i in range(240):
        blob = i % 12
        center = np.array([3.0 if d % 12 == blob else 0.1 for d in range(32)])
        noise = np.array([rnd.gauss(0, 0.05) for _ in range(32)])
        vecs.append(center + noise)
    exact = set()
    m = np.stack(vecs)
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    cos = mn @ mn.T
    for i in range(len(vecs)):
        for j in range(i + 1, len(vecs)):
            if round(float(cos[i, j]), 6) >= 0.95:
                exact.add((i, j))
    assert len(exact) > 100  # the planting worked

    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        ["vec_id", "embedding"],
    )
    got = {
        (r["src"], r["dst"])
        for r in embedding_near_dup_lsh(emb, threshold=0.95, bits=8, tables=8).collect()
    }
    assert got <= exact  # exact-verify => no false positives
    recall = len(got & exact) / len(exact)
    assert recall >= 0.9, f"near-dup LSH recall {recall} < 0.9"


def test_bpe_token_stats_matches_handcount(spark):
    """BPE-ish pretokenizer counts (driver mandate: whitespace + BPE-ish
    regex): contractions split, punctuation separates, numbers their own
    pieces; ratio reported as floor-micros."""
    from confluence2md_spark.functions.textstats import bpe_token_stats

    docs = spark.createDataFrame(
        [(0, "it's a test-case with 42 tokens, naturally")], ["doc_id", "text"]
    )
    r = bpe_token_stats(docs).collect()[0]
    # pieces: it | 's | a | test | - | case | with | 42 | tokens | , | naturally
    assert r["n_ws_tokens"] == 7
    assert r["n_bpe_pieces"] == 11
    assert r["pieces_per_word_micros"] == 1571428


# ----------------------------------------------------------- retrieval ----

def test_bm25_hand_computed_score_and_ranking(spark):
    """BM25 formula check against a hand-stated corpus: same idf/tf-part
    expression evaluated in Python must give the identical floor-micros
    score, and ranking must follow tf (repetition) and df (rarity)."""
    import math

    from confluence2md_spark.operators.retrieval import bm25_topk

    docs = spark.createDataFrame(
        [
            (0, "apple banana"),
            (1, "apple apple apple cherry"),
            (2, "cherry durian"),
        ],
        ["doc_id", "text"],
    )
    rows = bm25_topk(docs, queries=[(1, "apple"), (2, "durian")]).collect()
    got = {(r["q"], r["rank"]): (r["doc_id"], r["score_micros"]) for r in rows}

    # q1 "apple": doc 1 (tf=3) outranks doc 0 (tf=1); doc 2 absent.
    assert got[(1, 1)][0] == 1 and got[(1, 2)][0] == 0
    assert (1, 3) not in got
    # q2 "durian": only doc 2, and df=1 < df=2 makes it score above q1's top.
    assert got[(2, 1)][0] == 2
    assert got[(2, 1)][1] > got[(1, 1)][1]

    n, avgdl, k1, b = 3, (2 + 4 + 2) / 3, 1.2, 0.75
    def score(tf, dl, df):
        idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
        tfp = (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl))
        return math.floor(idf * tfp * 1_000_000)

    assert got[(1, 1)][1] == score(3, 4, 2)
    assert got[(1, 2)][1] == score(1, 2, 2)
    assert got[(2, 1)][1] == score(1, 2, 1)


def test_bm25_plan_broadcasts_and_never_shuffles_text(spark):
    """Scale shape: the only exchanges in the BM25 plan carry (doc_id, dl,
    term) postings or (q, doc_id, score) candidates — the text column must
    not appear in any Exchange, and the term/dfreq/stats joins must be
    broadcasts."""
    from confluence2md_spark.operators.retrieval import bm25_topk

    docs = spark.createDataFrame(
        [(i, f"hash join scan value {i}") for i in range(50)], ["doc_id", "text"]
    )
    plan = bm25_topk(docs)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    for line in plan.splitlines():
        if "Exchange" in line and "Broadcast" not in line:
            assert "text" not in line, f"text column crosses a shuffle: {line}"


def test_ngram_jaccard_inverted_index_matches_quadratic(spark):
    """r6 internals change: ngram_jaccard_pairs now generates candidates via
    an inverted-index join (shared-gram count == |A ∩ B| exactly) instead of
    the block all-pairs array_intersect/array_union form. Pin the new path
    against a brute-force quadratic recomputation over the same gram arrays
    — pair set AND jaccard values must match bit-for-bit."""
    from confluence2md_spark.operators.dedup import _word_ngrams, ngram_jaccard_pairs
    import pytest
    from pyspark.sql import functions as F

    # one 'en' near-dup family + a disjoint doc in the same (en, 0) block
    # (4 docs, at the cap), and a 5-doc 'de' block OVER the cap so the
    # oversized-block drop is exercised too.
    base = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (0, base, "en"),
        (1, base + " iota", "en"),
        (2, base + " iota kap", "en"),
        (20, "disjoint text about watermark state stores", "en"),
    ]
    for i in range(10, 15):
        rows.append((i, "eins zwei drei vier funf sechs sieben acht", "de"))
    docs = spark.createDataFrame(rows, ["doc_id", "text", "lang"])

    got = {
        (r["src"], r["dst"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, max_block_size=4).collect()
    }

    # brute force: same gram arrays, same blocks, same cap, python set math
    grams = {
        r["doc_id"]: (r["lang"], r["lb"], set(r["g"]))
        for r in docs.select(
            "doc_id",
            "lang",
            F.floor(F.length("text") / 64).alias("lb"),
            _word_ngrams(F.col("text"), 3).alias("g"),
        ).collect()
    }
    from collections import Counter

    blocks = Counter((l, b) for l, b, _ in grams.values())
    want = {}
    ids = sorted(grams)
    for i in ids:
        for j in ids:
            if i >= j or grams[i][:2] != grams[j][:2]:
                continue
            if blocks[grams[i][:2]] > 4:
                continue
            sa, sb = grams[i][2], grams[j][2]
            jac = round(len(sa & sb) / len(sa | sb), 6)
            if jac >= 0.2:
                want[(i, j)] = jac
    assert got == want and len(want) >= 3

    with pytest.raises(ValueError):
        ngram_jaccard_pairs(docs, threshold=0.0)


def test_ngram_cluster_census_planted_families(spark):
    """Census over planted near-dup families: one 3-doc chain family and one
    2-doc pair, plus unrelated singletons that must NOT appear."""
    from confluence2md_spark.operators.dedup import ngram_cluster_census

    # all texts stay inside ONE (lang, length//64) block — lengths < 64 —
    # so the blocked pair join sees every candidate pair
    base = "alpha beta gamma delta epsilon zeta eta theta"
    fam_a = [
        (0, base, "en"),
        (1, base + " aa", "en"),
        (2, base + " aa bb", "en"),
    ]
    fam_b = [
        (10, "one two three four five six seven eight nine ten", "en"),
        (11, "one two three four five six seven eight nine ten", "en"),
    ]
    singles = [
        (20, "totally unrelated words about streaming watermarks", "en"),
        (21, "other disjoint content concerning broadcast joins here", "en"),
    ]
    docs = spark.createDataFrame(fam_a + fam_b + singles, ["doc_id", "text", "lang"])
    got = {
        r["size"]: r["n_clusters"]
        for r in ngram_cluster_census(docs, threshold=0.2).collect()
    }
    assert got == {2: 1, 3: 1}


def test_pagerank_exact_integer_matches_python_mirror(spark):
    """pagerank_micros on a hand-stated graph equals a pure-Python mirror of
    the same integer recurrence — bit-exact, any partitioning."""
    from confluence2md_spark.operators.graph import pagerank_micros

    edge_list = [(1, 2), (1, 3), (2, 3), (3, 1), (3, 1)]  # dup edge dropped
    edges = spark.createDataFrame(edge_list, ["subj", "obj"])
    got = {
        r["page"]: r["rank_micros"]
        for r in pagerank_micros(edges, iters=5).collect()
    }

    e = sorted(set(edge_list))
    nodes = sorted({v for p in e for v in p})
    outdeg = {}
    for s, _ in e:
        outdeg[s] = outdeg.get(s, 0) + 1
    r = {v: 1_000_000 for v in nodes}
    for _ in range(5):
        sums = {v: 0 for v in nodes}
        for s, d in e:
            sums[d] += r[s] // outdeg[s]
        r = {v: 150_000 + sums[v] * 850_000 // 1_000_000 for v in nodes}
    assert got == r
    # rank mass flowed toward the sink-heavy node 3 -> 1 cycle
    assert got[1] > got[2]


def test_pagerank_deep_iteration_checkpoints_lineage(spark):
    """iters far past the contract depth must stay exact AND keep the plan
    bounded (VERDICT r3: without checkpointing, a 25-iteration run carries
    a 25-join unbroken plan). checkpoint_every=4 -> the returned relation
    is a checkpointed scan, not a join tower, and values still match the
    pure-Python integer mirror at depth 25."""
    from confluence2md_spark.operators.graph import pagerank_micros

    edge_list = [(1, 2), (1, 3), (2, 3), (3, 1), (2, 4), (4, 1)]
    edges = spark.createDataFrame(edge_list, ["subj", "obj"])
    cached_before = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
    out = pagerank_micros(edges, iters=25, checkpoint_every=4)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "Join" not in plan  # lineage truncated, not a 25-join tower
    # e/nodes caches and superseded intermediate checkpoints released
    # (ADVICE r3: they leaked across driver queries); only the RESULT's own
    # checkpoint may remain. Upper bound, not equality: the ContextCleaner
    # concurrently collects blocks of GC'd DataFrames from earlier tests.
    assert (
        spark.sparkContext._jsc.sc().getPersistentRDDs().size() <= cached_before + 1
    )
    got = {r["page"]: r["rank_micros"] for r in out.collect()}

    e = sorted(set(edge_list))
    nodes = sorted({v for p in e for v in p})
    outdeg = {}
    for s, _ in e:
        outdeg[s] = outdeg.get(s, 0) + 1
    r = {v: 1_000_000 for v in nodes}
    for _ in range(25):
        sums = {v: 0 for v in nodes}
        for s, d in e:
            sums[d] += r[s] // outdeg[s]
        r = {v: 150_000 + sums[v] * 850_000 // 1_000_000 for v in nodes}
    assert got == r


def test_asof_join_inclusive_carry_and_nulls(spark):
    """Hand-stated as-of semantics: equal timestamps join inclusively, the
    LATEST prior right row wins, keys with no prior right row yield nulls,
    and carry never crosses keys."""
    from confluence2md_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 10, "l-a"), (1, 20, "l-b"), (1, 5, "l-c"), (2, 10, "l-d")],
        ["k", "ts", "lval"],
    )
    right = spark.createDataFrame(
        [(1, 10, "r-10"), (1, 15, "r-15"), (3, 1, "r-other")],
        ["k", "ts", "rval"],
    )
    got = {
        r["lval"]: r["rval_asof"]
        for r in asof_join(
            left, right, key="k", left_ts="ts", right_ts="ts", value_cols=["rval"]
        ).collect()
    }
    assert got == {
        "l-a": "r-10",   # equal ts -> inclusive
        "l-b": "r-15",   # latest prior, not first
        "l-c": None,     # before any right row
        "l-d": None,     # key 2 has no right rows; key 3's row must not leak
    }


def test_asof_join_null_value_fields_stay_row_atomic(spark):
    """A newer right row with a legitimately-NULL value column must carry
    that NULL — not let the field ride forward from an OLDER right row
    while its sibling columns come from the newer one (ADVICE r3: the
    per-column last(ignorenulls) stitched two right rows together)."""
    from confluence2md_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 20, "l")], ["k", "ts", "lval"])
    right = spark.createDataFrame(
        [(1, 5, "old-a", "old-b"), (1, 15, "new-a", None)],
        "k long, ts long, a string, b string",
    )
    row = asof_join(
        left, right, key="k", left_ts="ts", right_ts="ts", value_cols=["a", "b"]
    ).collect()[0]
    assert (row["a_asof"], row["b_asof"]) == ("new-a", None)


def test_bm25_empty_query_list_returns_typed_empty(spark):
    from confluence2md_spark.operators.retrieval import bm25_topk

    docs = spark.createDataFrame([(0, "some text")], ["doc_id", "text"])
    out = bm25_topk(docs, queries=[])
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["q", "doc_id", "score_micros", "rank"]


def test_corpus_curation_plan_never_shuffles_text(spark, sf_dir):
    """The curation rollup's only exchanges carry the (xxhash64, length)
    survivor key + small metric struct and the per-lang aggregation — the
    document text must not appear in any Exchange."""
    import __spark_entry__ as entrymod

    out = entrymod.queries()["corpus_curation"](spark, sf_dir)
    plan = out._jdf.queryExecution().executedPlan().toString()
    exchanges = [l for l in plan.splitlines() if "Exchange" in l]
    assert exchanges  # the plan does shuffle (survivor pick + lang agg)
    for line in exchanges:
        assert "text#" not in line, f"text crosses a shuffle: {line}"
    assert out.count() > 0


def test_planted_cluster_vectors_bitexact_vs_duckdb_and_separable(spark, sf_dir):
    """The clusterable contract fixture (VERDICT r3 items 2/7): the Spark
    transform and its DuckDB twin must agree on every coordinate bit-for-bit
    (float->double widening + a binary-exact pull literal), and the planted
    geometry must actually separate: a non-empty cosine>=0.85 pair set that
    is a strict subset of same-label pairs."""
    import duckdb
    import numpy as np

    from confluence2md_spark.operators.similarity import (
        planted_cluster_sql_duck,
        planted_cluster_vectors,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    got = {
        r["vec_id"]: (r["label"], r["embedding"])
        for r in planted_cluster_vectors(emb).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{sf_dir}/embeddings.parquet'"
    )
    ora = {
        vid: (lab, v)
        for vid, lab, v in con.execute(planted_cluster_sql_duck()).fetchall()
    }
    assert got.keys() == ora.keys() and len(got) > 0
    for vid in got:
        assert got[vid][0] == ora[vid][0]
        assert got[vid][1] == ora[vid][1], f"coordinate mismatch at vec_id={vid}"

    ids = sorted(got)
    V = np.array([got[i][1] for i in ids])
    lab = np.array([got[i][0] for i in ids])
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    C = Vn @ Vn.T
    iu = np.triu_indices(len(ids), 1)
    same = lab[iu[0]] == lab[iu[1]]
    cs = C[iu]
    assert (cs >= 0.85).sum() > 0, "fixture is vacuous: no pair reaches 0.85"
    assert ((cs >= 0.85) & ~same).sum() == 0, "cross-label pair above threshold"
    assert (same & (cs < 0.85)).sum() > 0, "threshold does no work within labels"


def test_bm25_df_cap_drops_stopword_postings(spark):
    """max_df_frac guard (VERDICT r3 item 8): a stopword query term would
    carry O(N) postings into scoring with ~zero idf; the cap drops its
    postings once df is known, the kept-postings relation stays bounded,
    and the remaining terms score EXACTLY as if the stopword weren't in
    the query."""
    from confluence2md_spark.operators.retrieval import bm25_postings, bm25_topk

    n = 200
    rows = [(i, "the common filler " + ("rare gem " if i % 40 == 0 else "plain words ")) for i in range(n)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    terms = spark.createDataFrame([("the",), ("rare",)], ["term"])

    uncapped = bm25_postings(docs, terms).count()
    capped = bm25_postings(docs, terms, max_df_frac=0.5).count()
    assert uncapped == n + n // 40        # 'the' in every doc + 'rare' in 5
    assert capped == n // 40              # stopword postings gone
    assert capped <= 0.5 * n              # the bound the cap guarantees

    # scores under the cap == scores of the query without the stopword
    with_cap = {
        (r["q"], r["doc_id"]): r["score_micros"]
        for r in bm25_topk(docs, [(1, "the rare")], max_df_frac=0.5).collect()
    }
    no_stop = {
        (r["q"], r["doc_id"]): r["score_micros"]
        for r in bm25_topk(docs, [(1, "rare")]).collect()
    }
    assert with_cap == no_stop and len(with_cap) == n // 40

    # all-stopword query under the cap -> empty result, not O(N^2) work
    assert bm25_topk(docs, [(1, "the")], max_df_frac=0.5).count() == 0


def test_triangles_hand_graph(spark):
    """K4 + bowtie + pendant: known counts, degrees, clustering micros.
    cc_micros is exact-integer: 2*tri*1e6 DIV (d*(d-1))."""
    from confluence2md_spark.operators.triangles import triangle_participation

    k4 = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d")]
    bow = [("p", "q"), ("q", "r"), ("r", "p"), ("r", "s"), ("s", "t"), ("t", "r")]
    pend = [("a", "z")]  # z in no triangle; bumps a's degree to 4
    # duplicates + reversed edges + a self-loop must all be idempotent
    noise = [("b", "a"), ("a", "b"), ("c", "c")]
    edges = spark.createDataFrame(k4 + bow + pend + noise, ["subj", "obj"])
    got = {r["node"]: r for r in triangle_participation(edges).collect()}

    assert set(got) == {"a", "b", "c", "d", "p", "q", "r", "s", "t"}
    assert got["a"]["n_tri"] == 3 and got["a"]["degree"] == 4
    assert got["a"]["cc_micros"] == 2 * 3 * 1_000_000 // (4 * 3)
    for n in ("b", "c", "d"):
        assert got[n]["n_tri"] == 3 and got[n]["degree"] == 3
        assert got[n]["cc_micros"] == 1_000_000
    assert got["r"]["n_tri"] == 2 and got["r"]["degree"] == 4
    assert got["r"]["cc_micros"] == 2 * 2 * 1_000_000 // (4 * 3)
    for n in ("p", "q", "s", "t"):
        assert got[n]["n_tri"] == 1 and got[n]["degree"] == 2
        assert got[n]["cc_micros"] == 1_000_000


def test_triangles_match_brute_force_on_random_graph(spark):
    """Degree-oriented counting equals an adjacency-set brute force on a
    seeded random graph (the oriented-wedge join must count each triangle
    exactly once regardless of degree ties)."""
    import itertools
    import random

    from confluence2md_spark.operators.triangles import (
        triangle_participation,
        triangle_total,
    )

    rnd = random.Random(44)
    nodes = [f"n{i:02d}" for i in range(40)]
    pairs = sorted(
        {tuple(sorted(rnd.sample(nodes, 2))) for _ in range(220)}
    )
    adj: dict[str, set[str]] = {n: set() for n in nodes}
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)
    want: dict[str, int] = {}
    total = 0
    for a, b, c in itertools.combinations(nodes, 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            total += 1
            for n in (a, b, c):
                want[n] = want.get(n, 0) + 1
    assert total > 0  # seed sanity: the graph must actually have triangles

    edges = spark.createDataFrame(pairs, ["subj", "obj"])
    got = {r["node"]: r["n_tri"] for r in triangle_participation(edges).collect()}
    assert got == want
    assert triangle_total(edges) == total


def test_triangles_empty_on_bipartite_graph(spark):
    """A bipartite graph has no triangles: typed-empty result, no crash."""
    from confluence2md_spark.operators.triangles import triangle_participation

    edges = spark.createDataFrame(
        [(f"l{i}", f"r{j}") for i in range(4) for j in range(4)],
        ["subj", "obj"],
    )
    out = triangle_participation(edges)
    assert out.count() == 0
    assert out.columns == ["node", "n_tri", "degree", "cc_micros"]


def test_kcore_hand_graph(spark):
    """K4 with a dangling path: the path cascade-peels at k=2, K4 survives
    with in-core degree 3; k=4 empties the graph (K4 is only a 3-core)."""
    from confluence2md_spark.operators.kcore import kcore

    k4 = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d")]
    tail = [("c", "e"), ("e", "f")]
    edges = spark.createDataFrame(k4 + tail, ["subj", "obj"])

    got = {r["node"]: r["core_degree"] for r in kcore(edges, k=2).collect()}
    assert got == {"a": 3, "b": 3, "c": 3, "d": 3}
    assert kcore(edges, k=3).count() == 4
    assert kcore(edges, k=4).count() == 0


def test_kcore_cascade_needs_multiple_rounds(spark):
    """A 10-node path peels only from the ends: the k=2 core is empty but
    needs ~5 synchronous rounds — and max_rounds=2 must raise, not
    silently return the truncated (wrong, non-empty) edge set."""
    import pytest as _pytest

    from confluence2md_spark.operators.kcore import kcore

    path = [(f"n{i}", f"n{i+1}") for i in range(9)]
    edges = spark.createDataFrame(path, ["subj", "obj"])
    assert kcore(edges, k=2, max_rounds=12).count() == 0
    with _pytest.raises(RuntimeError, match="did not converge"):
        kcore(edges, k=2, max_rounds=2)


def test_kcore_matches_duckdb_twin_on_random_graph(spark):
    """Spark fixpoint peel == 12-round unrolled DuckDB twin, bit-exact,
    on a seeded random graph (same twin the contract oracle uses)."""
    import random

    import duckdb

    from confluence2md_spark.operators.kcore import kcore, kcore_sql_duck

    rnd = random.Random(7)
    nodes = [f"v{i:02d}" for i in range(40)]
    pairs = sorted({tuple(sorted(rnd.sample(nodes, 2))) for _ in range(130)})
    edges = spark.createDataFrame(pairs, ["subj", "obj"])
    got = [(r["node"], r["core_degree"]) for r in kcore(edges, k=3).collect()]
    assert got, "seed sanity: the 3-core must be non-empty"

    con = duckdb.connect()
    con.execute("CREATE TABLE raw (subj VARCHAR, obj VARCHAR)")
    con.executemany("INSERT INTO raw VALUES (?, ?)", pairs)
    want = con.execute(
        "WITH base AS (SELECT subj, obj FROM raw),\n"
        + kcore_sql_duck("base", k=3, rounds=12)
    ).fetchall()
    assert got == [tuple(w) for w in want]


def test_repetition_hand_computed(spark):
    """Signals on hand-computable docs: exact integer micros."""
    from confluence2md_spark.operators.repetition import repetition_signals

    docs = spark.createDataFrame(
        [(0, "a a a b"), (1, "solo"), (2, "w x y z")],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r for r in repetition_signals(docs).collect()}

    r0 = got[0]  # tokens a,a,a,b; grams "a a","a a","a b"
    assert r0["n_tok"] == 4
    assert r0["dup_word_micros"] == (4 - 2) * 1_000_000 // 4
    assert r0["top_word_micros"] == 3 * 1_000_000 // 4
    assert r0["dup_2gram_micros"] == (3 - 2) * 1_000_000 // 3
    assert r0["keep"] == 0  # top_word 750000 > cap

    r1 = got[1]  # one token: no grams, all-unique
    assert (r1["n_tok"], r1["dup_word_micros"], r1["dup_2gram_micros"]) == (1, 0, 0)
    assert r1["top_word_micros"] == 1_000_000 and r1["keep"] == 0

    r2 = got[2]  # all-distinct 4 tokens
    assert r2["dup_word_micros"] == 0 and r2["dup_2gram_micros"] == 0
    assert r2["top_word_micros"] == 250_000 and r2["keep"] == 0
    # a long low-repetition doc IS kept
    long_doc = spark.createDataFrame(
        [(9, " ".join(f"t{i}" for i in range(40)))], ["doc_id", "text"]
    )
    assert repetition_signals(long_doc).collect()[0]["keep"] == 1


def test_repetition_matches_duckdb_twin(spark):
    """Spark distributed aggregation == DuckDB list-lambda twin, bit-exact,
    on seeded word-soup docs (the two engines use structurally different
    algorithms — groupBy/window vs per-row list ops)."""
    import random

    import duckdb

    from confluence2md_spark.operators.repetition import (
        repetition_signals,
        repetition_sql_duck,
    )

    rnd = random.Random(13)
    vocab = [f"w{i}" for i in range(12)]
    rows = [
        (i, " ".join(rnd.choice(vocab) for _ in range(rnd.randint(1, 60))))
        for i in range(25)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = [tuple(r) for r in repetition_signals(docs).collect()]

    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    want = con.execute(repetition_sql_duck()).fetchall()
    assert got == [tuple(w) for w in want]


def test_pii_hand_computed(spark):
    """Counts and byte-exact redaction on hand-written PII docs."""
    import hashlib

    from confluence2md_spark.operators.pii import pii_signals

    rows = [
        (0, "mail bob@x.org or bob.jr@sub.x.co.uk call 555-123-4567"),
        (1, "host 192.168.0.1 and 10.0.255.3 no mail"),
        (2, "clean text only"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in pii_signals(docs).collect()}

    assert (got[0]["n_email"], got[0]["n_phone"], got[0]["n_ipv4"]) == (2, 1, 0)
    assert got[0]["n_pii"] == 3
    red0 = "mail <EMAIL> or <EMAIL> call <PHONE>"
    assert got[0]["red_len"] == len(red0)
    assert got[0]["red_sha"] == hashlib.sha256(red0.encode()).hexdigest()

    assert (got[1]["n_email"], got[1]["n_phone"], got[1]["n_ipv4"]) == (0, 0, 2)
    red1 = "host <IP> and <IP> no mail"
    assert got[1]["red_sha"] == hashlib.sha256(red1.encode()).hexdigest()

    assert got[2]["n_pii"] == 0 and got[2]["red_len"] == len(rows[2][1])


def test_pii_matches_duckdb_twin(spark):
    """Java-regex Spark pipeline == RE2 DuckDB twin bit-for-bit, including
    the deterministic synthetic-PII augmentation used by the contract
    query (regex dialect parity is the thing being pinned)."""
    import duckdb
    import random

    from pyspark.sql import functions as F

    from confluence2md_spark.operators.pii import (
        pii_signals,
        pii_sql_duck,
        synthetic_pii_expr_sql,
    )

    rnd = random.Random(41)
    vocab = ["alpha", "beta", "gamma", "delta", "x1", "no-match", "a.b"]
    rows = [
        (i, " ".join(rnd.choice(vocab) for _ in range(rnd.randint(0, 20))))
        for i in range(30)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"]).select(
        "doc_id", F.expr(synthetic_pii_expr_sql()).alias("text")
    )
    got = [tuple(r) for r in pii_signals(docs).collect()]

    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    aug = (
        "(SELECT doc_id, " + synthetic_pii_expr_sql() + " AS text FROM documents) aug"
    )
    want = con.execute(pii_sql_duck(docs_rel=aug)).fetchall()
    assert got == [tuple(w) for w in want]
    # non-vacuous: every PII class fires somewhere in the fixture
    assert sum(r[1] for r in got) > 0  # emails
    assert sum(r[2] for r in got) > 0  # phones
    assert sum(r[3] for r in got) > 0  # ipv4


def test_dup_spans_hand_computed(spark):
    """Cross-doc duplicated 4-gram windows on hand-computable docs."""
    from confluence2md_spark.operators.dupspans import dup_span_signals

    rows = [
        (0, "a b c d e f"),      # windows: abcd bcde cdef
        (1, "z a b c d y"),      # windows: zabc abcd bcdy -> shares abcd
        (2, "p q r s"),          # unique single window
        (3, "x y"),              # < 4 tokens: zero windows
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in dup_span_signals(docs).collect()}

    assert (got[0]["n_win"], got[0]["dup_win"]) == (3, 1)
    assert got[0]["dup_span_micros"] == 1_000_000 // 3
    assert (got[1]["n_win"], got[1]["dup_win"]) == (3, 1)
    assert (got[2]["n_win"], got[2]["dup_win"]) == (1, 0)
    assert (got[3]["n_win"], got[3]["dup_win"], got[3]["dup_span_micros"]) == (
        0,
        0,
        0,
    )
    assert got[3]["keep"] == 1


def test_dup_spans_matches_duckdb_twin(spark):
    """Spark hash-keyed df join == DuckDB exact-string twin bit-for-bit
    (also pins that 64-bit gram hashing is collision-free here)."""
    import duckdb
    import random

    from confluence2md_spark.operators.dupspans import (
        dup_span_signals,
        dup_span_sql_duck,
    )

    rnd = random.Random(59)
    vocab = [f"w{i}" for i in range(9)]
    rows = [
        (i, " ".join(rnd.choice(vocab) for _ in range(rnd.randint(2, 40))))
        for i in range(30)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = [tuple(r) for r in dup_span_signals(docs).collect()]

    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    want = con.execute(dup_span_sql_duck()).fetchall()
    assert got == [tuple(w) for w in want]
    assert any(r[2] > 0 for r in got)  # some duplicated window exists


def test_containment_hand_computed(spark):
    """A short doc embedded in a long one is caught in the contained
    direction only; unrelated docs produce no rows."""
    from confluence2md_spark.operators.containment import containment_pairs

    inner = "one two three four five six seven"
    outer = (
        "pad1 pad2 pad3 pad4 " + inner + " tail1 tail2 tail3 tail4 tail5 "
        "tail6 tail7 tail8 tail9 tail10 tail11 tail12 tail13 tail14"
    )
    rows = [
        (0, inner),
        (1, outer),
        (2, "totally different words with no overlap at all here friend"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = [tuple(r) for r in containment_pairs(docs, ordered=True).collect()]

    # all 5 of inner's 3-grams appear in outer -> cont(0 -> 1) = 1.0;
    # outer has 29 grams so cont(1 -> 0) is far below threshold.
    assert got == [(0, 1, 1_000_000)]


def test_containment_matches_duckdb_twin(spark):
    """Inverted-index candidates + exact verify == DuckDB twin, including
    planted containment and near-containment pairs."""
    import duckdb
    import random

    from confluence2md_spark.operators.containment import (
        containment_pairs,
        containment_sql_duck,
    )

    rnd = random.Random(73)
    vocab = [f"t{i}" for i in range(40)]
    rows = []
    for i in range(20):
        words = [rnd.choice(vocab) for _ in range(rnd.randint(8, 30))]
        rows.append((i, " ".join(words)))
    # plant: doc 20/21 contained in padded copies of docs 0/1
    for j, src in ((20, 0), (21, 1)):
        rows.append((j, rows[src][1] + " extra" + str(j) + " more" + str(j)))
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = [tuple(r) for r in containment_pairs(docs, ordered=True).collect()]

    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    want = con.execute(containment_sql_duck()).fetchall()
    assert got == [tuple(w) for w in want]
    # the planted pairs are found in the contained direction
    srcs = {(r[0], r[1]) for r in got}
    assert (0, 20) in srcs and (1, 21) in srcs


def test_nb_classifier_hand_computed(spark):
    """NB scores on a 4-doc corpus verified against a pure-Python
    reference computation (same floor-log-micros arithmetic)."""
    import math

    from confluence2md_spark.operators.classifier import nb_quality_scores

    rows = [
        (0, "good good fine", 1),
        (1, "good fine", 1),
        (2, "bad awful bad", 0),
        (3, "awful good", 0),
    ]
    docs = spark.createDataFrame([(i, t) for i, t, _ in rows], ["doc_id", "text"])
    labels = spark.createDataFrame([(i, l) for i, t, l in rows], ["doc_id", "label"])
    got = {r["doc_id"]: r for r in nb_quality_scores(docs, labels).collect()}

    # python mirror
    from collections import Counter

    cpos, cneg = Counter(), Counter()
    for _, t, l in rows:
        (cpos if l else cneg).update(t.split())
    vocab = set(cpos) | set(cneg)
    npos, nneg, v = sum(cpos.values()), sum(cneg.values()), len(vocab)

    def lp(c, n):
        return math.floor(math.log((c + 1) / n) * 1_000_000)

    prior_pos = math.floor(math.log(2 / 4) * 1_000_000)
    prior_neg = prior_pos
    for i, t, _ in rows:
        sp = prior_pos + sum(lp(cpos[w], npos + v) for w in t.split())
        sn = prior_neg + sum(lp(cneg[w], nneg + v) for w in t.split())
        assert got[i]["score_pos_micros"] == sp
        assert got[i]["score_neg_micros"] == sn
        assert got[i]["pred"] == (1 if sp > sn else 0)
    # the classifier reproduces the training labels on this separable set
    assert [got[i]["pred"] for i, _, _ in rows] == [l for _, _, l in rows]


def test_nb_classifier_matches_duckdb_twin(spark):
    """Spark distributed train+score == DuckDB twin bit-for-bit (pins the
    StrictMath.log vs ln floor-micros parity on the NB value range)."""
    import duckdb
    import random

    from pyspark.sql import functions as F

    from confluence2md_spark.operators.classifier import (
        nb_quality_scores,
        nb_quality_sql_duck,
    )

    rnd = random.Random(97)
    vocab = [f"w{i}" for i in range(15)]
    rows = [
        (i, " ".join(rnd.choice(vocab) for _ in range(rnd.randint(1, 30))), i % 3 != 0)
        for i in range(40)
    ]
    docs = spark.createDataFrame([(i, t) for i, t, _ in rows], ["doc_id", "text"])
    labels = spark.createDataFrame(
        [(i, int(l)) for i, _, l in rows], ["doc_id", "label"]
    )
    got = [tuple(r) for r in nb_quality_scores(docs, labels).collect()]

    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany(
        "INSERT INTO documents VALUES (?, ?)", [(i, t) for i, t, _ in rows]
    )
    con.execute("CREATE TABLE lab (doc_id BIGINT, label BIGINT)")
    con.executemany(
        "INSERT INTO lab VALUES (?, ?)", [(i, int(l)) for i, _, l in rows]
    )
    want = con.execute(
        nb_quality_sql_duck(labels_cte="SELECT doc_id, label FROM lab")
    ).fetchall()
    assert got == [tuple(w) for w in want]


def test_personalized_pagerank_seed_concentration(spark):
    """PPR on a two-community graph: restart on community-A seeds keeps
    all mass in A; community B (unreachable from A) ranks 0. Exact-integer
    arithmetic verified against a pure-Python mirror."""
    from confluence2md_spark.operators.graph import personalized_pagerank_micros

    edges = spark.createDataFrame(
        [("a1", "a2"), ("a2", "a3"), ("a3", "a1"), ("b1", "b2"), ("b2", "b1")],
        ["subj", "obj"],
    )
    seeds = spark.createDataFrame([("a1",)], ["page"])
    got = {
        r["page"]: r["rank_micros"]
        for r in personalized_pagerank_micros(edges, seeds, iters=5).collect()
    }
    assert got["b1"] == 0 and got["b2"] == 0

    # python mirror: N=5, |S|=1, base(a1)=150000*5, init(a1)=1000000*5
    ranks = {p: 0 for p in ("a1", "a2", "a3", "b1", "b2")}
    ranks["a1"] = 5_000_000
    base = {p: 0 for p in ranks}
    base["a1"] = 150_000 * 5
    out = {"a1": ["a2"], "a2": ["a3"], "a3": ["a1"], "b1": ["b2"], "b2": ["b1"]}
    for _ in range(5):
        sums = {p: 0 for p in ranks}
        for u, vs in out.items():
            for v in vs:
                sums[v] += ranks[u] // len(vs)
        ranks = {p: base[p] + sums[p] * 850_000 // 1_000_000 for p in ranks}
    assert got == ranks


def test_personalized_pagerank_deep_iters_bounded_plan(spark):
    """iters=25 with checkpoint_every=5 stays exact (vs the python mirror)
    — the lineage-truncation discipline ported from pagerank_micros."""
    from confluence2md_spark.operators.graph import personalized_pagerank_micros

    edges = spark.createDataFrame(
        [(f"n{i}", f"n{(i + 1) % 7}") for i in range(7)], ["subj", "obj"]
    )
    seeds = spark.createDataFrame([("n0",), ("n3",)], ["page"])
    got = {
        r["page"]: r["rank_micros"]
        for r in personalized_pagerank_micros(
            edges, seeds, iters=25, checkpoint_every=5
        ).collect()
    }
    ranks = {f"n{i}": 0 for i in range(7)}
    base = dict(ranks)
    for s in ("n0", "n3"):
        ranks[s] = 1_000_000 * 7 // 2
        base[s] = 150_000 * 7 // 2
    for _ in range(25):
        sums = {p: 0 for p in ranks}
        for i in range(7):
            sums[f"n{(i + 1) % 7}"] += ranks[f"n{i}"] // 1
        ranks = {p: base[p] + sums[p] * 850_000 // 1_000_000 for p in ranks}
    assert got == ranks


def test_winnowing_hand_computed(spark):
    """Winnowing selection verified against a pure-Python mirror of the
    algorithm (same polynomial hash, same leftmost-min rule)."""
    from confluence2md_spark.operators.winnow import (
        K_GRAM,
        W_WINDOW,
        winnow_fingerprints,
    )

    rows = [(0, "a b c d e f g h"), (1, "x y"), (2, "p q r s t u")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r["doc_id"], r["pos"], r["fp"])
        for r in winnow_fingerprints(docs).collect()
    }

    def phash(s):
        h = 0
        for ch in s:
            h = (h * 31 + ord(ch)) % 2147483647
        return h

    want = set()
    for i, t in rows:
        toks = t.split(" ")
        if len(toks) < K_GRAM + W_WINDOW - 1:
            continue
        hs = [
            phash(" ".join(toks[j : j + K_GRAM]))
            for j in range(len(toks) - K_GRAM + 1)
        ]
        for j in range(len(hs) - W_WINDOW + 1):
            wnd = hs[j : j + W_WINDOW]
            m = min(wnd)
            want.add((i, j + wnd.index(m), m))
    assert got == want and len(got) > 0
    # doc 1 (too short for a full window) emits nothing
    assert not any(d == 1 for d, _, _ in got)


def test_winnowing_shared_substring_guarantee(spark):
    """The paper's guarantee: two docs sharing a token run of length
    >= k + w - 1 share at least one fingerprint HASH."""
    from confluence2md_spark.operators.winnow import winnow_fingerprints

    shared = "alpha beta gamma delta epsilon zeta eta"  # 7 >= 3 + 4 - 1
    docs = spark.createDataFrame(
        [
            (0, "one two " + shared + " tail words here"),
            (1, shared + " completely other suffix tokens"),
            (2, "unrelated content with no overlap at all whatsoever"),
        ],
        ["doc_id", "text"],
    )
    fps = winnow_fingerprints(docs).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    assert by_doc[0] & by_doc[1], "shared substring must share a fingerprint"
    assert not (by_doc[0] & by_doc[1]) & by_doc.get(2, set())


def test_winnow_overlap_matches_duckdb_twin(spark):
    """Spark fingerprint co-occurrence join == DuckDB twin on planted
    overlapping docs; non-overlapping docs produce no pair."""
    import duckdb
    import random

    from confluence2md_spark.operators.winnow import (
        winnow_overlap_pairs,
        winnow_overlap_sql_duck,
    )

    rnd = random.Random(11)
    vocab = [f"v{i}" for i in range(30)]
    rows = [
        (i, " ".join(rnd.choice(vocab) for _ in range(25))) for i in range(12)
    ]
    # plant heavy overlap: doc 12 = doc 0 with a new tail
    rows.append((12, rows[0][1] + " tail12 tail13 tail14"))
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = [tuple(r) for r in winnow_overlap_pairs(docs, min_shared=3, ordered=True).collect()]

    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    want = con.execute(winnow_overlap_sql_duck(min_shared=3)).fetchall()
    assert got == [tuple(w) for w in want]
    assert any(s == 0 and d == 12 for s, d, _ in got)
