"""Trained-merges BPE (functions/bpe.py): merge learning vs a from-scratch
naive trainer, the classic Sennrich worked example, rank-greedy application
properties, and the distributed-vs-driver training equality."""

from __future__ import annotations

from confluence2md_spark.functions.bpe import (
    END,
    bpe_encode_stats,
    encode_word,
    train_bpe,
    train_merges_from_histogram,
)


def _naive_train(hist: dict[str, int], num_merges: int) -> list[tuple[str, str]]:
    """Pair counts recomputed from scratch every iteration — no index, no
    incremental updates; the slow-but-obviously-correct twin."""
    words = {w: list(w) + [END] for w in hist}
    merges = []
    for _ in range(num_merges):
        pc: dict[tuple, int] = {}
        for w, seq in words.items():
            for a, b in zip(seq, seq[1:]):
                pc[(a, b)] = pc.get((a, b), 0) + hist[w]
        if not pc:
            break
        best = min(pc, key=lambda p: (-pc[p], p))
        if pc[best] <= 0:
            break
        merges.append(best)
        for w, seq in words.items():
            out, j = [], 0
            while j < len(seq):
                if j + 1 < len(seq) and (seq[j], seq[j + 1]) == best:
                    out.append(seq[j] + seq[j + 1])
                    j += 2
                else:
                    out.append(seq[j])
                    j += 1
            words[w] = out
    return merges


def test_incremental_trainer_matches_naive_recompute():
    hist = {
        "low": 5, "lower": 2, "newest": 6, "widest": 3,
        "spark": 7, "sparkly": 1, "park": 4, "a": 9,
    }
    for k in (1, 5, 10, 30, 100):
        assert train_merges_from_histogram(list(hist.items()), k) == _naive_train(hist, k)


def test_sennrich_worked_example():
    """The BPE paper's example: with {low:5, lower:2, newest:6, widest:3},
    'es' (count 9) merges first, then 'est' (9), then 'est</w>' (9)."""
    hist = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = train_merges_from_histogram(hist, 3)
    assert merges == [("e", "s"), ("es", "t"), ("est", END)]


def test_encode_word_rank_greedy_equals_sequential_replay():
    hist = {"low": 5, "lower": 2, "newest": 6, "widest": 3, "lowest": 1}
    merges = _naive_train(hist, 12)
    ranks = {p: i for i, p in enumerate(merges)}

    def replay(word: str) -> list[str]:
        seq = list(word) + [END]
        for a, b in merges:
            out, j = [], 0
            while j < len(seq):
                if j + 1 < len(seq) and seq[j] == a and seq[j + 1] == b:
                    out.append(a + b)
                    j += 2
                else:
                    out.append(seq[j])
                    j += 1
            seq = out
        return seq

    for w in list(hist) + ["unseen", "lowlow", "west"]:
        got = encode_word(w, ranks)
        assert got == replay(w), w
        # lossless: pieces concatenate back to word + end marker
        assert "".join(got) == w + END


def test_train_bpe_spark_equals_histogram_training(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    merges = train_bpe(docs, num_merges=16)
    hist: dict[str, int] = {}
    for r in docs.select("text").collect():
        for w in (r["text"] or "").lower().split():
            hist[w] = hist.get(w, 0) + 1
    assert merges == _naive_train(hist, 16)
    assert len(merges) == 16


def test_bpe_encode_stats_fertility(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(100)
    merges = train_bpe(docs, num_merges=24)
    rows = bpe_encode_stats(docs, merges).collect()
    assert len(rows) == 100
    for r in rows:
        assert r["n_bpe_tokens"] >= r["n_words"] >= 1  # pieces never < words
        assert r["fertility_micros"] >= 1_000_000
    # more merges -> fertility never increases, and strictly drops somewhere
    rows2 = bpe_encode_stats(docs, train_bpe(docs, num_merges=64)).collect()
    f1 = {r["doc_id"]: r["n_bpe_tokens"] for r in rows}
    f2 = {r["doc_id"]: r["n_bpe_tokens"] for r in rows2}
    assert all(f2[d] <= f1[d] for d in f1)
    assert any(f2[d] < f1[d] for d in f1)


def test_bpe_unrolled_sql_twin_matches_spark(spark, sf_dir):
    """The 24-step unrolled DuckDB training twin must reproduce the
    Spark-side (driver-trained + Arrow-encoded) stats row-for-row, AND
    the rank-greedy encode must equal the training-state segmentation
    for every histogram word (the equivalence the twin relies on)."""
    import duckdb

    from confluence2md_spark.functions.bpe import (
        END,
        bpe_trained_sql_duck,
        encode_word,
        word_histogram,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    merges = train_bpe(docs, num_merges=24)
    got = [
        tuple(r)
        for r in bpe_encode_stats(docs, merges)
        .orderBy("doc_id")
        .collect()
    ]
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    want = [tuple(r) for r in con.sql(bpe_trained_sql_duck(num_merges=24)).fetchall()]
    assert got == want

    # encode/train-state equivalence, word-for-word
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    for row in word_histogram(docs).collect():
        w = row["word"]
        seq = list(w) + [END]
        for a, b in merges:
            out, j = [], 0
            while j < len(seq):
                if j + 1 < len(seq) and seq[j] == a and seq[j + 1] == b:
                    out.append(a + b)
                    j += 2
                else:
                    out.append(seq[j])
                    j += 1
            seq = out
        assert seq == encode_word(w, ranks), w
