"""BPE tokenizer (Sennrich 2016 recipe) tests: hand-computable merge
order, distributed histogram parity, encode/decode round trips,
greedy-rank encoding consistency with training, Zipf cache path."""

from collections import Counter

import pytest
from pyspark.sql import functions as F

from gdal_spark.operators import bpe


def test_merge_order_hand_computed():
    """Classic textbook fixture: {'low':5,'lower':2,'newest':6,
    'widest':3}. First merges are e+s (9), es+t (9), est+</w> (9),
    l+o (7), lo+w (7) — the exact sequence from the BPE paper."""
    hist = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = bpe.train_bpe(hist, num_merges=5, min_count=1)
    assert merges == [
        ("e", "s"), ("es", "t"), ("est", bpe.END),
        ("l", "o"), ("lo", "w"),
    ]


def test_training_is_deterministic():
    hist = [("abab", 3), ("baba", 3), ("aabb", 3)]
    m1 = bpe.train_bpe(hist, num_merges=8, min_count=1)
    m2 = bpe.train_bpe(list(reversed(hist)), num_merges=8, min_count=1)
    assert m1 == m2


def test_encode_applies_merges_by_rank():
    merges = [("e", "s"), ("es", "t"), ("l", "o")]
    assert bpe._encode_word("lest", {p: i for i, p in enumerate(merges)}) \
        == ["l", "est", bpe.END]


def test_encode_unknown_word_falls_back_to_chars():
    toks = bpe._encode_word("zq", {})
    assert toks == ["z", "q", bpe.END]


DOCS = [
    (0, "the lowest price for the newest widget"),
    (1, "newer and lower and widest"),
    (2, "THE THE THE lowest newest"),
]


def test_distributed_histogram_matches_counter(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r["word"]: r["cnt"]
        for r in bpe.word_histogram(df).collect()
    }
    import re

    want = Counter()
    for _, t in DOCS:
        want.update(re.findall(bpe.PRETOKEN_RE, t.lower()))
    assert got == dict(want)


def test_end_to_end_train_encode_decode(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    merges = bpe.train_bpe(
        bpe.word_histogram(df), num_merges=40, min_count=1, max_words=1000
    )
    assert len(merges) > 5
    enc = bpe.bpe_encode(df, merges).orderBy("doc_id").collect()
    assert len(enc) == 3
    for row, (_, text) in zip(enc, DOCS):
        # token count <= char count, >= word count
        words = text.lower().split()
        assert row["n_tokens"] >= len(words)
        assert row["n_tokens"] == len(row["tokens"])
        # round trip: decode restores the normalized word stream
        assert bpe.decode_tokens(list(row["tokens"])) == " ".join(
            w for w in __import__("re").findall(
                bpe.PRETOKEN_RE, text.lower()
            )
        )
    # frequent words compress: 'the' (5x) should be a single token
    merged_the = any(
        "".join(p) in ("the", "the" + bpe.END) or p == ("th", "e")
        for p in merges
    )
    assert merged_the


def test_more_merges_never_increase_token_count(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    hist = bpe.word_histogram(df)
    m_small = bpe.train_bpe(hist, num_merges=5, min_count=1)
    m_big = bpe.train_bpe(hist, num_merges=50, min_count=1)
    n_small = (
        bpe.bpe_encode(df, m_small).agg(F.sum("n_tokens")).collect()[0][0]
    )
    n_big = (
        bpe.bpe_encode(df, m_big).agg(F.sum("n_tokens")).collect()[0][0]
    )
    assert n_big <= n_small
    # prefix property: the first merges of the big run equal the small run
    assert m_big[:5] == m_small
