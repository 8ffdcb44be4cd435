"""Stupid-backoff n-gram LM (Brants 2007; CCNet-style perplexity
filtering) tests: hand-computed scores, broadcast ≡ join path,
discrimination between in-domain and gibberish text, count parity."""

import math

import pytest
from pyspark.sql import functions as F

from gdal_spark.operators import lm


DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the cat sat on the hat"),
    (2, "the dog sat on the mat"),
    (3, "a cat and a dog"),
]


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_ngram_counts_match_hand_count(spark):
    counts = {
        r["gram"]: r["cnt"]
        for r in lm.ngram_counts(_docs(spark), 2).collect()
    }
    sep = lm.SEP
    assert counts[f"the{sep}cat"] == 2
    assert counts[f"sat{sep}on"] == 3
    assert counts[f"on{sep}the"] == 3
    assert counts[f"a{sep}cat"] == 1
    total_bigrams = sum(counts.values())
    want = sum(len(t.split()) - 1 for _, t in DOCS)
    assert total_bigrams == want


def test_hand_computed_score():
    """score('mat' | 'the') with bigram model: c(the,mat)/c(the)."""
    tables = {
        1: {"the": 6, "mat": 2},
        2: {f"the{lm.SEP}mat": 2},
    }
    lp, n = lm._score_tokens(["the", "mat"], tables, total=8, order=2)
    # token 1: 'the' -> no bigram context (pos 0) -> ALPHA * unigram
    v1 = 3
    s1 = lm.ALPHA * (6 + 1) / (8 + v1)
    # token 2: bigram hit 2/6
    s2 = 2 / 6
    assert n == 2
    assert lp == pytest.approx(math.log10(s1) + math.log10(s2))


def test_broadcast_and_join_paths_agree(spark):
    docs = _docs(spark)
    model = lm.train_ngram_lm(docs, order=3)
    a = {
        r["doc_id"]: (r["n_tokens"], r["log10_prob"])
        for r in lm.score_perplexity(docs, model).collect()
    }
    b = {
        r["doc_id"]: (r["n_tokens"], r["log10_prob"])
        for r in lm.score_perplexity_join(docs, model).collect()
    }
    assert set(a) == set(b) == {0, 1, 2, 3}
    for k in a:
        assert a[k][0] == b[k][0]
        assert a[k][1] == pytest.approx(b[k][1], rel=1e-12)


def test_perplexity_discriminates_gibberish(spark):
    train = _docs(spark)
    model = lm.train_ngram_lm(train, order=2)
    test = spark.createDataFrame(
        [
            (10, "the cat sat on the mat"),   # in-domain
            (11, "zqx wvu ptk jjj qqq zzz"),  # gibberish
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["perplexity"]
        for r in lm.score_perplexity(test, model).collect()
    }
    assert got[10] < got[11] / 10  # order-of-magnitude separation


def test_perplexity_positive_and_finite(spark):
    docs = _docs(spark)
    model = lm.train_ngram_lm(docs, order=3)
    rows = lm.score_perplexity_join(docs, model).collect()
    for r in rows:
        assert r["perplexity"] > 1.0
        assert math.isfinite(r["perplexity"])


def test_zero_token_docs_survive_both_paths(spark):
    """Empty/whitespace documents must surface from BOTH scoring
    paths with identical rows (n_tokens=0, log10_prob=0,
    perplexity=NULL) — posexplode emits no rows for them, so the
    join path needs the left-join-back onto the doc list."""
    train = _docs(spark)
    model = lm.train_ngram_lm(train, order=2)
    docs = spark.createDataFrame(
        [(10, "the cat sat"), (11, ""), (12, "   ")],
        "doc_id long, text string",
    )
    a = {r["doc_id"]: r for r in lm.score_perplexity(docs, model).collect()}
    b = {r["doc_id"]: r
         for r in lm.score_perplexity_join(docs, model).collect()}
    assert set(a) == set(b) == {10, 11, 12}
    for k in (11, 12):
        for res in (a[k], b[k]):
            assert res["n_tokens"] == 0
            assert res["log10_prob"] == 0.0
            assert res["perplexity"] is None
    assert a[10]["log10_prob"] == pytest.approx(
        b[10]["log10_prob"], rel=1e-12
    )
