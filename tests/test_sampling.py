"""Deterministic corpus sampling / mixture weighting."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from gdal_spark.operators.sampling import weighted_mixture, weighted_sample


@pytest.fixture(scope="module")
def corpus(spark):
    n = 20_000
    pdf = pd.DataFrame(
        {
            "url": [f"https://s{i % 97}.example/{i}" for i in range(n)],
            "lang": np.array(["en", "de", "fr", "es"])[
                np.arange(n) % 4
            ],
        }
    )
    return spark.createDataFrame(pdf)


def test_rates_are_respected(corpus):
    rates = {"en": 0.5, "de": 0.1, "fr": 1.0}
    got = (
        weighted_sample(corpus, rates, seed=7)
        .groupBy("lang")
        .count()
        .collect()
    )
    by_lang = {r.lang: r["count"] for r in got}
    assert "es" not in by_lang  # default_rate=0 drops unlisted
    assert by_lang["fr"] == 5000  # rate 1.0 keeps everything
    assert by_lang["en"] == pytest.approx(2500, rel=0.08)
    assert by_lang["de"] == pytest.approx(500, rel=0.25)


def test_partitioning_independent_and_seeded(corpus):
    rates = {"en": 0.3, "de": 0.3, "fr": 0.3, "es": 0.3}
    a = {
        r.url
        for r in weighted_sample(corpus, rates, seed=1)
        .select("url")
        .collect()
    }
    b = {
        r.url
        for r in weighted_sample(
            corpus.repartition(17, "lang"), rates, seed=1
        )
        .select("url")
        .collect()
    }
    assert a == b  # repartition-proof, unlike DataFrame.sample
    c = {
        r.url
        for r in weighted_sample(corpus, rates, seed=2)
        .select("url")
        .collect()
    }
    assert a != c  # different seed → different (independent) sample


def test_mixture_epoch_counts(corpus):
    out = (
        weighted_mixture(
            corpus, {"en": 3.0, "de": 2.7, "fr": 0.4}, seed=5
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.countDistinct("url").alias("docs"),
            F.max("epoch").alias("max_epoch"),
        )
        .collect()
    )
    by = {r.lang: r for r in out}
    # integer weight: exactly w copies of every row
    assert by["en"].rows == 3 * 5000 and by["en"].max_epoch == 2
    # fractional: E[copies]=2.7, every doc at least twice
    assert by["de"].docs == 5000
    assert by["de"].rows == pytest.approx(int(2.7 * 5000), rel=0.03)
    assert by["fr"].rows == pytest.approx(2000, rel=0.12)
    assert "es" not in by


def test_plan_stays_codegen(corpus):
    plan = (
        weighted_mixture(corpus, {"en": 2.5}, seed=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan
    assert "Exchange" not in plan  # filter + explode only, no shuffle


def test_bad_rates_raise(corpus):
    with pytest.raises(ValueError):
        weighted_sample(corpus, {"en": 1.5})
    with pytest.raises(ValueError):
        weighted_mixture(corpus, {"en": -1.0})


def test_sample_by_rate_concentration_and_determinism(spark):
    from gdal_spark.operators.sampling import sample_by_rate

    df = spark.range(0, 20000).select(
        F.col("id").alias("doc_id"),
        # rate 0.8 for even ids, 0.2 for odd
        F.when(F.col("id") % 2 == 0, 0.8).otherwise(0.2).alias("r"),
    )
    kept = sample_by_rate(df, "r", seed=3).toPandas()
    even = (kept["doc_id"] % 2 == 0).sum()
    odd = (kept["doc_id"] % 2 == 1).sum()
    assert abs(even / 10000 - 0.8) < 0.02
    assert abs(odd / 10000 - 0.2) < 0.02
    # repartition-proof: identical surviving set
    kept2 = sample_by_rate(
        df.repartition(17), "r", seed=3
    ).toPandas()
    assert sorted(kept2["doc_id"]) == sorted(kept["doc_id"])
    # different seed -> different draw, same concentration
    kept3 = sample_by_rate(df, "r", seed=4).toPandas()
    assert sorted(kept3["doc_id"]) != sorted(kept["doc_id"])


def test_sample_by_rate_null_and_zero_drop(spark):
    from gdal_spark.operators.sampling import sample_by_rate

    df = spark.createDataFrame(
        [(1, None), (2, 0.0), (3, 1.0)], "doc_id long, r double"
    )
    got = sample_by_rate(df, "r").collect()
    assert [r["doc_id"] for r in got] == [3]
