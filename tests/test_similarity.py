"""ANN (IVF / LSH) vs exact brute-force: recall and plumbing."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from gdal_spark.operators.similarity import (
    ann_ivf_topk, ann_lsh_topk, build_centroids, cosine_topk,
)

DIM = 16
N = 400


@pytest.fixture(scope="module")
def emb_df(spark):
    rng = np.random.default_rng(11)
    # clustered vectors so IVF lists carry real structure
    centers = rng.normal(size=(8, DIM))
    assign = rng.integers(0, 8, N)
    vecs = centers[assign] + 0.15 * rng.normal(size=(N, DIM))
    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(N, dtype=np.int64),
            "embedding": [v.astype(np.float32).tolist() for v in vecs],
        }
    )
    return spark.createDataFrame(pdf)


def _queries(emb_df):
    return emb_df.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )


def _topk_sets(rows):
    out = {}
    for r in rows:
        out.setdefault(int(r["qid"]), set()).add(int(r["vec_id"]))
    return out


def test_ivf_recall_vs_exact(spark, emb_df):
    q = _queries(emb_df)
    exact = _topk_sets(cosine_topk(emb_df, q, k=5).collect())
    cents = build_centroids(
        emb_df.limit(64).toPandas(), n_cells=8
    )
    approx = _topk_sets(
        ann_ivf_topk(emb_df, q, cents, k=5, n_probe=3).collect()
    )
    recalls = [
        len(exact[qid] & approx.get(qid, set())) / len(exact[qid])
        for qid in exact
    ]
    assert sum(recalls) / len(recalls) >= 0.8  # clustered data, 3 probes


def test_ivf_is_deterministic(spark, emb_df):
    q = _queries(emb_df)
    cents = build_centroids(emb_df.limit(64).toPandas(), n_cells=8)
    a = sorted(map(tuple, ann_ivf_topk(emb_df, q, cents, k=3).collect()))
    b = sorted(
        map(
            tuple,
            ann_ivf_topk(
                emb_df.repartition(7), q, cents, k=3
            ).collect(),
        )
    )
    assert a == b


def test_lsh_returns_ranked_unique(spark, emb_df):
    q = _queries(emb_df)
    rows = ann_lsh_topk(emb_df, q, dim=DIM, k=3, n_planes=4).collect()
    seen = set()
    for r in rows:
        assert 1 <= r["rnk"] <= 3
        key = (r["qid"], r["vec_id"])
        assert key not in seen
        seen.add(key)
