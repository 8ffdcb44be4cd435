"""kNN ring-expansion vs exhaustive numpy oracle (FIXTURES.md F6)."""

import numpy as np
import pandas as pd

from gdal_spark import testdata
from gdal_spark.operators.knn import knn_join


def exhaustive_knn(pts: pd.DataFrame, queries: pd.DataFrame, k: int) -> set:
    want = set()
    px = pts["lon"].to_numpy()
    py = pts["lat"].to_numpy()
    pid = pts["pid"].to_numpy()
    for qid, qlon, qlat in queries[["qid", "qlon", "qlat"]].itertuples(index=False):
        d2 = (px - qlon) ** 2 + (py - qlat) ** 2
        order = np.lexsort((pid, d2))[:k]
        for rank, j in enumerate(order, start=1):
            want.add((int(qid), rank, int(pid[j])))
    return want


def test_knn_matches_exhaustive(spark):
    pts_pdf = testdata.grid_points_pdf(4000)
    points = spark.createDataFrame(pts_pdf)
    rng = np.random.default_rng(21)
    nq = 40
    queries = pd.DataFrame(
        {
            "qid": np.arange(nq, dtype=np.int64),
            "qlon": rng.uniform(-180, 180, nq),
            "qlat": rng.uniform(-90, 90, nq),
        }
    )
    # include queries inside the dense cluster (skew case)
    queries.loc[:4, "qlon"] = 13.405 + rng.uniform(0, 0.005, 5)
    queries.loc[:4, "qlat"] = 52.525 + rng.uniform(0, 0.005, 5)

    for k in (1, 4, 8):
        got = {
            (int(r.qid), int(r.rank), int(r.pid))
            for r in knn_join(points, queries, k=k, res=6).collect()
        }
        want = exhaustive_knn(pts_pdf, queries, k)
        assert got == want, f"k={k} mismatch"


def test_knn_k_larger_than_candidates(spark):
    pts_pdf = testdata.grid_points_pdf(50)
    points = spark.createDataFrame(pts_pdf)
    queries = pd.DataFrame({"qid": [0], "qlon": [0.0], "qlat": [0.0]})
    got = knn_join(points, queries, k=60, res=4).collect()
    assert len(got) == 50  # all points returned when k > n
