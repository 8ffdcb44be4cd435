"""Band statistics / histogram (ComputeStatistics + GetHistogram
analogs) vs numpy whole-array oracles, and dup_clusters vs a
driver-side union-find oracle."""

import numpy as np
import pandas as pd
import pytest

from gdal_spark.operators import stats as st
from gdal_spark.operators.dedup import dup_clusters


@pytest.fixture(scope="module")
def ramp():
    rng = np.random.default_rng(7)
    return rng.integers(0, 256, size=(64, 64), dtype=np.uint8)


def _tiles_from(spark, full, ts):
    h, w = full.shape
    rows = [
        (0, tx, ty, ts, ts,
         full[ty * ts:(ty + 1) * ts, tx * ts:(tx + 1) * ts]
         .astype(np.uint8).tobytes())
        for ty in range(h // ts) for tx in range(w // ts)
    ]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["z", "tx", "ty", "w", "h", "data"])
    )


def test_histogram_matches_numpy(spark, ramp):
    tiles = _tiles_from(spark, ramp, 16)
    got = st.band_histogram(tiles, 0.0, 256.0, 16).collect()
    want_cnt, _ = np.histogram(ramp, bins=16, range=(0, 256))
    assert [r["bucket"] for r in got] == list(range(16))
    assert [r["cnt"] for r in got] == want_cnt.tolist()
    flat = ramp.astype(np.int64)
    for r in got:
        lo, hi = r["bucket"] * 16, (r["bucket"] + 1) * 16
        m = (flat >= lo) & (flat < hi)
        assert r["sum_v"] == int(flat[m].sum())
        assert r["sumsq_v"] == int((flat[m] ** 2).sum())
        assert r["min_v"] == int(flat[m].min())
        assert r["max_v"] == int(flat[m].max())


def test_histogram_out_of_range_modes(spark, ramp):
    tiles = _tiles_from(spark, ramp, 16)
    # window [64, 192): default drops outside pixels
    drop = st.band_histogram(tiles, 64.0, 192.0, 8).collect()
    inside = ramp[(ramp >= 64) & (ramp < 192)]
    assert sum(r["cnt"] for r in drop) == inside.size
    # include_out_of_range clamps them into the end buckets
    clamp = st.band_histogram(
        tiles, 64.0, 192.0, 8, include_out_of_range=True
    ).collect()
    assert sum(r["cnt"] for r in clamp) == ramp.size
    assert clamp[0]["cnt"] == int((ramp < 64 + 16).sum())
    assert clamp[-1]["cnt"] == int((ramp >= 192 - 16).sum())


def test_band_statistics_exact(spark, ramp):
    tiles = _tiles_from(spark, ramp, 16)
    row = st.band_statistics(tiles).collect()[0]
    flat = ramp.astype(np.float64)
    assert row["min_v"] == int(ramp.min())
    assert row["max_v"] == int(ramp.max())
    assert row["cnt"] == ramp.size
    assert row["mean_v"] == pytest.approx(flat.mean(), abs=0, rel=1e-12)
    # population stddev, same accumulator form as the engine
    want_std = np.sqrt((flat ** 2).mean() - flat.mean() ** 2)
    assert row["stddev_v"] == pytest.approx(want_std, rel=1e-12)


# ---------------------------------------------------------------------------
# dup_clusters
# ---------------------------------------------------------------------------


def _oracle_roots(pairs):
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def test_dup_clusters_matches_union_find(spark):
    # chain 1-2-3-4, pair 10-11, triangle 20-21-22, self-contained 30-30
    pairs = [(1, 2), (2, 3), (3, 4), (10, 11),
             (20, 21), (21, 22), (20, 22), (30, 30)]
    pdf = pd.DataFrame(pairs, columns=["doc_a", "doc_b"])
    got = {
        r["doc_id"]: r["root_id"]
        for r in dup_clusters(spark.createDataFrame(pdf)).collect()
    }
    want = _oracle_roots(pairs)
    assert got == want
    assert got[4] == 1 and got[22] == 20 and got[30] == 30


def test_dup_clusters_long_chain_distributed(spark):
    # a 500-node path — the hash-min worst case; contraction must
    # still converge and every node must root at 0
    n = 500
    pdf = pd.DataFrame(
        [(i, i + 1) for i in range(n)], columns=["doc_a", "doc_b"]
    )
    got = dup_clusters(
        spark.createDataFrame(pdf).repartition(8)
    ).collect()
    assert len(got) == n + 1
    assert all(r["root_id"] == 0 for r in got)
