"""Pansharpen (alg/gdalpansharpen.cpp weighted Brovey) tests: the
distributed tile pipeline must equal a whole-image numpy oracle
exactly, and the combine must satisfy the Brovey invariants."""

import numpy as np
import pytest
from pyspark.sql import types as T

from gdal_spark.operators import pansharpen as ps

TILE_SCHEMA = T.StructType(
    [
        T.StructField("z", T.IntegerType()),
        T.StructField("tx", T.LongType()),
        T.StructField("ty", T.LongType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("data", T.BinaryType()),
    ]
)


def _tiles(spark, img, ts):
    h, w = img.shape
    rows = [
        (
            0, tx // ts, ty // ts, ts, ts,
            img[ty : ty + ts, tx : tx + ts].tobytes(),
        )
        for ty in range(0, h, ts)
        for tx in range(0, w, ts)
    ]
    return spark.createDataFrame(rows, TILE_SCHEMA).repartition(4)


def _fixture(ms_ts=16, grid=2, ratio=2):
    """Deterministic pan + 3 MS bands; pan correlated with the bands
    so the Brovey factor is non-trivial."""
    mw = ms_ts * grid
    x = np.arange(mw)[None, :]
    y = np.arange(mw)[:, None]
    ms = [
        ((x * 3 + y * 5 + 17) % 200 + 20).astype(np.uint8),
        ((x * 7 + y * 2 + 80) % 180 + 30).astype(np.uint8),
        ((x * 11 + y * 13 + 5) % 150 + 50).astype(np.uint8),
    ]
    pw = mw * ratio
    X = np.arange(pw)[None, :]
    Y = np.arange(pw)[:, None]
    pan = ((X * 2 + Y * 3 + 9) % 220 + 18).astype(np.uint8)
    return pan, ms


def _oracle(pan, ms, weights, ratio):
    """Whole-image oracle: zero-pad each MS band by 2 (the same
    edge-fill the halo exchange uses at the grid boundary), cubic
    upsample, weighted-Brovey combine."""
    h, w = pan.shape
    ups = []
    for m in ms:
        padded = np.pad(m, 2, constant_values=0)
        ups.append(ps.cubic_upsample(padded, 2, ratio, w, h))
    return ps.weighted_brovey(pan.astype(np.float64), ups, weights)


def test_cubic_upsample_constant_is_exact():
    m = np.full((12, 12), 77, dtype=np.uint8)
    up = ps.cubic_upsample(np.pad(m, 2, mode="edge"), 2, 2, 24, 24)
    np.testing.assert_allclose(up, 77.0)


def test_brovey_identity_when_pan_equals_pseudo():
    """If pan == sum w_i ms_i exactly, factor == 1 and each output
    band equals its (rounded) upsampled input."""
    a = np.full((8, 8), 60.0)
    b = np.full((8, 8), 120.0)
    pan = 0.5 * a + 0.5 * b  # 90
    outs = ps.weighted_brovey(pan, [a, b], [0.5, 0.5])
    np.testing.assert_array_equal(outs[0], 60)
    np.testing.assert_array_equal(outs[1], 120)


def test_brovey_zero_pseudo_yields_zero():
    a = np.zeros((4, 4))
    outs = ps.weighted_brovey(np.full((4, 4), 100.0), [a], [1.0])
    np.testing.assert_array_equal(outs[0], 0)


def test_distributed_pansharpen_matches_oracle(spark):
    ratio, ms_ts, grid = 2, 16, 2
    pan, ms = _fixture(ms_ts, grid, ratio)
    weights = [0.4, 0.35, 0.25]
    pan_df = _tiles(spark, pan, ms_ts * ratio)
    ms_dfs = [_tiles(spark, m, ms_ts) for m in ms]
    got = ps.pansharpen(pan_df, ms_dfs, weights, ratio).toPandas()
    assert len(got) == grid * grid * 3
    want = _oracle(pan, ms, weights, ratio)
    pts = ms_ts * ratio
    for _, row in got.iterrows():
        a = np.frombuffer(row["data"], np.uint8).reshape(
            row["h"], row["w"]
        )
        wtile = want[row["band"]][
            row["ty"] * pts : row["ty"] * pts + row["h"],
            row["tx"] * pts : row["tx"] * pts + row["w"],
        ]
        np.testing.assert_array_equal(a, wtile)


@pytest.mark.parametrize("ratio", [2, 4])
def test_pansharpen_ratio4(spark, ratio):
    ms_ts = 8
    pan, ms = _fixture(ms_ts, 2, ratio)
    pan_df = _tiles(spark, pan, ms_ts * ratio)
    ms_dfs = [_tiles(spark, m, ms_ts) for m in ms[:2]]
    got = ps.pansharpen(pan_df, ms_dfs, [0.5, 0.5], ratio).toPandas()
    want = _oracle(pan, ms[:2], [0.5, 0.5], ratio)
    pts = ms_ts * ratio
    for _, row in got.iterrows():
        a = np.frombuffer(row["data"], np.uint8).reshape(
            row["h"], row["w"]
        )
        np.testing.assert_array_equal(
            a,
            want[row["band"]][
                row["ty"] * pts : row["ty"] * pts + row["h"],
                row["tx"] * pts : row["tx"] * pts + row["w"],
            ],
        )
