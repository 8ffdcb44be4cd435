"""GCP polynomial transforms (alg/gdal_crs.c analog)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gdal_spark import gcp


def _truth2(x, y):
    X = 2.0 + 0.5 * x + 0.01 * y + 1e-3 * x * y + 2e-3 * x * x - 3e-3 * y * y
    Y = -1.0 + 0.02 * x + 0.8 * y - 5e-4 * x * y + 1e-3 * y * y
    return X, Y


def _gcps(fn, n=16, seed=3):
    rng = np.random.RandomState(seed)
    px = rng.uniform(-50, 50, n)
    py = rng.uniform(-30, 30, n)
    X, Y = fn(px, py)
    return np.stack([px, py, X, Y], axis=1)


class TestFit:
    def test_order1_recovers_affine_exactly(self):
        def aff(x, y):
            return 3.0 + 2.0 * x - 0.5 * y, -7.0 + 0.25 * x + 4.0 * y

        cx, cy, rms = gcp.fit(_gcps(aff, 8), order=1)
        assert rms < 1e-9
        np.testing.assert_allclose(cx, [3.0, 2.0, -0.5], atol=1e-10)
        np.testing.assert_allclose(cy, [-7.0, 0.25, 4.0], atol=1e-10)

    def test_order2_recovers_quadratic(self):
        cx, cy, rms = gcp.fit(_gcps(_truth2, 20), order=2)
        assert rms < 1e-8
        x = np.linspace(-40, 40, 11)
        y = np.linspace(-25, 25, 11)
        X, Y = _truth2(x, y)
        np.testing.assert_allclose(
            gcp.apply_poly(cx, x, y, 2), X, atol=1e-8
        )
        np.testing.assert_allclose(
            gcp.apply_poly(cy, x, y, 2), Y, atol=1e-8
        )

    def test_order3_terms_and_fit(self):
        def cub(x, y):
            return 1 + 1e-4 * x**3 - 2e-4 * y**3, 2 + 5e-5 * x**2 * y

        cx, cy, rms = gcp.fit(_gcps(cub, 30), order=3)
        assert rms < 1e-7

    def test_underdetermined_raises(self):
        with pytest.raises(ValueError):
            gcp.fit(np.zeros((4, 4)), order=2)
        with pytest.raises(ValueError):
            gcp.fit(np.zeros((8, 4)), order=4)


class TestColumns:
    def test_jvm_columns_match_numpy(self, spark):
        cx, cy, _ = gcp.fit(_gcps(_truth2, 20), order=2)
        df = spark.range(200).select(
            (F.col("id") % 20 - 10.0).alias("x"),
            (F.col("id") % 7 - 3.0).alias("y"),
        )
        X, Y = gcp.transform_columns(
            cx, cy, F.col("x"), F.col("y"), order=2
        )
        rows = df.select("x", "y", X.alias("X"), Y.alias("Y")).collect()
        xs = np.array([r.x for r in rows])
        ys = np.array([r.y for r in rows])
        np.testing.assert_allclose(
            [r.X for r in rows],
            gcp.apply_poly(cx, xs, ys, 2),
            rtol=1e-12,
        )
        np.testing.assert_allclose(
            [r.Y for r in rows],
            gcp.apply_poly(cy, xs, ys, 2),
            rtol=1e-12,
        )

    def test_columns_stay_codegen(self, spark):
        cx, cy, _ = gcp.fit(_gcps(_truth2, 20), order=2)
        df = spark.range(10).select(
            F.col("id").cast("double").alias("x"),
            (F.col("id") * 2).cast("double").alias("y"),
        )
        X, Y = gcp.transform_columns(
            cx, cy, F.col("x"), F.col("y"), order=2
        )
        plan = (
            df.select(X.alias("X"), Y.alias("Y"))
            ._jdf.queryExecution().executedPlan().toString()
        )
        # executedPlan toString marks whole-stage-codegen spans "*(n)"
        assert "*(1)" in plan
        assert "Python" not in plan


class TestWarpParity:
    def test_order1_gcp_warp_equals_affine_warp(self, spark):
        """A GCP transform fitted to an exact affine must reproduce
        the affine warp pixel-for-pixel through the general path."""
        from gdal_spark.operators.tiling import formula_tiles, warp_affine

        src_gt = (100.0, 0.5, 0.0, 80.0, 0.0, -0.5)
        # dst origin offset a quarter dst-pixel from src so every dst
        # CENTER maps to a HALF-integer src coord: with aligned origins
        # the centers land exactly on src pixel corners, and the fitted
        # identity's ~1e-15 coefficient noise flips floor(3.0-eps) to 2
        # (GDAL's GWKNearest has the same boundary sensitivity — parity
        # at exact pixel-corner hits is not a defined contract).
        dst_gt = (100.25, 1.0, 0.0, 79.75, 0.0, -1.0)
        tiles = formula_tiles(spark, 4, 3, 16)  # 64 x 48

        # dst georef -> src georef is identity here; fit it from GCPs
        ident = _gcps(lambda x, y: (x, y), 8, seed=11)
        cx, cy, _ = gcp.fit(ident, order=1)
        tf = gcp.GCPPolyTransform(cx, cy, 1)

        base = warp_affine(
            tiles, src_gt, 64, 48, dst_gt, 32, 24, method="nearest",
            src_tile_size=16,
        )
        via_gcp = warp_affine(
            tiles, src_gt, 64, 48, dst_gt, 32, 24, method="nearest",
            src_tile_size=16, transform=tf,
        )
        a = {(r.di, r.dj): r.val for r in base.collect()}
        b = {(r.di, r.dj): r.val for r in via_gcp.collect()}
        assert a == b
