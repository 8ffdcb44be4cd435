"""Approximate transformer (alg/gdaltransformer.cpp:3935+) tests:
error bound, exact-at-affine, call-count savings, tol=0 degeneracy,
and warp integration."""

import numpy as np
import pytest

from gdal_spark import proj, tps
from gdal_spark.approx import ApproxTransform
from gdal_spark.operators import tiling


class _Counting:
    def __init__(self, fn):
        self.fn = fn
        self.calls = 0

    def __call__(self, x, y):
        self.calls += np.asarray(x).size
        return self.fn(x, y)


def _utm():
    t = proj.UTMForwardTransform(zone=31)
    return t


def test_affine_base_is_exact():
    base = lambda x, y: (2.0 * x + 3.0, -0.5 * y + 1.0)  # noqa: E731
    at = ApproxTransform(base, max_error=0.125)
    xs = np.linspace(0, 1000, 257)[None, :].repeat(3, axis=0)
    ys = np.full_like(xs, 5.0)
    ax, ay = at(xs, ys)
    ex, ey = base(xs, ys)
    np.testing.assert_allclose(ax, ex, rtol=0, atol=1e-9)
    np.testing.assert_allclose(ay, ey, rtol=0, atol=1e-9)


def test_error_bound_on_curved_transform():
    t = _utm()
    at = ApproxTransform(t, max_error=0.5)
    # scanlines across 3 degrees of longitude (visibly curved map)
    xs = np.linspace(1.5, 4.5, 513)[None, :].repeat(8, axis=0)
    ys = np.repeat(np.linspace(40, 47, 8)[:, None], 513, axis=1)
    ax, ay = at(xs, ys)
    ex, ey = t(xs, ys)
    err = np.abs(ax - ex) + np.abs(ay - ey)
    # accept-test guarantees the MIDDLE error; interior points obey
    # the same bound up to the usual small heuristic slack
    assert err.max() <= 2 * 0.5


def test_saves_exact_evaluations():
    counting = _Counting(_utm())
    # error is in OUTPUT units (meters for UTM); 5 m over a 3-degree
    # scanline is the kind of slack -et buys in practice
    at = ApproxTransform(counting, max_error=5.0)
    xs = np.linspace(1.5, 4.5, 1025)[None, :]
    ys = np.full_like(xs, 45.0)
    at(xs, ys)
    assert counting.calls < 0.12 * xs.size
    assert at.last_exact_evals == counting.calls


def test_zero_tolerance_degenerates_to_exact():
    t = _utm()
    at = ApproxTransform(t, max_error=0.0)
    xs = np.linspace(1.5, 4.5, 65)[None, :]
    ys = np.full_like(xs, 44.0)
    ax, ay = at(xs, ys)
    ex, ey = t(xs, ys)
    np.testing.assert_array_equal(ax, ex)
    np.testing.assert_array_equal(ay, ey)


SRC_GT = (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)
DST_GT = (440000.0, 75.0, 0.0, 3752000.0, 0.0, -75.0)


def test_warp_with_approx_tps_matches_exact_tps(spark):
    """warp(transform=Approx(TPS)) at a sub-quantization tolerance is
    pixel-identical to warp(transform=TPS) — the -et flag contract."""
    src_w = src_h = 128
    ts = 64
    gx = np.array([440000.0, 446000.0, 440000.0, 446000.0, 443100.0])
    gy = np.array([3752000.0, 3752000.0, 3747500.0, 3747500.0, 3749700.0])
    # mildly bent target field so TPS is non-affine
    t = tps.fit_tps(
        np.column_stack([gx, gy]),
        np.column_stack([gx + 20.0 * np.sin(gx / 2000.0), gy]),
    )
    tiles = tiling.formula_tiles(spark, src_w // ts, src_h // ts, ts)
    kw = dict(method="nearest", dst_block=32, src_tile_size=ts)
    a = tiling.warp_affine(
        tiles, SRC_GT, src_w, src_h, DST_GT, 80, 60,
        transform=ApproxTransform(t, max_error=0.001), **kw
    ).orderBy("dj", "di").toPandas()
    b = tiling.warp_affine(
        tiles, SRC_GT, src_w, src_h, DST_GT, 80, 60, transform=t, **kw
    ).orderBy("dj", "di").toPandas()
    assert a["val"].tolist() == b["val"].tolist()
