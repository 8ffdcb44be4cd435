"""Geolocation-array transform (alg/gdalgeoloc.cpp) tests: forward
bilinear exactness, exact-inverse round trips on smooth swaths,
subsampled arrays, affine-consistency warp parity."""

import numpy as np
import pytest

from gdal_spark import geoloc
from gdal_spark.operators import tiling
from gdal_spark import raster

rng = np.random.default_rng(5)


def _swath(h=20, w=30, step=1.0, off=0.0):
    """Smooth non-affine geoloc field (monotone, swath-like)."""
    c = np.arange(w)[None, :]
    r = np.arange(h)[:, None]
    lon = 10.0 + 0.01 * (off + c * step) + 0.002 * (off + r * step) \
        + 0.0005 * np.sin(c / 7.0)
    lat = 45.0 - 0.008 * (off + r * step) + 0.001 * (off + c * step) \
        + 0.0004 * np.cos(r / 5.0)
    return lon, lat


def test_forward_exact_at_nodes():
    lon, lat = _swath()
    t = geoloc.GeolocTransform(lon, lat)
    c = np.arange(30)
    r = np.arange(20)
    cc, rr = np.meshgrid(c, r)
    gx, gy = t(cc.ravel().astype(float), rr.ravel().astype(float))
    np.testing.assert_allclose(gx, lon[rr.ravel(), cc.ravel()])
    np.testing.assert_allclose(gy, lat[rr.ravel(), cc.ravel()])


def test_forward_bilinear_between_nodes():
    lon, lat = _swath()
    t = geoloc.GeolocTransform(lon, lat)
    gx, gy = t(np.array([3.5]), np.array([4.5]))
    want_x = (lon[4, 3] + lon[4, 4] + lon[5, 3] + lon[5, 4]) / 4
    want_y = (lat[4, 3] + lat[4, 4] + lat[5, 3] + lat[5, 4]) / 4
    np.testing.assert_allclose(gx[0], want_x)
    np.testing.assert_allclose(gy[0], want_y)


def test_subsampled_offsets():
    """PIXEL_STEP/OFFSET convention: geoloc sample (r, c) speaks for
    source pixel OFFSET + index*STEP (gdalgeoloc.cpp:617-624)."""
    lon, lat = _swath(step=4.0, off=2.0)
    t = geoloc.GeolocTransform(
        lon, lat, pixel_offset=2.0, line_offset=2.0,
        pixel_step=4.0, line_step=4.0,
    )
    gx, gy = t(np.array([2.0 + 4.0 * 3]), np.array([2.0 + 4.0 * 5]))
    np.testing.assert_allclose(gx[0], lon[5, 3])
    np.testing.assert_allclose(gy[0], lat[5, 3])


def test_inverse_round_trip():
    lon, lat = _swath()
    t = geoloc.GeolocTransform(lon, lat)
    inv = t.inverse()
    px = rng.uniform(0, 29, 500)
    py = rng.uniform(0, 19, 500)
    gx, gy = t(px, py)
    bx, by = inv(gx, gy)
    assert np.isfinite(bx).all()
    np.testing.assert_allclose(bx, px, atol=1e-7)
    np.testing.assert_allclose(by, py, atol=1e-7)


def test_inverse_outside_returns_nan():
    lon, lat = _swath()
    inv = geoloc.GeolocTransform(lon, lat).inverse()
    bx, by = inv(np.array([0.0]), np.array([0.0]))  # far outside
    assert np.isnan(bx[0]) and np.isnan(by[0])


def test_inverse_subsampled_round_trip():
    lon, lat = _swath(h=12, w=16, step=8.0)
    t = geoloc.GeolocTransform(lon, lat, pixel_step=8.0, line_step=8.0)
    inv = t.inverse()
    px = rng.uniform(0, 15 * 8, 200)
    py = rng.uniform(0, 11 * 8, 200)
    gx, gy = t(px, py)
    bx, by = inv(gx, gy)
    np.testing.assert_allclose(bx, px, atol=1e-6)
    np.testing.assert_allclose(by, py, atol=1e-6)


SRC_GT = (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)
DST_GT = (440000.0, 75.0, 0.0, 3752000.0, 0.0, -75.0)


def test_warp_geoloc_affine_parity(spark):
    """A geoloc INVERSE whose field encodes the identity georef map
    must warp pixel-identically to the affine path (same pin as
    TPS/RPC): geoloc nodes = src georef coords of each src pixel."""
    src_w = src_h = 128
    ts = 64
    # geoloc arrays: lon/lat = georef coords of src pixel centers,
    # subsampled every 8 px
    step = 8.0
    c = np.arange(0, src_w + 1, 8)[None, :].astype(float)
    r = np.arange(0, src_h + 1, 8)[:, None].astype(float)
    lon = SRC_GT[0] + (c + 0.0) * SRC_GT[1] + 0 * r
    lat = SRC_GT[3] + (r + 0.0) * SRC_GT[5] + 0 * c
    lon = np.broadcast_to(lon, (r.size, c.size)).copy()
    lat = np.broadcast_to(lat, (r.size, c.size)).copy()
    t = geoloc.GeolocTransform(lon, lat, pixel_step=step,
                               line_step=step)
    inv = t.inverse()

    tiles = tiling.formula_tiles(spark, src_w // ts, src_h // ts, ts)
    kw = dict(method="nearest", dst_block=32, src_tile_size=ts)

    class _InvPix:
        """dst georef -> src PIXEL -> src georef (what warp wants)."""

        def __init__(self, inv):
            self.inv = inv

        def __call__(self, gx, gy):
            px, py = self.inv(gx, gy)
            X = SRC_GT[0] + px * SRC_GT[1]
            Y = SRC_GT[3] + py * SRC_GT[5]
            # outside the geoloc extent: push far away -> nodata
            X = np.where(np.isnan(X), 1e12, X)
            Y = np.where(np.isnan(Y), 1e12, Y)
            return X, Y

    a = tiling.warp_affine(
        tiles, SRC_GT, src_w, src_h, DST_GT, 80, 60,
        transform=_InvPix(inv), **kw
    ).orderBy("dj", "di").toPandas()
    b = tiling.warp_affine(
        tiles, SRC_GT, src_w, src_h, DST_GT, 80, 60, **kw
    ).orderBy("dj", "di").toPandas()
    # inside the geoloc-covered area the two warps agree; outside the
    # geoloc warp is nodata
    av = a["val"].to_numpy()
    bv = b["val"].to_numpy()
    inside = av != raster.NODATA
    assert inside.sum() > 0.5 * len(av)
    np.testing.assert_array_equal(av[inside], bv[inside])
