"""TPS (alg/thinplatespline.cpp, alg/gdal_tps.cpp) and RPC
(alg/gdal_rpc.cpp) transform tests: interpolation exactness, affine
reproduction, warp parity against the pure-affine path, inverse
round-trips, and the JVM-codegen/numpy split agreement."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gdal_spark import raster, rpc, tps
from gdal_spark.operators import tiling

rng = np.random.default_rng(42)


# ---------------------------------------------------------------- TPS


def _scatter_gcps(n=12):
    px = rng.uniform(0, 100, n)
    py = rng.uniform(0, 100, n)
    # a smooth non-affine target field
    X = 500.0 + 2.0 * px + 0.3 * py + 5.0 * np.sin(px / 20.0)
    Y = 900.0 - 1.5 * py + 0.2 * px + 4.0 * np.cos(py / 25.0)
    return np.column_stack([px, py, X, Y])


def test_tps_interpolates_gcps_exactly():
    g = _scatter_gcps()
    fwd, rev = tps.tps_transform_pair(g)
    X, Y = fwd(g[:, 0], g[:, 1])
    np.testing.assert_allclose(X, g[:, 2], atol=1e-8)
    np.testing.assert_allclose(Y, g[:, 3], atol=1e-8)
    x, y = rev(g[:, 2], g[:, 3])
    np.testing.assert_allclose(x, g[:, 0], atol=1e-8)
    np.testing.assert_allclose(y, g[:, 1], atol=1e-8)


def test_tps_reproduces_affine_everywhere():
    # when the GCPs lie on an exact affine map, the TPS radial
    # weights vanish and the transform IS that affine map everywhere
    # (minimum-bending property).
    px = rng.uniform(0, 50, 9)
    py = rng.uniform(0, 50, 9)
    X = 10.0 + 3.0 * px - 0.5 * py
    Y = -20.0 + 0.25 * px + 2.0 * py
    t = tps.fit_tps(np.column_stack([px, py]), np.column_stack([X, Y]))
    qx = rng.uniform(-30, 80, 200)
    qy = rng.uniform(-30, 80, 200)
    U, V = t(qx, qy)
    np.testing.assert_allclose(U, 10.0 + 3.0 * qx - 0.5 * qy, atol=1e-6)
    np.testing.assert_allclose(V, -20.0 + 0.25 * qx + 2.0 * qy, atol=1e-6)
    # radial weights ~ 0
    assert np.abs(t.coef[: len(t.src_xy)]).max() < 1e-9


def test_tps_roundtrip_inside_hull():
    g = _scatter_gcps(16)
    fwd, rev = tps.tps_transform_pair(g)
    qx = rng.uniform(20, 80, 50)
    qy = rng.uniform(20, 80, 50)
    X, Y = fwd(qx, qy)
    bx, by = rev(X, Y)
    # forward/reverse are independent fits (like the reference), so
    # the round-trip is approximate away from GCPs but tight inside
    # the hull of a well-sampled smooth field.
    assert np.abs(bx - qx).max() < 0.5
    assert np.abs(by - qy).max() < 0.5


def test_tps_dedups_duplicate_source_points():
    g = _scatter_gcps(8)
    gg = np.vstack([g, g[2]])  # exact duplicate row
    t = tps.fit_tps(gg[:, :2], gg[:, 2:])
    X, Y = t(g[:, 0], g[:, 1])
    np.testing.assert_allclose(X, g[:, 2], atol=1e-8)
    np.testing.assert_allclose(Y, g[:, 3], atol=1e-8)


SRC_GT = (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)
DST_GT = (440000.0, 75.0, 0.0, 3752000.0, 0.0, -75.0)


def test_warp_tps_matches_affine_warp(spark):
    """gdalwarp -tps parity pin: with GCPs sampled from the exact
    dst->src affine, the TPS warp must be PIXEL-IDENTICAL to the
    pure-affine warp path."""
    src_w = src_h = 128
    ts = 64
    igt = raster.inv_gt(SRC_GT)

    # GCPs: dst georef -> src georef is identity here (same CRS), so
    # sample the identity map — TPS must reproduce it exactly.
    gx = np.array([440000.0, 446000.0, 440000.0, 446000.0, 443000.0])
    gy = np.array([3752000.0, 3752000.0, 3747500.0, 3747500.0, 3749750.0])
    t = tps.fit_tps(
        np.column_stack([gx, gy]), np.column_stack([gx, gy])
    )

    tiles = tiling.formula_tiles(spark, src_w // ts, src_h // ts, ts)
    out_tps = (
        tiling.warp_affine(
            tiles, SRC_GT, src_w, src_h, DST_GT, 80, 60,
            method="nearest", dst_block=32, src_tile_size=ts,
            transform=t,
        )
        .orderBy("dj", "di")
        .toPandas()
    )
    out_aff = (
        tiling.warp_affine(
            tiles, SRC_GT, src_w, src_h, DST_GT, 80, 60,
            method="nearest", dst_block=32, src_tile_size=ts,
        )
        .orderBy("dj", "di")
        .toPandas()
    )
    assert out_tps["val"].tolist() == out_aff["val"].tolist()
    _ = igt  # (kept for doc symmetry with the affine test)


# ---------------------------------------------------------------- RPC


def _bumpy_rpc():
    """A deterministic mildly non-linear RPC model: affine base plus
    small quadratic terms, denominators != 1."""
    m = rpc.affine_rpc(
        a=5000.0, b=100.0, c=-20.0, d=3000.0, e=15.0, f=-120.0,
        long_off=44.0, lat_off=33.0, long_scale=0.5, lat_scale=0.5,
    )
    m.samp_num_coeff[7] = 0.01   # L^2
    m.line_num_coeff[8] = 0.015  # P^2
    m.samp_den_coeff[1] = 0.02   # 1 + 0.02 L
    m.line_den_coeff[2] = 0.01   # 1 + 0.01 P
    return m


def test_affine_rpc_is_exact():
    m = rpc.affine_rpc(
        a=5000.0, b=100.0, c=-20.0, d=3000.0, e=15.0, f=-120.0,
        long_off=44.0, lat_off=33.0, long_scale=0.5, lat_scale=0.5,
    )
    lon = rng.uniform(43.5, 44.5, 300)
    lat = rng.uniform(32.5, 33.5, 300)
    px, ln = m.geo_to_image(lon, lat)
    np.testing.assert_allclose(px, 5000.0 + 100.0 * lon - 20.0 * lat,
                               rtol=0, atol=1e-8)
    np.testing.assert_allclose(ln, 3000.0 + 15.0 * lon - 120.0 * lat,
                               rtol=0, atol=1e-8)


def test_rpc_inverse_roundtrip():
    m = _bumpy_rpc()
    lon = rng.uniform(43.8, 44.2, 500)
    lat = rng.uniform(32.8, 33.2, 500)
    px, ln = m.geo_to_image(lon, lat, height=100.0)
    lon2, lat2 = m.image_to_geo(px, ln, height=100.0,
                                pix_err_threshold=1e-8)
    # re-forward: the iteration's own stopping metric (pixels)
    px2, ln2 = m.geo_to_image(lon2, lat2, height=100.0)
    assert np.abs(px2 - px).max() < 1e-6
    assert np.abs(ln2 - ln).max() < 1e-6
    assert np.abs(lon2 - lon).max() < 1e-7
    assert np.abs(lat2 - lat).max() < 1e-7


def test_rpc_height_matters():
    m = _bumpy_rpc()
    m.samp_num_coeff[3] = 0.3  # H term — parallax
    p0, l0 = m.geo_to_image(44.0, 33.0, height=0.0)
    p1, l1 = m.geo_to_image(44.0, 33.0, height=200.0)
    assert abs(p1 - p0) > 1.0  # height shifts the sample coord
    np.testing.assert_allclose(l1, l0)


def test_rpc_columns_match_numpy(spark):
    m = _bumpy_rpc()
    lon = rng.uniform(43.8, 44.2, 400)
    lat = rng.uniform(32.8, 33.2, 400)
    pdf = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(lon, lat)], "lon double, lat double"
    )
    pc, lc = rpc.geo_to_image_columns(m, F.col("lon"), F.col("lat"))
    got = (
        pdf.select(pc.alias("px"), lc.alias("ln"), "lon", "lat")
        .toPandas()
        .sort_values(["lon", "lat"])
    )
    order = np.lexsort((lat, lon))
    px, ln = m.geo_to_image(lon[order], lat[order])
    np.testing.assert_allclose(got["px"].to_numpy(), px, rtol=1e-12)
    np.testing.assert_allclose(got["ln"].to_numpy(), ln, rtol=1e-12)


def test_warp_rpc_affine_parity(spark):
    """gdalwarp -rpc parity pin: an RPC that encodes the exact
    dst-georef -> src-georef identity must warp pixel-identically to
    the affine path (same trick as the TPS pin)."""
    src_w = src_h = 128
    ts = 64
    m = rpc.affine_rpc(a=0.0, b=1.0, c=0.0, d=0.0, e=0.0, f=1.0)
    t = rpc.RPCGeoToImage(m)  # (gx, gy) -> (gx, gy)
    tiles = tiling.formula_tiles(spark, src_w // ts, src_h // ts, ts)
    kw = dict(method="nearest", dst_block=32, src_tile_size=ts)
    a = tiling.warp_affine(tiles, SRC_GT, src_w, src_h, DST_GT, 80, 60,
                           transform=t, **kw).orderBy("dj", "di").toPandas()
    b = tiling.warp_affine(tiles, SRC_GT, src_w, src_h, DST_GT, 80, 60,
                           **kw).orderBy("dj", "di").toPandas()
    assert a["val"].tolist() == b["val"].tolist()
