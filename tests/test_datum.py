"""Datum shifts (gdal_spark/datum.py): ECEF round trips, Helmert
properties, composed datum-shift warp."""

import numpy as np
import pytest

from gdal_spark import datum, proj
from gdal_spark.datum import (
    CLARKE1866,
    ED50_TO_WGS84,
    INTL1924,
    WGS84,
    DatumShiftTransform,
    Helmert7,
    ecef_to_geodetic,
    geodetic_to_ecef,
)

RNG = np.random.default_rng(7)
LON = RNG.uniform(-179.0, 179.0, 500)
LAT = RNG.uniform(-84.0, 84.0, 500)


@pytest.mark.parametrize("ell", [WGS84, INTL1924, CLARKE1866])
def test_ecef_roundtrip(ell):
    h = RNG.uniform(-100.0, 4000.0, LON.size)
    x, y, z = geodetic_to_ecef(LON, LAT, h, ell)
    lon2, lat2, h2 = ecef_to_geodetic(x, y, z, ell)
    # Bowring single-step: ~1e-12 rad near the surface
    assert np.max(np.abs(lon2 - LON)) < 1e-9
    assert np.max(np.abs(lat2 - LAT)) < 1e-9
    assert np.max(np.abs(h2 - h)) < 1e-3


def test_ecef_poles_and_equator():
    lon = np.array([0.0, 90.0, 0.0, 45.0])
    lat = np.array([90.0, -90.0, 0.0, 0.0])
    x, y, z = geodetic_to_ecef(lon, lat, 0.0, WGS84)
    assert abs(z[0] - WGS84.b) < 1e-6 and abs(z[1] + WGS84.b) < 1e-6
    assert abs(x[2] - WGS84.a) < 1e-6
    lon2, lat2, _ = ecef_to_geodetic(x, y, z, WGS84)
    assert abs(lat2[0] - 90.0) < 1e-9 and abs(lat2[1] + 90.0) < 1e-9
    assert abs(lon2[3] - 45.0) < 1e-9


def test_helmert_identity_and_translation():
    ident = Helmert7(0, 0, 0)
    x, y, z = geodetic_to_ecef(LON, LAT, 0.0, WGS84)
    xo, yo, zo = ident(x, y, z)
    assert np.array_equal(xo, x) and np.array_equal(zo, z)
    t = Helmert7(-87.0, -98.0, -121.0)
    xo, yo, zo = t(x, y, z)
    assert np.allclose(xo - x, -87.0) and np.allclose(zo - z, -121.0)


def test_helmert_full_seven_param_roundtrip():
    # rotations + scale: the linearized inverse must round-trip to
    # sub-millimetre (residual is O(rot^2)*|X|)
    h = Helmert7(84.87, 96.49, 116.95, 0.4, 0.23, 0.84, 0.98)
    x, y, z = geodetic_to_ecef(LON, LAT, 0.0, WGS84)
    xi, yi, zi = h.inverse()(*h(x, y, z))
    assert np.max(np.abs(xi - x)) < 1e-3
    assert np.max(np.abs(yi - y)) < 1e-3
    assert np.max(np.abs(zi - z)) < 1e-3


def test_helmert_known_vector():
    # EPSG GN7-2 example (method 9606, WGS72 -> WGS84):
    # T=(0,0,4.5) m, rz=0.554", ds=0.219 ppm
    h = Helmert7(0.0, 0.0, 4.5, 0.0, 0.0, 0.554, 0.219)
    x, y, z = h(3657660.66, 255768.55, 5201382.11)
    assert abs(x - 3657660.78) < 0.02
    assert abs(y - 255778.43) < 0.02
    assert abs(z - 5201387.75) < 0.02


def test_datum_shift_ed50_magnitude_and_inverse():
    # European window: the classic ED50->WGS84 shift is ~100-250 m
    lon = RNG.uniform(-5.0, 15.0, 200)
    lat = RNG.uniform(36.0, 55.0, 200)
    fwd = DatumShiftTransform(INTL1924, ED50_TO_WGS84, WGS84)
    lon2, lat2 = fwd(lon, lat)
    dist = np.hypot((lon2 - lon) * 111e3 * np.cos(np.radians(lat)),
                    (lat2 - lat) * 111e3)
    assert np.all(dist > 50.0) and np.all(dist < 400.0)
    lon3, lat3 = fwd.inverse()(lon2, lat2)
    assert np.max(np.abs(lon3 - lon)) < 1e-7
    assert np.max(np.abs(lat3 - lat)) < 1e-7


def test_datum_shift_null_is_identity():
    null = DatumShiftTransform(WGS84, Helmert7(0, 0, 0), WGS84)
    lon2, lat2 = null(LON, LAT)
    assert np.max(np.abs(lon2 - LON)) < 1e-9
    assert np.max(np.abs(lat2 - LAT)) < 1e-9


def test_composed_datum_warp_runs(spark):
    """End-to-end: warp a synthetic raster whose destination grid is
    geographic ED50 onto a UTM(WGS84) source via
    compose(datum shift, UTM forward) — the 'two CRSs on different
    datums' path the reference gets from PROJ pipelines."""
    from gdal_spark.operators.tiling import formula_tiles, warp_affine

    ts = 64
    tiles = formula_tiles(spark, 4, 4, ts)
    src_gt = (487200.0, 100.0, 0.0, 5000000.0, 0.0, -100.0)
    dst_gt = (8.9, 0.003, 0.0, 45.0, 0.0, -0.0015)
    tr = proj.compose(
        DatumShiftTransform(INTL1924, ED50_TO_WGS84, WGS84),
        proj.UTMForwardTransform(32),
    )
    out = warp_affine(
        tiles, src_gt, 4 * ts, 4 * ts, dst_gt, 32, 32,
        method="nearest", dst_block=32, src_tile_size=ts, transform=tr,
    )
    rows = {(r["di"], r["dj"]): r["val"] for r in out.collect()}
    assert len(rows) == 32 * 32
    # every valid pixel must equal the driver-side recompute through
    # the identical composed transform (nearest = src pixel floor)
    n_valid = 0
    for (di, dj), val in rows.items():
        lon = dst_gt[0] + (di + 0.5) * dst_gt[1]
        lat = dst_gt[3] + (dj + 0.5) * dst_gt[5]
        e, n = tr(np.array([lon]), np.array([lat]))
        sx = int(np.floor((e[0] - src_gt[0]) / src_gt[1]))
        sy = int(np.floor((n[0] - src_gt[3]) / src_gt[5]))
        if 0 <= sx < 256 and 0 <= sy < 256:
            n_valid += 1
            assert val == (sx * 7 + sy * 13) % 251, (di, dj, sx, sy)
        else:
            assert val == -1
    assert n_valid > 500  # the window mostly lands inside the source
