"""Vector reprojection (ogr2ogr -t_srs / OGRGeometry::transform)
tests: coordinate exactness per WKB type, single-batched-call
contract, densification, transform-family composition."""

import numpy as np
import pytest

from gdal_spark import proj, wkb
from gdal_spark.operators import reproject as rp


class _Affine:
    def __call__(self, x, y):
        return 2.0 * np.asarray(x) + 10.0, -1.0 * np.asarray(y) + 5.0


class _Counting:
    def __init__(self):
        self.calls = 0

    def __call__(self, x, y):
        self.calls += 1
        return np.asarray(x), np.asarray(y)


GEOMS = [
    wkb.point(1.0, 2.0),
    wkb.linestring([(0.0, 0.0), (4.0, 2.0)]),
    wkb.polygon(
        [[(0.0, 0.0), (3.0, 0.0), (3.0, 3.0), (0.0, 3.0), (0.0, 0.0)],
         [(1.0, 1.0), (1.0, 2.0), (2.0, 2.0), (2.0, 1.0), (1.0, 1.0)]]
    ),
    wkb.multipolygon(
        [[[(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 0.0)]],
         [[(5.0, 5.0), (6.0, 5.0), (6.0, 6.0), (5.0, 5.0)]]]
    ),
    None,
]


def test_batch_transform_exact_per_type():
    out = rp.transform_wkb_batch(GEOMS, _Affine())
    assert out[4] is None
    gt, p = wkb.parse(out[0])
    assert p == (12.0, 3.0)
    gt, ls = wkb.parse(out[1])
    np.testing.assert_array_equal(
        np.asarray(ls), [[10.0, 5.0], [18.0, 3.0]]
    )
    gt, rings = wkb.parse(out[2])
    assert len(rings) == 2
    np.testing.assert_array_equal(
        np.asarray(rings[0])[0], [10.0, 5.0]
    )
    gt, polys = wkb.parse(out[3])
    assert gt == wkb.MULTIPOLYGON and len(polys) == 2


def test_one_transform_call_per_batch():
    t = _Counting()
    rp.transform_wkb_batch(GEOMS, t)
    assert t.calls == 1


def test_densify_subdivides_long_edges():
    ls = wkb.linestring([(0.0, 0.0), (10.0, 0.0)])
    out = rp.transform_wkb_batch([ls], _Affine(), densify_max_len=2.5)
    _, coords = wkb.parse(out[0])
    assert len(coords) == 5  # 4 segments + 1
    np.testing.assert_allclose(np.asarray(coords)[:, 1], 5.0)


def test_distributed_reproject_utm(spark):
    t = proj.UTMForwardTransform(zone=31)
    rows = [
        (i, wkb.point(3.0 + i * 0.01, 45.0 + i * 0.01))
        for i in range(50)
    ]
    df = spark.createDataFrame(rows, "fid long, geometry binary")
    out = rp.reproject_geometries(df.repartition(4), t).orderBy("fid")
    got = out.collect()
    lons = np.array([3.0 + i * 0.01 for i in range(50)])
    lats = np.array([45.0 + i * 0.01 for i in range(50)])
    ex, ey = t(lons, lats)
    for i, r in enumerate(got):
        _, p = wkb.parse(bytes(r["geometry"]))
        assert p[0] == pytest.approx(ex[i], rel=1e-12)
        assert p[1] == pytest.approx(ey[i], rel=1e-12)


def test_schema_preserved(spark):
    df = spark.createDataFrame(
        [(1, "x", GEOMS[0])], "fid long, name string, geometry binary"
    )
    # executor-side pickling needs an importable transform (test-local
    # classes don't ship) — any library transform works
    out = rp.reproject_geometries(df, proj.UTMForwardTransform(zone=31))
    assert out.columns == ["fid", "name", "geometry"]
    assert out.count() == 1
