"""Delaunay triangulation + TIN interpolation properties
(alg/delaunay.c / GDALGridLinear analog)."""

import numpy as np
import pytest

from gdal_spark import geometry
from gdal_spark.operators.grid import delaunay_triangulate


def test_square_with_center():
    pts = np.array([[0, 0], [10, 0], [10, 10], [0, 10], [5, 5]], float)
    tris = delaunay_triangulate(pts)
    assert len(tris) == 4
    assert all(4 in t for t in tris)  # center in every triangle


def _tri_area(P, t):
    a, b, c = P[t[0]], P[t[1]], P[t[2]]
    return abs(
        (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])
    ) / 2.0


def test_fixture_triangulation_properties():
    import __spark_entry__ as e

    pdf = e._tin_points()
    P = pdf[["x", "y"]].to_numpy()
    tris = delaunay_triangulate(P)
    # coverage: triangle areas tile the convex hull exactly
    hull = geometry.convex_hull(P)
    hull_area = abs(geometry.ring_area(hull))
    assert sum(_tri_area(P, t) for t in tris) == pytest.approx(hull_area)
    # Delaunay property: no point strictly inside any circumcircle
    from gdal_spark.operators.grid import _in_circumcircle

    for t in tris[::7]:  # spot-check every 7th triangle
        for i in range(len(P)):
            if i in t:
                continue
            assert not _in_circumcircle(
                P[t[0]], P[t[1]], P[t[2]], P[i][0], P[i][1]
            )
    # every point participates
    used = {i for t in tris for i in t}
    assert used == set(range(len(P)))


def test_tin_grid_interpolates_plane_exactly(spark):
    # z = 2x + 3y + 7 over any triangulation reproduces the plane
    import pandas as pd

    from gdal_spark.operators.grid import tin_grid

    xs = [0, 40, 80, 20, 60, 10, 70]
    ys = [0, 10, 0, 50, 60, 80, 80]
    pdf = pd.DataFrame({
        "x": [float(v) for v in xs],
        "y": [float(v) for v in ys],
        "z": [float(2 * x + 3 * y + 7) for x, y in zip(xs, ys)],
    })
    out = tin_grid(spark, pdf, 16, 16, 0.0, 0.0, 4.0).collect()
    assert len(out) > 30
    for r in out:
        px, py = 4 * r.gx + 2, 4 * r.gy + 2
        want = int(np.floor((2 * px + 3 * py + 7) * 1000 + 0.5))
        assert abs(r.z_q3 - want) <= 1  # float assoc slack at q3


class TestDistributedDelaunay:
    """delaunay_distributed must reproduce the driver Bowyer-Watson
    triple set exactly (general-position inputs)."""

    def _ids_df(self, spark, P):
        import pandas as pd

        return spark.createDataFrame(
            pd.DataFrame({
                "id": range(len(P)),
                "x": P[:, 0], "y": P[:, 1],
                "z": np.arange(len(P), dtype=float),
            })
        )

    def _driver_triples(self, P):
        tris = delaunay_triangulate(P)
        out = set()
        for a, b, c in tris:
            while not (a < b and a < c):
                a, b, c = b, c, a
            out.add((a, b, c))
        return out

    def test_matches_driver_random(self, spark):
        from gdal_spark.operators.grid import delaunay_distributed

        rng = np.random.default_rng(7)
        P = rng.uniform(0, 100, size=(150, 2))
        got = {
            (r.a, r.b, r.c)
            for r in delaunay_distributed(
                spark, self._ids_df(spark, P), cell_size=25.0
            ).collect()
        }
        assert got == self._driver_triples(P)

    def test_matches_driver_with_escalation(self, spark):
        # sparse clustered points force circumdisks far beyond the 3x3
        # gather -> halo doubling must fire and still be exact
        from gdal_spark.operators.grid import delaunay_distributed

        rng = np.random.default_rng(13)
        a = rng.uniform(0, 10, size=(20, 2))
        b = rng.uniform(90, 100, size=(20, 2)) + np.array([0.0, -90.0])
        c = rng.uniform(0, 10, size=(20, 2)) + np.array([45.0, 80.0])
        P = np.vstack([a, b, c])
        got = {
            (r.a, r.b, r.c)
            for r in delaunay_distributed(
                spark, self._ids_df(spark, P), cell_size=5.0
            ).collect()
        }
        assert got == self._driver_triples(P)

    def test_tin_fixture_matches_driver(self, spark):
        import __spark_entry__ as e
        from gdal_spark.operators.grid import delaunay_distributed

        P = e._tin_points()[["x", "y"]].to_numpy()
        got = {
            (r.a, r.b, r.c)
            for r in delaunay_distributed(
                spark, self._ids_df(spark, P), cell_size=64.0
            ).collect()
        }
        assert got == self._driver_triples(P)


def test_tin_grid_distributed_equals_broadcast_path(spark):
    """The zero-driver TIN pipeline (distributed triangulation +
    bucket-local fill) is byte-identical to tin_grid on the gate
    fixture — same canonical-triple tie-break, same arithmetic."""
    import __spark_entry__ as e
    from gdal_spark.operators.grid import tin_grid, tin_grid_distributed

    pdf = e._tin_points().copy()
    ref = {
        (r.gx, r.gy): r.z_q3
        for r in tin_grid(
            spark, pdf, e._TIN_GRID, e._TIN_GRID, 0.0, 0.0, 4.0
        ).collect()
    }
    pdf.insert(0, "id", range(len(pdf)))
    got = {
        (r.gx, r.gy): r.z_q3
        for r in tin_grid_distributed(
            spark, spark.createDataFrame(pdf), e._TIN_GRID, e._TIN_GRID,
            0.0, 0.0, 4.0, cell_size=64.0,
        ).collect()
    }
    assert got == ref


def test_delaunay_no_driver_toPandas(spark, monkeypatch):
    """Driver memory pin (the sieve collected_edges==0 pattern): the
    whole distributed-Delaunay path — hull candidates included — must
    never pull a point DataFrame to the driver via toPandas. The old
    hull-candidate collect (grid.py r04) would trip this."""
    import pyspark.sql as pssql

    from gdal_spark.operators.grid import delaunay_distributed

    def boom(self, *a, **k):
        raise AssertionError("driver-side toPandas on the TIN path")

    monkeypatch.setattr(pssql.DataFrame, "toPandas", boom)
    rng = np.random.default_rng(21)
    P = rng.uniform(0, 100, size=(120, 2))
    pdf = __import__("pandas").DataFrame(
        {"id": range(len(P)), "x": P[:, 0], "y": P[:, 1],
         "z": np.arange(len(P), dtype=float)}
    )
    got = {
        (r.a, r.b, r.c)
        for r in delaunay_distributed(
            spark, spark.createDataFrame(pdf), cell_size=25.0
        ).collect()
    }
    tris = delaunay_triangulate(P)
    want = set()
    for a, b, c in tris:
        while not (a < b and a < c):
            a, b, c = b, c, a
        want.add((a, b, c))
    assert got == want


def test_global_hull_cycle_distributed(spark):
    """The distributed hull boundary cycle (id, nbr1, nbr2) matches a
    locally computed strict hull + collinear threading on a fixture
    with interior points, collinear edge points, and duplicates of
    neither."""
    import pandas as pd

    from gdal_spark.operators.grid import _global_hull_neighbors_df

    # square hull with one collinear mid-edge point + interior cloud
    base = [(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0),
            (5.0, 0.0)]  # id 4 sits mid bottom edge
    rng = np.random.default_rng(3)
    inner = rng.uniform(1, 9, size=(40, 2))
    P = np.array(base + [tuple(p) for p in inner])
    pdf = pd.DataFrame({"id": range(len(P)), "x": P[:, 0],
                        "y": P[:, 1]})
    cycle, bbox = _global_hull_neighbors_df(
        spark, spark.createDataFrame(pdf).repartition(8)
    )
    rows = {r.id: {r.nbr1, r.nbr2} for r in cycle.collect()}
    assert bbox == (0.0, 10.0, 0.0, 10.0)
    assert set(rows) == {0, 1, 2, 3, 4}
    assert rows[4] == {0, 1}          # threaded into the bottom edge
    assert rows[0] == {3, 4} and rows[1] == {4, 2}
    assert rows[2] == {1, 3} and rows[3] == {2, 0}
