"""Property-based tests (hypothesis) for the numpy geometry kernels —
the randomized layer the reference covers with fuzzers (SURVEY.md §5):
conservation laws that must hold for ANY input, not just fixtures."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from gdal_spark import geometry


def area_of(p):
    if len(p) < 3:
        return 0.0
    return abs(geometry.ring_area(np.vstack([p, p[:1]])))


@st.composite
def convex_polys(draw, lo=-50, hi=50, min_pts=4, max_pts=12):
    n = draw(st.integers(min_pts, max_pts))
    pts = [
        (draw(st.integers(lo, hi)), draw(st.integers(lo, hi)))
        for _ in range(n)
    ]
    hull = geometry.convex_hull(np.array(pts, dtype=float))
    if len(hull) < 4:  # degenerate draw (collinear) — widen
        hull = geometry.convex_hull(
            np.array(pts + [(lo, lo), (hi, lo), (lo, hi)], dtype=float)
        )
    return hull


@st.composite
def star_polys(draw, lo=-40, hi=40, min_pts=5, max_pts=10):
    """Star-shaped (simple, often concave) polygon: random points
    sorted by angle around their centroid."""
    n = draw(st.integers(min_pts, max_pts))
    pts = np.array(
        [
            (draw(st.integers(lo, hi)), draw(st.integers(lo, hi)))
            for _ in range(n)
        ],
        dtype=float,
    )
    pts = np.unique(pts, axis=0)
    if len(pts) < 3:
        pts = np.array([[0, 0], [10, 0], [0, 10]], dtype=float)
    c = pts.mean(axis=0)
    ang = np.arctan2(pts[:, 1] - c[1], pts[:, 0] - c[0])
    ring = pts[np.argsort(ang)]
    return np.vstack([ring, ring[:1]])


@settings(max_examples=120, deadline=None)
@given(convex_polys(), convex_polys())
def test_clip_split_conserves_area(a, b):
    inter = geometry.clip_poly_convex(a, b)
    _, outs = geometry.split_poly_convex(a, b)
    total = area_of(inter) + sum(area_of(p) for p in outs)
    assert abs(total - area_of(a[:-1])) < 1e-6 * max(1.0, area_of(a[:-1]))


@settings(max_examples=120, deadline=None)
@given(convex_polys(), convex_polys())
def test_intersection_bounded_and_symmetricish(a, b):
    ia = area_of(geometry.clip_poly_convex(a, b))
    ib = area_of(geometry.clip_poly_convex(b, a))
    assert ia <= min(area_of(a[:-1]), area_of(b[:-1])) + 1e-7
    assert abs(ia - ib) < 1e-6 * max(1.0, ia)


@settings(max_examples=80, deadline=None)
@given(star_polys())
def test_ear_triangulation_tiles_simple_polygons(ring):
    tris = geometry.ear_triangulate(ring)
    total = sum(area_of(t) for t in tris)
    assert abs(total - area_of(ring[:-1])) < 1e-6 * max(
        1.0, area_of(ring[:-1])
    )


@settings(max_examples=80, deadline=None)
@given(star_polys(), convex_polys())
def test_concave_erase_conserves_area(subject, clip):
    inter = geometry.pieces_area(
        geometry.clip_poly_simple(subject[:-1], clip)
    )
    rest = geometry.pieces_area(
        geometry.erase_poly_simple(subject[:-1], [clip])
    )
    want = area_of(subject[:-1])
    assert abs(inter + rest - want) < 1e-6 * max(1.0, want)


@settings(max_examples=120, deadline=None)
@given(
    convex_polys(),
    st.lists(
        st.tuples(
            st.floats(-60, 60, allow_nan=False),
            st.floats(-60, 60, allow_nan=False),
        ),
        min_size=1, max_size=30,
    ),
)
def test_raycast_and_winding_agree_off_boundary(poly, pts):
    px = np.array([p[0] for p in pts])
    py = np.array([p[1] for p in pts])
    # exclude points within eps of the boundary: WITHIN one float ulp
    # of an edge the two conventions legitimately disagree (hypothesis
    # finds denormal offsets like 1e-38 from a vertex; the engine
    # routes boundary handling through points_on_ring_boundary)
    d = geometry.points_to_ring_distance(px, py, poly)
    off = d > 1e-9
    rc = geometry.points_in_ring(px, py, poly)
    wn = geometry.winding_number(px, py, poly) != 0
    assert (rc[off] == wn[off]).all()


@settings(max_examples=80, deadline=None)
@given(convex_polys(), convex_polys(), convex_polys())
def test_piece_feedback_conserves_area(a, b, c):
    """Pieces produced by one decomposition (with SH's duplicate/
    collinear vertices) must behave exactly when fed back as clips —
    the degenerate-edge double-count regression."""
    pieces = geometry.erase_poly_simple(a[:-1], [b[:-1]])
    want_c = area_of(c[:-1])
    rest = geometry.pieces_area(geometry.erase_poly_simple(c[:-1], pieces))
    inter = sum(
        geometry.pieces_area(geometry.clip_poly_simple(c[:-1], p))
        for p in pieces
    )
    assert rest <= want_c + 1e-6
    assert abs(rest + inter - want_c) < 1e-6 * max(1.0, want_c)
