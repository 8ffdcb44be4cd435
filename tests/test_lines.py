"""Line × polygon: Cyrus-Beck clip kernel, clip/erase pieces,
mixed-dimension predicates (KEEP_LOWER_DIMENSION_GEOMETRIES,
ogr/ogrlayer.cpp:3514-3541; Crosses ogr/ogrgeometry.cpp:5734)."""

import numpy as np
import pandas as pd
import pytest

from gdal_spark import geometry, wkb


def sq(x0, y0, x1, y1):
    return np.array(
        [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], dtype=float
    )


class TestSegmentClipKernel:
    def test_chord(self):
        t0, t1, ok = geometry.clip_segments_convex(
            np.array([[-5.0, 5.0]]), np.array([[15.0, 5.0]]),
            sq(0, 0, 10, 10),
        )
        assert ok[0] and t0[0] == pytest.approx(0.25) \
            and t1[0] == pytest.approx(0.75)

    def test_miss_and_parallel(self):
        t0, t1, ok = geometry.clip_segments_convex(
            np.array([[-5.0, 20.0], [-5.0, -1.0]]),
            np.array([[15.0, 20.0], [15.0, -1.0]]),
            sq(0, 0, 10, 10),
        )
        assert not ok[0] and not ok[1]

    def test_inside_segment(self):
        t0, t1, ok = geometry.clip_segments_convex(
            np.array([[2.0, 2.0]]), np.array([[8.0, 8.0]]),
            sq(0, 0, 10, 10),
        )
        assert ok[0] and t0[0] == 0.0 and t1[0] == 1.0


@pytest.fixture()
def donut_b():
    return pd.DataFrame({
        "poly_id": [0],
        "geom_wkb": [wkb.polygon([sq(0, 0, 10, 10), sq(4, 4, 6, 6)])],
    })


def _line_df(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["line_id", "geom_wkb"])
    )


class TestLinePieces:
    def test_clip_through_donut(self, spark, donut_b):
        from gdal_spark.operators.layer_algebra import clip_line_pieces

        # y=5 across the donut: inside length = 10 - 2 (hole) = 8
        lines = _line_df(spark, [
            (0, wkb.linestring([[-5.0, 5.0], [15.0, 5.0]])),
        ])
        out = clip_line_pieces(lines, donut_b).collect()
        assert sum(r.length for r in out) == pytest.approx(8.0)

    def test_erase_complement(self, spark, donut_b):
        from gdal_spark.operators.layer_algebra import erase_line_pieces

        lines = _line_df(spark, [
            (0, wkb.linestring([[-5.0, 5.0], [15.0, 5.0]])),
        ])
        out = erase_line_pieces(lines, donut_b).collect()
        # outside the donut: 5 (left) + 2 (hole gap) + 5 (right) = 12
        assert sum(r.length for r in out) == pytest.approx(12.0)

    def test_multisegment_polyline(self, spark, donut_b):
        from gdal_spark.operators.layer_algebra import clip_line_pieces

        # L-shaped polyline clipped by the solid part
        lines = _line_df(spark, [
            (0, wkb.linestring([[2.0, -5.0], [2.0, 2.0], [12.0, 2.0]])),
        ])
        out = clip_line_pieces(lines, donut_b).collect()
        # vertical: y 0..2 -> 2; horizontal: x 2..10 -> 8
        assert sum(r.length for r in out) == pytest.approx(10.0)


class TestLinePredicates:
    def test_matrix(self, spark, donut_b):
        from gdal_spark.operators.layer_algebra import (
            line_polygon_predicates,
        )

        lines = _line_df(spark, [
            (0, wkb.linestring([[-5.0, 5.0], [15.0, 5.0]])),   # crosses
            (1, wkb.linestring([[1.0, 1.0], [3.0, 1.0]])),     # within
            (2, wkb.linestring([[-5.0, 20.0], [15.0, 20.0]])), # disjoint
            (3, wkb.linestring([[0.0, -2.0], [0.0, 12.0]])),   # touches
            (4, wkb.linestring([[4.5, 4.5], [5.5, 5.5]])),     # in hole
        ])
        got = {
            int(r.line_id): r
            for r in line_polygon_predicates(lines, donut_b).collect()
        }
        assert got[0].st_crosses == 1 and got[0].st_within == 0
        assert got[1].st_within == 1 and got[1].st_crosses == 0
        assert got[2].st_disjoint == 1
        assert got[3].st_touches == 1 and got[3].st_crosses == 0
        # a segment wholly inside the HOLE is outside the polygon
        # interior; it may touch nothing -> disjoint
        assert got[4].st_disjoint == 1
