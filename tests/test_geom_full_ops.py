"""Full-polygon ST_Buffer / ST_MakeValid: holes, multiparts,
self-intersection resolution (ogr/ogrgeometry.cpp:4526, :3922
semantics) via the union erase-fold."""

import numpy as np
import pytest

from gdal_spark import geometry, wkb
from gdal_spark.operators.geom_ops import (
    buffer_polygon, make_valid_polygon, union_rings,
)


def rect(x0, y0, x1, y1):
    return np.array(
        [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]],
        dtype=np.float64,
    )


def _rect_buffer_area(w, h, d, qs=8):
    # area + perimeter strips + 4 inscribed corner fans (each fan =
    # qs triangles of angle pi/(2*qs) at radius d)
    return w * h + 2 * (w + h) * d + 4 * (
        qs * 0.5 * d * d * np.sin(np.pi / (2 * qs))
    )


class TestUnionRings:
    def test_overlapping_rects(self):
        pieces, area = union_rings([rect(0, 0, 4, 4), rect(2, 2, 6, 6)])
        assert area == pytest.approx(28.0)

    def test_disjoint_and_nested(self):
        _, area = union_rings(
            [rect(0, 0, 4, 4), rect(10, 10, 12, 12), rect(1, 1, 2, 2)]
        )
        assert area == pytest.approx(16.0 + 4.0)


class TestBufferPolygon:
    def test_convex_closed_form(self):
        _, area = buffer_polygon(wkb.polygon([rect(0, 0, 20, 10)]), 2.0)
        assert area == pytest.approx(_rect_buffer_area(20, 10, 2.0),
                                     rel=1e-12)

    def test_multipart_equals_sum_of_parts(self):
        """Far-apart parts: whole-geometry buffer == sum of per-part
        buffers, exactly (no interaction)."""
        a = rect(0, 0, 8, 6)
        b = rect(100, 0, 112, 6)
        multi = wkb.multipolygon([[a], [b]])
        _, area = buffer_polygon(multi, 2.0)
        _, aa = buffer_polygon(wkb.polygon([a]), 2.0)
        _, ab = buffer_polygon(wkb.polygon([b]), 2.0)
        assert area == pytest.approx(aa + ab, rel=1e-12)

    def test_merging_parts_less_than_sum(self):
        """Parts closer than 2d: buffers merge, union < sum."""
        a = rect(0, 0, 8, 6)
        b = rect(10, 0, 18, 6)  # gap 2 < 2*d
        _, area = buffer_polygon(wkb.multipolygon([[a], [b]]), 2.0)
        _, aa = buffer_polygon(wkb.polygon([a]), 2.0)
        _, ab = buffer_polygon(wkb.polygon([b]), 2.0)
        assert area < aa + ab - 1.0
        assert area > aa  # but more than one part alone

    def test_holed_surviving_hole(self):
        """Hole wider than 2d survives as the sharply-eroded inner
        rect: buffered area == buffer(outer) - (wh-2d)(hh-2d)."""
        outer, hole = rect(0, 0, 30, 20), rect(10, 5, 20, 12)
        d = 2.0
        _, area = buffer_polygon(wkb.polygon([outer, hole]), d)
        _, solid = buffer_polygon(wkb.polygon([outer]), d)
        want = solid - (10 - 2 * d) * (7 - 2 * d)
        assert area == pytest.approx(want, rel=1e-9)

    def test_holed_narrow_hole_fills_in(self):
        """Hole narrower than 2d disappears entirely."""
        outer, hole = rect(0, 0, 30, 20), rect(10, 5, 13, 8)  # 3x3 hole
        _, area = buffer_polygon(wkb.polygon([outer, hole]), 2.0)
        _, solid = buffer_polygon(wkb.polygon([outer]), 2.0)
        assert area == pytest.approx(solid, rel=1e-9)

    def test_hole_interior_not_covered(self):
        """PIP probe: the surviving hole center stays outside every
        output piece; a point just inside the old hole edge is
        covered."""
        outer, hole = rect(0, 0, 30, 20), rect(10, 5, 20, 12)
        pieces, _ = buffer_polygon(wkb.polygon([outer, hole]), 2.0)

        def covered(x, y):
            return any(
                geometry.points_in_polygon(
                    np.array([x]), np.array([y]), [p]
                )[0]
                for p in pieces
            )

        assert not covered(15.0, 8.5)   # hole center survives
        assert covered(10.5, 8.5)       # within d of the hole edge
        assert covered(31.0, 10.0)      # outward growth


class TestMakeValidPolygon:
    def test_valid_passthrough(self):
        _, area = make_valid_polygon(wkb.polygon([rect(0, 0, 4, 3)]))
        assert area == pytest.approx(12.0)

    def test_bowtie(self):
        bow = wkb.polygon([np.array(
            [[0, 0], [2, 2], [2, 0], [0, 2], [0, 0]], dtype=np.float64
        )])
        pieces, area = make_valid_polygon(bow)
        assert len(pieces) == 2
        assert area == pytest.approx(2.0)

    def test_holed_with_bowtie_hole(self):
        """Self-intersecting HOLE ring: resolved then erased."""
        outer = rect(0, 0, 10, 10)
        bow_hole = np.array(
            [[2, 2], [6, 6], [6, 2], [2, 6], [2, 2]], dtype=np.float64
        )
        _, area = make_valid_polygon(wkb.polygon([outer, bow_hole]))
        assert area == pytest.approx(100.0 - 8.0)

    def test_overlapping_invalid_multipart_unions(self):
        multi = wkb.multipolygon(
            [[rect(0, 0, 4, 4)], [rect(2, 2, 6, 6)]]
        )
        _, area = make_valid_polygon(multi)
        assert area == pytest.approx(28.0)

    def test_bowtie_multipart_combo(self):
        bow = np.array(
            [[10, 0], [12, 2], [12, 0], [10, 2], [10, 0]],
            dtype=np.float64,
        )
        multi = wkb.multipolygon([[rect(0, 0, 4, 4)], [bow]])
        _, area = make_valid_polygon(multi)
        assert area == pytest.approx(16.0 + 2.0)
