"""WKB encode/decode roundtrips + cross-check against DuckDB spatial
(if available) / struct layout constants."""

import numpy as np
import pytest

from gdal_spark import wkb

RING = np.array([[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]], dtype=float)
HOLE = np.array([[1, 1], [1, 3], [3, 3], [3, 1], [1, 1]], dtype=float)


def test_point_roundtrip():
    buf = wkb.point(1.5, -2.25)
    t, (x, y) = wkb.parse(buf)
    assert t == wkb.POINT and (x, y) == (1.5, -2.25)
    assert len(buf) == 21  # 1 + 4 + 16


def test_linestring_roundtrip():
    buf = wkb.linestring(RING[:3])
    t, coords = wkb.parse(buf)
    assert t == wkb.LINESTRING
    assert np.array_equal(coords, RING[:3])


def test_polygon_roundtrip_with_hole():
    buf = wkb.polygon([RING, HOLE])
    t, rings = wkb.parse(buf)
    assert t == wkb.POLYGON and len(rings) == 2
    assert np.array_equal(rings[0], RING)
    assert np.array_equal(rings[1], HOLE)


def test_polygon_autocloses_open_ring():
    buf = wkb.polygon([RING[:-1]])
    _, rings = wkb.parse(buf)
    assert np.array_equal(rings[0][0], rings[0][-1])


def test_multipolygon_roundtrip():
    buf = wkb.multipolygon([[RING], [HOLE]])
    t, polys = wkb.parse(buf)
    assert t == wkb.MULTIPOLYGON and len(polys) == 2
    assert np.array_equal(polys[0][0], RING)
    rings = wkb.polygon_rings(buf)
    assert len(rings) == 2


def test_polygon_rings_rejects_point():
    with pytest.raises(ValueError):
        wkb.polygon_rings(wkb.point(0, 0))


def test_wkt_output():
    assert wkb.wkt(wkb.point(1, 2)) == "POINT (1 2)"
    assert wkb.wkt(wkb.polygon([RING])) == (
        "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"
    )


def test_big_endian_parse():
    import struct

    # hand-build a big-endian point
    buf = struct.pack(">BIdd", 0, wkb.POINT, 3.0, 4.0)
    t, (x, y) = wkb.parse(buf)
    assert t == wkb.POINT and (x, y) == (3.0, 4.0)


def test_iso_z_type_codes_stripped():
    import struct

    # ISO WKB Polygon Z = 1003; we only read XY here but type must map
    buf = struct.pack("<BII", 1, 1001, 0)  # PointZ header (no coords read)
    # PointZ would carry 3 doubles; our parser reads 2 — only assert the
    # type mapping helper
    assert wkb._geom_type(1003) == wkb.POLYGON
    assert wkb._geom_type(3006) == wkb.MULTIPOLYGON
    assert wkb._geom_type(1) == wkb.POINT


def test_ewkb_srid_flag_consumes_srid_word():
    """PostGIS EWKB sets 0x20000000 on the type word and inserts a
    4-byte SRID before the coordinates; the parser must skip it (the
    old behavior masked the flag and decoded the SRID bytes as the
    first coordinate)."""
    import struct

    # hand-build EWKB: little-endian point(1,2) with SRID=4326
    buf = (b"\x01"
           + struct.pack("<I", 0x20000001)
           + struct.pack("<I", 4326)
           + struct.pack("<dd", 1.0, 2.0))
    gt, payload = wkb.parse(buf)
    assert gt == wkb.POINT
    assert payload == (1.0, 2.0)

    # EWKB polygon with SRID
    ring = [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 0.0)]
    body = struct.pack("<I", 1) + struct.pack("<I", len(ring))
    for x, y in ring:
        body += struct.pack("<dd", x, y)
    pbuf = (b"\x01" + struct.pack("<I", 0x20000003)
            + struct.pack("<I", 3857) + body)
    gt, rings = wkb.parse(pbuf)
    assert gt == wkb.POLYGON
    assert len(rings) == 1 and len(rings[0]) == 4
    assert rings[0][1][0] == 4.0
