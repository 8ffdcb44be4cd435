"""NTv2 grid-shift datum transform (.gsb) — from-spec vs closed-form
oracles (reference semantics: PROJ hgridshift behind ogr/ogrct.cpp;
grid fixtures pattern autotest/proj_grids/*.gsb).

The key trick: an AFFINE shift field is reproduced EXACTLY by
bilinear interpolation, so hand-computed target coordinates exist in
closed form anywhere inside the grid — no external data needed. All
fixture values are float32-exact (dyadic rationals) so the format's
node precision costs nothing."""

import numpy as np
import pytest

from gdal_spark import ntv2, proj


def _affine_grid(name="MAIN", parent="NONE", s_lat=30 * 3600.0,
                 n_lat=40 * 3600.0, e_long=80 * 3600.0,
                 w_long=100 * 3600.0, inc=1800.0,
                 a=0.25, bx=0.0078125, cy=0.015625):
    """Shift fields Δlat = a + bx*i + cy*j, Δlon = 2a − cy*i + bx*j
    (arc-seconds; i = west column, j = south row). All dyadic →
    float32-exact nodes."""
    ncols = round((w_long - e_long) / inc) + 1
    nrows = round((n_lat - s_lat) / inc) + 1
    jj, ii = np.meshgrid(np.arange(nrows), np.arange(ncols),
                         indexing="ij")
    return {
        "name": name, "parent": parent,
        "s_lat": s_lat, "n_lat": n_lat,
        "e_long": e_long, "w_long": w_long,
        "lat_inc": inc, "long_inc": inc,
        "lat_shift": a + bx * ii + cy * jj,
        "lon_shift": 2 * a - cy * ii + bx * jj,
    }


def _closed_form(sg, lon_deg, lat_deg):
    """Direct affine evaluation at fractional grid coords."""
    x = (-lon_deg * 3600.0 - sg["e_long"]) / sg["long_inc"]
    y = (lat_deg * 3600.0 - sg["s_lat"]) / sg["lat_inc"]
    dlat = 0.25 + 0.0078125 * x + 0.015625 * y
    dlon = 0.5 - 0.015625 * x + 0.0078125 * y
    return lon_deg - dlon / 3600.0, lat_deg + dlat / 3600.0


def test_encode_parse_roundtrip_exact():
    sg = _affine_grid()
    buf = ntv2.gsb_encode([sg], system_f="NAD27", system_t="NAD83")
    assert buf[:8] == b"NUM_OREC"
    back = ntv2.gsb_parse(buf)
    assert len(back) == 1
    b = back[0]
    assert b["name"] == "MAIN" and b["parent"] == "NONE"
    for k in ("s_lat", "n_lat", "e_long", "w_long", "lat_inc",
              "long_inc"):
        assert b[k] == sg[k]
    # dyadic values survive the float32 node storage exactly
    assert np.array_equal(b["lat_shift"], sg["lat_shift"])
    assert np.array_equal(b["lon_shift"], sg["lon_shift"])


def test_big_endian_parse():
    sg = _affine_grid(inc=3600.0)
    buf = bytearray(ntv2.gsb_encode([sg]))
    # rewrite as big-endian: swap every numeric field
    import struct

    out = bytearray()
    pos = 0
    for i in range(11):
        name = bytes(buf[pos:pos + 8])
        val = bytes(buf[pos + 8:pos + 16])
        if name in (b"NUM_OREC", b"NUM_SREC", b"NUM_FILE"):
            val = struct.pack(">i4x", struct.unpack("<i4x", val)[0])
        elif name.startswith((b"MAJOR", b"MINOR")):
            val = struct.pack(">d", struct.unpack("<d", val)[0])
        out += name + val
        pos += 16
    for i in range(11):
        name = bytes(buf[pos:pos + 8])
        val = bytes(buf[pos + 8:pos + 16])
        if name == b"GS_COUNT":
            cnt = struct.unpack("<i4x", val)[0]
            val = struct.pack(">i4x", cnt)
        elif name.strip() in (b"S_LAT", b"N_LAT", b"E_LONG",
                              b"W_LONG", b"LAT_INC", b"LONG_INC"):
            val = struct.pack(">d", struct.unpack("<d", val)[0])
        out += name + val
        pos += 16
    node = np.frombuffer(bytes(buf[pos:pos + cnt * 16]), "<f4")
    out += node.astype(">f4").tobytes()
    back = ntv2.gsb_parse(bytes(out))
    assert np.array_equal(back[0]["lat_shift"], sg["lat_shift"])


def test_forward_matches_closed_form_everywhere():
    sg = _affine_grid()
    tf = ntv2.NTv2Shift(ntv2.gsb_encode([sg]))
    rng = np.random.default_rng(5)
    lon = -(80.0 + rng.random(500) * 20.0)  # east-positive ∈ grid
    lat = 30.0 + rng.random(500) * 10.0
    glon, glat = tf(lon, lat)
    elon, elat = _closed_form(sg, lon, lat)
    np.testing.assert_allclose(glon, elon, rtol=0, atol=1e-12)
    np.testing.assert_allclose(glat, elat, rtol=0, atol=1e-12)


def test_sign_conventions():
    # positive lat shift moves north; positive (west) lon shift moves
    # the east-positive longitude WEST (more negative)
    sg = _affine_grid(a=1.0, bx=0.0, cy=0.0)  # Δlat=1", Δlon=2"
    tf = ntv2.NTv2Shift(ntv2.gsb_encode([sg]))
    glon, glat = tf(np.array([-90.0]), np.array([35.0]))
    assert glat[0] == pytest.approx(35.0 + 1.0 / 3600.0, abs=1e-12)
    assert glon[0] == pytest.approx(-90.0 - 2.0 / 3600.0, abs=1e-12)


def test_inverse_fixed_point_roundtrip():
    sg = _affine_grid()
    buf = ntv2.gsb_encode([sg])
    fwd = ntv2.NTv2Shift(buf)
    inv = ntv2.NTv2Shift(buf, inverse=True)
    rng = np.random.default_rng(11)
    lon = -(81.0 + rng.random(300) * 18.0)
    lat = 30.5 + rng.random(300) * 9.0
    tlon, tlat = fwd(lon, lat)
    blon, blat = inv(tlon, tlat)
    np.testing.assert_allclose(blon, lon, rtol=0, atol=1e-11)
    np.testing.assert_allclose(blat, lat, rtol=0, atol=1e-11)


def test_finest_subgrid_wins_and_outside_passthrough():
    parent = _affine_grid(inc=3600.0)
    child = {
        **_affine_grid(name="CHILD", parent="MAIN",
                       s_lat=33 * 3600.0, n_lat=35 * 3600.0,
                       e_long=85 * 3600.0, w_long=88 * 3600.0,
                       inc=900.0),
    }
    # constant child field, distinct from the parent's affine one
    child["lat_shift"] = np.full_like(child["lat_shift"], 7.5)
    child["lon_shift"] = np.full_like(child["lon_shift"], -2.5)
    tf = ntv2.NTv2Shift(ntv2.gsb_encode([parent, child]))
    # inside the child window
    glon, glat = tf(np.array([-86.0]), np.array([34.0]))
    assert glat[0] == pytest.approx(34.0 + 7.5 / 3600.0, abs=1e-12)
    assert glon[0] == pytest.approx(-86.0 + 2.5 / 3600.0, abs=1e-12)
    # inside parent only → parent's affine field
    p = tf(np.array([-95.0]), np.array([31.0]))
    e = _closed_form(parent, np.array([-95.0]), np.array([31.0]))
    assert p[0][0] == pytest.approx(e[0][0], abs=1e-12)
    # outside everything → unshifted
    o = tf(np.array([10.0]), np.array([0.0]))
    assert o[0][0] == 10.0 and o[1][0] == 0.0


def test_pickles_and_composes_into_warp_chain():
    import pickle

    sg = _affine_grid()
    tf = ntv2.NTv2Shift(ntv2.gsb_encode([sg]))
    tf2 = pickle.loads(pickle.dumps(tf))
    lon = np.array([-90.0, -85.5])
    lat = np.array([32.0, 38.25])
    assert np.array_equal(tf(lon, lat), tf2(lon, lat))
    # 3857 → NTv2 shift → 3857: a composed chain like the warp uses
    chain = proj.compose(
        proj.WebMercatorToLonLat(), tf, proj.LonLatToWebMercator()
    )
    mx = np.array([-10018754.17])
    my = np.array([4163881.1])
    ox, oy = chain(mx, my)
    assert ox.shape == (1,) and np.isfinite(ox).all()
    # and the shift actually moved the point west (Δlon > 0)
    assert ox[0] < mx[0]


def test_grid_extent_validation():
    sg = _affine_grid()
    sg["lat_shift"] = sg["lat_shift"][:-1]  # break row count
    with pytest.raises(ValueError):
        ntv2.gsb_encode([sg])
    with pytest.raises(ValueError):
        ntv2.gsb_parse(b"\x00" * 64)
