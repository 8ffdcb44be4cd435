"""UTM forward/inverse (Krüger series): round-trip, known values,
numpy↔SQL parity with the dialect-common oracle expression."""

import numpy as np
import pytest

from gdal_spark import proj


def test_roundtrip_forward_inverse():
    rng = np.random.default_rng(7)
    lat = rng.uniform(-80, 80, 500)
    lon = rng.uniform(-179, 179, 500)
    e, n, z = proj.utm_forward(lat, lon)
    lat2, lon2 = proj.utm_inverse(e, n, z, northern=lat >= 0)
    np.testing.assert_allclose(lat2, lat, atol=1e-9)
    np.testing.assert_allclose(lon2, lon, atol=1e-9)


def test_known_value_cross_checked():
    """43.7230N 10.3966E (zone 32): Krüger series vs an independent
    implementation of Snyder's TM expansion (USGS PP1395 eq 8-9ff)
    — the two agree to sub-mm, pinned here at the mm."""

    def snyder_tm(lat, lon, lon0):
        a, f = 6378137.0, 1 / 298.257223563
        e2 = f * (2 - f)
        ep2 = e2 / (1 - e2)
        k0 = 0.9996
        phi, dl = np.radians(lat), np.radians(lon - lon0)
        nn = a / np.sqrt(1 - e2 * np.sin(phi) ** 2)
        t = np.tan(phi) ** 2
        c = ep2 * np.cos(phi) ** 2
        aa = dl * np.cos(phi)
        m = a * (
            (1 - e2 / 4 - 3 * e2**2 / 64 - 5 * e2**3 / 256) * phi
            - (3 * e2 / 8 + 3 * e2**2 / 32 + 45 * e2**3 / 1024)
            * np.sin(2 * phi)
            + (15 * e2**2 / 256 + 45 * e2**3 / 1024) * np.sin(4 * phi)
            - (35 * e2**3 / 3072) * np.sin(6 * phi)
        )
        x = k0 * nn * (
            aa + (1 - t + c) * aa**3 / 6
            + (5 - 18 * t + t**2 + 72 * c - 58 * ep2) * aa**5 / 120
        )
        y = k0 * (
            m + nn * np.tan(phi) * (
                aa**2 / 2 + (5 - t + 9 * c + 4 * c**2) * aa**4 / 24
                + (61 - 58 * t + t**2 + 600 * c - 330 * ep2)
                * aa**6 / 720
            )
        )
        return 500000 + x, y

    lat, lon = 43.7230, 10.3966
    es, ns = snyder_tm(lat, lon, 9.0)
    e, n, z = proj.utm_forward(np.array([lat]), np.array([lon]))
    assert int(z[0]) == 32
    assert abs(e[0] - es) < 1e-3
    assert abs(n[0] - ns) < 1e-3


def test_southern_hemisphere_false_northing():
    e, n, z = proj.utm_forward(np.array([-33.9]), np.array([18.4]))
    assert n[0] > 6_000_000  # false northing applied
    lat, lon = proj.utm_inverse(e, n, z, northern=False)
    assert abs(lat[0] + 33.9) < 1e-9 and abs(lon[0] - 18.4) < 1e-9


def test_numpy_matches_sql_oracle_mm():
    """The numpy forward kernel agrees with the driver gate's
    dialect-common SQL series (DuckDB) to the millimetre — the same
    tolerance the sp_utm_transform gate rounds to."""
    import duckdb

    lats = np.linspace(-70, 70, 29)
    lons = np.linspace(-170, 170, 29)
    e, n_raw, z = proj.utm_forward(lats, lons, northern=True)
    c = proj.series_constants()
    s2n, k0a = c["e"], c["k0a"]
    a1, a2, a3, a4 = c["alpha"]
    series_xi = " + ".join(
        f"{cf!r} * SIN({2 * j}e0 * xip)"
        f" * ((EXP({2 * j}e0 * etap) + EXP(-{2 * j}e0 * etap)) / 2e0)"
        for j, cf in zip((1, 2, 3, 4), (a1, a2, a3, a4))
    )
    series_eta = " + ".join(
        f"{cf!r} * COS({2 * j}e0 * xip)"
        f" * ((EXP({2 * j}e0 * etap) - EXP(-{2 * j}e0 * etap)) / 2e0)"
        for j, cf in zip((1, 2, 3, 4), (a1, a2, a3, a4))
    )
    vals = ", ".join(
        f"({la!r}, {lo!r})" for la, lo in zip(lats, lons)
    )
    sql = f"""
        WITH pts(lat, lon) AS (VALUES {vals}),
        zc AS (SELECT lat, lon,
                      LEAST(CAST(FLOOR((lon + 180e0) / 6e0) AS BIGINT)
                            + 1, 60) AS zone FROM pts),
        pr AS (SELECT lat, zone,
                      RADIANS(LEAST(GREATEST(lat, -84e0), 84e0)) AS phi,
                      RADIANS(lon - (zone * 6 - 183)) AS dlam FROM zc),
        s1 AS (SELECT *, SIN(phi) AS sphi FROM pr),
        s2 AS (SELECT *,
                      0.5e0 * LN((1e0 + sphi) / (1e0 - sphi))
                      - {s2n!r} * (0.5e0 * LN((1e0 + {s2n!r} * sphi)
                                              / (1e0 - {s2n!r} * sphi)))
                        AS u FROM s1),
        s3 AS (SELECT *, (EXP(u) - EXP(-u)) / 2e0 AS t FROM s2),
        s4 AS (SELECT *, ATAN2(t, COS(dlam)) AS xip,
                      0.5e0 * LN((1e0 + SIN(dlam) / SQRT(1e0 + t * t))
                                 / (1e0 - SIN(dlam) / SQRT(1e0 + t * t)))
                        AS etap FROM s3),
        s5 AS (SELECT lat, zone, xip + {series_xi} AS xi,
                      etap + {series_eta} AS eta FROM s4)
        SELECT 500000e0 + {k0a!r} * eta AS e, {k0a!r} * xi AS n
        FROM s5 ORDER BY lat"""
    got = duckdb.sql(sql).df()
    order = np.argsort(lats)
    np.testing.assert_allclose(got["e"].to_numpy(), e[order], atol=1e-3)
    np.testing.assert_allclose(got["n"].to_numpy(), n_raw[order], atol=1e-3)


def test_warp_utm_to_4326_matches_single_node(spark):
    """End-to-end UTM→4326 warp through the distributed gather
    (general-transform path: sampled block bounds + per-pixel
    projection) equals the whole-array single-node computation."""
    from gdal_spark import raster
    from gdal_spark.operators import tiling

    zone = 32
    res = 100.0
    src_w = src_h = 256
    e0, n0 = 487_200.0, 5_000_000.0
    src_gt = (e0, res, 0.0, n0, 0.0, -res)
    src_tiles = tiling.formula_tiles(spark, 4, 4, 64)

    # dst 4326 grid strictly inside the src footprint
    lat1, lon0_ = proj.utm_inverse(
        np.array([e0 + 2 * res]), np.array([n0 - 2 * res]), zone
    )
    lat0, lon1 = proj.utm_inverse(
        np.array([e0 + (src_w - 2) * res]),
        np.array([n0 - (src_h - 2) * res]),
        zone,
    )
    dst_w = dst_h = 96
    dlon = (lon1[0] - lon0_[0]) / dst_w
    dlat = (lat0[0] - lat1[0]) / dst_h
    dst_gt = (lon0_[0], dlon, 0.0, lat1[0], 0.0, dlat)

    tf = proj.UTMForwardTransform(zone)
    got_rows = tiling.warp_affine(
        src_tiles, src_gt, src_w, src_h, dst_gt, dst_w, dst_h,
        method="nearest", transform=tf,
    ).collect()
    got = np.full((dst_h, dst_w), -99, dtype=np.int64)
    for r in got_rows:
        got[int(r["dj"]), int(r["di"])] = int(r["val"])

    di = np.arange(dst_w, dtype=np.float64)[None, :] + 0.5
    dj = np.arange(dst_h, dtype=np.float64)[:, None] + 0.5
    gx, gy = raster.apply_gt(dst_gt, di, dj)
    E, N = tf(gx, gy)
    igt = raster.inv_gt(src_gt)
    sx = igt[0] + E * igt[1] + N * igt[2]
    sy = igt[3] + E * igt[4] + N * igt[5]
    ix = np.floor(sx).astype(np.int64)
    iy = np.floor(sy).astype(np.int64)
    full = raster.formula_block(0, 0, src_w, src_h).astype(np.int64)
    want = np.full((dst_h, dst_w), int(raster.NODATA), dtype=np.int64)
    ok = (ix >= 0) & (ix < src_w) & (iy >= 0) & (iy < src_h)
    want[ok] = full[iy[ok], ix[ok]]
    np.testing.assert_array_equal(got, want)
    assert (got != int(raster.NODATA)).mean() > 0.9  # mostly inside


class TestLCC:
    def _p(self):
        return proj.LCC(33.0, 45.0, 23.0, -96.0,
                        false_e=2_000_000.0, false_n=500_000.0)

    def test_true_scale_on_both_standard_parallels(self):
        p = self._p()
        np.testing.assert_allclose(p.scale_k(33.0), 1.0, rtol=1e-12)
        np.testing.assert_allclose(p.scale_k(45.0), 1.0, rtol=1e-12)
        # conformal conic: k < 1 strictly between the parallels,
        # k > 1 strictly outside
        assert p.scale_k(39.0) < 1.0
        assert p.scale_k(50.0) > 1.0
        assert p.scale_k(25.0) > 1.0

    def test_roundtrip_submillimeter(self):
        p = self._p()
        lon = np.linspace(-130.0, -60.0, 41)
        lat = np.linspace(20.0, 55.0, 41)
        LO, LA = np.meshgrid(lon, lat)
        x, y = p.forward(LO, LA)
        lo2, la2 = p.inverse(x, y)
        # degrees -> meters: 1e-9 deg ~ 0.1 mm
        np.testing.assert_allclose(lo2, LO, atol=1e-9)
        np.testing.assert_allclose(la2, LA, atol=1e-9)

    def test_central_meridian_maps_to_false_easting(self):
        p = self._p()
        x, y = p.forward(np.full(5, -96.0), np.linspace(25, 50, 5))
        np.testing.assert_allclose(x, 2_000_000.0, atol=1e-6)
        # northing increases with latitude
        assert np.all(np.diff(y) > 0)

    def test_conformal_angles_locally(self):
        """Conformality: small east and north steps map to image
        vectors of equal length and 90° apart (same local scale in
        every direction)."""
        p = self._p()
        lon0, lat0 = -80.0, 40.0
        d = 1e-6
        x0, y0 = p.forward(lon0, lat0)
        xe, ye = p.forward(lon0 + d, lat0)
        xn, yn = p.forward(lon0, lat0 + d)
        ve = np.array([xe - x0, ye - y0])
        vn = np.array([xn - x0, yn - y0])
        # lengths agree after metric correction (east step is shorter
        # on the ellipsoid by cos(lat) * M/N factor); use the exact
        # parallel/meridian radii
        s = np.sin(np.radians(lat0))
        e2 = proj._E * proj._E
        W = np.sqrt(1 - e2 * s * s)
        N_r = proj._A / W                      # prime vertical radius
        M_r = proj._A * (1 - e2) / W**3        # meridian radius
        ge = np.hypot(*ve) / (np.radians(d) * N_r *
                              np.cos(np.radians(lat0)))
        gn = np.hypot(*vn) / (np.radians(d) * M_r)
        np.testing.assert_allclose(ge, gn, rtol=1e-5)
        cosang = ve @ vn / (np.hypot(*ve) * np.hypot(*vn))
        np.testing.assert_allclose(cosang, 0.0, atol=1e-5)

    def test_warp_through_general_transform_path(self, spark):
        """A small LCC->4326 warp through the distributed general
        gather equals the whole-array single-node computation."""
        from gdal_spark import raster
        from gdal_spark.operators import tiling

        params = (33.0, 45.0, 23.0, -96.0, 0.0, 0.0)
        p = proj.LCC(*params)
        src_w = src_h = 128
        # src raster georeferenced in LCC meters around (-96E, 39N)
        cx, cy = p.forward(-96.0, 39.0)
        res = 1000.0
        src_gt = (cx - 64 * res, res, 0.0, cy + 64 * res, 0.0, -res)
        src_tiles = tiling.formula_tiles(spark, 2, 2, 64)
        # dst 4326 grid strictly inside the src footprint
        dst_w = dst_h = 48
        lon0, lat1 = p.inverse(src_gt[0] + 5 * res, src_gt[3] - 5 * res)
        lon1, lat0 = p.inverse(
            src_gt[0] + (src_w - 5) * res, src_gt[3] - (src_h - 5) * res
        )
        dst_gt = (
            float(lon0), float(lon1 - lon0) / dst_w, 0.0,
            float(lat1), 0.0, float(lat0 - lat1) / dst_h,
        )
        tf = proj.LCCForwardTransform(*params)
        got_rows = tiling.warp_affine(
            src_tiles, src_gt, src_w, src_h, dst_gt, dst_w, dst_h,
            method="nearest", transform=tf,
        ).collect()
        got = np.full((dst_h, dst_w), -99, dtype=np.int64)
        for r in got_rows:
            got[int(r["dj"]), int(r["di"])] = int(r["val"])

        di = np.arange(dst_w, dtype=np.float64)[None, :] + 0.5
        dj = np.arange(dst_h, dtype=np.float64)[:, None] + 0.5
        gx, gy = raster.apply_gt(dst_gt, di, dj)
        E, N = tf(gx, gy)
        igt = raster.inv_gt(src_gt)
        sx = igt[0] + E * igt[1] + N * igt[2]
        sy = igt[3] + E * igt[4] + N * igt[5]
        xi = np.clip(np.floor(sx).astype(np.int64), 0, src_w - 1)
        yi = np.clip(np.floor(sy).astype(np.int64), 0, src_h - 1)
        want = ((xi * 7 + yi * 13) % 251).astype(np.int64)
        np.testing.assert_array_equal(got, want)


class TestCompose:
    def test_compose_equals_nesting(self):
        import numpy as np

        from gdal_spark import proj

        lon = np.linspace(1.5, 3.5, 40)
        lat = np.linspace(46.0, 48.5, 40)
        f = proj.LonLatToWebMercator()
        g = proj.WebMercatorToLonLat()
        h = proj.LCCForwardTransform(44.0, 49.0, 46.5, 3.0,
                                     700000.0, 6600000.0)
        chained = proj.compose(f, g, h)
        x1, y1 = chained(lon, lat)
        x2, y2 = h(*g(*f(lon, lat)))
        np.testing.assert_array_equal(x1, x2)
        np.testing.assert_array_equal(y1, y2)

    def test_mercator_round_trip(self):
        import numpy as np

        from gdal_spark import proj

        lon = np.linspace(-179.0, 179.0, 37)
        lat = np.linspace(-85.0, 85.0, 37)
        rt = proj.compose(
            proj.LonLatToWebMercator(), proj.WebMercatorToLonLat()
        )
        lon2, lat2 = rt(lon, lat)
        np.testing.assert_allclose(lon2, lon, atol=1e-11)
        np.testing.assert_allclose(lat2, lat, atol=1e-11)

    def test_lcc_to_utm_composed_warp_chain(self):
        """The projected→projected chain the composition exists for:
        LCC metres → geodetic → UTM metres, equal to applying the
        steps by hand and round-tripping back to sub-mm."""
        import numpy as np

        from gdal_spark import proj

        params = (44.0, 49.0, 46.5, 3.0, 700000.0, 6600000.0)
        x = np.linspace(650000.0, 750000.0, 25)
        y = np.linspace(6.55e6, 6.65e6, 25)
        tf = proj.compose(
            proj.LCCInverseTransform(*params),
            proj.UTMForwardTransform(31),
        )
        e, n = tf(x, y)
        back = proj.compose(
            proj.UTMInverseTransform(31),
            proj.LCCForwardTransform(*params),
        )
        x2, y2 = back(e, n)
        np.testing.assert_allclose(x2, x, atol=1e-3)
        np.testing.assert_allclose(y2, y, atol=1e-3)


class TestCrsTransform:
    def test_identity_and_roundtrips(self):
        from gdal_spark.proj import crs_transform

        lon = np.array([-120.0, 0.0, 13.37, 150.0])
        lat = np.array([-45.0, 0.0, 52.5, 60.0])
        same = crs_transform("EPSG:4326", "epsg:4326")
        X, Y = same(lon, lat)
        np.testing.assert_allclose(X, lon)
        np.testing.assert_allclose(Y, lat)
        for dst in ("EPSG:3857", "EPSG:32633", "EPSG:32733"):
            fwd = crs_transform("EPSG:4326", dst)
            inv = crs_transform(dst, "EPSG:4326")
            gx, gy = fwd(lon, lat)
            lo, la = inv(gx, gy)
            np.testing.assert_allclose(lo, lon, atol=1e-8)
            np.testing.assert_allclose(la, lat, atol=1e-8)

    def test_projected_to_projected_composes(self):
        from gdal_spark.proj import crs_transform, utm_forward

        # UTM 33N -> 3857 equals 33N -> 4326 -> 3857 by construction;
        # check against the direct legs
        e, n, _ = utm_forward(
            np.array([52.0]), np.array([15.0]), zone=33, northern=True
        )
        tf = crs_transform("EPSG:32633", "EPSG:3857")
        x, y = tf(e, n)
        direct = crs_transform("EPSG:4326", "EPSG:3857")
        x2, y2 = direct(np.array([15.0]), np.array([52.0]))
        np.testing.assert_allclose(x, x2, atol=1e-6)
        np.testing.assert_allclose(y, y2, atol=1e-6)

    def test_south_utm_false_northing(self):
        from gdal_spark.proj import crs_transform

        tf = crs_transform("EPSG:4326", "EPSG:32733")
        _, n = tf(np.array([15.0]), np.array([-30.0]))
        assert 6_000_000 < float(n[0]) < 10_000_000

    def test_unsupported_raises(self):
        from gdal_spark.proj import crs_transform

        with pytest.raises(ValueError):
            crs_transform("EPSG:4326", "EPSG:2154")
        with pytest.raises(ValueError):
            crs_transform("UTM33", "EPSG:4326")
