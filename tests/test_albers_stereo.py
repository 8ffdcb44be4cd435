"""Albers Equal-Area Conic + Polar/Oblique Stereographic tests
(Snyder PP 1395; reference analog PROJ `aea`/`stere` behind
ogr/ogrct.cpp:2254). Pinned against Snyder's own published numerical
examples plus the projections' defining invariants (equal-area
Jacobian, true-scale parallels, conformality), so no external data is
needed."""

import numpy as np
import pytest

from gdal_spark.proj import (
    GRS80_F,
    AlbersEqualArea,
    ObliqueStereographic,
    PolarStereographic,
    crs_transform,
)

CLARKE_A, CLARKE_F = 6378206.4, 1 / 294.9786982
INTL_A, INTL_F = 6378388.0, 1 / 297.0


class TestAlbers:
    def test_snyder_numerical_example(self):
        """PP 1395 p. 292: Clarke 1866, φ1=29.5 φ2=45.5 origin
        (23, -96); (35N, 75W) → x=1885472.7, y=1535925.0."""
        aea = AlbersEqualArea(29.5, 45.5, 23.0, -96.0,
                              a=CLARKE_A, f=CLARKE_F)
        x, y = aea.forward(np.array([-75.0]), np.array([35.0]))
        assert abs(x[0] - 1885472.7) < 0.1
        assert abs(y[0] - 1535925.0) < 0.1

    def test_true_scale_on_both_standard_parallels(self):
        aea = AlbersEqualArea(29.5, 45.5, 23.0, -96.0, f=GRS80_F)
        k = aea.scale_k(np.array([29.5, 45.5, 23.0, 37.0]))
        np.testing.assert_allclose(k[:2], 1.0, atol=1e-12)
        assert k[2] > 1.0 and k[3] < 1.0  # outside > 1, between < 1

    def test_round_trip_continental(self):
        aea = AlbersEqualArea(29.5, 45.5, 23.0, -96.0, f=GRS80_F)
        rng = np.random.default_rng(7)
        lon = rng.uniform(-125, -66, 500)
        lat = rng.uniform(24, 49, 500)
        x, y = aea.forward(lon, lat)
        lo, la = aea.inverse(x, y)
        np.testing.assert_allclose(lo, lon, atol=1e-9)
        np.testing.assert_allclose(la, lat, atol=1e-9)

    def test_equal_area_jacobian(self):
        """The defining property: |J| of (lon,lat)→(x,y) equals the
        ellipsoidal area element a²(1−e²)cosφ/(1−e²sin²φ)² per radian²
        — checked by central finite differences across the domain."""
        aea = AlbersEqualArea(29.5, 45.5, 23.0, -96.0, f=GRS80_F)
        e2 = aea.e2
        h = 1e-5
        for lon, lat in ((-96.0, 37.0), (-120.0, 30.0), (-70.0, 47.0)):
            xe, ye = aea.forward(np.array([lon + h, lon - h]),
                                 np.array([lat, lat]))
            xn, yn = aea.forward(np.array([lon, lon]),
                                 np.array([lat + h, lat - h]))
            dxdl = (xe[0] - xe[1]) / (2 * h)
            dydl = (ye[0] - ye[1]) / (2 * h)
            dxdp = (xn[0] - xn[1]) / (2 * h)
            dydp = (yn[0] - yn[1]) / (2 * h)
            jac = abs(dxdl * dydp - dxdp * dydl) * (180 / np.pi) ** 2
            s = np.sin(np.radians(lat))
            want = (
                aea.a ** 2 * (1 - e2) * np.cos(np.radians(lat))
                / (1 - e2 * s * s) ** 2
            )
            assert abs(jac / want - 1.0) < 1e-6

    def test_crs_transform_5070(self):
        tf = crs_transform("EPSG:4326", "EPSG:5070")
        x, y = tf(np.array([-96.0]), np.array([23.0]))
        assert abs(x[0]) < 1e-6 and abs(y[0]) < 1e-6
        back = crs_transform("EPSG:5070", "EPSG:4326")
        lo, la = back(*tf(np.array([-100.0]), np.array([40.0])))
        assert abs(lo[0] + 100.0) < 1e-9 and abs(la[0] - 40.0) < 1e-9


class TestPolarStereographic:
    def test_snyder_numerical_example_south(self):
        """PP 1395 p. 315: International ellipsoid, south aspect,
        φc=−71, λ0=−100; (−75, 150) → x=−1540033.6, y=−560526.4."""
        ps = PolarStereographic(-100.0, north=False, lat_ts_deg=-71.0,
                                a=INTL_A, f=INTL_F)
        x, y = ps.forward(np.array([150.0]), np.array([-75.0]))
        assert abs(x[0] + 1540033.6) < 0.1
        assert abs(y[0] + 560526.4) < 0.1

    def test_ups_north_pole_at_false_origin(self):
        ups = PolarStereographic(0.0, north=True, k0=0.994,
                                 false_e=2e6, false_n=2e6)
        x, y = ups.forward(np.array([0.0]), np.array([90.0]))
        assert abs(x[0] - 2e6) < 1e-6 and abs(y[0] - 2e6) < 1e-6

    def test_true_scale_at_lat_ts(self):
        """Variant B: scale along the true-scale parallel is exactly
        1 — arc length of a small longitude step at φ_ts must equal
        the ellipsoidal parallel arc a·m(φ)·dλ."""
        from gdal_spark.proj import _m_of

        ps = PolarStereographic(-45.0, north=True, lat_ts_deg=70.0)
        h = 1e-6
        x, y = ps.forward(np.array([0.0, h]), np.array([70.0, 70.0]))
        planar = np.hypot(x[1] - x[0], y[1] - y[0])
        arc = ps.a * _m_of(np.radians(70.0), ps.e) * np.radians(h)
        # 1e-7 bound: the chord/arc finite difference itself carries
        # O(h) truncation (~5e-9 at h=1e-6), not projection error.
        assert abs(planar / arc - 1.0) < 1e-7

    @pytest.mark.parametrize("north,ts", [(True, 70.0), (False, -71.0)])
    def test_round_trip(self, north, ts):
        ps = PolarStereographic(-45.0 if north else 0.0, north=north,
                                lat_ts_deg=ts)
        rng = np.random.default_rng(11)
        lon = rng.uniform(-180, 180, 400)
        lat = rng.uniform(60, 89.9, 400) * (1 if north else -1)
        x, y = ps.forward(lon, lat)
        lo, la = ps.inverse(x, y)
        # lon wraps at ±180
        dl = (lo - lon + 180) % 360 - 180
        np.testing.assert_allclose(dl, 0.0, atol=1e-9)
        np.testing.assert_allclose(la, lat, atol=1e-9)

    def test_crs_transform_3413_3031_ups(self):
        for code, lon, lat in (("EPSG:3413", -30.0, 75.0),
                               ("EPSG:3031", 45.0, -80.0),
                               ("EPSG:32661", 10.0, 85.0),
                               ("EPSG:32761", 10.0, -85.0)):
            fwd = crs_transform("EPSG:4326", code)
            inv = crs_transform(code, "EPSG:4326")
            lo, la = inv(*fwd(np.array([lon]), np.array([lat])))
            assert abs(lo[0] - lon) < 1e-9 and abs(la[0] - lat) < 1e-9


class TestObliqueStereographic:
    # RD New (EPSG:28992) parameters minus the Bessel datum shift —
    # the projection math itself on WGS84 for invariants
    P = dict(lat0_deg=52.15616055, lon0_deg=5.38763889, k0=0.9999079)

    def test_origin_maps_to_false_origin(self):
        ob = ObliqueStereographic(**self.P, false_e=155000.0,
                                  false_n=463000.0)
        x, y = ob.forward(np.array([self.P["lon0_deg"]]),
                          np.array([self.P["lat0_deg"]]))
        assert abs(x[0] - 155000.0) < 1e-6
        assert abs(y[0] - 463000.0) < 1e-6

    def test_scale_at_center_is_k0(self):
        ob = ObliqueStereographic(**self.P)
        h = 1e-6
        lon0, lat0 = self.P["lon0_deg"], self.P["lat0_deg"]
        x, y = ob.forward(np.array([lon0, lon0 + h]),
                          np.array([lat0, lat0]))
        planar = np.hypot(x[1] - x[0], y[1] - y[0])
        s = np.sin(np.radians(lat0))
        nu = ob.a / np.sqrt(1 - ob.e2 * s * s)
        arc = nu * np.cos(np.radians(lat0)) * np.radians(h)
        assert abs(planar / arc - self.P["k0"]) < 1e-7

    def test_conformality(self):
        """Stereographic is conformal: at any point the two principal
        scale factors agree (finite-difference Tissot check)."""
        ob = ObliqueStereographic(**self.P)
        h = 1e-6
        for lon, lat in ((6.5, 53.0), (4.0, 51.0), (5.4, 52.2)):
            xe, ye = ob.forward(np.array([lon + h, lon - h]),
                                np.array([lat, lat]))
            xn, yn = ob.forward(np.array([lon, lon]),
                                np.array([lat + h, lat - h]))
            s = np.sin(np.radians(lat))
            w = np.sqrt(1 - ob.e2 * s * s)
            # scale along parallel / meridian on the ellipsoid
            kp = np.hypot(xe[0] - xe[1], ye[0] - ye[1]) / (
                2 * h * np.radians(1) * ob.a * np.cos(np.radians(lat)) / w
            )
            km = np.hypot(xn[0] - xn[1], yn[0] - yn[1]) / (
                2 * h * np.radians(1) * ob.a * (1 - ob.e2) / w ** 3
            )
            assert abs(kp / km - 1.0) < 1e-6

    def test_round_trip(self):
        ob = ObliqueStereographic(**self.P, false_e=155000.0,
                                  false_n=463000.0)
        rng = np.random.default_rng(3)
        lon = rng.uniform(3.2, 7.2, 300)
        lat = rng.uniform(50.7, 53.6, 300)
        x, y = ob.forward(lon, lat)
        lo, la = ob.inverse(x, y)
        np.testing.assert_allclose(lo, lon, atol=1e-9)
        np.testing.assert_allclose(la, lat, atol=1e-9)
