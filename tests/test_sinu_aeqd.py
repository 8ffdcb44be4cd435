"""Sinusoidal + Azimuthal Equidistant projections: defining-property
pins (equal area / true geodesic distance), closed forms, round trips,
warp-chain composition."""

import numpy as np
import pytest

from gdal_spark import geodesy, proj

MODIS_R = 6371007.181


class TestSinusoidal:
    def test_equator_x_is_arc_length(self):
        # x = a·Δλ exactly on the equator (cosφ=1, W=1)
        p = proj.Sinusoidal(lon0_deg=0.0)
        x, y = p.forward(np.array([10.0]), np.array([0.0]))
        assert x[0] == pytest.approx(
            6378137.0 * np.radians(10.0), abs=1e-9
        )
        assert y[0] == 0.0

    def test_modis_tile_width_closed_form(self):
        # MODIS grid: sphere R=6371007.181; a 10° tile at the equator
        # is 1111950.5196666666 m wide (the published grid constant)
        p = proj.Sinusoidal(lon0_deg=0.0, a=MODIS_R, f=0.0)
        x, _ = p.forward(np.array([10.0]), np.array([0.0]))
        assert x[0] == pytest.approx(1111950.5196666666, abs=1e-3)

    def test_central_meridian_y_is_meridian_arc(self):
        # y on the central meridian = meridian arc; check against an
        # independent numeric quadrature of a(1-e²)/(1-e²sin²φ)^1.5
        p = proj.Sinusoidal(lon0_deg=0.0)
        for lat in (17.3, 45.0, 66.6, 89.0):
            _, y = p.forward(np.array([0.0]), np.array([lat]))
            phi = np.linspace(0.0, np.radians(lat), 200_001)
            integ = (
                6378137.0 * (1.0 - p.e2)
                / (1.0 - p.e2 * np.sin(phi) ** 2) ** 1.5
            )
            arc = np.trapz(integ, phi)
            assert y[0] == pytest.approx(arc, abs=1e-6)

    def test_equal_area_jacobian(self):
        # |∂(x,y)/∂(λ,φ)| equals the ellipsoidal area element
        # a²(1-e²)cosφ/(1-e²sin²φ)² everywhere
        p = proj.Sinusoidal(lon0_deg=-96.0)
        rng = np.random.default_rng(4)
        lon = rng.uniform(-170, 170, 50)
        lat = rng.uniform(-85, 85, 50)
        h = 1e-6
        xln, yln = p.forward(lon - h, lat)
        xlp, ylp = p.forward(lon + h, lat)
        xpn, ypn = p.forward(lon, lat - h)
        xpp, ypp = p.forward(lon, lat + h)
        dlam = 2 * h * np.pi / 180.0
        J = (
            (xlp - xln) * (ypp - ypn) - (xpp - xpn) * (ylp - yln)
        ) / (dlam * dlam)
        s = np.sin(np.radians(lat))
        want = (
            6378137.0 ** 2 * (1.0 - p.e2) * np.cos(np.radians(lat))
            / (1.0 - p.e2 * s * s) ** 2
        )
        assert np.allclose(J, want, rtol=1e-4)

    def test_round_trip(self):
        p = proj.Sinusoidal(lon0_deg=20.0, false_e=3e5, false_n=-1e5)
        rng = np.random.default_rng(9)
        lon = rng.uniform(-179, 179, 300)
        lat = rng.uniform(-80, 80, 300)
        lo, la = p.inverse(*p.forward(lon, lat))
        assert np.abs(la - lat).max() < 1e-11
        assert np.abs(lo - lon).max() < 1e-8
        # near-pole: the 1/cosφ sensitivity amplifies the footpoint
        # series' ~1e-9 rad into ~1e-7 deg of longitude
        lo2, la2 = p.inverse(*p.forward(
            np.array([150.0]), np.array([89.5])
        ))
        assert la2[0] == pytest.approx(89.5, abs=1e-9)
        assert lo2[0] == pytest.approx(150.0, abs=1e-6)

    def test_sphere_round_trip(self):
        p = proj.Sinusoidal(lon0_deg=0.0, a=MODIS_R, f=0.0)
        lo, la = p.inverse(*p.forward(
            np.array([55.5]), np.array([-33.25])
        ))
        assert la[0] == pytest.approx(-33.25, abs=1e-12)
        assert lo[0] == pytest.approx(55.5, abs=1e-12)


class TestAzimuthalEquidistant:
    def test_radial_distance_is_geodesic(self):
        # THE defining property: hypot(x,y) == vincenty distance
        # from the center, for arbitrary points
        p = proj.AzimuthalEquidistant(52.0, 13.4)  # Berlin-centered
        rng = np.random.default_rng(7)
        lon = rng.uniform(-120, 150, 40)
        lat = rng.uniform(-60, 80, 40)
        x, y = p.forward(lon, lat)
        want = geodesy.vincenty_distance(
            np.full_like(lat, 52.0), np.full_like(lon, 13.4),
            lat, lon,
        )
        assert np.allclose(np.hypot(x, y), want, rtol=0, atol=1e-6)

    def test_north_azimuth_is_up(self):
        # a point due north of the center lies on +y
        p = proj.AzimuthalEquidistant(10.0, 30.0)
        x, y = p.forward(np.array([30.0]), np.array([20.0]))
        assert abs(x[0]) < 1e-6 and y[0] > 1e6

    def test_round_trip(self):
        p = proj.AzimuthalEquidistant(-41.3, 174.8)  # Wellington
        rng = np.random.default_rng(2)
        lon = rng.uniform(-179, 179, 200)
        lat = rng.uniform(-85, 85, 200)
        lo, la = p.inverse(*p.forward(lon, lat))
        assert np.abs(la - lat).max() < 1e-8
        assert (np.abs((lo - lon + 180) % 360 - 180)).max() < 1e-8

    def test_center_fixed_point(self):
        p = proj.AzimuthalEquidistant(40.0, -100.0, false_e=5e5)
        x, y = p.forward(np.array([-100.0]), np.array([40.0]))
        assert x[0] == pytest.approx(5e5) and y[0] == pytest.approx(0.0)
        lo, la = p.inverse(np.array([5e5]), np.array([0.0]))
        assert lo[0] == -100.0 and la[0] == 40.0


def test_compose_into_warp_chain():
    # sinusoidal → lonlat → aeqd chains through proj.compose and
    # stays picklable (the warp/reproject contract)
    import pickle

    t = proj.compose(
        proj.sinusoidal_inverse_transform(0.0, a=MODIS_R, f=0.0),
        proj.aeqd_forward_transform(0.0, 0.0),
    )
    t = pickle.loads(pickle.dumps(t))
    sinu = proj.Sinusoidal(0.0, a=MODIS_R, f=0.0)
    aeqd = proj.AzimuthalEquidistant(0.0, 0.0)
    sx, sy = sinu.forward(np.array([12.0]), np.array([34.0]))
    gx, gy = t(sx, sy)
    wx, wy = aeqd.forward(np.array([12.0]), np.array([34.0]))
    assert gx[0] == pytest.approx(wx[0], abs=1e-6)
    assert gy[0] == pytest.approx(wy[0], abs=1e-6)
