"""Geodetic datums: ellipsoid table, geodetic ↔ geocentric (ECEF)
conversion, and Helmert 7-parameter datum shifts.

This closes the transform family's last gap vs the reference: a warp
between CRSs on DIFFERENT ellipsoids/datums. The reference gets datum
paths for free from PROJ behind OGRCoordinateTransformation
(ogr/ogrct.cpp:2254, `+towgs84` / EPSG method 9606 position-vector
transformation); the ellipsoid table analog is the SRS machinery in
ogr/ogrspatialreference.cpp. PROJ is an external library (not in the
reference tree), so — like `proj.py`'s Krüger/Snyder series — this is
a from-spec implementation of the published formulas:

* geodetic → ECEF: EPSG Guidance Note 7-2 §4.1.1.
* ECEF → geodetic: Bowring (1976) single-step closed form — exact to
  ~1e-12 rad for points near the ellipsoid surface (h = 0 here), and
  deliberately NON-iterative so a SQL oracle can evaluate the
  identical arithmetic tree (the driver gate `sp_datum_shift` mirrors
  it term-for-term in DuckDB).
* Helmert: EPSG method 9606 (position-vector convention, linearized
  rotation matrix). The coordinate-frame convention (method 9607) is
  the same with negated rotations.

Every transform here is a picklable vectorized numpy kernel usable as
a :func:`gdal_spark.proj.compose` step, so a warp LCC(ED50) →
UTM(WGS84) is `compose(lcc_inv, DatumShiftTransform(...), utm_fwd)`
inside the standard distributed gather — no driver stage, no
per-point Python.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np


class Ellipsoid(NamedTuple):
    """Reference ellipsoid (semi-major axis metres, flattening)."""

    a: float
    f: float

    @property
    def b(self) -> float:
        return self.a * (1.0 - self.f)

    @property
    def e2(self) -> float:
        """First eccentricity squared."""
        return self.f * (2.0 - self.f)

    @property
    def ep2(self) -> float:
        """Second eccentricity squared."""
        return self.e2 / (1.0 - self.e2)


# the ellipsoids behind the overwhelming majority of legacy CRSs
WGS84 = Ellipsoid(6378137.0, 1.0 / 298.257223563)
GRS80 = Ellipsoid(6378137.0, 1.0 / 298.257222101)
INTL1924 = Ellipsoid(6378388.0, 1.0 / 297.0)        # Hayford / ED50
CLARKE1866 = Ellipsoid(6378206.4, 1.0 / 294.978698214)  # NAD27
BESSEL1841 = Ellipsoid(6377397.155, 1.0 / 299.1528128)


def geodetic_to_ecef(
    lon_deg: np.ndarray,
    lat_deg: np.ndarray,
    h: np.ndarray | float = 0.0,
    ell: Ellipsoid = WGS84,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(lon, lat degrees, h metres) → geocentric (X, Y, Z) metres."""
    lam = np.radians(np.asarray(lon_deg, dtype=np.float64))
    phi = np.radians(np.asarray(lat_deg, dtype=np.float64))
    s, c = np.sin(phi), np.cos(phi)
    nu = ell.a / np.sqrt(1.0 - ell.e2 * s * s)
    x = (nu + h) * c * np.cos(lam)
    y = (nu + h) * c * np.sin(lam)
    z = (nu * (1.0 - ell.e2) + h) * s
    return x, y, z


def ecef_to_geodetic(
    x: np.ndarray,
    y: np.ndarray,
    z: np.ndarray,
    ell: Ellipsoid = WGS84,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Geocentric (X, Y, Z) → (lon, lat degrees, h metres), Bowring's
    single-step form.  The cube terms are written as explicit triple
    products (NOT ``**3``) so the SQL oracle's ``st*st*st`` evaluates
    the bit-identical tree."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    z = np.asarray(z, dtype=np.float64)
    p = np.sqrt(x * x + y * y)
    theta = np.arctan2(z * ell.a, p * ell.b)
    st, ct = np.sin(theta), np.cos(theta)
    lat = np.arctan2(
        z + ell.ep2 * ell.b * st * st * st,
        p - ell.e2 * ell.a * ct * ct * ct,
    )
    lon = np.arctan2(y, x)
    s = np.sin(lat)
    nu = ell.a / np.sqrt(1.0 - ell.e2 * s * s)
    # h from the radial component; near the poles cos(lat) degenerates,
    # so switch to the Z form there (same quantity, stable arithmetic)
    cl = np.cos(lat)
    with np.errstate(divide="ignore", invalid="ignore"):
        h_eq = p / cl - nu
        h_po = z / s - nu * (1.0 - ell.e2)
    h = np.where(np.abs(cl) > 1e-8, h_eq, h_po)
    return np.degrees(lon), np.degrees(lat), h


_AS_TO_RAD = np.pi / (180.0 * 3600.0)


class Helmert7:
    """EPSG method 9606 position-vector 7-parameter transformation:
    ``X' = T + (1 + ds)·R·X`` with the linearized rotation matrix
    ``R = [[1, -rz, ry], [rz, 1, -rx], [-ry, rx, 1]]``.

    Translations in metres, rotations in arc-seconds, scale in ppm.
    The coordinate-frame convention (EPSG 9607, used by some national
    agencies) is obtained by negating the three rotations."""

    def __init__(
        self,
        tx: float,
        ty: float,
        tz: float,
        rx_as: float = 0.0,
        ry_as: float = 0.0,
        rz_as: float = 0.0,
        ds_ppm: float = 0.0,
    ):
        self.t = (float(tx), float(ty), float(tz))
        self.r_as = (float(rx_as), float(ry_as), float(rz_as))
        self.ds_ppm = float(ds_ppm)

    def __call__(self, x, y, z):
        tx, ty, tz = self.t
        rx, ry, rz = (v * _AS_TO_RAD for v in self.r_as)
        m = 1.0 + self.ds_ppm * 1e-6
        xo = tx + m * (x - rz * y + ry * z)
        yo = ty + m * (rz * x + y - rx * z)
        zo = tz + m * (-ry * x + rx * y + z)
        return xo, yo, zo

    def inverse(self) -> "Helmert7":
        """Linearized inverse (all parameters negated) — the EPSG
        convention; residual is O(rot²)·|X| ≈ sub-millimetre for
        arc-second rotations."""
        tx, ty, tz = self.t
        rx, ry, rz = self.r_as
        return Helmert7(-tx, -ty, -tz, -rx, -ry, -rz, -self.ds_ppm)


# Classic published parameter sets (3-parameter geocentric
# translations; EPSG dataset, widely mirrored in PROJ's +towgs84).
ED50_TO_WGS84 = Helmert7(-87.0, -98.0, -121.0)          # EPSG:1133
NAD27_TO_WGS84 = Helmert7(-8.0, 160.0, 176.0)           # EPSG:1173
TOKYO_TO_WGS84 = Helmert7(-148.0, 507.0, 685.0)         # EPSG:1230


class DatumShiftTransform:
    """Picklable ``(lon, lat) → (lon, lat)`` :func:`compose` step:
    geodetic on the source ellipsoid (h = 0) → ECEF → Helmert →
    geodetic on the destination ellipsoid.  The PROJ
    ``+towgs84``-pipeline analog, runnable inside the distributed
    warp gather."""

    def __init__(
        self,
        src: Ellipsoid,
        helmert: Helmert7,
        dst: Ellipsoid,
    ):
        self.src, self.helmert, self.dst = src, helmert, dst

    def __call__(self, gx: np.ndarray, gy: np.ndarray):
        x, y, z = geodetic_to_ecef(gx, gy, 0.0, self.src)
        x, y, z = self.helmert(x, y, z)
        lon, lat, _ = ecef_to_geodetic(x, y, z, self.dst)
        return lon, lat

    def inverse(self) -> "DatumShiftTransform":
        return DatumShiftTransform(
            self.dst, self.helmert.inverse(), self.src
        )
