"""RPC (Rational Polynomial Coefficient) transforms — GDALRPCTransformer
analog.

Reference semantics: ``alg/gdal_rpc.cpp`` —
* term basis: the 20 cubic monomials of (long, lat, height) in the
  exact RPC00B order of RPCComputeTerms (gdal_rpc.cpp:192-217);
* geo -> image: normalize by (OFF, SCALE), evaluate the four 20-term
  polynomials, pixel = SAMP_NUM/SAMP_DEN, line = LINE_NUM/LINE_DEN,
  de-normalize and add the +0.5 center-of-upper-left-pixel -> GDAL
  top-left-corner convention shift (RPCTransformPoint,
  gdal_rpc.cpp:358-467) — this direction is CLOSED FORM;
* image -> geo: no closed form — iterative refinement up to
  RPC_MAX_ITERATIONS=10 until the apparent error falls under
  dfPixErrThreshold=0.1 px (gdal_rpc.cpp:719-807). We run the same
  scheme vectorized: a Newton step per point with a
  finite-difference 2x2 Jacobian in normalized geo space, all points
  in one numpy batch.

Spark shape: the model is ~90 floats (per-scene metadata, broadcast
by value in task closures); the APPLY comes in the repo's two
standard forms —
* :meth:`RPCModel.geo_to_image` / :class:`RPCGeoToImage` — picklable
  vectorized numpy callables; the latter is the
  ``warp_affine(transform=...)`` input for orthorectification onto a
  lon/lat dst grid (dst georef -> src image coords), the reference's
  ``gdalwarp -rpc`` path;
* :func:`geo_to_image_columns` — the same four polynomials as a pure
  JVM expression tree, so probing billions of rows through an RPC
  model stays inside whole-stage codegen (same split as
  gcp.transform_columns / proj's column forms).

Height handling: a constant ``height`` argument is the reference's
RPC_HEIGHT option (average terrain height); the per-point DEM lookup
(RPC_DEM) composes as ``height=`` an array aligned with the points,
which the caller obtains from :func:`operators.tiling.point_probe`
over a DEM tile table — same decomposition, no special path needed.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

#: exponent triples (i, j, k) of long^i * lat^j * height^k in the
#: exact RPCComputeTerms order (gdal_rpc.cpp:196-216).
TERMS: list[tuple[int, int, int]] = [
    (0, 0, 0),
    (1, 0, 0), (0, 1, 0), (0, 0, 1),
    (1, 1, 0), (1, 0, 1), (0, 1, 1),
    (2, 0, 0), (0, 2, 0), (0, 0, 2),
    (1, 1, 1),
    (3, 0, 0), (1, 2, 0), (1, 0, 2),
    (2, 1, 0), (0, 3, 0), (0, 1, 2),
    (2, 0, 1), (0, 2, 1), (0, 0, 3),
]


def _terms(lon: np.ndarray, lat: np.ndarray, h: np.ndarray) -> np.ndarray:
    """(..., 20) monomial stack in RPC00B order over NORMALIZED
    coordinates."""
    return np.stack(
        [lon**i * lat**j * h**k for i, j, k in TERMS], axis=-1
    )


@dataclass
class RPCModel:
    """The GDALRPCInfoV2 field set (gdal_rpc.cpp:102-176 metadata
    names LINE_OFF/.../SAMP_DEN_COEFF)."""

    line_off: float
    samp_off: float
    lat_off: float
    long_off: float
    height_off: float
    line_scale: float
    samp_scale: float
    lat_scale: float
    long_scale: float
    height_scale: float
    line_num_coeff: np.ndarray = field(default=None)
    line_den_coeff: np.ndarray = field(default=None)
    samp_num_coeff: np.ndarray = field(default=None)
    samp_den_coeff: np.ndarray = field(default=None)

    def __post_init__(self):
        for name in (
            "line_num_coeff", "line_den_coeff",
            "samp_num_coeff", "samp_den_coeff",
        ):
            v = np.asarray(getattr(self, name), dtype=np.float64)
            if v.shape != (20,):
                raise ValueError(f"{name} must have 20 coefficients")
            setattr(self, name, v)

    # ---------------- closed-form geo -> image ----------------

    def geo_to_image(self, lon, lat, height=0.0):
        """(lon, lat, height) -> (pixel, line), GDAL top-left-corner
        convention (RPCTransformPoint incl. the +0.5 shift,
        gdal_rpc.cpp:460-465). Vectorized, shape-preserving."""
        lon = np.asarray(lon, dtype=np.float64)
        lat = np.asarray(lat, dtype=np.float64)
        h = np.broadcast_to(
            np.asarray(height, dtype=np.float64), lon.shape
        )
        L = (lon - self.long_off) / self.long_scale
        P = (lat - self.lat_off) / self.lat_scale
        H = (h - self.height_off) / self.height_scale
        t = _terms(L, P, H)
        x = (t @ self.samp_num_coeff) / (t @ self.samp_den_coeff)
        y = (t @ self.line_num_coeff) / (t @ self.line_den_coeff)
        pixel = x * self.samp_scale + self.samp_off + 0.5
        line = y * self.line_scale + self.line_off + 0.5
        return pixel, line

    # ---------------- iterative image -> geo ----------------

    def image_to_geo(
        self,
        pixel,
        line,
        height=0.0,
        max_iterations: int = 10,
        pix_err_threshold: float = 0.1,
    ):
        """(pixel, line, height) -> (lon, lat) by vectorized Newton
        iteration — the reference's scheme (≤ RPC_MAX_ITERATIONS=10
        rounds, stop when apparent error < 0.1 px,
        gdal_rpc.cpp:723-726), with a central-difference 2x2 Jacobian
        in normalized geo space per point, every point advanced in the
        same numpy batch (no per-point loop)."""
        pixel = np.asarray(pixel, dtype=np.float64)
        line = np.asarray(line, dtype=np.float64)
        shape = pixel.shape
        px, ln = pixel.ravel(), line.ravel()
        h = np.broadcast_to(
            np.asarray(height, dtype=np.float64), pixel.shape
        ).ravel()
        lon = np.full_like(px, self.long_off)
        lat = np.full_like(px, self.lat_off)
        # finite-difference step: 1e-7 of a scale unit in geo degrees
        dlon = 1e-7 * self.long_scale
        dlat = 1e-7 * self.lat_scale
        for _ in range(max_iterations):
            fx, fy = self.geo_to_image(lon, lat, h)
            ex, ey = fx - px, fy - ln
            if max(np.abs(ex).max(initial=0.0),
                   np.abs(ey).max(initial=0.0)) < pix_err_threshold:
                break
            fx1, fy1 = self.geo_to_image(lon + dlon, lat, h)
            fx2, fy2 = self.geo_to_image(lon, lat + dlat, h)
            j11 = (fx1 - fx) / dlon  # d pixel / d lon
            j21 = (fy1 - fy) / dlon
            j12 = (fx2 - fx) / dlat
            j22 = (fy2 - fy) / dlat
            det = j11 * j22 - j12 * j21
            det = np.where(np.abs(det) < 1e-30, np.nan, det)
            lon = lon - (j22 * ex - j12 * ey) / det
            lat = lat - (-j21 * ex + j11 * ey) / det
        return lon.reshape(shape), lat.reshape(shape)


class RPCGeoToImage:
    """Picklable ``(gx, gy) -> (px, py)`` adapter over
    :meth:`RPCModel.geo_to_image` at a fixed terrain height — the
    ``warp_affine(transform=...)`` input for the ``gdalwarp -rpc``
    orthorectification (dst lon/lat grid -> src image coords);
    RPC_HEIGHT analog (gdal_rpc.cpp:742-745)."""

    def __init__(self, model: RPCModel, height: float = 0.0):
        self.model = model
        self.height = float(height)

    def __call__(self, gx: np.ndarray, gy: np.ndarray):
        return self.model.geo_to_image(gx, gy, self.height)


def geo_to_image_columns(
    model: RPCModel,
    lon: Column,
    lat: Column,
    height: Column | float = 0.0,
) -> tuple[Column, Column]:
    """geo -> image as a pure JVM expression tree (whole-stage
    codegen): the four 20-term polynomials expand to literal
    products, so an RPC probe over billions of rows is just a
    projection — the same JVM/numpy split as gcp.transform_columns.

    Returns (pixel, line) Columns."""
    h = F.lit(float(height)) if not isinstance(height, Column) else height
    L = (lon - F.lit(model.long_off)) / F.lit(model.long_scale)
    P = (lat - F.lit(model.lat_off)) / F.lit(model.lat_scale)
    H = (h - F.lit(model.height_off)) / F.lit(model.height_scale)

    def powc(c: Column, e: int) -> Column | None:
        if e == 0:
            return None
        out = c
        for _ in range(e - 1):
            out = out * c
        return out

    def poly(coefs: np.ndarray) -> Column:
        acc = None
        for (i, j, k), c in zip(TERMS, coefs):
            if c == 0.0:
                continue
            term = F.lit(float(c))
            for part in (powc(L, i), powc(P, j), powc(H, k)):
                if part is not None:
                    term = term * part
            acc = term if acc is None else acc + term
        return acc if acc is not None else F.lit(0.0)

    x = poly(model.samp_num_coeff) / poly(model.samp_den_coeff)
    y = poly(model.line_num_coeff) / poly(model.line_den_coeff)
    pixel = x * F.lit(model.samp_scale) + F.lit(model.samp_off + 0.5)
    line = y * F.lit(model.line_scale) + F.lit(model.line_off + 0.5)
    return pixel, line


def affine_rpc(
    a: float, b: float, c: float, d: float, e: float, f: float,
    long_off: float = 0.0, lat_off: float = 0.0,
    long_scale: float = 1.0, lat_scale: float = 1.0,
) -> RPCModel:
    """Build an RPC model that is EXACTLY the affine map
    pixel = a + b*lon + c*lat, line = d + e*lon + f*lat (in image
    coords already incl. the +0.5 convention — we subtract it here so
    geo_to_image reproduces the affine bit-for-bit). Deterministic
    fixture helper for tests/oracles — no external RPC metadata is
    ever needed."""
    def lin(c0, cl, cp, scale, off):
        num = np.zeros(20)
        # model output x satisfies: out = x*scale + off + 0.5
        # want out = c0 + cl*lon + cp*lat with lon = L*lsc + loff ...
        num[0] = (c0 + cl * long_off + cp * lat_off - off - 0.5) / scale
        num[1] = cl * long_scale / scale
        num[2] = cp * lat_scale / scale
        den = np.zeros(20)
        den[0] = 1.0
        return num, den

    sx_off, sy_off = a, d  # reuse as OFF for conditioning
    snum, sden = lin(a, b, c, 1.0, sx_off)
    lnum, lden = lin(d, e, f, 1.0, sy_off)
    return RPCModel(
        line_off=sy_off, samp_off=sx_off,
        lat_off=lat_off, long_off=long_off, height_off=0.0,
        line_scale=1.0, samp_scale=1.0,
        lat_scale=lat_scale, long_scale=long_scale, height_scale=1.0,
        line_num_coeff=lnum, line_den_coeff=lden,
        samp_num_coeff=snum, samp_den_coeff=sden,
    )
