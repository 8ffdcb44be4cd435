"""Thin Plate Spline GCP transform — GDALCreateTPSTransformer analog.

Reference semantics: ``alg/thinplatespline.cpp`` (VizGeorefSpline2D —
radial basis phi(d2) = d2 * ln(d2) over SQUARED distance, line 180,
plus an affine part) and ``alg/gdal_tps.cpp:148-221`` (two splines are
fitted from the same GCP list: forward pixel/line -> georef and
reverse georef -> pixel/line; the warp consumes whichever direction it
needs — there is no iterative inversion).

Spark shape — same split as :mod:`gdal_spark.gcp`: GCP lists are
small by definition (hand-picked tie points; the reference solves the
(N+3)x(N+3) dense system in memory, gdallinearsystem.cpp), so the FIT
is a driver-side numpy solve; the APPLY is a picklable vectorized
callable ``(gx, gy) -> (X, Y)`` — the protocol
``tiling.warp_affine(transform=...)`` consumes — whose cost per warp
block is one (Q x N) distance matrix, Arrow-batched like every other
kernel in the repo. N control points is O(100); Q is one dst block.

Unlike the polynomial fit (gdal_crs.c, least squares, smooths
residuals), TPS INTERPOLATES: it is exact at every GCP and bends
minimally (minimum integrated second derivative) between them — the
reference exposes both and so do we (``gdalwarp -order N`` vs
``gdalwarp -tps``).
"""

from __future__ import annotations

import numpy as np


def _phi(d2: np.ndarray) -> np.ndarray:
    """Radial basis over SQUARED distance: d2 * ln(d2), 0 at 0 —
    exactly VizGeorefSpline2DBase_func (thinplatespline.cpp:174-181;
    the classic r^2 ln r kernel up to a factor 2 that the solved
    coefficients absorb)."""
    out = np.zeros_like(d2)
    nz = d2 > 0.0
    out[nz] = d2[nz] * np.log(d2[nz])
    return out


class TPSTransform:
    """One direction of a TPS fit: maps (x, y) -> (u, v).

    Picklable (plain ndarrays), vectorized, shape-preserving — the
    same callable protocol as proj/gcp transforms, so it slots
    directly into ``warp_affine(transform=...)`` and
    ``datum.compose``-style chaining.
    """

    def __init__(self, src_xy: np.ndarray, coef: np.ndarray):
        # coef: (N + 3, 2) — rows 0..N-1 the radial weights w_i,
        # rows N..N+2 the affine part [a0, ax, ay] per output var.
        self.src_xy = np.asarray(src_xy, dtype=np.float64)
        self.coef = np.asarray(coef, dtype=np.float64)

    def __call__(self, x: np.ndarray, y: np.ndarray):
        x = np.asarray(x, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        shape = x.shape
        q = np.stack([x.ravel(), y.ravel()], axis=1)  # (Q, 2)
        # (Q, N) squared distances -> basis matrix
        d2 = (
            (q[:, 0:1] - self.src_xy[None, :, 0]) ** 2
            + (q[:, 1:2] - self.src_xy[None, :, 1]) ** 2
        )
        B = _phi(d2)
        n = len(self.src_xy)
        w, a = self.coef[:n], self.coef[n:]
        out = (
            B @ w
            + a[0][None, :]
            + q[:, 0:1] * a[1][None, :]
            + q[:, 1:2] * a[2][None, :]
        )
        return out[:, 0].reshape(shape), out[:, 1].reshape(shape)

    def residual_at(self, x, y, u, v) -> float:
        """Max abs error of the fit at probe points (diagnostics)."""
        U, V = self(np.asarray(x), np.asarray(y))
        return float(
            max(np.abs(U - np.asarray(u)).max(), np.abs(V - np.asarray(v)).max())
        )


def fit_tps(src_xy, dst_xy) -> TPSTransform:
    """Fit one TPS direction: src (x, y) -> dst (u, v).

    Solves the standard augmented system
    ``[[K, P], [P^T, 0]] [w; a] = [v; 0]`` with K the phi matrix over
    control points and P = [1, x, y] — the same dense solve
    VizGeorefSpline2D::solve() runs (thinplatespline.cpp:423+ via
    GDALLinearSystemSolve). Duplicate source points make the system
    singular; the reference silently drops them at add_point
    (gdal_tps.cpp:213 forward/reverse add), we dedup explicitly
    (first occurrence wins) for the same effect.
    """
    s = np.asarray(src_xy, dtype=np.float64).reshape(-1, 2)
    d = np.asarray(dst_xy, dtype=np.float64).reshape(-1, 2)
    if len(s) != len(d):
        raise ValueError("src/dst GCP counts differ")
    _, keep = np.unique(s, axis=0, return_index=True)
    keep = np.sort(keep)
    s, d = s[keep], d[keep]
    n = len(s)
    if n < 3:
        raise ValueError(f"TPS needs >= 3 distinct GCPs, got {n}")

    d2 = (
        (s[:, 0:1] - s[None, :, 0]) ** 2 + (s[:, 1:2] - s[None, :, 1]) ** 2
    )
    K = _phi(d2)
    P = np.column_stack([np.ones(n), s[:, 0], s[:, 1]])
    L = np.zeros((n + 3, n + 3))
    L[:n, :n] = K
    L[:n, n:] = P
    L[n:, :n] = P.T
    rhs = np.zeros((n + 3, 2))
    rhs[:n] = d
    try:
        coef = np.linalg.solve(L, rhs)
    except np.linalg.LinAlgError:
        # collinear control points: affine part is rank-deficient —
        # fall back to least squares like the reference's Gaussian
        # elimination with pivoting degrades gracefully.
        coef, *_ = np.linalg.lstsq(L, rhs, rcond=None)
    return TPSTransform(s, coef)


def tps_transform_pair(gcps) -> tuple[TPSTransform, TPSTransform]:
    """Fit BOTH directions from one GCP list, like
    GDALCreateTPSTransformerInt (gdal_tps.cpp:148: poForward
    pixel/line -> georef AND poReverse georef -> pixel/line from the
    same points).

    ``gcps``: rows (px, py, X, Y). Returns (forward, reverse);
    ``reverse`` is the ``warp_affine(transform=...)`` input for
    warping a GCP-georeferenced image onto a georef dst grid
    (dst georef -> src pixel space).
    """
    g = np.asarray(gcps, dtype=np.float64).reshape(-1, 4)
    fwd = fit_tps(g[:, :2], g[:, 2:])
    rev = fit_tps(g[:, 2:], g[:, :2])
    return fwd, rev
