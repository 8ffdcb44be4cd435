"""Homography (projective) GCP transform — GDALCreateHomographyTransformer
/ GDALGCPsToHomography analog.

Reference semantics: ``alg/gdal_homography.cpp`` —
* coefficient layout is geotransform-like: ``x' = (h0 + x*h1 + y*h2)
  / w``, ``y' = (h3 + x*h4 + y*h5) / w``, ``w = h6 + x*h7 + y*h8``
  (GDALApplyHomography);
* the fit normalizes BOTH spaces to the unit square, solves the DLT
  normal equations with the extra constraint ``h6 == 1`` (rank-8
  system + one pinning equation, gdal_homography.cpp:228-247),
  rejects fits whose unit square maps to a non-convex quadrilateral
  (:288-312), then composes with the normalizers (:314-321);
* degenerate GCP ranges (all-equal pixel/line/geox/geoy) are refused
  (:178-190); 3 GCPs fall back to the affine GDALGCPsToGeoTransform
  (:143-150) — here: the order-1 polynomial fit in
  :mod:`gdal_spark.gcp`.

Spark shape — identical split to gcp/tps/rpc: the fit is a
driver-side numpy solve over the (tiny, hand-picked) GCP list; the
apply ships as either a picklable vectorized callable (the
``warp_affine(transform=...)`` protocol) or a whole-stage-codegen
Column pair (a ratio of three linear forms — pure JVM projection for
billion-row probes).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F


def apply_h(h: np.ndarray, x: np.ndarray, y: np.ndarray):
    """Vectorized GDALApplyHomography (layout h0..h8 as above)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    w = h[6] + x * h[7] + y * h[8]
    return (
        (h[0] + x * h[1] + y * h[2]) / w,
        (h[3] + x * h[4] + y * h[5]) / w,
    )


def _to_matrix(h: np.ndarray) -> np.ndarray:
    """GDAL layout -> row-vector 3x3 projective matrix M with
    [X, Y, W]^T = M @ [x, y, 1]^T."""
    return np.array(
        [
            [h[1], h[2], h[0]],
            [h[4], h[5], h[3]],
            [h[7], h[8], h[6]],
        ]
    )


def _from_matrix(m: np.ndarray) -> np.ndarray:
    return np.array(
        [m[0, 2], m[0, 0], m[0, 1],
         m[1, 2], m[1, 0], m[1, 1],
         m[2, 2], m[2, 0], m[2, 1]]
    )


def compose_h(h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
    """h1 then h2 (GDALComposeHomographies order)."""
    return _from_matrix(_to_matrix(h2) @ _to_matrix(h1))


def inv_h(h: np.ndarray) -> np.ndarray:
    """GDALInvHomography: projective inverse (adjugate up to scale)."""
    m = np.linalg.inv(_to_matrix(h))
    return _from_matrix(m / m[2, 2])


def fit_homography(gcps) -> np.ndarray:
    """Least-squares projective fit of GCP rows (px, py, X, Y) with
    the reference's exact conditioning: unit-square normalization of
    both spaces, DLT normal equations + the ``h6 == 1`` pinning row,
    convexity check on the mapped unit square, then composition with
    the normalizers. Needs >= 4 GCPs (3 define only an affinity —
    use gcp.fit(order=1))."""
    g = np.asarray(gcps, dtype=np.float64).reshape(-1, 4)
    if len(g) < 4:
        raise ValueError("homography needs >= 4 GCPs")
    px, py, gx, gy = g[:, 0], g[:, 1], g[:, 2], g[:, 3]
    eps = 1.0e-12
    rng_p = px.max() - px.min()
    rng_l = py.max() - py.min()
    rng_x = gx.max() - gx.min()
    rng_y = gy.max() - gy.min()
    if min(rng_p, rng_l, rng_x, rng_y) < eps:
        raise ValueError("GCPs degenerate in at least one dimension")

    # normalizers (affine homographies) to the unit square
    pl_n = np.array([-px.min() / rng_p, 1.0 / rng_p, 0.0,
                     -py.min() / rng_l, 0.0, 1.0 / rng_l,
                     1.0, 0.0, 0.0])
    geo_n = np.array([-gx.min() / rng_x, 1.0 / rng_x, 0.0,
                      -gy.min() / rng_y, 0.0, 1.0 / rng_y,
                      1.0, 0.0, 0.0])
    npx, npy = apply_h(pl_n, px, py)
    ngx, ngy = apply_h(geo_n, gx, gy)

    # DLT rows: (h0 + x h1 + y h2) - X (h6 + x h7 + y h8) = 0 and the
    # y analog; plus the pinning equation h6 = 1.
    n = len(g)
    A = np.zeros((2 * n + 1, 9))
    b = np.zeros(2 * n + 1)
    A[:n, 0] = 1.0
    A[:n, 1] = npx
    A[:n, 2] = npy
    A[:n, 6] = -ngx
    A[:n, 7] = -ngx * npx
    A[:n, 8] = -ngx * npy
    A[n : 2 * n, 3] = 1.0
    A[n : 2 * n, 4] = npx
    A[n : 2 * n, 5] = npy
    A[n : 2 * n, 6] = -ngy
    A[n : 2 * n, 7] = -ngy * npx
    A[n : 2 * n, 8] = -ngy * npy
    A[2 * n, 6] = 1.0
    b[2 * n] = 1.0
    hn, *_ = np.linalg.lstsq(A, b, rcond=None)
    if abs(hn[6]) < 1.0e-15:
        raise ValueError("homography fit degenerate (h6 ~ 0)")

    # convexity of the mapped unit square (gdal_homography.cpp:288)
    ux, uy = apply_h(hn, np.array([0.0, 1.0, 1.0, 0.0]),
                     np.array([0.0, 0.0, 1.0, 1.0]))
    ux, uy = ux - ux[0], uy - uy[0]
    c12 = ux[1] * uy[2] - ux[2] * uy[1]
    c23 = ux[2] * uy[3] - ux[3] * uy[2]
    if c12 * c23 <= 0.0:
        raise ValueError("homography maps unit square non-convexly")

    return compose_h(compose_h(pl_n, hn), inv_h(geo_n))


class HomographyTransform:
    """Picklable ``(x, y) -> (X, Y)`` callable — the
    ``warp_affine(transform=...)`` / compose protocol."""

    def __init__(self, h: np.ndarray):
        self.h = np.asarray(h, dtype=np.float64)

    def __call__(self, x: np.ndarray, y: np.ndarray):
        return apply_h(self.h, x, y)

    def inverse(self) -> "HomographyTransform":
        return HomographyTransform(inv_h(self.h))


def transform_columns(
    h: np.ndarray, x: Column, y: Column
) -> tuple[Column, Column]:
    """The same map as a JVM expression pair (ratio of linear forms —
    stays in whole-stage codegen for billion-point probes)."""
    w = F.lit(float(h[6])) + x * F.lit(float(h[7])) + y * F.lit(float(h[8]))
    gx = (F.lit(float(h[0])) + x * F.lit(float(h[1]))
          + y * F.lit(float(h[2]))) / w
    gy = (F.lit(float(h[3])) + x * F.lit(float(h[4]))
          + y * F.lit(float(h[5]))) / w
    return gx, gy
