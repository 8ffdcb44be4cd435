"""GCP polynomial transforms — GDALCreateGCPTransformer analog.

Reference: ``alg/gdal_crs.c`` (least-squares polynomial fit of ground
control points, orders 1-3 — the machinery behind ``gdal_translate
-gcp`` + ``gdalwarp -order N``) and ``alg/gdaltransformer.cpp``'s use
of the fitted transform inside warps.

Spark shape: GCP sets are small by definition (hand-picked tie
points; the reference fits them in one in-memory solve), so the FIT
runs on the driver with numpy lstsq; the APPLY is where scale lives
and comes in two forms —

* :func:`transform_columns` — a pure JVM expression tree (Horner-ish
  products of the fitted coefficients), so probing billions of points
  through a GCP transform stays inside whole-stage codegen: no Python,
  no shuffle, just a projection.
* :class:`GCPPolyTransform` — the picklable numpy callable the
  general warp path consumes (``tiling.warp_affine(transform=...)``),
  same protocol as the UTM transforms in :mod:`gdal_spark.proj`.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

# exponent pairs (i, j) per order — x^i * y^j, the exact term sets
# gdal_crs.c solves for (all i + j <= order)
_TERMS = {
    1: [(0, 0), (1, 0), (0, 1)],
    2: [(0, 0), (1, 0), (0, 1), (1, 1), (2, 0), (0, 2)],
    3: [
        (0, 0), (1, 0), (0, 1), (1, 1), (2, 0), (0, 2),
        (2, 1), (1, 2), (3, 0), (0, 3),
    ],
}


def terms(order: int) -> list[tuple[int, int]]:
    if order not in _TERMS:
        raise ValueError(f"order must be 1, 2 or 3, got {order}")
    return _TERMS[order]


def _design(x: np.ndarray, y: np.ndarray, order: int) -> np.ndarray:
    return np.stack(
        [x**i * y**j for i, j in terms(order)], axis=1
    )


def fit(gcps, order: int = 1):
    """Least-squares polynomial fit of GCPs → (coef_x, coef_y, rms).

    ``gcps``: array-like of rows (px, py, X, Y) — source pixel/georef
    coords and their target coords (GDAL_GCP's pixel/line →
    dfGCPX/dfGCPY, gdal.h). Needs >= len(terms(order)) points, like
    the reference (gdal_crs.c CRS_compute refuses underdetermined
    fits)."""
    g = np.asarray(gcps, dtype=np.float64).reshape(-1, 4)
    need = len(terms(order))
    if len(g) < need:
        raise ValueError(
            f"order-{order} fit needs >= {need} GCPs, got {len(g)}"
        )
    A = _design(g[:, 0], g[:, 1], order)
    cx, _, _, _ = np.linalg.lstsq(A, g[:, 2], rcond=None)
    cy, _, _, _ = np.linalg.lstsq(A, g[:, 3], rcond=None)
    pred = A @ np.stack([cx, cy], axis=1)
    rms = float(
        np.sqrt(np.mean(np.sum((pred - g[:, 2:4]) ** 2, axis=1)))
    )
    return cx, cy, rms


def apply_poly(
    coef: np.ndarray, x: np.ndarray, y: np.ndarray, order: int
) -> np.ndarray:
    """Evaluate a fitted polynomial — shape-agnostic (the warp path
    feeds 2-D pixel meshgrids)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    out = np.zeros(np.broadcast(x, y).shape, dtype=np.float64)
    for c, (i, j) in zip(np.asarray(coef, dtype=np.float64),
                         terms(order)):
        out += c * x**i * y**j
    return out


class GCPPolyTransform:
    """Picklable ``(gx, gy) -> (X, Y)`` numpy callable for the general
    warp path (``tiling.warp_affine(transform=...)``) — the
    GDALGCPTransform analog (alg/gdal_crs.c:CRS_georef)."""

    def __init__(self, coef_x, coef_y, order: int):
        self.cx = np.asarray(coef_x, dtype=np.float64)
        self.cy = np.asarray(coef_y, dtype=np.float64)
        self.order = int(order)

    def __call__(self, gx: np.ndarray, gy: np.ndarray):
        return (
            apply_poly(self.cx, gx, gy, self.order),
            apply_poly(self.cy, gx, gy, self.order),
        )


def transform_columns(
    coef_x, coef_y, x: Column, y: Column, order: int = 1
) -> tuple[Column, Column]:
    """(X, Y) as pure JVM Column expressions — point probes through a
    GCP transform compile to whole-stage codegen (no Python)."""

    def one(coef) -> Column:
        out = None
        for c, (i, j) in zip(coef, terms(order)):
            t: Column = F.lit(float(c))
            for _ in range(i):
                t = t * x
            for _ in range(j):
                t = t * y
            out = t if out is None else out + t
        return out

    return one(coef_x), one(coef_y)
