"""Geolocation-array transforms — GDALCreateGeoLocTransformer analog.

Reference semantics: ``alg/gdalgeoloc.cpp`` — a GEOLOCATION metadata
domain carries two rasters (lon, lat) sampled every
PIXEL_STEP/LINE_STEP source pixels from PIXEL_OFFSET/LINE_OFFSET
(the swath-data model: per-scanline geodetic positions). Forward:
source pixel -> fractional geoloc-array index
``(p - OFFSET) / STEP`` -> BILINEAR interpolation of lon/lat
(gdalgeoloc.cpp:369, 617-624). Inverse: locate the geoloc CELL whose
bilinear patch contains the query and solve the EXACT inverse
bilinear (quadratic in one parameter — the reference's
GDALInverseBilinearInterpolation, :955+; we use the same classic
closed form, independently derived).

Spark shape: geoloc arrays are subsampled by design (a 100k-line
swath at LINE_STEP=16 is ~6k rows — megabytes), so the arrays ship
in the task closure like every other fitted transform here and both
directions are picklable vectorized callables satisfying the
``warp_affine(transform=...)`` protocol. The inverse builds a
uniform-bin cell index ONCE at construction (the analog of the
reference's backmap/quadtree, :787) and resolves each query batch
with numpy gather + one exact per-cell solve — no per-point Python.
"""

from __future__ import annotations

import numpy as np


def _bilinear(arr: np.ndarray, fx: np.ndarray, fy: np.ndarray):
    """Sample arr at fractional indices (fy rows, fx cols), clamped
    to the array edge like the reference's boundary handling."""
    h, w = arr.shape
    fx = np.clip(fx, 0.0, w - 1.0)
    fy = np.clip(fy, 0.0, h - 1.0)
    x0 = np.clip(np.floor(fx).astype(np.int64), 0, w - 2) if w > 1 else \
        np.zeros_like(fx, dtype=np.int64)
    y0 = np.clip(np.floor(fy).astype(np.int64), 0, h - 2) if h > 1 else \
        np.zeros_like(fy, dtype=np.int64)
    tx = fx - x0
    ty = fy - y0
    a = arr[y0, x0]
    b = arr[y0, x0 + 1] if w > 1 else a
    c = arr[y0 + 1, x0] if h > 1 else a
    d = arr[y0 + 1, x0 + 1] if (w > 1 and h > 1) else a
    return (
        a * (1 - tx) * (1 - ty)
        + b * tx * (1 - ty)
        + c * (1 - tx) * ty
        + d * tx * ty
    )


class GeolocTransform:
    """Forward: source (pixel, line) -> (lon, lat). Picklable,
    vectorized, warp-protocol shaped."""

    def __init__(
        self,
        lon: np.ndarray,
        lat: np.ndarray,
        pixel_offset: float = 0.0,
        line_offset: float = 0.0,
        pixel_step: float = 1.0,
        line_step: float = 1.0,
    ):
        self.lon = np.asarray(lon, dtype=np.float64)
        self.lat = np.asarray(lat, dtype=np.float64)
        if self.lon.shape != self.lat.shape or self.lon.ndim != 2:
            raise ValueError("lon/lat must be equal-shape 2-D arrays")
        self.pixel_offset = float(pixel_offset)
        self.line_offset = float(line_offset)
        self.pixel_step = float(pixel_step)
        self.line_step = float(line_step)

    def __call__(self, px: np.ndarray, py: np.ndarray):
        px = np.asarray(px, dtype=np.float64)
        py = np.asarray(py, dtype=np.float64)
        fx = (px - self.pixel_offset) / self.pixel_step
        fy = (py - self.line_offset) / self.line_step
        return _bilinear(self.lon, fx, fy), _bilinear(self.lat, fx, fy)

    def inverse(self, bins: int = 64) -> "GeolocInverse":
        return GeolocInverse(self, bins=bins)


def _inverse_bilinear_cell(x, y, p00, p10, p01, p11):
    """Exact inverse of the bilinear patch P(s,t) =
    (1-s)(1-t)p00 + s(1-t)p10 + (1-s)t p01 + s t p11 for query
    points (x, y): returns (s, t). Classic closed form: t solves a
    quadratic (the same construction as the reference's
    GDALInverseBilinearInterpolation, gdalgeoloc.cpp:955+).
    Vectorized over matched point/cell arrays."""
    # P(s,t) = a + b s + c t + d s t  per coordinate
    ax, bx = p00[0], p10[0] - p00[0]
    cx, dx = p01[0] - p00[0], p11[0] - p10[0] - p01[0] + p00[0]
    ay, by = p00[1], p10[1] - p00[1]
    cy, dy = p01[1] - p00[1], p11[1] - p10[1] - p01[1] + p00[1]
    rx = x - ax
    ry = y - ay
    # s (b + d t) = r - c t  =>  (r - c t) x (b + d t) = 0, a
    # quadratic in t: A t^2 + B t + C = 0 with
    A = cy * dx - cx * dy
    B = rx * dy - ry * dx + cy * bx - cx * by
    C = rx * by - ry * bx
    lin = np.abs(A) < 1e-14 * (np.abs(B) + np.abs(C) + 1e-300)
    with np.errstate(divide="ignore", invalid="ignore"):
        t_lin = -C / B
        disc = B * B - 4 * A * C
        sq = np.sqrt(np.maximum(disc, 0.0))
        t1 = (-B + sq) / (2 * A)
        t2 = (-B - sq) / (2 * A)

    def s_of(t):
        with np.errstate(divide="ignore", invalid="ignore"):
            den_x = bx + dx * t
            den_y = by + dy * t
            use_x = np.abs(den_x) >= np.abs(den_y)
            return np.where(
                use_x, (rx - cx * t) / den_x, (ry - cy * t) / den_y
            )

    eps = 1e-9

    def in01(v):
        return (v >= -eps) & (v <= 1 + eps)

    s1, s2 = s_of(t1), s_of(t2)
    ok1 = in01(t1) & in01(s1)
    t_quad = np.where(ok1, t1, t2)
    t = np.where(lin, t_lin, t_quad)
    s = np.where(lin, s_of(t_lin), np.where(ok1, s1, s2))
    return s, t


class GeolocInverse:
    """(lon, lat) -> source (pixel, line): uniform-bin cell index
    built once (the backmap/quadtree analog), exact per-cell inverse
    bilinear at query time. Picklable (plain ndarrays + dict)."""

    def __init__(self, fwd: GeolocTransform, bins: int = 64):
        self.fwd = fwd
        lon, lat = fwd.lon, fwd.lat
        h, w = lon.shape
        if h < 2 or w < 2:
            raise ValueError("inverse needs a >= 2x2 geoloc array")
        # per-cell bboxes (h-1, w-1)
        cx0 = np.minimum.reduce(
            [lon[:-1, :-1], lon[:-1, 1:], lon[1:, :-1], lon[1:, 1:]]
        )
        cx1 = np.maximum.reduce(
            [lon[:-1, :-1], lon[:-1, 1:], lon[1:, :-1], lon[1:, 1:]]
        )
        cy0 = np.minimum.reduce(
            [lat[:-1, :-1], lat[:-1, 1:], lat[1:, :-1], lat[1:, 1:]]
        )
        cy1 = np.maximum.reduce(
            [lat[:-1, :-1], lat[:-1, 1:], lat[1:, :-1], lat[1:, 1:]]
        )
        self.x_min, self.x_max = float(cx0.min()), float(cx1.max())
        self.y_min, self.y_max = float(cy0.min()), float(cy1.max())
        self.bins = bins
        self.bx = (self.x_max - self.x_min) / bins or 1.0
        self.by = (self.y_max - self.y_min) / bins or 1.0
        # bin -> flat cell ids whose bbox overlaps the bin
        buckets: dict[int, list[int]] = {}
        i0 = np.clip(((cx0 - self.x_min) / self.bx).astype(int), 0, bins - 1)
        i1 = np.clip(((cx1 - self.x_min) / self.bx).astype(int), 0, bins - 1)
        j0 = np.clip(((cy0 - self.y_min) / self.by).astype(int), 0, bins - 1)
        j1 = np.clip(((cy1 - self.y_min) / self.by).astype(int), 0, bins - 1)
        for cid in range(cx0.size):
            r, c = divmod(cid, w - 1)
            for jj in range(j0[r, c], j1[r, c] + 1):
                for ii in range(i0[r, c], i1[r, c] + 1):
                    buckets.setdefault(jj * bins + ii, []).append(cid)
        self.buckets = {
            k: np.asarray(v, dtype=np.int64) for k, v in buckets.items()
        }

    def __call__(self, x: np.ndarray, y: np.ndarray):
        fwd = self.fwd
        lon, lat = fwd.lon, fwd.lat
        h, w = lon.shape
        x = np.asarray(x, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        shape = x.shape
        xf, yf = x.ravel(), y.ravel()
        n = xf.size
        out_px = np.full(n, np.nan)
        out_py = np.full(n, np.nan)
        bi = np.clip(((xf - self.x_min) / self.bx).astype(int),
                     0, self.bins - 1)
        bj = np.clip(((yf - self.y_min) / self.by).astype(int),
                     0, self.bins - 1)
        keys = bj * self.bins + bi
        # expand (query, candidate cell) pairs bucket by bucket
        order = np.argsort(keys, kind="stable")
        ks = keys[order]
        starts = np.searchsorted(ks, np.unique(ks), side="left")
        uniq = np.unique(ks)
        ends = np.append(starts[1:], n)
        for k, a, b in zip(uniq, starts, ends):
            cells = self.buckets.get(int(k))
            if cells is None:
                continue
            qidx = order[a:b]
            Q = qidx.size
            C = cells.size
            qq = np.repeat(qidx, C)
            cc = np.tile(cells, Q)
            r, c = divmod(cc, w - 1)
            p00 = (lon[r, c], lat[r, c])
            p10 = (lon[r, c + 1], lat[r, c + 1])
            p01 = (lon[r + 1, c], lat[r + 1, c])
            p11 = (lon[r + 1, c + 1], lat[r + 1, c + 1])
            s, t = _inverse_bilinear_cell(xf[qq], yf[qq], p00, p10,
                                          p01, p11)
            eps = 1e-9
            hit = (
                (s >= -eps) & (s <= 1 + eps)
                & (t >= -eps) & (t <= 1 + eps)
                & np.isfinite(s) & np.isfinite(t)
            )
            fx = c + np.clip(s, 0.0, 1.0)
            fy = r + np.clip(t, 0.0, 1.0)
            px = fx * fwd.pixel_step + fwd.pixel_offset
            py = fy * fwd.line_step + fwd.line_offset
            # any containing cell is a valid preimage (cells of a
            # monotone geoloc field overlap only at shared edges,
            # where both solves agree; a folded field has multiple
            # true preimages and the reference also returns one
            # arbitrary branch) — plain vectorized assignment
            out_px[qq[hit]] = px[hit]
            out_py[qq[hit]] = py[hit]
        return out_px.reshape(shape), out_py.reshape(shape)
