"""Approximate transformer — GDALApproxTransform analog.

Reference semantics: ``alg/gdaltransformer.cpp:3935-4190`` — for a
scanline of points (constant y, monotone x, the shape warp kernels
produce), transform the two ENDPOINTS and the MIDDLE exactly; if the
middle's linear-interpolation error (MANHATTAN distance in output
units, :3953) is within ``max_error`` (gdalwarp's default 0.125 px,
apps/gdalwarp_lib.cpp:1569-1576), linearly interpolate every point
between the endpoints; otherwise subdivide and recurse. The payoff is
for EXPENSIVE base transforms (TPS with many control points, RPC,
geodesic pipelines): exact evaluations drop from O(width) to
O(subdivisions) per row.

Implementation is breadth-first and fully vectorized: each recursion
level gathers every still-unresolved segment's midpoint across ALL
rows into ONE base-transform call, so a whole warp block costs
O(log width) batched calls instead of per-segment recursion — the
Spark-friendly rendering of the reference's per-scanline recursion
(same accept test, same subdivision rule).

Wraps any picklable ``(x, y) -> (X, Y)`` callable and is itself one,
so it composes with ``warp_affine(transform=...)``, ``compose``, and
every fitted transform in this package. ``max_error=0`` degenerates
to the exact transform (every segment subdivides to leaves).
"""

from __future__ import annotations

import numpy as np


class ApproxTransform:
    """Picklable adaptive-linear wrapper around a base transform."""

    def __init__(self, base, max_error: float = 0.125):
        self.base = base
        self.max_error = float(max_error)
        #: exact-evaluation counter (diagnostics; reset per call)
        self.last_exact_evals = 0

    def __call__(self, x: np.ndarray, y: np.ndarray):
        x = np.asarray(x, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        shape = x.shape
        if x.ndim == 1:
            xs, ys = x[None, :], y[None, :]
        else:
            xs, ys = x.reshape(-1, x.shape[-1]), y.reshape(-1, y.shape[-1])
        n_rows, width = xs.shape
        out_x = np.empty_like(xs)
        out_y = np.empty_like(ys)
        self.last_exact_evals = 0

        if width <= 4 or self.max_error <= 0.0:
            ox, oy = self.base(xs, ys)
            self.last_exact_evals = xs.size
            return ox.reshape(shape), oy.reshape(shape)

        def exact(cols_r, cols_c):
            self.last_exact_evals += len(cols_r)
            return self.base(xs[cols_r, cols_c], ys[cols_r, cols_c])

        # seed: endpoints of every row
        r0 = np.arange(n_rows)
        ex0, ey0 = exact(r0, np.zeros(n_rows, dtype=np.int64))
        ex1, ey1 = exact(r0, np.full(n_rows, width - 1, dtype=np.int64))
        out_x[:, 0], out_y[:, 0] = ex0, ey0
        out_x[:, -1], out_y[:, -1] = ex1, ey1

        # active segments: (row, i0, i1) with transformed endpoints
        seg_r = r0
        seg_a = np.zeros(n_rows, dtype=np.int64)
        seg_b = np.full(n_rows, width - 1, dtype=np.int64)
        sax, say, sbx, sby = ex0, ey0, ex1, ey1

        while seg_r.size:
            mid = (seg_a + seg_b) // 2
            mx, my = exact(seg_r, mid)
            out_x[seg_r, mid] = mx
            out_y[seg_r, mid] = my
            # linear prediction of the middle from the endpoints
            # (parametrized by source x, like the reference :4105)
            t = (
                (xs[seg_r, mid] - xs[seg_r, seg_a])
                / (xs[seg_r, seg_b] - xs[seg_r, seg_a])
            )
            err = (
                np.abs(sax + (sbx - sax) * t - mx)
                + np.abs(say + (sby - say) * t - my)
            )
            ok = err <= self.max_error
            # resolved segments: lerp their interiors (both halves)
            for rr, a, b, ax_, ay_, bx_, by_ in zip(
                seg_r[ok], seg_a[ok], seg_b[ok],
                sax[ok], say[ok], sbx[ok], sby[ok],
            ):
                cols = np.arange(a + 1, b)
                tt = (xs[rr, cols] - xs[rr, a]) / (xs[rr, b] - xs[rr, a])
                out_x[rr, cols] = ax_ + (bx_ - ax_) * tt
                out_y[rr, cols] = ay_ + (by_ - ay_) * tt
            # unresolved: split into two halves around the (now
            # exact) middle; degenerate halves (no interior) retire
            bad = ~ok
            nr = seg_r[bad]
            na, nb = seg_a[bad], seg_b[bad]
            nm = mid[bad]
            nmx, nmy = mx[bad], my[bad]
            halves = []
            for a_, b_, ex_, ey_, fx_, fy_ in (
                (na, nm, sax[bad], say[bad], nmx, nmy),
                (nm, nb, nmx, nmy, sbx[bad], sby[bad]),
            ):
                keep = (b_ - a_) > 1
                halves.append(
                    (nr[keep], a_[keep], b_[keep],
                     ex_[keep], ey_[keep], fx_[keep], fy_[keep])
                )
            seg_r = np.concatenate([h[0] for h in halves])
            seg_a = np.concatenate([h[1] for h in halves])
            seg_b = np.concatenate([h[2] for h in halves])
            sax = np.concatenate([h[3] for h in halves])
            say = np.concatenate([h[4] for h in halves])
            sbx = np.concatenate([h[5] for h in halves])
            sby = np.concatenate([h[6] for h in halves])

        return out_x.reshape(shape), out_y.reshape(shape)
