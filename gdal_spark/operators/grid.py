"""Grid interpolation: scattered points → per-cell values.

The Spark rendering of GDAL's gridding engine (alg/gdalgrid.cpp): IDW
(inverse distance weighting, :109), moving average (:629), and the
data metrics family (:1033+, covered by the sp_grid_metrics query).
GDAL answers each output pixel with a quadtree radius search; the
engine inverts the data flow — each point SCATTERS its contribution to
the target cells within the search radius (a JVM-side neighbor-offset
explode), then one groupBy(cell) reduces the weighted sums. No
per-pixel search structure, no Python in the plan, shuffle volume =
points x (2r+1)^2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..cells import _IX_SHIFT, _RES_SHIFT


def _cell_parts(lon_col, lat_col, res: int):
    n = 1 << res
    ix = F.least(
        F.greatest(F.floor((lon_col + 180.0) / 360.0 * n), F.lit(0)),
        F.lit(n - 1),
    ).cast("long")
    iy = F.least(
        F.greatest(F.floor((lat_col + 90.0) / 180.0 * n), F.lit(0)),
        F.lit(n - 1),
    ).cast("long")
    return ix, iy


def idw_grid(
    points: DataFrame,
    res: int,
    z_col: str = "z",
    lon_col: str = "lon",
    lat_col: str = "lat",
    radius_cells: int = 1,
    power: int = 2,
    smoothing: float = 1e-9,
) -> DataFrame:
    """IDW value per touched cell from points within ``radius_cells``
    Chebyshev rings (GDALGridInverseDistanceToAPower semantics,
    radius-bounded; alg/gdalgrid.cpp:109).

    Output: (cell_ix, cell_iy, n_points, idw) — idw = Σz/dᵖ / Σ1/dᵖ
    with d = distance from the point to the TARGET cell's center
    (+smoothing to keep a point exactly on a center finite).

    Plan: point → explode (2r+1)² neighbor offsets (JVM) → weight
    arithmetic (codegen) → groupBy(cell).agg(sum, sum, count) with
    map-side combine. Cells with no point in range simply don't
    appear (GDAL writes nodata there).
    """
    n = 1 << res
    r = radius_cells
    ix, iy = _cell_parts(F.col(lon_col), F.col(lat_col), res)
    offs = F.expr(
        f"flatten(transform(sequence({-r}, {r}), dx -> "
        f"transform(sequence({-r}, {r}), dy -> struct(dx, dy))))"
    )
    pts = (
        points.withColumn("__ix", ix)
        .withColumn("__iy", iy)
        .withColumn("__o", F.explode(offs))
        .withColumn("cell_ix", F.col("__ix") + F.col("__o.dx"))
        .withColumn("cell_iy", F.col("__iy") + F.col("__o.dy"))
        .filter(
            (F.col("cell_ix") >= 0) & (F.col("cell_ix") < n)
            & (F.col("cell_iy") >= 0) & (F.col("cell_iy") < n)
        )
    )
    cx = (F.col("cell_ix") + 0.5) / n * 360.0 - 180.0
    cy = (F.col("cell_iy") + 0.5) / n * 180.0 - 90.0
    dx = F.col(lon_col) - cx
    dy = F.col(lat_col) - cy
    d2 = dx * dx + dy * dy + F.lit(smoothing)
    w = F.lit(1.0) / F.pow(d2, F.lit(power / 2.0))
    return (
        pts.withColumn("__w", w)
        .groupBy("cell_ix", "cell_iy")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            (F.sum(F.col(z_col) * F.col("__w")) / F.sum("__w")).alias("idw"),
        )
    )


def idw_grid_quantized(
    points: DataFrame,
    res: int,
    z_col: str = "z",
    lon_col: str = "lon",
    lat_col: str = "lat",
    radius_cells: int = 1,
) -> DataFrame:
    """IDW with INTEGER-quantized weights — the oracle-exact gate
    variant of idw_grid (same scatter plan; alg/gdalgrid.cpp:109).

    Float Σw / Σzw are aggregation-order-dependent, so this variant
    quantizes per-point: d2q = floor(d2·1e6)+1, w = 1e12 DIV d2q, and
    reduces in pure integers; the output millis come from the exact
    long-division split q·1000 + (rem·1000) DIV Σw. Bit-reproducible
    under ANY aggregation order/partitioning — the float variant is
    the throughput path, this one the verification path.

    Output: (cell_ix, cell_iy, n_points, idw_m3)."""
    n = 1 << res
    r = radius_cells
    ix, iy = _cell_parts(F.col(lon_col), F.col(lat_col), res)
    offs = F.expr(
        f"flatten(transform(sequence({-r}, {r}), dx -> "
        f"transform(sequence({-r}, {r}), dy -> struct(dx, dy))))"
    )
    pts = (
        points.withColumn("__ix", ix)
        .withColumn("__iy", iy)
        .withColumn("__o", F.explode(offs))
        .withColumn("cell_ix", F.col("__ix") + F.col("__o.dx"))
        .withColumn("cell_iy", F.col("__iy") + F.col("__o.dy"))
        .filter(
            (F.col("cell_ix") >= 0) & (F.col("cell_ix") < n)
            & (F.col("cell_iy") >= 0) & (F.col("cell_iy") < n)
        )
    )
    cx = (F.col("cell_ix") + 0.5) / n * 360.0 - 180.0
    cy = (F.col("cell_iy") + 0.5) / n * 180.0 - 90.0
    dx = F.col(lon_col) - cx
    dy = F.col(lat_col) - cy
    d2 = dx * dx + dy * dy
    d2q = F.floor(d2 * 1000000.0).cast("long") + 1
    agg = (
        pts.withColumn("__d2q", d2q)
        .withColumn("__w", F.expr("1000000000000 DIV __d2q"))
        .withColumn("__zw", F.col(z_col) * F.col("__w"))
        .groupBy("cell_ix", "cell_iy")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.sum("__w").alias("__sw"),
            F.sum("__zw").alias("__szw"),
        )
    )
    return agg.select(
        "cell_ix", "cell_iy", "n_points",
        F.expr(
            "(__szw DIV __sw) * 1000 + ((__szw % __sw) * 1000) DIV __sw"
        ).alias("idw_m3"),
    )


def moving_average_grid(
    points: DataFrame,
    res: int,
    z_col: str = "z",
    lon_col: str = "lon",
    lat_col: str = "lat",
    radius_cells: int = 1,
) -> DataFrame:
    """Moving-average gridding (alg/gdalgrid.cpp:629): plain mean of
    all points within the ring window of each cell. Same scatter plan
    as IDW with unit weights."""
    n = 1 << res
    r = radius_cells
    ix, iy = _cell_parts(F.col(lon_col), F.col(lat_col), res)
    offs = F.expr(
        f"flatten(transform(sequence({-r}, {r}), dx -> "
        f"transform(sequence({-r}, {r}), dy -> struct(dx, dy))))"
    )
    pts = (
        points.withColumn("__ix", ix)
        .withColumn("__iy", iy)
        .withColumn("__o", F.explode(offs))
        .withColumn("cell_ix", F.col("__ix") + F.col("__o.dx"))
        .withColumn("cell_iy", F.col("__iy") + F.col("__o.dy"))
        .filter(
            (F.col("cell_ix") >= 0) & (F.col("cell_ix") < n)
            & (F.col("cell_iy") >= 0) & (F.col("cell_iy") < n)
        )
    )
    return pts.groupBy("cell_ix", "cell_iy").agg(
        F.count(F.lit(1)).alias("n_points"),
        F.avg(F.col(z_col)).alias("avg_z"),
    )


# ---------------------------------------------------------------------------
# linear (Delaunay/TIN) interpolation — alg/gdalgrid.cpp:2459 GDALGridLinear,
# triangulation alg/delaunay.c. GDAL loads the WHOLE point set in memory and
# triangulates once; the engine keeps that split: triangulation is a
# driver-side numpy step over the (small) scattered point set, the per-pixel
# barycentric interpolation is fully distributed over the (huge) raster.
# ---------------------------------------------------------------------------

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402


def _in_circumcircle(a, b, c, px, py) -> bool:
    ax, ay = a[0] - px, a[1] - py
    bx, by = b[0] - px, b[1] - py
    cx, cy = c[0] - px, c[1] - py
    d = (
        (ax * ax + ay * ay) * (bx * cy - cx * by)
        - (bx * bx + by * by) * (ax * cy - cx * ay)
        + (cx * cx + cy * cy) * (ax * by - bx * ay)
    )
    orient = (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])
    return d * (1.0 if orient > 0 else -1.0) > 0


def delaunay_triangulate(pts: np.ndarray) -> list[tuple[int, int, int]]:
    """Bowyer-Watson incremental Delaunay triangulation (the qhull /
    alg/delaunay.c role, reimplemented from the textbook algorithm).
    Deterministic for a fixed point order; returns CCW-oriented vertex
    index triples sorted canonically. O(n²) — intended for the
    in-memory scattered point set, not raster-sized data."""
    pts = np.asarray(pts, dtype=np.float64)
    n = len(pts)
    cx, cy = float(pts[:, 0].mean()), float(pts[:, 1].mean())
    span = float(max(np.ptp(pts[:, 0]), np.ptp(pts[:, 1]))) * 16 + 1.0
    allp = np.vstack([
        pts,
        [[cx - 8 * span, cy - span], [cx + 8 * span, cy - span],
         [cx, cy + 8 * span]],
    ])
    tris: list[tuple[int, int, int]] = [(n, n + 1, n + 2)]
    for i in range(n):
        px, py = float(allp[i, 0]), float(allp[i, 1])
        bad = [
            t for t in tris
            if _in_circumcircle(allp[t[0]], allp[t[1]], allp[t[2]], px, py)
        ]
        edge_cnt: dict[tuple[int, int], int] = {}
        edge_dir: dict[tuple[int, int], tuple[int, int]] = {}
        for t in bad:
            for e in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
                k = (min(e), max(e))
                edge_cnt[k] = edge_cnt.get(k, 0) + 1
                edge_dir[k] = e
        for t in bad:
            tris.remove(t)
        for k, cnt in edge_cnt.items():
            if cnt == 1:
                a, b = edge_dir[k]  # keep boundary orientation → CCW
                tris.append((a, b, i))
    out = []
    for t in tris:
        if max(t) >= n:
            continue
        a, b, c = t
        orient = (
            (allp[b][0] - allp[a][0]) * (allp[c][1] - allp[a][1])
            - (allp[b][1] - allp[a][1]) * (allp[c][0] - allp[a][0])
        )
        if orient < 0:
            b, c = c, b
        lo = min(a, b, c)
        while a != lo:  # rotate so the smallest index leads (canonical)
            a, b, c = b, c, a
        out.append((a, b, c))
    out.sort()
    return out


def tin_grid(
    spark,
    pts_xyz: pd.DataFrame,
    width: int,
    height: int,
    x0: float,
    y0: float,
    step: float,
    n_partitions: int = 32,
):
    """Linear (TIN) gridding: Delaunay-triangulate the point set
    driver-side, broadcast the triangle list, barycentric-interpolate
    every pixel center distributively (GDALGridLinear semantics,
    alg/gdalgrid.cpp:2459). Pixels outside the hull emit nothing
    (GDAL nodata). On shared edges the lowest triangle id wins.

    Output: (gx, gy, z_q3 = floor(z * 1000 + 0.5))."""
    from pyspark.sql import functions as F  # noqa: F401

    P = pts_xyz[["x", "y"]].to_numpy(dtype=np.float64)
    Z = pts_xyz["z"].to_numpy(dtype=np.float64)
    tris = delaunay_triangulate(P)
    tri_arr = np.array(
        [
            [P[a][0], P[a][1], Z[a], P[b][0], P[b][1], Z[b],
             P[c][0], P[c][1], Z[c]]
            for a, b, c in tris
        ],
        dtype=np.float64,
    )
    # bucket triangles by a coarse pixel-cell grid (driver-side bbox
    # cover — triangles ≪ raster): per-pixel work is then O(triangles
    # overlapping its cell), not O(all triangles) — the quadtree role
    # of the reference's per-pixel search, precomputed once
    bucket = 32  # pixels per bucket side
    nbx = (width + bucket - 1) // bucket
    nby = (height + bucket - 1) // bucket
    cell_tris: dict[int, list] = {}
    if len(tri_arr):
        xs = tri_arr[:, [0, 3, 6]]
        ys = tri_arr[:, [1, 4, 7]]
        for tid in range(len(tri_arr)):
            bx0 = int((xs[tid].min() - x0) / step) // bucket
            bx1 = int((xs[tid].max() - x0) / step) // bucket
            by0 = int((ys[tid].min() - y0) / step) // bucket
            by1 = int((ys[tid].max() - y0) / step) // bucket
            for byi in range(max(by0, 0), min(by1, nby - 1) + 1):
                for bxi in range(max(bx0, 0), min(bx1, nbx - 1) + 1):
                    cell_tris.setdefault(byi * nbx + bxi, []).append(tid)
    bc = spark.sparkContext.broadcast((tri_arr, cell_tris))

    def run(batches):
        T, buckets = bc.value
        for pdf in batches:
            ids = pdf["id"].to_numpy(dtype=np.int64)
            gx = ids % width
            gy = ids // width
            px = x0 + (gx + 0.5) * step
            py = y0 + (gy + 0.5) * step
            assigned = np.full(len(ids), -1, dtype=np.int64)
            zout = np.zeros(len(ids), dtype=np.float64)
            cell = (gy // bucket) * nbx + (gx // bucket)
            for c in np.unique(cell):
                tids = buckets.get(int(c))
                if not tids:
                    continue
                sel = np.nonzero(cell == c)[0]
                pxs, pys = px[sel], py[sel]
                done = np.zeros(len(sel), dtype=bool)
                for tid in tids:
                    ax, ay, az, bx, by, bz, cx, cy, cz = T[tid]
                    det = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
                    wa = ((by - cy) * (pxs - cx)
                          + (cx - bx) * (pys - cy)) / det
                    wb = ((cy - ay) * (pxs - cx)
                          + (ax - cx) * (pys - cy)) / det
                    m = (~done) & (wa >= 0) & (wb >= 0) & (wa + wb <= 1)
                    if not m.any():
                        continue
                    z = (
                        wa[m] * az + wb[m] * bz
                        + (1.0 - wa[m] - wb[m]) * cz
                    )
                    idxs = sel[m]
                    zout[idxs] = z
                    assigned[idxs] = tid
                    done |= m
            got = assigned >= 0
            yield pd.DataFrame({
                "gx": gx[got], "gy": gy[got],
                "z_q3": np.floor(zout[got] * 1000.0 + 0.5).astype(np.int64),
            })

    rng = spark.range(0, width * height, 1, n_partitions)
    return rng.mapInPandas(run, "gx long, gy long, z_q3 long")
