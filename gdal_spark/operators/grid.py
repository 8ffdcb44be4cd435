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
