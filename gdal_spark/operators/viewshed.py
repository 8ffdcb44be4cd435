"""Viewshed: which cells can an observer see over a DEM?

The gdal_viewshed analog (alg/viewshed/viewshed.cpp; Wang, Robinson &
White 2000 is the reference's interpolated line-of-sight). This engine
computes the EXACT lattice viewshed instead: target cell T is visible
from observer O iff no grid cell lying exactly on the open segment
O→T subtends an elevation angle ≥ T's own. The cells on that segment
are precisely the integer multiples of T's primitive direction vector
(rx, ry)/gcd — so every cell belongs to exactly one "ray" (its
primitive direction) at step = gcd, and visibility along a ray is a
running-maximum scan ordered by step. No interpolation means the
result is bit-stable and ANSI-SQL-expressible (the driver oracle);
the deviation from the reference's edge-interpolated LOS is
documented here, not hidden.

Distributed plan (scale story):
  1. tiles → (gx, gy, val) pixel rows (pixels_df, 1→N mapInPandas);
  2. primitive direction + step via ONE vectorized Arrow pass
     (np.gcd — Spark has no gcd Column function);
  3. the elevation-angle proxy ratio = (val − z_obs) / step is
     JVM-side arithmetic. Within one ray the true tangent
     (val − z_obs) / (step · |(dx,dy)|) differs from it by the
     positive per-ray constant |(dx,dy)|, so comparisons — all the
     algorithm needs — are unchanged, and the sqrt never happens;
  4. ONE shuffle: window MAX over (PARTITION BY ray ORDER BY step,
     ROWS UNBOUNDED PRECEDING TO 1 PRECEDING). Rays are numerous
     (Θ(R²) primitive vectors) and short (≤ max(w,h) steps), so the
     partition-by-ray shuffle is balanced with no driver role; the
     per-ray sequential scan is inherent to line-of-sight.
  5. per-tile summary aggregation (groupBy tile) for compact output.

Grazing rays (equal angle) count as visible, matching the ≥ in the
reference's blocking test being strict (viewshed.cpp oIn-place
comparison: a cell blocks only if strictly higher along the LOS).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .tiling import pixels_df


def viewshed_cells(
    tiles: DataFrame,
    ox: int,
    oy: int,
    obs_height: int,
    obs_z: int | None = None,
) -> DataFrame:
    """(gx, gy, visible) for every cell except the observer's own.

    ``obs_z``: terrain elevation at the observer (read from the raster
    when None — costs a tiny filtered aggregate); eye height =
    obs_z + obs_height."""
    px = pixels_df(tiles, nonzero_only=False)
    if obs_z is None:
        obs_z = (
            px.filter((F.col("gx") == ox) & (F.col("gy") == oy))
            .agg(F.first("val"))
            .collect()[0][0]
        )
    z0 = int(obs_z) + int(obs_height)

    rel = px.filter((F.col("gx") != ox) | (F.col("gy") != oy)).select(
        "gx", "gy", "val",
        (F.col("gx") - F.lit(ox)).alias("rx"),
        (F.col("gy") - F.lit(oy)).alias("ry"),
    )

    @F.pandas_udf("long")
    def gcd_udf(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series(np.gcd(a.to_numpy(), b.to_numpy()))

    rays = rel.withColumn(
        "step", gcd_udf(F.abs("rx"), F.abs("ry"))
    ).select(
        "gx", "gy",
        (F.col("rx") / F.col("step")).cast("long").alias("dx"),
        (F.col("ry") / F.col("step")).cast("long").alias("dy"),
        "step",
        ((F.col("val") - F.lit(z0)) / F.col("step").cast("double"))
        .alias("ratio"),
    )
    w = (
        Window.partitionBy("dx", "dy")
        .orderBy("step")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev = F.max("ratio").over(w)
    return rays.select(
        "gx", "gy",
        F.when(prev.isNull() | (F.col("ratio") >= prev), F.lit(1))
        .otherwise(F.lit(0))
        .alias("visible"),
    )


def viewshed_tile_summary(
    cells: DataFrame, tile_size: int
) -> DataFrame:
    """Compact per-tile digest of a viewshed bitmap: visible-cell
    count plus a position-weighted checksum (order-free integer sum,
    so the digest is partitioning-invariant and SQL-reproducible).

    Tile ids use true floor division (``F.floor``), so negative grid
    coordinates bin into the correct tile — Spark's ``%`` takes the
    dividend's sign, which would round toward zero instead."""
    ts = int(tile_size)
    return (
        cells.select(
            F.floor(F.col("gx") / ts).cast("long").alias("tx"),
            F.floor(F.col("gy") / ts).cast("long").alias("ty"),
            "gx", "gy", "visible",
        )
        .groupBy("tx", "ty")
        .agg(
            F.sum("visible").cast("long").alias("n_visible"),
            F.sum(
                F.col("visible") * (F.col("gx") * 31 + F.col("gy") * 17)
            ).cast("long").alias("vis_cks"),
        )
    )
