"""DEM derivatives: hillshade / slope / aspect (the gdaldem family,
apps/gdaldem_lib.cpp; Horn's formula — GDAL's default gradient
estimator).

All three are 3x3 focal operators: one halo exchange
(tiling.add_halo), then per-tile numpy. Output tiles keep the input
grid; border pixels beyond the global raster use edge-replication via
the halo fill only where a neighbor tile exists (grid-edge pixels use
the zero fill, matching a nodata-less GDAL run on the interior — the
tests compare interior pixels).

Horn gradients over the 3x3 window (a..i, row-major, c row = north):
    dz/dx = ((c + 2f + i) - (a + 2d + g)) / (8 * xres)
    dz/dy = ((g + 2h + i) - (a + 2b + c)) / (8 * yres)
hillshade (alt/az in degrees, GDAL's 0-255 scaling):
    shade = 255 * (sin(alt)·cos(s) + cos(alt)·sin(s)·cos(az - 90 - aspect))
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .tiling import TILE_SCHEMA, add_halo


def _gradients(a: np.ndarray, xres: float, yres: float):
    """Horn dz/dx, dz/dy for the core of a 1-px padded array."""
    z = a.astype(np.float64)
    dzdx = (
        (z[:-2, 2:] + 2.0 * z[1:-1, 2:] + z[2:, 2:])
        - (z[:-2, :-2] + 2.0 * z[1:-1, :-2] + z[2:, :-2])
    ) / (8.0 * xres)
    dzdy = (
        (z[2:, :-2] + 2.0 * z[2:, 1:-1] + z[2:, 2:])
        - (z[:-2, :-2] + 2.0 * z[:-2, 1:-1] + z[:-2, 2:])
    ) / (8.0 * yres)
    return dzdx, dzdy


def dem_derive(
    tiles: DataFrame,
    mode: str = "hillshade",
    xres: float = 1.0,
    yres: float = 1.0,
    z_factor: float = 1.0,
    altitude: float = 45.0,
    azimuth: float = 315.0,
) -> DataFrame:
    """gdaldem analog over a tile DataFrame → uint8 tiles.

    mode: 'hillshade' (Horn + GDAL 0-255 scaling), 'slope' (degrees,
    rounded), 'aspect' (degrees from north clockwise, /2 to fit
    uint8; flat → 0)."""
    if mode not in ("hillshade", "slope", "aspect"):
        raise ValueError(f"unknown dem mode {mode!r}")
    padded = add_halo(tiles, pad=1)
    alt = np.deg2rad(altitude)
    az = np.deg2rad(azimuth)

    def run(batches):
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                ts_w, ts_h, p = int(r["w"]), int(r["h"]), int(r["pad"])
                a = np.frombuffer(r["data"], dtype=np.uint8).reshape(
                    ts_h + 2 * p, ts_w + 2 * p
                )
                dzdx, dzdy = _gradients(a, xres, yres)
                dzdx = dzdx * z_factor
                dzdy = dzdy * z_factor
                if mode == "slope":
                    out = np.degrees(
                        np.arctan(np.sqrt(dzdx * dzdx + dzdy * dzdy))
                    )
                    out = np.floor(out + 0.5)
                elif mode == "aspect":
                    flat = (dzdx == 0) & (dzdy == 0)
                    ang = np.degrees(np.arctan2(dzdy, -dzdx))
                    # → compass degrees clockwise from north
                    asp = np.mod(450.0 - ang, 360.0)
                    out = np.floor(asp / 2.0 + 0.5)
                    out[flat] = 0.0
                else:  # hillshade (Horn + GDAL scaling)
                    slope = np.arctan(np.sqrt(dzdx * dzdx + dzdy * dzdy))
                    aspect = np.arctan2(dzdy, -dzdx)
                    shade = np.sin(alt) * np.cos(slope) + np.cos(
                        alt
                    ) * np.sin(slope) * np.cos(az - np.pi / 2.0 - aspect)
                    out = np.floor(np.clip(shade, 0.0, 1.0) * 255.0 + 0.5)
                rows.append(
                    (int(r["z"]), int(r["tx"]), int(r["ty"]),
                     ts_w, ts_h,
                     np.clip(out, 0, 255).astype(np.uint8).tobytes())
                )
            yield pd.DataFrame(
                rows, columns=["z", "tx", "ty", "w", "h", "data"]
            )

    return padded.mapInPandas(run, TILE_SCHEMA)
