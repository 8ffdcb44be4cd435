"""Pansharpening — GDALPansharpenOperation (weighted Brovey) analog.

Reference semantics: ``alg/gdalpansharpen.cpp`` —
* pseudo-panchromatic value per pan pixel: ``pseudo = sum_i w_i *
  MS_i`` over the spectral bands UPSAMPLED to the pan grid (default
  resampling GRIORA_Cubic, gdalpansharpen.cpp:58);
* ``factor = pan / pseudo`` (0 when pseudo == 0,
  WeightedBrovey/WeightedBroveyWithNoData gdalpansharpen.cpp:516-557);
* ``out_i = MS_i * factor`` clamped + rounded into the output type
  (GDALCopyWord: +0.5 floor for unsigned ints).

Spark shape: the MS bands exchange a 2-pixel halo once per band
(perimeter-sized shuffle via :func:`tiling.add_halo` — the cubic
kernel's support), then ONE equi-join on the tile key ships each
padded MS tile to its pan tile's task, and one Arrow-batched kernel
does upsample + combine for every band in a single pass. No
per-pixel shuffle, no driver stage; at 100 TB the plan is
(nbands + 1) co-partitioned scans + one join keyed by (tx, ty) —
broadcast-free because both sides are big, skew-free because tile
keys are uniform by construction.

Tile contract: pan tiles (z, tx, ty, w, h, data) at full resolution,
MS tiles on the SAME tile grid indices at 1/ratio resolution (pan
tile w == ms tile w * ratio), one DataFrame per band.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import raster
from . import tiling


def cubic_upsample(
    padded: np.ndarray, pad: int, ratio: int, out_w: int, out_h: int
) -> np.ndarray:
    """Catmull-Rom upsample of a pad-padded low-res tile to the pan
    grid (float, unquantized — reuses the exact GWKCubic weights in
    :func:`raster.cubic_weights`). Pan pixel center i maps to ms
    coordinate (i + 0.5) / ratio (area-preserving grid alignment,
    same convention as the warp kernels)."""
    # continuous ms coords of pan pixel centers, shifted into the
    # padded array's frame
    cx = (np.arange(out_w) + 0.5) / ratio + pad
    cy = (np.arange(out_h) + 0.5) / ratio + pad
    fx = cx - 0.5
    fy = cy - 0.5
    x0 = np.floor(fx).astype(np.int64)
    y0 = np.floor(fy).astype(np.int64)
    tx_ = fx - x0
    ty_ = fy - y0
    wx = raster.cubic_weights(tx_)
    wy = raster.cubic_weights(ty_)
    src = padded.astype(np.float64)
    out = np.zeros((out_h, out_w), dtype=np.float64)
    for j in range(4):
        row = np.zeros((out_h, out_w), dtype=np.float64)
        for i in range(4):
            row += wx[i][None, :] * src[np.ix_(y0 + j - 1, x0 + i - 1)]
        out += wy[j][:, None] * row
    return out


def weighted_brovey(
    pan: np.ndarray, ms_up: list[np.ndarray], weights: list[float]
) -> list[np.ndarray]:
    """The per-pixel combine (gdalpansharpen.cpp:516-557): factor =
    pan / (sum w_i ms_i), 0 where the pseudo-pan is 0; output rounded
    +0.5-floor and clamped to uint8 like GDALCopyWord."""
    pseudo = np.zeros_like(pan, dtype=np.float64)
    for w, m in zip(weights, ms_up):
        pseudo += w * m
    factor = np.where(pseudo != 0.0, pan / np.where(pseudo == 0, 1, pseudo), 0.0)
    return [
        np.clip(np.floor(m * factor + 0.5), 0, 255).astype(np.uint8)
        for m in ms_up
    ]


_OUT_SCHEMA = T.StructType(
    [
        T.StructField("band", T.IntegerType()),
        T.StructField("tx", T.LongType()),
        T.StructField("ty", T.LongType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("data", T.BinaryType()),
    ]
)


def pansharpen(
    pan_tiles: DataFrame,
    ms_bands: list[DataFrame],
    weights: list[float],
    ratio: int,
) -> DataFrame:
    """Distributed weighted-Brovey pansharpen.

    ``pan_tiles``: (z, tx, ty, w, h, data) full-res uint8 tiles.
    ``ms_bands``: one tile DataFrame per spectral band on the same
    (tx, ty) grid at 1/ratio resolution. Returns (band, tx, ty, w, h,
    data) sharpened uint8 tiles, one row per band per pan tile.

    Plan: per-band halo exchange (pad=2, the cubic support), then a
    single multi-way equi-join on (tx, ty) — every stage shuffles on
    the same key, so AQE coalesces them into co-located exchanges —
    and one mapInPandas combine kernel."""
    if len(ms_bands) != len(weights):
        raise ValueError("one weight per MS band required")
    nb = len(ms_bands)

    joined = pan_tiles.select(
        "tx", "ty", "w", "h", F.col("data").alias("pan")
    )
    for i, b in enumerate(ms_bands):
        hb = tiling.add_halo(b, pad=2).select(
            "tx", "ty",
            F.col("w").alias(f"mw{i}"),
            F.col("data").alias(f"ms{i}"),
        )
        joined = joined.join(hb, ["tx", "ty"])

    wts = [float(w) for w in weights]
    r = int(ratio)

    def gen(batches):
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                w_, h_ = int(row["w"]), int(row["h"])
                pan = np.frombuffer(row["pan"], np.uint8).reshape(h_, w_)
                ups = []
                for i in range(nb):
                    mw = int(row[f"mw{i}"])
                    mh_tot = len(row[f"ms{i}"]) // (mw + 4)
                    padded = np.frombuffer(
                        row[f"ms{i}"], np.uint8
                    ).reshape(mh_tot, mw + 4)
                    ups.append(
                        cubic_upsample(padded, 2, r, w_, h_)
                    )
                outs = weighted_brovey(
                    pan.astype(np.float64), ups, wts
                )
                for i, o in enumerate(outs):
                    rows.append(
                        (
                            i, int(row["tx"]), int(row["ty"]),
                            w_, h_, o.tobytes(),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=["band", "tx", "ty", "w", "h", "data"],
            )

    return joined.mapInPandas(gen, _OUT_SCHEMA)
