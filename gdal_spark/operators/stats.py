"""Band statistics + histogram — the GDALRasterBand::ComputeStatistics
(gcore/gdalrasterband.cpp:6478) and GetHistogram (:4133) analogs.

Both are single-pass reductions over tile pixels: a mapInPandas pass
emits one partial row per (tile, bucket) — numpy bincount inside the
tile, so the shuffle carries O(tiles x buckets) rows, never pixels —
and a groupBy(bucket) combines. Bucket index = floor((v - min) *
nBuckets / (max - min)) exactly as the reference
(gdalrasterband.cpp:4183 dfScale), out-of-range handling per
bIncludeOutOfRange (drop, the default).

min/max/mean/stddev come free from the same partials: the per-bucket
(cnt, sum, sumsq, min, max) rows aggregate to the band-wide exact
moments (integer pixels ⇒ exact integer sums, no Welford needed).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def band_histogram(
    tiles: DataFrame,
    vmin: float,
    vmax: float,
    buckets: int,
    include_out_of_range: bool = False,
) -> DataFrame:
    """Per-bucket histogram + moment partials:
    (bucket, cnt, sum_v, sumsq_v, min_v, max_v), bucket ascending.

    ``include_out_of_range`` clamps under/overflow into the first and
    last bucket (GetHistogram's bIncludeOutOfRange); the default drops
    them (gdalrasterband.cpp:4255 region)."""
    scale = buckets / (vmax - vmin)

    def run(batches):
        for pdf in batches:
            parts: dict[int, list] = {}
            for _, r in pdf.iterrows():
                a = np.frombuffer(r["data"], dtype=np.uint8).astype(
                    np.int64
                )
                idx = np.floor((a - vmin) * scale).astype(np.int64)
                if include_out_of_range:
                    np.clip(idx, 0, buckets - 1, out=idx)
                    keep = np.ones(len(a), dtype=bool)
                else:
                    keep = (idx >= 0) & (idx < buckets)
                idx, v = idx[keep], a[keep]
                for b in np.unique(idx):
                    m = idx == b
                    vb = v[m]
                    row = parts.setdefault(
                        int(b), [0, 0, 0, int(vb[0]), int(vb[0])]
                    )
                    row[0] += int(m.sum())
                    row[1] += int(vb.sum())
                    row[2] += int((vb * vb).sum())
                    row[3] = min(row[3], int(vb.min()))
                    row[4] = max(row[4], int(vb.max()))
            yield pd.DataFrame(
                [(b, *vals) for b, vals in parts.items()],
                columns=["bucket", "cnt", "sum_v", "sumsq_v",
                         "min_v", "max_v"],
            )

    partials = tiles.mapInPandas(
        run,
        "bucket long, cnt long, sum_v long, sumsq_v long, "
        "min_v long, max_v long",
    )
    return (
        partials.groupBy("bucket")
        .agg(
            F.sum("cnt").alias("cnt"),
            F.sum("sum_v").alias("sum_v"),
            F.sum("sumsq_v").alias("sumsq_v"),
            F.min("min_v").alias("min_v"),
            F.max("max_v").alias("max_v"),
        )
        .orderBy("bucket")
    )


def band_statistics(tiles: DataFrame) -> DataFrame:
    """Exact band-wide (min, max, mean, stddev, cnt) — the
    ComputeStatistics(bApproxOK=false) analog; population stddev as
    the reference computes it (sumsq/n − mean², gdalrasterband.cpp
    statistics accumulators)."""
    hist = band_histogram(tiles, 0.0, 256.0, 1, include_out_of_range=True)
    return hist.select(
        F.col("min_v").alias("min_v"),
        F.col("max_v").alias("max_v"),
        (F.col("sum_v") / F.col("cnt")).alias("mean_v"),
        F.sqrt(
            F.col("sumsq_v") / F.col("cnt")
            - (F.col("sum_v") / F.col("cnt")) ** 2
        ).alias("stddev_v"),
        F.col("cnt").alias("cnt"),
    )


_PRIMES = np.array([7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43], dtype=np.int64)


def checksum_image(
    tiles: DataFrame,
    x_off: int = 0,
    y_off: int = 0,
    x_size: int | None = None,
    y_size: int | None = None,
    tile_size: int = 64,
) -> DataFrame:
    """GDALChecksumImage analog (alg/gdalchecksum.cpp:48-230): each
    pixel of the window contributes ``value % primes[i % 11]`` where
    ``i`` is the pixel's row-major linear index within the window and
    the primes cycle {7,11,...,43}; the sum is masked to 16 bits.

    This is the checksum the reference's ENTIRE autotest suite pins
    rasters with (autotest/.../checksum uses), so matching it exactly
    is the strongest cross-implementation parity primitive available.

    Spark shape: the prime index is a pure function of the pixel's
    GLOBAL coordinates (i = (gy - y_off) * x_size + (gx - x_off)), so
    each tile computes its partial independently of visit order and
    one sum() reduces them — checksum addition commutes, the
    distributed result is BIT-identical to the reference's sequential
    scan. Returns a 1-row DataFrame (checksum int).

    Tiles: (tx, ty, w, h, data) uint8 on a ``tile_size`` grid.
    Window defaults to the full grid extent.
    """
    if x_size is None or y_size is None:
        raise ValueError("x_size and y_size are required")

    def run(batches):
        for pdf in batches:
            parts = []
            for tx, ty, w, h, data in zip(
                pdf["tx"], pdf["ty"], pdf["w"], pdf["h"], pdf["data"]
            ):
                w, h = int(w), int(h)
                arr = np.frombuffer(data, np.uint8)[: w * h].reshape(h, w)
                gx0, gy0 = int(tx) * tile_size, int(ty) * tile_size
                # clip tile to the checksum window
                cx0 = max(gx0, x_off)
                cy0 = max(gy0, y_off)
                cx1 = min(gx0 + w, x_off + x_size)
                cy1 = min(gy0 + h, y_off + y_size)
                if cx0 >= cx1 or cy0 >= cy1:
                    continue
                sub = arr[cy0 - gy0 : cy1 - gy0, cx0 - gx0 : cx1 - gx0]
                lin = (
                    (cy0 - y_off + np.arange(sub.shape[0])[:, None])
                    * x_size
                    + (cx0 - x_off + np.arange(sub.shape[1])[None, :])
                )
                parts.append(
                    int((sub.astype(np.int64) % _PRIMES[lin % 11]).sum())
                )
            yield pd.DataFrame({"partial": parts or [0]})

    partials = tiles.mapInPandas(run, "partial long")
    return partials.agg(
        (F.sum("partial") % F.lit(65536)).cast("int").alias("checksum")
    )
