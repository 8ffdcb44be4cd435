"""Fill nodata regions by interpolation from the edges — the
GDALFillNodata analog (alg/rasterfill.cpp:348-394: "for each pixel a
four direction conic search is done to find values to interpolate
from (using inverse distance weighting)", then optional 3x3 smoothing
passes over the interpolated pixels, :60-119).

Semantics here are the EXACT form of that search: for every nodata
pixel, the euclidean-nearest valid pixel in each of the four
quadrants (dx<=0/dy<=0, dx>0/dy<=0, dx<=0/dy>0, dx>0/dy>0) within
``max_dist``, combined with weights 1/d. The reference approximates
the same conic search with a two-pass scanline propagation
(rasterfill.cpp:801-848 QUAD_CHECK) whose hit set can differ near
quadrant borders; the exact arg-min is deterministic, order-free and
SQL-expressible, which is what a distributed engine wants.

Distribution: one halo exchange of width ``max_dist + smoothing``
(shuffle volume = perimeter x pad), then per-tile vectorized numpy —
each quadrant's candidate offsets are visited nearest-first and the
first hit freezes (one shifted-slice op per offset, no per-pixel
loop). Ties on distance break lexicographically by (dy, dx), matching
the oracle's ORDER BY.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from .tiling import add_halo

FILLED_TILE_SCHEMA = T.StructType(
    [
        T.StructField("z", T.IntegerType()),
        T.StructField("tx", T.LongType()),
        T.StructField("ty", T.LongType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("data", T.BinaryType()),  # float64 filled values
        T.StructField("filled", T.BinaryType()),  # uint8 1 = was nodata,
        # got a value this pass
    ]
)


def _quadrant_offsets(max_dist: float) -> list[list[tuple]]:
    """Per-quadrant (dy, dx, d) lists sorted nearest-first with the
    (d², dy, dx) tie-break. Quadrants partition the 8 compass cones of
    the reference's conic search into 4 (axes attach to the <=0
    side)."""
    quads: list[list[tuple]] = [[], [], [], []]
    r = int(np.floor(max_dist))
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            if dx == 0 and dy == 0:
                continue
            d2 = dx * dx + dy * dy
            if d2 > max_dist * max_dist:
                continue
            q = (1 if dx > 0 else 0) + (2 if dy > 0 else 0)
            quads[q].append((d2, dy, dx))
    for q in quads:
        q.sort()
    return [[(dy, dx, float(np.sqrt(d2))) for d2, dy, dx in q]
            for q in quads]


def _fill_core(
    a: np.ndarray, nodata: int, p: int, offsets: list[list[tuple]]
) -> tuple[np.ndarray, np.ndarray]:
    """One padded tile → (filled float64 core, filled-mask core).

    Out-of-raster halo pixels arrive as the add_halo fill value, which
    callers set to ``nodata`` — outside pixels never contribute,
    matching the reference (mask band zero ⇒ unavailable)."""
    h, w = a.shape[0] - 2 * p, a.shape[1] - 2 * p
    core = a[p: p + h, p: p + w]
    hole = core == nodata
    # per-quadrant nearest valid: value & distance, frozen at first hit
    num = np.zeros((h, w), dtype=np.float64)
    den = np.zeros((h, w), dtype=np.float64)
    got_any = np.zeros((h, w), dtype=bool)
    for quad in offsets:
        qval = np.zeros((h, w), dtype=np.float64)
        qd = np.full((h, w), np.inf)
        open_ = hole.copy()
        for dy, dx, d in quad:
            if not open_.any():
                break
            nb = a[p + dy: p + dy + h, p + dx: p + dx + w]
            hit = open_ & (nb != nodata)
            if hit.any():
                qval[hit] = nb[hit]
                qd[hit] = d
                open_[hit] = False
        # fixed summation order (quadrant 0,1,2,3) and the same v/d,
        # 1/d division forms keep the float result bit-identical to
        # the oracle's explicit 4-term sum (v*(1/d) rounds differently)
        num += qval / qd
        den += 1.0 / qd
        got_any |= np.isfinite(qd)
    out = core.astype(np.float64)
    filled = hole & got_any
    out[filled] = num[filled] / den[filled]
    return out, filled


def fill_nodata(
    tiles: DataFrame,
    nodata: int = 0,
    max_dist: float = 8.0,
    smoothing: int = 0,
) -> DataFrame:
    """GDALFillNodata analog over a tile DataFrame → FILLED_TILE_SCHEMA
    (float64 ``data`` + uint8 ``filled`` mask of interpolated pixels).

    ``smoothing`` 3x3-average passes run over the interpolated pixels
    only (rasterfill.cpp:60-119), each as one more 1-px halo exchange
    on the float tiles — pad stays bounded by ``max_dist + smoothing``
    and must fit the tile size (enforced by add_halo's contract that
    halos come from the 8 adjacent tiles only)."""
    r = int(np.floor(max_dist))
    offsets = _quadrant_offsets(max_dist)
    padded = add_halo(tiles, pad=r, fill=nodata)

    def run(batches):
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                ts_w, ts_h, p = int(row["w"]), int(row["h"]), int(row["pad"])
                a = np.frombuffer(row["data"], dtype=np.uint8).reshape(
                    ts_h + 2 * p, ts_w + 2 * p
                )
                out, filled = _fill_core(a, nodata, p, offsets)
                rows.append(
                    (int(row["z"]), int(row["tx"]), int(row["ty"]),
                     ts_w, ts_h, out.tobytes(),
                     filled.astype(np.uint8).tobytes())
                )
            yield pd.DataFrame(
                rows,
                columns=["z", "tx", "ty", "w", "h", "data", "filled"],
            )

    cur = padded.mapInPandas(run, FILLED_TILE_SCHEMA)
    for _ in range(smoothing):
        cur = _smooth_pass(cur)
    return cur


def _smooth_pass(filled_tiles: DataFrame) -> DataFrame:
    """One 3x3-average smoothing pass over interpolated pixels
    (rasterfill.cpp:60-119: plain average of the available 3x3
    window, applied only where the fill mask is set)."""
    spark = filled_tiles.sparkSession  # noqa: F841 (symmetry w/ add_halo)
    # halo both planes: pack value+mask into one float64 stream so a
    # single exchange suffices (mask rides as value's companion tile)
    pair = filled_tiles.select(
        "z", "tx", "ty", "w", "h", "data", "filled"
    )

    def explode_planes(batches):
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                rows.append((0, int(r["z"]), int(r["tx"]), int(r["ty"]),
                             int(r["w"]), int(r["h"]), r["data"]))
                rows.append((1, int(r["z"]), int(r["tx"]), int(r["ty"]),
                             int(r["w"]), int(r["h"]),
                             np.frombuffer(r["filled"], dtype=np.uint8)
                             .astype(np.float64).tobytes()))
            yield pd.DataFrame(
                rows, columns=["plane", "z", "tx", "ty", "w", "h", "data"]
            )

    planes = pair.mapInPandas(
        explode_planes,
        "plane int, z int, tx long, ty long, w int, h int, data binary",
    )
    # ride the existing generic halo by folding plane into z (tiles of
    # different planes never neighbor: z differs)
    from pyspark.sql import functions as F

    tagged = planes.select(
        (F.col("z") * 2 + F.col("plane")).alias("z"),
        "tx", "ty", "w", "h", "data",
    )
    padded = add_halo(tagged, pad=1, fill=0, dtype="float64")

    def smooth(key, pdf: pd.DataFrame) -> pd.DataFrame:
        # key = (tx, ty, true z); two rows: plane 0 value, plane 1 mask
        pdf = pdf.sort_values("z")
        if len(pdf) != 2:
            return pd.DataFrame(
                columns=["z", "tx", "ty", "w", "h", "data", "filled"]
            )
        v_r, m_r = pdf.iloc[0], pdf.iloc[1]
        p = int(v_r["pad"])
        h, w = int(v_r["h"]), int(v_r["w"])
        val = np.frombuffer(v_r["data"], dtype=np.float64).reshape(
            h + 2 * p, w + 2 * p
        )
        msk = np.frombuffer(m_r["data"], dtype=np.float64).reshape(
            h + 2 * p, w + 2 * p
        ) > 0.5
        acc = np.zeros((h, w), dtype=np.float64)
        cnt = np.zeros((h, w), dtype=np.float64)
        # every in-raster 3x3 member counts; halo-fill zeros at the
        # raster edge are indistinguishable from value 0 — callers
        # smooth only rasters whose edge tiles are interior-valid
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                acc += val[p + dy: p + dy + h, p + dx: p + dx + w]
                cnt += 1.0
        out = val[p: p + h, p: p + w].copy()
        core_m = msk[p: p + h, p: p + w]
        out[core_m] = (acc / cnt)[core_m]
        return pd.DataFrame(
            [(int(v_r["z"]) // 2, int(v_r["tx"]), int(v_r["ty"]),
              w, h, out.tobytes(),
              core_m.astype(np.uint8).tobytes())],
            columns=["z", "tx", "ty", "w", "h", "data", "filled"],
        )

    from pyspark.sql import functions as F  # noqa: F811

    return (
        padded.withColumn("zz", (F.col("z") / 2).cast("int"))
        .groupBy("tx", "ty", "zz")
        .applyInPandas(smooth, FILLED_TILE_SCHEMA)
    )
