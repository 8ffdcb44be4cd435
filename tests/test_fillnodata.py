"""GDALFillNodata analog: distributed quadrant-IDW fill must equal a
brute-force whole-array oracle (exact nearest-per-quadrant search)."""

import numpy as np
import pandas as pd
import pytest

from gdal_spark.operators import fillnodata as fnd


def _tiles_from(spark, full, ts):
    h, w = full.shape
    rows = [
        (0, tx, ty, ts, ts,
         full[ty * ts:(ty + 1) * ts, tx * ts:(tx + 1) * ts]
         .astype(np.uint8).tobytes())
        for ty in range(h // ts) for tx in range(w // ts)
    ]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["z", "tx", "ty", "w", "h", "data"])
    )


def _brute_fill(full, nodata, max_dist):
    """Per-hole exact search over the WHOLE array (no tiling)."""
    h, w = full.shape
    out = full.astype(np.float64)
    filled = np.zeros((h, w), dtype=bool)
    ys, xs = np.nonzero(full == nodata)
    vys, vxs = np.nonzero(full != nodata)
    for y, x in zip(ys, xs):
        dy = vys - y
        dx = vxs - x
        d2 = dy * dy + dx * dx
        ok = d2 <= max_dist * max_dist
        num = den = 0.0
        got = False
        for q in range(4):  # fixed quadrant order = engine order
            qm = ok & ((dx > 0) == bool(q & 1)) & ((dy > 0) == bool(q & 2))
            if not qm.any():
                continue
            cand = np.lexsort(
                (dx[qm], dy[qm], d2[qm])
            )[0]
            d = np.sqrt(d2[qm][cand])
            num += full[vys[qm][cand], vxs[qm][cand]] / d
            den += 1.0 / d
            got = True
        if got:
            out[y, x] = num / den
            filled[y, x] = True
    return out, filled


@pytest.fixture(scope="module")
def holed():
    n = 48
    yy, xx = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    full = ((xx * 7 + yy * 13) % 250 + 1).astype(np.uint8)  # 1..250
    hole = (xx * 3 + yy * 5) % 17 == 0
    # one larger blob crossing a tile border (ts=16 → border at 16)
    hole[12:20, 14:19] = True
    full[hole] = 0
    return full


def test_fill_matches_brute_force(spark, holed):
    n, ts, md = 48, 16, 6.0
    rows = fnd.fill_nodata(
        _tiles_from(spark, holed, ts), nodata=0, max_dist=md
    ).collect()
    got = np.zeros((n, n), dtype=np.float64)
    gotm = np.zeros((n, n), dtype=bool)
    for r in rows:
        arr = np.frombuffer(r["data"], dtype=np.float64).reshape(ts, ts)
        m = np.frombuffer(r["filled"], dtype=np.uint8).reshape(ts, ts)
        got[r["ty"] * ts:(r["ty"] + 1) * ts,
            r["tx"] * ts:(r["tx"] + 1) * ts] = arr
        gotm[r["ty"] * ts:(r["ty"] + 1) * ts,
             r["tx"] * ts:(r["tx"] + 1) * ts] = m > 0
    want, wantm = _brute_fill(holed, 0, md)
    assert np.array_equal(gotm, wantm)
    # identical float arithmetic (fixed quadrant summation order)
    assert np.array_equal(got, want)
    # sanity: the blob interior actually got interpolated
    assert gotm[15, 16] and 0.0 < got[15, 16] <= 250.0


def test_unreachable_holes_stay_nodata(spark):
    n, ts = 32, 16
    full = np.full((n, n), 7, dtype=np.uint8)
    full[4:28, 4:28] = 0  # 24x24 hole, interior > max_dist from valid
    rows = fnd.fill_nodata(
        _tiles_from(spark, full, ts), nodata=0, max_dist=3.0
    ).collect()
    got = np.zeros((n, n))
    gotm = np.zeros((n, n), dtype=bool)
    for r in rows:
        got[r["ty"] * ts:(r["ty"] + 1) * ts,
            r["tx"] * ts:(r["tx"] + 1) * ts] = np.frombuffer(
            r["data"], dtype=np.float64).reshape(ts, ts)
        gotm[r["ty"] * ts:(r["ty"] + 1) * ts,
             r["tx"] * ts:(r["tx"] + 1) * ts] = np.frombuffer(
            r["filled"], dtype=np.uint8).reshape(ts, ts) > 0
    assert not gotm[15, 15] and got[15, 15] == 0.0  # center untouched
    # rim reachable; IDW of a uniform field is 7 up to division rounding
    assert gotm[4, 4] and abs(got[4, 4] - 7.0) < 1e-12


def test_smoothing_pass(spark, holed):
    n, ts, md = 48, 16, 6.0
    rows = fnd.fill_nodata(
        _tiles_from(spark, holed, ts), nodata=0, max_dist=md, smoothing=1
    ).collect()
    got = np.zeros((n, n), dtype=np.float64)
    gotm = np.zeros((n, n), dtype=bool)
    for r in rows:
        got[r["ty"] * ts:(r["ty"] + 1) * ts,
            r["tx"] * ts:(r["tx"] + 1) * ts] = np.frombuffer(
            r["data"], dtype=np.float64).reshape(ts, ts)
        gotm[r["ty"] * ts:(r["ty"] + 1) * ts,
             r["tx"] * ts:(r["tx"] + 1) * ts] = np.frombuffer(
            r["filled"], dtype=np.uint8).reshape(ts, ts) > 0
    base, basem = _brute_fill(holed, 0, md)
    assert np.array_equal(gotm, basem)
    # oracle smoothing: plain 3x3 mean over the filled raster, applied
    # to interpolated pixels only (interior — edge pixels see the halo
    # zero fill in the engine)
    pad = np.zeros((n + 2, n + 2))
    pad[1:-1, 1:-1] = base
    sm = sum(
        pad[1 + dy:n + 1 + dy, 1 + dx:n + 1 + dx]
        for dy in (-1, 0, 1) for dx in (-1, 0, 1)
    ) / 9.0
    want = base.copy()
    want[basem] = sm[basem]
    interior = np.zeros((n, n), dtype=bool)
    interior[1:-1, 1:-1] = True
    sel = basem & interior
    assert np.allclose(got[sel], want[sel], rtol=0, atol=1e-12)
    # untouched pixels identical
    assert np.array_equal(got[~basem], base[~basem])
