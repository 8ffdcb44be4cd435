"""COG writer with embedded overview IFDs (frmts/cog/cogdriver.cpp;
overview build gdaladdo / gcore/overview.cpp analog).

Pins: every IFD of cog_encode's own output reads back byte-exact
through both the whole-buffer decoder and the ranged Spark scan;
overview pixels equal iterated raster.block_reduce_2x2; COG layout
invariants (IFDs before all pixel data, smallest overview's payload
first); odd-dimension partial-window average semantics."""

import glob
import os

import numpy as np
import pytest

from gdal_spark import gtiff, raster


def _img(h, w, seed=3, dtype=np.uint8):
    rng = np.random.default_rng(seed)
    if np.dtype(dtype).kind == "f":
        return rng.random((h, w)).astype(dtype)
    info = np.iinfo(dtype)
    return rng.integers(info.min, info.max, (h, w), dtype=dtype)


def _expected_levels(a, tile=(64, 64), method="average"):
    out = [a]
    while out[-1].shape[0] > tile[1] or out[-1].shape[1] > tile[0]:
        out.append(gtiff._cog_reduce(out[-1], method))
    return out


def test_cog_every_level_roundtrips_exact():
    a = _img(300, 420)
    buf = cog = gtiff.cog_encode(
        a, tile=(64, 64),
        geotransform=(500.0, 10.0, 0.0, 900.0, 0.0, -10.0),
        epsg=32633,
    )
    lv = _expected_levels(a)
    assert gtiff.tiff_n_ifds(cog) == len(lv) and len(lv) >= 3
    for i, exp in enumerate(lv):
        got = gtiff.tiff_decode(buf, ifd=i)
        assert got.dtype == exp.dtype
        assert np.array_equal(got, exp), f"level {i}"
    m0 = gtiff.tiff_meta(cog, ifd=0)
    assert m0["subfile_type"] == 0 and m0["has_next_ifd"]
    assert m0["gt"][1] == 10.0 and m0["epsg"] == 32633
    m1 = gtiff.tiff_meta(cog, ifd=1)
    assert m1["subfile_type"] == 1  # NewSubfileType reduced-res bit
    assert m1["width"] == lv[1].shape[1]
    assert m1["gt"] is None  # georef lives on IFD 0 only


def test_cog_overviews_match_block_reduce_chain():
    a = _img(256, 256, seed=9)
    cog = gtiff.cog_encode(a, tile=(64, 64))
    exp = a
    for i in range(1, gtiff.tiff_n_ifds(cog)):
        exp = raster.block_reduce_2x2(exp, "average")
        assert np.array_equal(gtiff.tiff_decode(cog, ifd=i), exp)
    assert exp.shape == (64, 64)  # stops once it fits one tile


def test_cog_layout_ifds_first_smallest_payload_first():
    a = _img(256, 256, seed=1)
    cog = gtiff.cog_encode(a, tile=(64, 64))
    n = gtiff.tiff_n_ifds(cog)
    metas = [gtiff.tiff_meta(cog, ifd=i) for i in range(n)]
    first_data = min(min(m["offsets"]) for m in metas)
    # every IFD walk (header+tags) stays in front of all pixel bytes
    for m in metas:
        assert max(
            o + c for o, c in zip(m["offsets"], m["bytecounts"])
        ) <= len(cog)
    starts = [min(m["offsets"]) for m in metas]
    # smallest overview (last IFD) leads the data section; full-res last
    assert starts[-1] == first_data
    assert starts[0] == max(starts)


def test_cog_single_level_when_image_fits_tile():
    a = _img(48, 48)
    cog = gtiff.cog_encode(a, tile=(64, 64))
    assert gtiff.tiff_n_ifds(cog) == 1
    assert np.array_equal(gtiff.tiff_decode(cog), a)


@pytest.mark.parametrize("dtype", [np.uint16, np.float32])
def test_cog_dtypes(dtype):
    a = _img(130, 200, seed=5, dtype=dtype)
    cog = gtiff.cog_encode(a, tile=(64, 64))
    for i in range(gtiff.tiff_n_ifds(cog)):
        got = gtiff.tiff_decode(cog, ifd=i)
        assert got.dtype == np.dtype(dtype)


def test_odd_dim_reduce_matches_partial_window_average():
    # 5x3: remainder column/row average only their real pixels with
    # GDAL's (total + n/2) / n rounding
    a = np.arange(15, dtype=np.uint8).reshape(5, 3) * 11
    r = gtiff._cog_reduce(a, "average")
    assert r.shape == (3, 2)
    # corner remainder pixel keeps its own value
    assert r[2, 1] == a[4, 2]
    # 1-wide column remainder: (a+b+1)//2 of the two real pixels
    assert r[0, 1] == (int(a[0, 2]) + int(a[1, 2]) + 1) // 2
    # 1-tall row remainder likewise
    assert r[2, 0] == (int(a[4, 0]) + int(a[4, 1]) + 1) // 2
    # full 2x2 block: GDAL half-up
    s = int(a[0, 0]) + int(a[0, 1]) + int(a[1, 0]) + int(a[1, 1])
    assert r[0, 0] == (s + 2) // 4


def test_tiff_encode_bytes_unchanged_by_refactor():
    # single-IFD writer must keep its historical layout: IFD at 8,
    # ext values, then data — and round-trip with predictor etc.
    a = _img(100, 130, seed=7)
    b = gtiff.tiff_encode(
        a, tile=(64, 64), predictor=True,
        geotransform=(10.0, 1.0, 0.0, 20.0, 0.0, -1.0), epsg=4326,
    )
    assert b[:4] == b"II\x2a\x00" and b[4:8] == b"\x08\x00\x00\x00"
    assert gtiff.tiff_n_ifds(b) == 1
    assert np.array_equal(gtiff.tiff_decode(b), a)


def test_ranged_scan_reads_every_cog_level(spark, tmp_path):
    a = _img(300, 420, seed=11)
    gt = (500.0, 10.0, 0.0, 900.0, 0.0, -10.0)
    p = str(tmp_path / "x.tif")
    with open(p, "wb") as f:
        f.write(gtiff.cog_encode(a, tile=(64, 64), geotransform=gt))
    lv = _expected_levels(a)
    for i, exp in enumerate(lv):
        rows = (
            gtiff.read_gtiff_ranged(spark, [p], ifd=i)
            .toPandas()
            .sort_values(["ty", "tx"])
        )
        got = np.zeros(exp.shape, exp.dtype)
        for r in rows.itertuples(index=False):
            blk = np.frombuffer(r.data, exp.dtype).reshape(r.h, r.w)
            got[r.y0:r.y0 + r.h, r.x0:r.x0 + r.w] = blk
        assert np.array_equal(got, exp), f"ranged level {i}"


def test_write_gtiff_dir_cog_mode(spark, tmp_path):
    from pyspark.sql import Row

    ts = 64
    rng = np.random.default_rng(2)
    tiles = [
        Row(
            z=0, tx=tx, ty=ty, w=ts, h=ts,
            data=bytes(
                rng.integers(0, 255, (ts, ts), dtype=np.uint8).tobytes()
            ),
        )
        for ty in range(4)
        for tx in range(4)
    ]
    df = spark.createDataFrame(tiles)
    out = str(tmp_path / "cog")
    man = gtiff.write_gtiff_dir(
        df, out, geotransform=(0.0, 1.0, 0.0, 256.0, 0.0, -1.0),
        epsg=3857, cog_overviews="average",
    ).collect()
    assert len(man) == 1
    files = glob.glob(os.path.join(out, "*.tif"))
    assert len(files) == 1
    with open(files[0], "rb") as f:
        buf = f.read()
    n = gtiff.tiff_n_ifds(buf)
    assert n == 3  # 256 -> 128 -> 64 fits one 64px tile
    full = gtiff.tiff_decode(buf, ifd=0)
    for i in range(1, n):
        full = raster.block_reduce_2x2(full, "average")
        assert np.array_equal(gtiff.tiff_decode(buf, ifd=i), full)
