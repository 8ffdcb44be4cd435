"""GDALApplyVerticalShiftGrid (alg/gdalapplyverticalshiftgrid.cpp)
tests: the warp+join composition must equal a whole-array numpy
oracle, forward and inverse, with unit conversions."""

import numpy as np
import pytest

from gdal_spark import raster
from gdal_spark.operators import dem, tiling

DEM_GT = (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)
# shift grid: coarser resolution, covering the DEM extent
GRID_GT = (440000.0, 150.0, 0.0, 3752000.0, 0.0, -150.0)


def _oracle(dem_arr, grid_arr, inverse, s2m=1.0, d2m=1.0,
            scale=65536):
    h, w = dem_arr.shape
    sx, sy = raster.dst_to_src_coords(DEM_GT, GRID_GT, w, h)
    q = raster.warp_bilinear_q(grid_arr, sx, sy, scale=scale)
    shift = np.where(q == raster.NODATA, np.nan, q / scale)
    sgn = -1.0 if inverse else 1.0
    return (dem_arr * s2m + sgn * shift) / d2m


@pytest.mark.parametrize("inverse", [False, True])
def test_vertical_shift_matches_oracle(spark, inverse):
    ts = 64
    dem_tiles = tiling.formula_tiles(spark, 2, 2, ts)
    grid_tiles = tiling.formula_tiles(spark, 1, 1, ts)
    out = dem.apply_vertical_shift(
        dem_tiles, DEM_GT, 2 * ts, 2 * ts,
        grid_tiles, GRID_GT, ts, ts, grid_tile_size=ts,
        inverse=inverse,
    ).toPandas()
    assert len(out) == 4 * ts * ts

    dem_arr = raster.formula_block(0, 0, 2 * ts, 2 * ts).astype(float)
    grid_arr = raster.formula_block(0, 0, ts, ts)
    want = _oracle(dem_arr, grid_arr, inverse)
    got = np.full_like(want, np.nan)
    gy = out["gy"].to_numpy()
    gx = out["gx"].to_numpy()
    ev = out["elevation"].to_numpy(dtype=float)
    got[gy, gx] = ev
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-9,
                               equal_nan=True)
    # the grid covers the whole DEM here, so no NaN shifts inside
    interior = ~np.isnan(want)
    assert interior.sum() > 0.5 * want.size


def test_unit_conversion(spark):
    ts = 64
    dem_tiles = tiling.formula_tiles(spark, 1, 1, ts)
    grid_tiles = tiling.formula_tiles(spark, 1, 1, ts)
    out = dem.apply_vertical_shift(
        dem_tiles, DEM_GT, ts, ts,
        grid_tiles, GRID_GT, ts, ts, grid_tile_size=ts,
        src_unit_to_meter=0.3048, dst_unit_to_meter=2.0,
    ).toPandas()
    dem_arr = raster.formula_block(0, 0, ts, ts).astype(float)
    grid_arr = raster.formula_block(0, 0, ts, ts)
    want = _oracle(dem_arr, grid_arr, False, 0.3048, 2.0)
    got = np.full_like(want, np.nan)
    got[out["gy"], out["gx"]] = out["elevation"].to_numpy(dtype=float)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-9,
                               equal_nan=True)
