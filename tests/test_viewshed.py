"""Viewshed (lattice line-of-sight) vs a brute-force per-target oracle
that walks every lattice point on the open segment observer→target."""

import math

import numpy as np
import pandas as pd
import pytest

from gdal_spark.operators.viewshed import viewshed_cells, viewshed_tile_summary


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


def _brute_viewshed(full, ox, oy, obs_height):
    """visible[y, x] by explicit lattice-point walk (exact rationals:
    compare (z_m - z0) * step_t vs (z_t - z0) * step_m in integers)."""
    h, w = full.shape
    z0 = int(full[oy, ox]) + obs_height
    vis = np.zeros((h, w), dtype=np.int64)
    for y in range(h):
        for x in range(w):
            if x == ox and y == oy:
                continue
            rx, ry = x - ox, y - oy
            g = math.gcd(abs(rx), abs(ry))
            dx, dy = rx // g, ry // g
            zt = int(full[y, x]) - z0
            ok = True
            for m in range(1, g):
                zm = int(full[oy + m * dy, ox + m * dx]) - z0
                # blocked iff zm/m > zt/g  ⟺  zm*g > zt*m (m, g > 0)
                if zm * g > zt * m:
                    ok = False
                    break
            vis[y, x] = 1 if ok else 0
    return vis


@pytest.mark.parametrize("seed,obs", [(3, (7, 9)), (11, (0, 0))])
def test_viewshed_matches_bruteforce(spark, seed, obs):
    n, ts = 32, 16
    rng = np.random.default_rng(seed)
    full = rng.integers(0, 40, size=(n, n), dtype=np.uint8)
    ox, oy = obs
    got_rows = viewshed_cells(
        _tiles_from(spark, full, ts), ox, oy, obs_height=2
    ).collect()
    got = np.full((n, n), -1, dtype=np.int64)
    for r in got_rows:
        got[r["gy"], r["gx"]] = r["visible"]
    want = _brute_viewshed(full, ox, oy, obs_height=2)
    assert got[oy, ox] == -1  # observer cell excluded
    got[oy, ox] = want[oy, ox] = 9
    assert np.array_equal(got, want)


def test_viewshed_flat_terrain_all_visible(spark):
    n, ts = 32, 16
    full = np.full((n, n), 5, dtype=np.uint8)
    cells = viewshed_cells(_tiles_from(spark, full, ts), 16, 16, 1)
    rows = cells.collect()
    assert len(rows) == n * n - 1
    assert all(r["visible"] == 1 for r in rows)


def test_viewshed_wall_shadows(spark):
    # flat plain with a tall 1-cell wall east of the observer: cells
    # strictly behind the wall on the same lattice ray are blocked
    n, ts = 32, 16
    full = np.zeros((n, n), dtype=np.uint8)
    full[16, 20] = 50
    got = {
        (r["gx"], r["gy"]): r["visible"]
        for r in viewshed_cells(
            _tiles_from(spark, full, ts), 16, 16, 1
        ).collect()
    }
    assert got[(20, 16)] == 1          # the wall itself is visible
    assert got[(21, 16)] == 0          # directly behind it
    assert got[(31, 16)] == 0          # far behind on the same ray
    assert got[(21, 17)] == 1          # off the ray: clear
    assert got[(19, 16)] == 1          # in front of the wall


def test_viewshed_tile_summary(spark):
    n, ts = 32, 16
    rng = np.random.default_rng(5)
    full = rng.integers(0, 30, size=(n, n), dtype=np.uint8)
    cells = viewshed_cells(_tiles_from(spark, full, ts), 3, 4, 2)
    summ = {
        (r["tx"], r["ty"]): (r["n_visible"], r["vis_cks"])
        for r in viewshed_tile_summary(cells, ts).collect()
    }
    want = _brute_viewshed(full, 3, 4, 2)
    want[4, 3] = 0  # observer cell not in the output
    for (tx, ty), (nv, cks) in summ.items():
        blk = want[ty * ts:(ty + 1) * ts, tx * ts:(tx + 1) * ts]
        ys, xs = np.nonzero(blk)
        xs_g, ys_g = xs + tx * ts, ys + ty * ts
        assert nv == blk.sum()
        assert cks == int((xs_g * 31 + ys_g * 17).sum())


def test_tile_summary_negative_coords_floor(spark):
    """Tile ids are true floor division: gx=-1 with tile_size=16 lands
    in tile -1, not tile 0 (Spark's % takes the dividend's sign)."""
    cells = spark.createDataFrame(
        [(-1, -17, 1), (0, 0, 1), (-16, 5, 1)],
        "gx long, gy long, visible int",
    )
    got = {
        (r["tx"], r["ty"]): r["n_visible"]
        for r in viewshed_tile_summary(cells, 16).collect()
    }
    assert got == {(-1, -2): 1, (0, 0): 1, (-1, 0): 1}
