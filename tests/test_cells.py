"""Unit tests for the quadtree cell index (gdal_spark.cells)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from gdal_spark import cells


def test_encode_decode_roundtrip():
    rng = np.random.default_rng(42)
    lon = rng.uniform(-180, 180, 1000)
    lat = rng.uniform(-90, 90, 1000)
    for res in (0, 1, 5, 12, 26):
        cid = cells.encode(lon, lat, res)
        r, ix, iy = cells.decode(cid)
        assert (r == res).all()
        n = 1 << res
        assert (ix >= 0).all() and (ix < n).all()
        assert (iy >= 0).all() and (iy < n).all()
        # the point lies inside its cell bounds
        lo_lon, lo_lat, hi_lon, hi_lat = cells.cell_bounds(cid)
        assert (lon >= lo_lon).all() and (lon <= hi_lon).all()
        assert (lat >= lo_lat).all() and (lat <= hi_lat).all()


def test_encode_edges_clamped():
    cid = cells.encode([180.0, -180.0], [90.0, -90.0], 4)
    r, ix, iy = cells.decode(cid)
    assert ix.tolist() == [15, 0]
    assert iy.tolist() == [15, 0]


def test_parent_children_inverse():
    cid = int(cells.encode(12.5, 47.3, 10))
    kids = cells.children(cid)
    assert len(kids) == 4
    assert len(set(kids.tolist())) == 4
    for k in kids.tolist():
        assert int(cells.parent(np.int64(k))) == cid


def test_parent_contains_point():
    lon, lat = 12.34, -56.78
    c10 = int(cells.encode(lon, lat, 10))
    c7 = int(cells.encode(lon, lat, 7))
    assert int(cells.parent(np.int64(c10), steps=3)) == c7


def test_k_ring_sizes():
    c = int(cells.encode(0.1, 0.1, 8))
    assert len(cells.k_ring(c, 0)) == 1
    assert len(cells.k_ring(c, 1)) == 9
    assert len(cells.k_ring(c, 2)) == 25
    assert len(cells.ring_only(c, 1)) == 8
    assert len(cells.ring_only(c, 2)) == 16


def test_k_ring_clamps_at_grid_edge():
    c = int(cells.encode(-179.99, -89.99, 4))  # corner cell (0,0)
    assert len(cells.k_ring(c, 1)) == 4


def test_cover_bbox_and_compact_uncompact():
    cover = cells.cover_bbox(-1.0, -1.0, 1.0, 1.0, 8)
    lo_lon, lo_lat, hi_lon, hi_lat = cells.cell_bounds(cover)
    # every cover cell's rectangle intersects the bbox
    assert (hi_lon >= -1.0).all() and (lo_lon <= 1.0).all()
    assert (hi_lat >= -1.0).all() and (lo_lat <= 1.0).all()

    # compact of a full 2x2 sibling block collapses to the parent
    c = int(cells.encode(10.0, 10.0, 6))
    kids = cells.children(c)
    assert cells.compact(kids).tolist() == [c]
    # uncompact returns exactly the res+1 descendants
    assert sorted(cells.uncompact([c], 7).tolist()) == sorted(kids.tolist())
    # two-level roundtrip
    grand = cells.uncompact([c], 8)
    assert len(grand) == 16
    assert cells.compact(grand).tolist() == [c]


def test_uncompact_rejects_finer_input():
    c = int(cells.encode(0.0, 0.0, 9))
    with pytest.raises(ValueError):
        cells.uncompact([c], 8)


def test_morton_locality():
    # the 4 children of one parent occupy a contiguous morton range
    c = int(cells.encode(5.0, 5.0, 9))
    kid_keys = sorted(cells.morton_key(cells.children(c)).tolist())
    assert kid_keys[-1] - kid_keys[0] == 3


@settings(max_examples=200, deadline=None)
@given(
    lon=st.floats(-180, 180, allow_nan=False),
    lat=st.floats(-90, 90, allow_nan=False),
    res=st.integers(0, cells.MAX_RES),
)
def test_encode_hypothesis_in_bounds(lon, lat, res):
    # Contract: consistent quantization across numpy/JVM/SQL — cell
    # bounds contain the point up to float rounding of (v+off)/span*2^r
    # (a value within 1 grid-ULP of a cell edge may land either side).
    cid = int(cells.encode(lon, lat, res))
    lo_lon, lo_lat, hi_lon, hi_lat = (float(v) for v in cells.cell_bounds(cid))
    eps_lon = 360.0 * 2**-50
    eps_lat = 180.0 * 2**-50
    assert lo_lon - eps_lon <= lon <= hi_lon + eps_lon or abs(lon) == 180.0
    assert lo_lat - eps_lat <= lat <= hi_lat + eps_lat or abs(lat) == 90.0


def test_cell_expr_matches_numpy(spark):
    """The JVM Column expression and numpy kernel must agree bit-for-bit."""
    import pandas as pd
    from pyspark.sql import functions as F

    rng = np.random.default_rng(7)
    pdf = pd.DataFrame(
        {"lon": rng.uniform(-180, 180, 500), "lat": rng.uniform(-90, 90, 500)}
    )
    df = spark.createDataFrame(pdf)
    for res in (0, 3, 9, 15):
        got = (
            df.select(cells.cell_expr(F.col("lon"), F.col("lat"), res).alias("c"))
            .toPandas()["c"]
            .to_numpy()
        )
        want = cells.encode(pdf["lon"].to_numpy(), pdf["lat"].to_numpy(), res)
        assert (got == want).all()


def test_cell_sql_matches_numpy():
    """The DuckDB oracle SQL fragment must agree with the numpy kernel."""
    import duckdb
    import pandas as pd

    rng = np.random.default_rng(11)
    pts = pd.DataFrame(
        {"lon": rng.uniform(-180, 180, 500), "lat": rng.uniform(-90, 90, 500)}
    )
    for res in (0, 4, 11):
        frag = cells.cell_sql("lon", "lat", res)
        got = (
            duckdb.sql(f"SELECT {frag} AS c FROM pts").df()["c"].to_numpy()
        )
        want = cells.encode(pts["lon"].to_numpy(), pts["lat"].to_numpy(), res)
        assert (got == want).all()
