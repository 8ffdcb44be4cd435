"""dissolve (aggregate ST_Union per key): exact union areas for
overlapping / disjoint / duplicate / holed / multipart inputs."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from gdal_spark import wkb
from gdal_spark.operators.layer_algebra import dissolve


def rect(x0, y0, x1, y1):
    return np.array(
        [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], float
    )


def _df(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["key", "geom_wkb"])
    )


def _areas(df):
    return {r.key: r.area for r in df.collect()}


def test_single_geometry_identity(spark):
    d = dissolve(_df(spark, [(1, wkb.polygon([rect(0, 0, 4, 3)]))]))
    out = d.collect()[0]
    assert out.area == pytest.approx(12.0)
    assert out.n_geoms == 1


def test_disjoint_sum_and_overlap_subtraction(spark):
    rows = [
        # key 1: two disjoint 4x2 rects -> 16
        (1, wkb.polygon([rect(0, 0, 4, 2)])),
        (1, wkb.polygon([rect(10, 0, 14, 2)])),
        # key 2: chain overlap width 1 height 2 -> 8 + 8 - 2 = 14
        (2, wkb.polygon([rect(0, 0, 4, 2)])),
        (2, wkb.polygon([rect(3, 0, 7, 2)])),
        # key 3: identical copies -> area of one
        (3, wkb.polygon([rect(0, 0, 5, 5)])),
        (3, wkb.polygon([rect(0, 0, 5, 5)])),
        (3, wkb.polygon([rect(0, 0, 5, 5)])),
        # key 4: contained -> area of the big one
        (4, wkb.polygon([rect(0, 0, 10, 10)])),
        (4, wkb.polygon([rect(2, 2, 5, 5)])),
    ]
    a = _areas(dissolve(_df(spark, rows)))
    assert a[1] == pytest.approx(16.0)
    assert a[2] == pytest.approx(14.0)
    assert a[3] == pytest.approx(25.0)
    assert a[4] == pytest.approx(100.0)


def test_holed_and_multipart_inputs(spark):
    donut = wkb.polygon([rect(0, 0, 10, 10), rect(4, 4, 6, 6)])  # 96
    plug = wkb.polygon([rect(4, 4, 6, 6)])  # fills the hole exactly
    multi = wkb.multipolygon(
        [[rect(20, 0, 24, 2)], [rect(30, 0, 34, 2)]]
    )  # 16, disjoint from the donut
    a = _areas(
        dissolve(
            _df(spark, [(7, donut), (7, plug), (7, multi)])
        )
    )
    assert a[7] == pytest.approx(96 + 4 + 16)


def test_triple_overlap_exact(spark):
    # three rects all overlapping a common core — inclusion-exclusion:
    # 3*24 - (12+12+12 pairwise) + 6 core... computed directly: the
    # union of [0,6]x[0,4], [2,8]x[0,4], [4,10]x[0,4] is [0,10]x[0,4]
    rows = [
        (9, wkb.polygon([rect(0, 0, 6, 4)])),
        (9, wkb.polygon([rect(2, 0, 8, 4)])),
        (9, wkb.polygon([rect(4, 0, 10, 4)])),
    ]
    a = _areas(dissolve(_df(spark, rows)))
    assert a[9] == pytest.approx(40.0)


def test_partitioning_and_order_invariance(spark):
    rows = [
        (1, wkb.polygon([rect(j * 3, 0, j * 3 + 4, 2 + j % 2)]))
        for j in range(6)
    ]
    base = _areas(dissolve(_df(spark, rows)))
    shuf = _areas(
        dissolve(_df(spark, rows[::-1]).repartition(7, "geom_wkb"))
    )
    assert base.keys() == shuf.keys()
    for k in base:
        assert base[k] == pytest.approx(shuf[k])


def test_emitted_multipolygon_tiles_the_union(spark):
    from gdal_spark import geometry

    rows = [
        (5, wkb.polygon([rect(0, 0, 4, 2)])),
        (5, wkb.polygon([rect(3, 0, 7, 2)])),
    ]
    out = dissolve(_df(spark, rows)).collect()[0]
    parts = wkb.polygon_rings(bytes(out.geom_wkb))
    total = sum(
        abs(geometry.ring_area(p[0])) for p in parts
    )
    assert total == pytest.approx(out.area) == pytest.approx(14.0)


def test_one_and_two_level_plans_agree(spark):
    """prefold_salts (the default two-level fold) and the one-shuffle
    plan produce the same union area and count per key — associativity
    of the fold; only the internal tiling may differ."""
    rows = []
    for k in range(5):
        for j in range(12):
            rows.append(
                (k, wkb.polygon([rect(j * 2.5, 0, j * 2.5 + 4, 3 + k % 2)]))
            )
    one = _areas(dissolve(_df(spark, rows), prefold_salts=None))
    two = _areas(dissolve(_df(spark, rows), prefold_salts=4))
    assert set(one) == set(two)
    for k in one:
        assert one[k] == pytest.approx(two[k])


def test_adaptive_plan_exchanges(spark):
    """Plan-shape pin for the adaptive default: a HOT key (rows >
    threshold) materializes BOTH shuffles — (key, salt) pre-fold then
    per-key re-fold; an all-cold input (or prefold_salts=None) plans
    exactly ONE exchange, the single-shuffle fold."""
    hot_rows = [(0, wkb.polygon([rect(0, 0, 4, 3)]))] * 100
    plan = dissolve(
        _df(spark, hot_rows), prefold_threshold=10
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") >= 2

    cold_rows = [(0, wkb.polygon([rect(0, 0, 4, 3)]))] * 3
    for kwargs in ({}, {"prefold_salts": None}):
        plan1 = dissolve(
            _df(spark, cold_rows), **kwargs
        )._jdf.queryExecution().executedPlan().toString()
        assert plan1.count("Exchange") == 1


def test_hot_key_ten_thousand_overlapping(spark):
    """The verdict scenario: ONE key with 10^4 mutually overlapping
    rects (a country-sized dissolve group). The indexed accumulator +
    salted pre-fold keep it inside a tight budget; the union area is
    closed-form (one long 4-high strip)."""
    import time

    n = 10_000
    rows = [
        (7, wkb.polygon([rect(i * 0.5, 0.0, i * 0.5 + 4.0, 4.0)]))
        for i in range(n)
    ]
    t0 = time.time()
    out = dissolve(_df(spark, rows).repartition(16)).collect()
    dt = time.time() - t0
    assert len(out) == 1
    r = out[0]
    assert r["n_geoms"] == n
    want = ((n - 1) * 0.5 + 4.0) * 4.0
    assert r["area"] == pytest.approx(want, rel=1e-9)
    assert dt < 120.0, f"hot-key dissolve took {dt:.1f}s"


def test_adaptive_prefold_mixed_hot_cold(spark):
    """Adaptive routing: cold keys (≤ threshold rows) and a hot key
    (> threshold rows) in ONE call, exact closed-form areas for both.
    Also pins that forcing everything hot (threshold=0) and the
    single-shuffle plan agree with the adaptive default."""
    rows = []
    # cold: 4 keys, 5 chained rects each (spacing 3 → width-1 overlaps)
    for k in range(4):
        for j in range(5):
            rows.append(
                (k, wkb.polygon([rect(j * 3, 0, j * 3 + 4, 2)]))
            )
    # hot: key 99, 200 overlapping rects (threshold default 64)
    n = 200
    for i in range(n):
        rows.append(
            (99, wkb.polygon([rect(i * 0.5, 0.0, i * 0.5 + 4.0, 4.0)]))
        )
    want_cold = (5 * 4 * 2 - 4 * 1 * 2) * 1.0   # 40 - 8 = 32
    want_hot = ((n - 1) * 0.5 + 4.0) * 4.0

    d = dissolve(_df(spark, rows).repartition(8))
    a = _areas(d)
    for k in range(4):
        assert a[k] == pytest.approx(want_cold)
    assert a[99] == pytest.approx(want_hot, rel=1e-9)
    ng = {r.key: r.n_geoms for r in d.collect()}
    assert ng[99] == n and all(ng[k] == 5 for k in range(4))

    for kwargs in ({"prefold_threshold": 0}, {"prefold_salts": None}):
        b = _areas(dissolve(_df(spark, rows).repartition(8), **kwargs))
        assert set(b) == set(a)
        for k in a:
            assert b[k] == pytest.approx(a[k], rel=1e-9)
