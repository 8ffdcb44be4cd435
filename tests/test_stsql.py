"""ST functions through SQL strings: registry parity with the
DataFrame kernels, plus the OGR SQL dialect front-end routing
st_* calls to the registered UDFs."""

import numpy as np
import pandas as pd
import pytest

from gdal_spark import geometry, stsql, wkb


def rect(x0, y0, x1, y1):
    return np.array(
        [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]],
        dtype=np.float64,
    )


@pytest.fixture(scope="module")
def st(spark):
    stsql.register_st_functions(spark)
    pdf = pd.DataFrame(
        {
            "gid": [0, 1, 2],
            "g": [
                wkb.polygon([rect(0, 0, 4, 3)]),
                wkb.polygon([rect(2, 1, 8, 5)]),
                # donut: area = 24 - 1
                wkb.polygon([rect(10, 10, 16, 14), rect(12, 11, 13, 12)]),
            ],
        }
    )
    spark.createDataFrame(pdf).createOrReplaceTempView("geoms")
    return spark


def test_area_length_centroid_with_holes(st):
    rows = {
        r.gid: r
        for r in st.sql(
            "SELECT gid, st_area(g) a, st_length(g) l, "
            "st_centroid_x(g) cx, st_centroid_y(g) cy FROM geoms"
        ).collect()
    }
    assert rows[0].a == 12.0 and rows[0].l == 14.0
    assert (rows[0].cx, rows[0].cy) == (2.0, 1.5)
    assert rows[2].a == 23.0          # hole subtracted
    assert rows[2].l == 20.0 + 4.0    # outer + hole boundary


def test_predicates_in_sql_join(st):
    got = sorted(
        (r.a, r.b)
        for r in st.sql(
            "SELECT x.gid a, y.gid b FROM geoms x JOIN geoms y "
            "ON st_intersects(x.g, y.g) AND x.gid < y.gid"
        ).collect()
    )
    assert got == [(0, 1)]


def test_buffer_isvalid_makevalid(st):
    r = st.sql(
        "SELECT st_area(st_buffer(g, 2.0)) a, st_isvalid(g) v "
        "FROM geoms WHERE gid = 0"
    ).collect()[0]
    # rect buffer area: A + P*d + corner fans (8 segs/quadrant)
    want = 12.0 + 14.0 * 2.0 + 16.0 * 4.0 * np.sin(np.pi / 16)
    assert r.a == pytest.approx(want, rel=1e-12)
    assert r.v

    # bowtie: invalid; makevalid splits into two triangles, area 2*0.25
    bow = wkb.polygon([np.array(
        [[0, 0], [1, 1], [1, 0], [0, 1], [0, 0]], dtype=np.float64
    )])
    pdf = pd.DataFrame({"gid": [9], "g": [bow]})
    st.createDataFrame(pdf).createOrReplaceTempView("bow")
    r2 = st.sql(
        "SELECT st_isvalid(g) v, st_area(st_makevalid(g)) a FROM bow"
    ).collect()[0]
    assert not r2.v
    assert r2.a == pytest.approx(0.5)


def test_ogr_dialect_routes_st_functions(st):
    """The OGR SQL string front-end compiles st_* calls to the
    registered UDFs — the two-dialect story of the reference."""
    from gdal_spark import ogrsql

    pdf = pd.DataFrame(
        {
            "fid": [1, 2],
            "geom_wkb": [
                wkb.polygon([rect(0, 0, 4, 3)]),
                wkb.polygon([rect(0, 0, 2, 2)]),
            ],
        }
    )
    df = st.createDataFrame(pdf)
    out = ogrsql.execute(
        st,
        "SELECT fid, st_area(geom_wkb) AS a FROM t "
        "WHERE st_area(geom_wkb) > 5 ORDER BY fid",
        {"t": df},
    ).collect()
    assert [(r.fid, r.a) for r in out] == [(1, 12.0)]
