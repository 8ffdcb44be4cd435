"""CSV-with-geometry (OGR CSV driver analog) tests: WKT round trips
through the native CSV source/sink, XY point building."""

import numpy as np

from gdal_spark import csvgeom, wkb


def _df(spark):
    rows = [
        (1, "a", wkb.point(1.5, 2.5)),
        (2, "b", wkb.polygon(
            [[(0.0, 0.0), (3.0, 0.0), (3.0, 3.0), (0.0, 0.0)]]
        )),
        (3, "c", wkb.linestring([(0.0, 1.0), (2.0, 2.0)])),
        (4, "d", None),
    ]
    return spark.createDataFrame(
        rows, "fid long, name string, geometry binary"
    )


def test_csv_wkt_round_trip(spark, tmp_path):
    out = str(tmp_path / "csv")
    df = _df(spark)
    csvgeom.write_csv_geom(df.repartition(2), out)
    back = csvgeom.read_csv_geom(spark, out).orderBy("fid").collect()
    want = {r["fid"]: r for r in df.collect()}
    assert len(back) == 4
    for r in back:
        w = want[r["fid"]]
        assert r["name"] == w["name"]
        if w["geometry"] is None:
            assert r["geometry"] is None
        else:
            # WKT text round trip preserves geometry type + coords
            got = wkb.parse(bytes(r["geometry"]))
            exp = wkb.parse(bytes(w["geometry"]))
            assert got[0] == exp[0]


def test_points_from_xy(spark):
    df = spark.createDataFrame(
        [(1, 10.0, 20.0), (2, None, 5.0)],
        "fid long, lon double, lat double",
    )
    out = {r["fid"]: r["geometry"]
           for r in csvgeom.points_from_xy(df).collect()}
    assert bytes(out[1]) == wkb.point(10.0, 20.0)
    assert out[2] is None


def test_wkt_column_transform_matches_codec(spark):
    df = _df(spark).filter("geometry is not null")
    as_wkt = csvgeom.geometry_to_wkt(df)
    back = csvgeom.wkt_to_geometry(as_wkt, "WKT").orderBy("fid").collect()
    want = df.orderBy("fid").collect()
    for g, w in zip(back, want):
        assert wkb.wkt(bytes(g["geometry"])) == wkb.wkt(bytes(w["geometry"]))
