"""GeoJSON / GeoJSONSeq (ogr/ogrsf_frmts/geojson, RFC 7946) tests:
geometry codec round trips over every type, seq write->read parity
through the native splittable text source, FeatureCollection reads,
and Spark-native property access on the JSON column."""

import json

import pytest
from pyspark.sql import functions as F

from gdal_spark import geojson as gj
from gdal_spark import wkb


GEOMS = {
    "Point": {"type": "Point", "coordinates": [2.5, -3.0]},
    "LineString": {
        "type": "LineString",
        "coordinates": [[0.0, 0.0], [4.0, 1.0], [5.0, -2.0]],
    },
    "Polygon": {
        "type": "Polygon",
        "coordinates": [
            [[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0], [0.0, 0.0]],
            [[1.0, 1.0], [2.0, 1.0], [2.0, 2.0], [1.0, 2.0], [1.0, 1.0]],
        ],
    },
    "MultiPoint": {
        "type": "MultiPoint", "coordinates": [[1.0, 2.0], [3.0, 4.0]]
    },
    "MultiLineString": {
        "type": "MultiLineString",
        "coordinates": [[[0.0, 0.0], [1.0, 1.0]], [[2.0, 2.0], [3.0, 1.0]]],
    },
    "MultiPolygon": {
        "type": "MultiPolygon",
        "coordinates": [
            [[[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 0.0]]],
            [[[5.0, 5.0], [6.0, 5.0], [6.0, 6.0], [5.0, 5.0]]],
        ],
    },
}


@pytest.mark.parametrize("name", sorted(GEOMS))
def test_geometry_codec_round_trip(name):
    g = GEOMS[name]
    w = gj.geometry_to_wkb(g)
    back = gj.wkb_to_geometry(w)
    assert back == g
    # and the WKB is consumable by the engine's own parser
    assert wkb.parse(w)[0] > 0


def _df(spark):
    rows = [
        (i, f"road-{i}", float(i) / 4.0,
         gj.geometry_to_wkb(GEOMS[name]))
        for i, name in enumerate(sorted(GEOMS))
    ]
    return spark.createDataFrame(
        rows, "fid long, name string, score double, geometry binary"
    )


def test_seq_write_read_round_trip(spark, tmp_path):
    out = str(tmp_path / "gjs")
    df = _df(spark).repartition(2)
    manifest = gj.write_geojson_seq(df, out, id_col="fid").toPandas()
    assert manifest["n_rows"].sum() == 6

    # each line is a valid standalone Feature with sorted keys
    with open(manifest["path"].iloc[0]) as f:
        line = f.readline()
    feat = json.loads(line)
    assert feat["type"] == "Feature"
    assert "geometry" in feat and "properties" in feat

    back = gj.read_geojson_seq(spark, out)
    assert back.count() == 6
    got = (
        back.select(
            F.get_json_object("properties", "$.name").alias("name"),
            F.get_json_object("properties", "$.score")
            .cast("double").alias("score"),
            "feature_id", "geometry",
        )
        .orderBy("feature_id")
        .collect()
    )
    want = sorted(
        _df(spark).collect(), key=lambda r: str(r["fid"])
    )
    for g, w in zip(got, want):
        assert g["name"] == w["name"]
        assert g["score"] == w["score"]
        assert bytes(g["geometry"]) == bytes(w["geometry"])


def test_feature_collection_read(spark, tmp_path):
    p = tmp_path / "fc.geojson"
    fc = {
        "type": "FeatureCollection",
        "features": [
            {
                "type": "Feature",
                "id": 7,
                "properties": {"a": 1},
                "geometry": GEOMS["Point"],
            },
            {
                "type": "Feature",
                "properties": {"a": 2},
                "geometry": GEOMS["Polygon"],
            },
            {"type": "Feature", "properties": None, "geometry": None},
        ],
    }
    p.write_text(json.dumps(fc))
    df = gj.read_geojson(spark, [str(p)]).orderBy("feature_id").toPandas()
    assert len(df) == 3
    assert df["feature_id"].tolist()[-1] == "7"  # None sorts first
    geoms = [g for g in df["geometry"] if g is not None]
    assert len(geoms) == 2


def test_rs_framed_lines(spark, tmp_path):
    """RFC 8142 RS-framed sequences parse too."""
    p = tmp_path / "rs.geojsonl"
    feat = {"type": "Feature", "properties": {"x": 1},
            "geometry": GEOMS["Point"]}
    p.write_text("\x1e" + json.dumps(feat) + "\n\x1e"
                 + json.dumps(feat) + "\n")
    assert gj.read_geojson_seq(spark, str(p)).count() == 2


def test_seq_stream_matches_batch(spark, tmp_path):
    """Streaming arrival twin parses identically to the batch scan
    (same kernel; parity by construction, verified end-to-end)."""
    out = str(tmp_path / "land")
    df = _df(spark).repartition(2)
    assert (
        gj.write_geojson_seq(df, out, id_col="fid")
        .toPandas()["n_rows"].sum() == 6
    )
    stream = gj.read_geojson_seq_stream(spark, out)
    q = (
        stream.writeStream.format("memory")
        .queryName("gj_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "SELECT feature_id, geometry FROM gj_stream ORDER BY feature_id"
    ).collect()
    want = (
        gj.read_geojson_seq(spark, out)
        .select("feature_id", "geometry")
        .orderBy("feature_id")
        .collect()
    )
    assert len(got) == 6
    assert [
        (r["feature_id"], bytes(r["geometry"])) for r in got
    ] == [(r["feature_id"], bytes(r["geometry"])) for r in want]
