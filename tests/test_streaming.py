"""Streaming ingest equals its batch twin (availableNow triggers over
a file-arrival directory, results into a memory sink)."""

import os

import pytest
from pyspark.sql import functions as F

from gdal_spark import streaming, testdata


@pytest.fixture(scope="module")
def pages_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("pages_stream"))
    # two "arrival batches" of pages, overlapping urls across batches
    testdata.pages_df(spark, 2000, partitions=2).write.mode(
        "overwrite"
    ).parquet(os.path.join(d, "b0"))
    # second batch repeats rows 1000-1999 (same urls, later files)
    pdf = testdata.pages_pdf(3000).iloc[1000:3000]
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        os.path.join(d, "b1")
    )
    return d


def _schema(spark):
    return testdata.pages_df(spark, 1).schema


def _run_stream(df, name):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append" if "dedup" in name else "complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_windowed_counts_match_batch(spark, pages_dir):
    schema = _schema(spark)
    stream = streaming.read_pages_stream(
        spark, pages_dir + "/*", schema
    )
    counts = streaming.windowed_event_counts(
        stream, window="10 minutes", watermark="30 minutes"
    )
    _run_stream(counts, "win_counts")
    got = {
        (str(r["win_start"]), r["lang"]): r["n"]
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }

    batch = spark.read.schema(schema).parquet(pages_dir + "/*")
    want = {
        (str(r["w"]["start"]), r["lang"]): r["n"]
        for r in batch.groupBy(
            F.window("warc_ts", "10 minutes").alias("w"), "lang"
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want and len(got) > 0


def test_stream_dedup_keeps_one_per_url(spark, pages_dir):
    schema = _schema(spark)
    stream = streaming.read_pages_stream(spark, pages_dir + "/*", schema)
    dedup = streaming.stream_dedup_by_url(stream).select("url")
    _run_stream(dedup, "dedup_urls")
    got = spark.sql("SELECT url FROM dedup_urls").collect()
    urls = [r["url"] for r in got]
    assert len(urls) == len(set(urls))  # unique
    batch = spark.read.schema(schema).parquet(pages_dir + "/*")
    assert len(urls) == batch.select("url").distinct().count()


def test_stream_spatial_join_matches_batch(spark, tmp_path):
    """Stateless streaming spatial join: identical rows to the batch
    operator over the same files."""
    import numpy as np
    import pandas as pd

    from gdal_spark import streaming
    from gdal_spark.operators.spatial_join import spatial_join
    from gdal_spark.testdata import polygons_pdf

    d = str(tmp_path / "pts")
    ids = np.arange(2000, dtype=np.int64)
    pdf = pd.DataFrame({
        "doc_id": ids,
        "lon": ((ids * 2654435761) % 360000000) / 1e6 - 180.0,
        "lat": ((ids * 2246822519 + 7) % 180000000) / 1e6 - 90.0,
    })
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(d)
    schema = spark.read.parquet(d).schema
    polys = polygons_pdf(20)

    stream = spark.readStream.schema(schema).parquet(d)
    joined = streaming.stream_spatial_join(
        stream, polys, res_min=2, res_max=6
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("sj_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r.doc_id, r.poly_id)
        for r in spark.sql("SELECT doc_id, poly_id FROM sj_stream").collect()
    )
    want = sorted(
        (r.doc_id, r.poly_id)
        for r in spatial_join(
            spark.read.parquet(d), polys, res_min=2, res_max=6
        ).collect()
    )
    assert got == want and len(got) > 0
