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


def test_stream_sessionize_matches_batch_twin(spark, tmp_path):
    """applyInPandasWithState sessionizer == the batch LAG gap-merge
    on the same events. A far-future sentinel per key flushes every
    real session through the gap-split path (deterministic end-state,
    no reliance on timeout firing order at stream end)."""
    import numpy as np
    import pandas as pd

    from gdal_spark.streaming import stream_sessionize

    gap_s = 60
    rng = np.random.RandomState(7)
    rows = []
    base = pd.Timestamp("2026-01-01")
    for k in range(8):
        t = 0
        for s in range(1 + k % 3):  # 1-3 sessions per key
            t += gap_s + 1 + int(rng.randint(0, 300))  # new session
            for e in range(1 + (k + s) % 4):  # 1-4 events
                rows.append((f"u{k}", base + pd.Timedelta(seconds=t)))
                t += int(rng.randint(0, gap_s))  # stay in session
    sentinel = base + pd.Timedelta(days=10)
    sent_rows = [(f"u{k}", sentinel) for k in range(8)]

    d = str(tmp_path / "events")
    os.makedirs(d)
    pdf = pd.DataFrame(rows, columns=["url", "warc_ts"])
    half = len(pdf) // 2
    spark.createDataFrame(pdf.iloc[:half]).coalesce(1).write.parquet(d + "/b0")
    spark.createDataFrame(
        pd.concat(
            [pdf.iloc[half:],
             pd.DataFrame(sent_rows, columns=["url", "warc_ts"])]
        )
    ).coalesce(1).write.parquet(d + "/b1")

    schema = "url string, warc_ts timestamp"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d + "/*")
    )
    sess = stream_sessionize(
        stream, key_col="url", ts_col="warc_ts", gap_s=gap_s,
        watermark="10 seconds",
    )
    q = (
        sess.writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.key, str(r.session_start), str(r.session_end), r.n_events)
        for r in spark.sql(
            "SELECT * FROM sessions WHERE session_start < "
            "timestamp'2026-01-05'"
        ).collect()
    }

    # batch twin: LAG gap-merge over the same (non-sentinel) events
    from pyspark.sql import Window

    ev = spark.createDataFrame(pdf)
    w = Window.partitionBy("url").orderBy("warc_ts")
    twin = (
        ev.withColumn(
            "brk",
            F.when(
                F.col("warc_ts").cast("long")
                - F.lag(F.col("warc_ts").cast("long")).over(w)
                <= gap_s,
                F.lit(0),
            ).otherwise(F.lit(1)),
        )
        .withColumn(
            "sid",
            F.sum("brk").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .groupBy("url", "sid")
        .agg(
            F.min("warc_ts").alias("a"),
            F.max("warc_ts").alias("b"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    want = {
        (r.url, str(r.a), str(r.b), r.n) for r in twin.collect()
    }
    assert got == want


def test_stream_sessionize_out_of_order_bridge(spark, tmp_path):
    """An in-watermark event arriving in a LATER micro-batch that
    bridges two already-open segments merges into ONE session — the
    failure mode of emit-on-sight sessionizers is an overlapping or
    fragmented pair. Segments are held in state until the watermark
    passes end+gap, so nothing is emitted prematurely."""
    import pandas as pd

    from gdal_spark.streaming import stream_sessionize

    gap_s = 100
    base = pd.Timestamp("2026-01-01")

    def ev(*secs):
        return pd.DataFrame(
            [("x", base + pd.Timedelta(seconds=s)) for s in secs],
            columns=["url", "warc_ts"],
        )

    d = str(tmp_path / "ooo")
    os.makedirs(d)
    # batch 0: two segments [1000] and [1300] (300s apart > gap)
    spark.createDataFrame(ev(1000, 1300)).coalesce(1).write.parquet(
        d + "/b0"
    )
    # batch 1: 1100 and 1200 bridge them (every hop <= gap). With a
    # 1h watermark these are NOT late even though they precede b0's
    # max event time.
    spark.createDataFrame(ev(1100, 1200)).coalesce(1).write.parquet(
        d + "/b1"
    )
    # batch 2: sentinel far in the future flushes via watermark
    spark.createDataFrame(ev(10 * 86400)).coalesce(1).write.parquet(
        d + "/b2"
    )

    stream = (
        spark.readStream.schema("url string, warc_ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(d + "/*")
    )
    sess = stream_sessionize(
        stream, key_col="url", ts_col="warc_ts", gap_s=gap_s,
        watermark="1 hour",
    )
    q = (
        sess.writeStream.format("memory")
        .queryName("sessions_ooo")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = [
        (r.key, str(r.session_start), str(r.session_end), r.n_events)
        for r in spark.sql(
            "SELECT * FROM sessions_ooo WHERE session_start < "
            "timestamp'2026-01-05' ORDER BY session_start"
        ).collect()
    ]
    assert got == [
        (
            "x",
            str(base + pd.Timedelta(seconds=1000)),
            str(base + pd.Timedelta(seconds=1300)),
            4,
        )
    ]
