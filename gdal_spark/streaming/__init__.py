"""Structured Streaming surface (roadmap layer).

The reference is a batch engine — its only "streaming" is I/O-level
(forward-only iterators, /vsistdin, single-pass HTTP; SURVEY.md §2.12)
— so no streaming operator is required for parity. This package is the
engine's forward-looking ingest path for the pages table: a
file-arrival stream with event-time watermarking, exactly the shape an
Iceberg ingest job would take at production scale.

Operators mirror their batch twins so results are comparable:
``windowed_event_counts`` ↔ groupBy(window).count,
``stream_dedup_by_url`` ↔ the exact-dedup operator with ``warc_ts``
watermark bounding the dedup state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def read_pages_stream(
    spark,
    path: str,
    schema,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-arrival stream over a growing directory of parquet pages
    (the sandbox stand-in for an Iceberg streaming read)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def windowed_event_counts(
    stream: DataFrame,
    ts_col: str = "warc_ts",
    key_col: str = "lang",
    window: str = "10 minutes",
    slide: str | None = None,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Tumbling (or sliding) event-time window counts with late-data
    handling via watermark — the canonical stateful aggregation."""
    win = (
        F.window(F.col(ts_col), window, slide)
        if slide
        else F.window(F.col(ts_col), window)
    )
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(win.alias("w"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("win_start"),
            F.col("w.end").alias("win_end"),
            key_col,
            "n",
        )
    )


def stream_dedup_by_url(
    stream: DataFrame,
    ts_col: str = "warc_ts",
    key_col: str = "url",
    watermark: str = "1 hour",
) -> DataFrame:
    """Keep the first arrival per url; watermark bounds the dedup state
    so it doesn't grow without limit (dropDuplicates + watermark —
    state eviction past the watermark)."""
    return stream.withWatermark(ts_col, watermark).dropDuplicates(
        [key_col]
    )


def stream_spatial_join(stream_points: DataFrame, polygons_pdf, **kw):
    """Streaming spatial enrichment: the EXACT batch plan — cell-cover
    broadcast equi-join + ray-cast PIP — applied to an unbounded point
    source. All ops are stateless (project/explode/broadcast-join/
    filter), so Structured Streaming runs the same declarative plan
    per micro-batch with no watermark or state store; parity with the
    batch twin is by construction and pinned in tests."""
    from ..operators.spatial_join import spatial_join

    return spatial_join(stream_points, polygons_pdf, **kw)
