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

import numpy as np
import pandas as pd
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


SESSION_SCHEMA = (
    "key string, session_start timestamp, session_end timestamp, "
    "n_events long"
)
_SESSION_STATE = "start long, last long, n long"


def stream_sessionize(
    stream: DataFrame,
    key_col: str = "url",
    ts_col: str = "warc_ts",
    gap_s: int = 1800,
    watermark: str = "1 hour",
) -> DataFrame:
    """CUSTOM STATEFUL streaming operator via applyInPandasWithState:
    per-key sessionization with an inactivity gap — the operator
    Structured Streaming has no built-in for (windows are fixed-width;
    sessions are data-driven). State per key = (session start, last
    event, count) in epoch micros; a session is emitted when a new
    event arrives past the gap, or when the state times out at the
    watermark (GroupStateTimeout.EventTimeTimeout bounds state size —
    no key lingers past watermark + gap).

    Batch twin (the repo's streaming verification pattern): the same
    gap rule as a LAG/running-SUM window chain — parity pinned in
    tests/test_streaming.py. Scale: state is 24 bytes/key + Spark's
    HDFS-backed state store; the shuffle carries (key, ts) only.
    """
    from pyspark.sql.streaming.state import (
        GroupState, GroupStateTimeout,
    )

    gap_us = gap_s * 1_000_000

    def fn(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "key": [key[0]],
                    "session_start": [pd.Timestamp(start, unit="us")],
                    "session_end": [pd.Timestamp(last, unit="us")],
                    "n_events": [int(n)],
                }
            )
            return
        ts = np.sort(
            np.concatenate(
                [
                    pdf[ts_col].to_numpy(dtype="datetime64[us]")
                    for pdf in pdfs
                ]
            )
        ).astype(np.int64)
        if ts.size == 0:
            yield pd.DataFrame(
                columns=["key", "session_start", "session_end",
                         "n_events"]
            )
            return
        # segments of the sorted batch at gap boundaries (one
        # vectorized diff), merged with the carried open session by
        # INTERVAL arithmetic — robust to micro-batches arriving out
        # of event-time order within the watermark (Spark drops rows
        # older than the watermark before they reach this function;
        # anything younger may still interleave across batches)
        brk = np.nonzero(np.diff(ts) > gap_us)[0]
        seg_starts = np.concatenate([[0], brk + 1])
        seg_ends = np.concatenate([brk, [ts.size - 1]])
        intervals = [
            (int(ts[s_i]), int(ts[e_i]), int(e_i - s_i + 1))
            for s_i, e_i in zip(seg_starts, seg_ends)
        ]
        if state.exists:
            st = state.get
            intervals.append((int(st[0]), int(st[1]), int(st[2])))
            intervals.sort()
        merged = [intervals[0]]
        for lo, hi, cnt in intervals[1:]:
            plo, phi, pcnt = merged[-1]
            if lo - phi <= gap_us:
                merged[-1] = (plo, max(phi, hi), pcnt + cnt)
            else:
                merged.append((lo, hi, cnt))
        out = merged[:-1]
        start, last, n = merged[-1]
        state.update((int(start), int(last), int(n)))
        # event-time timeout: fires once the watermark passes last+gap
        # (clamped — Spark rejects timestamps behind the current
        # watermark, which happens when another key's much-later event
        # has already advanced it past this key's session end)
        state.setTimeoutTimestamp(
            max(
                (last + gap_us) // 1000,
                state.getCurrentWatermarkMs() + 1,
            )
        )
        yield pd.DataFrame(
            [
                {
                    "key": key[0],
                    "session_start": pd.Timestamp(a, unit="us"),
                    "session_end": pd.Timestamp(b, unit="us"),
                    "n_events": int(c),
                }
                for a, b, c in out
            ],
            columns=["key", "session_start", "session_end", "n_events"],
        )

    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.col(key_col))
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_SESSION_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
