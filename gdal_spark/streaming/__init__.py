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
    """Keep the first arrival per url within the watermark horizon.

    Uses ``dropDuplicatesWithinWatermark`` (Spark 3.5+): state for a
    key is evicted once event time passes the watermark, so the state
    store is bounded by the number of distinct keys seen per watermark
    window — not by the lifetime of the stream.  (Plain
    ``dropDuplicates([key])`` would keep every key forever because the
    event-time column is not part of the dedup subset; Spark only
    evicts at the watermark when it is.)  The semantic trade: a url
    recurring LATER than the watermark delay after its first arrival
    is emitted again — for crawl dedup that is the desired refresh
    behaviour; for strict lifetime-exact dedup use the batch operator.
    """
    return stream.withWatermark(
        ts_col, watermark
    ).dropDuplicatesWithinWatermark([key_col])


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
# state = EVERY segment not yet finalizable: parallel arrays of
# (session_start, last_event, n_events) in epoch micros, sorted.
_SESSION_STATE = (
    "starts array<long>, lasts array<long>, ns array<long>"
)


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
    sessions are data-driven).

    Correctness contract (append mode): a session is emitted ONLY once
    it is provably final — ``session_end + gap < watermark`` — because
    any not-yet-dropped event that could extend or bridge a segment
    must carry ``ts <= segment_end + gap`` and events below the
    watermark never reach this function. Until then EVERY open segment
    (not just the latest) is held in state as parallel (start, last,
    n) arrays, so an out-of-order event arriving in a later
    micro-batch that lands before, inside, or bridging earlier
    segments merges correctly instead of producing overlapping or
    fragmented sessions. State per key is O(open segments), each 24
    bytes, and is bounded by the watermark: a segment becomes final —
    and is emitted and dropped — as soon as the watermark passes its
    end + gap (EventTimeTimeout guarantees the flush even when the key
    goes quiet).

    Batch twin (the repo's streaming verification pattern): the same
    gap rule as a LAG/running-SUM window chain — parity pinned in
    tests/test_streaming.py, including a cross-batch out-of-order
    bridge case. Scale: the shuffle carries (key, ts) only; state
    lives in Spark's checkpointed state store.
    """
    from pyspark.sql.streaming.state import (
        GroupState, GroupStateTimeout,
    )

    gap_us = gap_s * 1_000_000

    def fn(key, pdfs, state: GroupState):
        wm_us = state.getCurrentWatermarkMs() * 1000
        held = []
        if state.exists:
            st = state.get
            held = [
                (int(a), int(b), int(c))
                for a, b, c in zip(st[0], st[1], st[2])
            ]
        if state.hasTimedOut:
            merged = held
        else:
            ts = np.sort(
                np.concatenate(
                    [
                        pdf[ts_col].to_numpy(dtype="datetime64[us]")
                        for pdf in pdfs
                    ]
                )
            ).astype(np.int64)
            if ts.size == 0 and not held:
                yield pd.DataFrame(
                    columns=["key", "session_start", "session_end",
                             "n_events"]
                )
                return
            # segments of the sorted batch at gap boundaries (one
            # vectorized diff), interval-merged with ALL held
            # segments — a new event may extend, bridge, or precede
            # any of them
            if ts.size:
                brk = np.nonzero(np.diff(ts) > gap_us)[0]
                seg_starts = np.concatenate([[0], brk + 1])
                seg_ends = np.concatenate([brk, [ts.size - 1]])
                new_segs = [
                    (int(ts[s_i]), int(ts[e_i]), int(e_i - s_i + 1))
                    for s_i, e_i in zip(seg_starts, seg_ends)
                ]
            else:
                new_segs = []
            intervals = held + new_segs
            intervals.sort()
            merged = [intervals[0]]
            for lo, hi, cnt in intervals[1:]:
                plo, phi, pcnt = merged[-1]
                if lo - phi <= gap_us:
                    merged[-1] = (plo, max(phi, hi), pcnt + cnt)
                else:
                    merged.append((lo, hi, cnt))
        closed = [s for s in merged if s[1] + gap_us < wm_us]
        open_ = [s for s in merged if s[1] + gap_us >= wm_us]
        if open_:
            state.update(
                (
                    [s[0] for s in open_],
                    [s[1] for s in open_],
                    [s[2] for s in open_],
                )
            )
            # fire once the watermark passes the EARLIEST open
            # segment's end + gap (clamped — Spark rejects timeout
            # timestamps at or behind the current watermark)
            state.setTimeoutTimestamp(
                max(
                    (open_[0][1] + gap_us) // 1000,
                    state.getCurrentWatermarkMs() + 1,
                )
            )
        elif state.exists:
            state.remove()
        yield pd.DataFrame(
            [
                {
                    "key": key[0],
                    "session_start": pd.Timestamp(a, unit="us"),
                    "session_end": pd.Timestamp(b, unit="us"),
                    "n_events": int(c),
                }
                for a, b, c in closed
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
