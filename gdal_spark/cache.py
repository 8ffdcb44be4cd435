"""Session cache registry for operator-internal persists.

Several operators persist intermediates whose lifetime must outlive
the operator call (the RETURNED plan reads the cache: minhash
candidate pairs, layer-algebra piece tables, kNN ring state, sieve
subgraphs). There is no safe in-operator unpersist point — the caller
decides when results are consumed — so those persists route through
``track`` and a long-lived session (notebook, service) releases them
in one call:

    from gdal_spark import cache
    ...consume results...
    cache.unpersist_all()

Per-query processes (the driver gate, bench.py) don't need to call it
— executor/storage memory dies with the session. ``unpersist_all``
is safe while downstream plans still exist: Spark recomputes evicted
stages from lineage; only latency, never correctness, is at stake.
"""

from __future__ import annotations

_TRACKED: list = []


def track(df, storage_level=None):
    """Persist ``df`` and register it for :func:`unpersist_all`."""
    df = df.persist(storage_level) if storage_level else df.persist()
    _TRACKED.append(df)
    return df


def unpersist_all(blocking: bool = False) -> int:
    """Unpersist every tracked DataFrame; returns how many released."""
    n = 0
    for df in _TRACKED:
        try:
            df.unpersist(blocking)
            n += 1
        except Exception:
            pass
    _TRACKED.clear()
    return n
