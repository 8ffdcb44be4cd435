"""pages.text → features: deterministic geocoding extraction.

The ETL front of the pipeline (reference analog: ogr2ogr's per-feature
translate loop, apps/ogr2ogr_lib.cpp:653 — here an Arrow-batched
columnar pass, the moral equivalent of its TranslateArrow fast path,
apps/ogr2ogr_lib.cpp:6118).

Extraction is a pure function of ``text`` (itself a pure function of
``url``), preserving the byte-identity invariant: re-extracting from
the same url yields identical features in any partitioning.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

# "Observed near (13.372615,52.512345)" — fixed 6-decimal mentions
MENTION_RE = re.compile(r"\(([-+]?\d+\.\d{6}),([-+]?\d+\.\d{6})\)")

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("feat_id", T.IntegerType()),
        T.StructField("kind", T.StringType()),
        T.StructField("lon", T.DoubleType()),
        T.StructField("lat", T.DoubleType()),
    ]
)


def extract_features_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    """Extraction over one pandas batch (url, text).

    One regex pass over the NUL-joined batch text (a single C-level
    scan) instead of pandas ``str.extractall`` (which builds a
    MultiIndex frame per row and costs ~10x more CPU at this shape);
    match→row attribution is a searchsorted over row offsets."""
    texts = pdf["text"].tolist()
    if not texts:
        return _EMPTY.copy()
    joined = "\x00".join(texts)
    matches = list(MENTION_RE.finditer(joined))
    if not matches:
        return _EMPTY.copy()
    starts = np.fromiter((m.start() for m in matches), dtype=np.int64)
    # offsets[i] = start index of row i+1 in `joined`
    lens = np.fromiter((len(t) + 1 for t in texts), dtype=np.int64)
    offsets = np.cumsum(lens)
    row_idx = np.searchsorted(offsets, starts, side="right")
    idx = np.arange(len(starts), dtype=np.int64)
    feat_id = idx - np.searchsorted(row_idx, row_idx, side="left")
    lon = np.array([m.group(1) for m in matches], dtype=np.float64)
    lat = np.array([m.group(2) for m in matches], dtype=np.float64)
    return pd.DataFrame(
        {
            "url": pdf["url"].to_numpy()[row_idx],
            "feat_id": feat_id.astype(np.int32),
            "kind": "point",
            "lon": lon,
            "lat": lat,
        }
    )


_EMPTY = pd.DataFrame(
    {
        "url": pd.Series([], dtype=str),
        "feat_id": pd.Series([], dtype=np.int32),
        "kind": pd.Series([], dtype=str),
        "lon": pd.Series([], dtype=np.float64),
        "lat": pd.Series([], dtype=np.float64),
    }
)


def extract_features(pages: DataFrame) -> DataFrame:
    """pages → features(url, feat_id, kind, lon, lat).

    mapInPandas: Arrow batches in, vectorized regex, 1→N rows out.
    Column pruning: only (url, text) are read from the scan."""

    def run(batches):
        for pdf in batches:
            yield extract_features_pdf(pdf)

    return pages.select("url", "text").mapInPandas(run, schema=FEATURES_SCHEMA)


# ---------------------------------------------------------------------------
# html → text extraction (the north-rule byte-identity invariant)
# ---------------------------------------------------------------------------

# script/style subtrees contribute no text (case-insensitive, tolerant
# of attributes); then any remaining tag is stripped.
_DROP_SUBTREE_RE = re.compile(
    rb"<(script|style)\b[^>]*>.*?</\1\s*>", re.IGNORECASE | re.DOTALL
)
_TAG_RE = re.compile(rb"<[^>]*>")
_ENTITIES = [
    (b"&lt;", b"<"), (b"&gt;", b">"), (b"&quot;", b'"'),
    (b"&#39;", b"'"), (b"&amp;", b"&"),  # &amp; LAST: "&amp;lt;" → "&lt;"
]


def extract_text_bytes(html: bytes) -> bytes:
    """One document: drop script/style subtrees, strip tags, unescape
    the five standard entities. Deterministic pure function of the
    input bytes — same url, same bytes out, on any executor."""
    s = _DROP_SUBTREE_RE.sub(b"", html)
    s = _TAG_RE.sub(b"", s)
    for ent, ch in _ENTITIES:
        s = s.replace(ent, ch)
    return s


def extract_text(pages: DataFrame, out_col: str = "text_extracted") -> DataFrame:
    """pages(url, html) → (url, text_extracted): the WARC-style
    extraction step in front of the feature pipeline. The invariant
    the driver contract states (BASELINE.json input_hint): extracted
    text is BYTE-IDENTICAL per url across runs and partitionings —
    guaranteed here because the kernel is a pure function of the html
    bytes and the plan is a stateless mapInPandas (no shuffle, no
    order dependence). Reference analog: per-feature translate loop in
    apps/ogr2ogr_lib.cpp:653 reading WARC-extracted layers."""

    def run(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "url": pdf["url"],
                    out_col: [
                        extract_text_bytes(bytes(h)).decode(
                            "utf-8", errors="replace"
                        )
                        for h in pdf["html"]
                    ],
                }
            )

    return pages.select("url", "html").mapInPandas(
        run, schema=f"url string, {out_col} string"
    )
