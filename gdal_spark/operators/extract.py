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
    """Vectorized extraction over one pandas batch (url, text)."""
    hits = pdf["text"].str.extractall(MENTION_RE)
    if hits.empty:
        return pd.DataFrame(
            {
                "url": pd.Series([], dtype=str),
                "feat_id": pd.Series([], dtype=np.int32),
                "kind": pd.Series([], dtype=str),
                "lon": pd.Series([], dtype=np.float64),
                "lat": pd.Series([], dtype=np.float64),
            }
        )
    hits = hits.reset_index()
    row_idx = hits["level_0"].to_numpy()
    return pd.DataFrame(
        {
            "url": pdf["url"].to_numpy()[row_idx],
            "feat_id": hits["match"].to_numpy().astype(np.int32),
            "kind": "point",
            "lon": hits[0].to_numpy().astype(np.float64),
            "lat": hits[1].to_numpy().astype(np.float64),
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
