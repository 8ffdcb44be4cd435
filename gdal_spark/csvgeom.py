"""CSV-with-geometry source/sink — the OGR CSV driver's geometry
handling (``ogr/ogrsf_frmts/csv/ogrcsvlayer.cpp``: GEOM_POSSIBLE_NAMES
/ ``_WKT`` column convention; X_POSSIBLE_NAMES/Y_POSSIBLE_NAMES point
building).

Spark-first by construction: the CSV itself rides ``spark.read.csv``
(native splittable source — header, quoting, type inference all
built-in, a 10 TB CSV scans with full parallelism); this module only
adds the two geometry conventions as COLUMN transforms:

* WKT column -> WKB binary (and back) via the engine's own WKT codec
  in an Arrow-batched kernel (WKT grammar is not expressible in
  builtin SQL functions);
* lon/lat column pair -> point WKB, which IS pure codegen (a binary
  concat of literals and IEEE bytes would be, but the kernel keeps
  byte-layout ownership in ``wkb.py``).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import wkb as _wkb


def read_csv_geom(
    spark: SparkSession,
    path: str,
    wkt_col: str = "WKT",
    header: bool = True,
    **csv_options,
) -> DataFrame:
    """spark.read.csv + WKT column decoded to a ``geometry`` WKB
    column (the OGR CSV driver's `_WKT`/GEOM_POSSIBLE_NAMES path)."""
    df = spark.read.csv(
        path, header=header, inferSchema=True, **csv_options
    )
    return wkt_to_geometry(df, wkt_col)


def wkt_to_geometry(
    df: DataFrame, wkt_col: str, out_col: str = "geometry"
) -> DataFrame:
    cols = [c for c in df.columns if c != wkt_col]
    schema = ", ".join(
        f"`{n}` {t}" for n, t in df.dtypes if n != wkt_col
    ) + f", `{out_col}` binary"

    def gen(batches):
        for pdf in batches:
            out = pdf[cols].copy()
            out[out_col] = [
                None if w is None else _wkb.from_wkt(w)
                for w in pdf[wkt_col]
            ]
            yield out

    return df.mapInPandas(gen, schema)


def geometry_to_wkt(
    df: DataFrame, geometry_col: str = "geometry", out_col: str = "WKT"
) -> DataFrame:
    cols = [c for c in df.columns if c != geometry_col]
    schema = ", ".join(
        f"`{n}` {t}" for n, t in df.dtypes if n != geometry_col
    ) + f", `{out_col}` string"

    def gen(batches):
        for pdf in batches:
            out = pdf[cols].copy()
            out[out_col] = [
                None if g is None else _wkb.wkt(bytes(g))
                for g in pdf[geometry_col]
            ]
            yield out

    return df.mapInPandas(gen, schema)


def points_from_xy(
    df: DataFrame,
    x_col: str = "lon",
    y_col: str = "lat",
    out_col: str = "geometry",
) -> DataFrame:
    """X_POSSIBLE_NAMES/Y_POSSIBLE_NAMES analog: build point WKB from
    coordinate columns."""
    schema = ", ".join(f"`{n}` {t}" for n, t in df.dtypes) \
        + f", `{out_col}` binary"

    def gen(batches):
        for pdf in batches:
            out = pdf.copy()
            out[out_col] = [
                None if pd.isna(x) or pd.isna(y)
                else _wkb.point(float(x), float(y))
                for x, y in zip(pdf[x_col], pdf[y_col])
            ]
            yield out

    return df.mapInPandas(gen, schema)


def write_csv_geom(
    df: DataFrame,
    path: str,
    geometry_col: str = "geometry",
    **csv_options,
) -> None:
    """Native distributed CSV write with the geometry column rendered
    as WKT — ogr2ogr -f CSV -lco GEOMETRY=AS_WKT."""
    geometry_to_wkt(df, geometry_col).write.csv(
        path, header=True, **csv_options
    )
