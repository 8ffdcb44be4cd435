"""ST_* functions registered into Spark SQL — the engine's analog of
the reference's SQLite-dialect function registry
(ogr/ogrsf_frmts/sqlite/ogrsqlitesqlfunctions.cpp:876-1054), which
makes ST_Area/ST_Intersects/... callable from a real SQL string
rather than only from the DataFrame API.

``register_st_functions(spark)`` registers every function as an
Arrow-batched pandas UDF over WKB binary columns, wrapping the SAME
numpy kernels the DataFrame operators use (`geometry.py`), so SQL
results are value-identical to the operator results by construction.
After registration the functions work in ``spark.sql(...)`` AND in
the OGR SQL dialect front-end (``ogrsql.execute`` compiles unknown
``st_*`` calls to the registered UDFs).

Scale notes: each UDF is a per-row geometry kernel behind Arrow
transfer — the right tool for SELECT-list evaluation and ad-hoc SQL.
Joins ON st_intersects(...) evaluated this way are nested-loop; for
large joins use the cell-cover operators (`spatial_join`,
`intersection_join`, `predicate_pairs_join`), exactly as the
reference steers big joins away from per-pair SQL functions.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf

from . import geometry, wkb


def _parts(buf) -> list:
    return wkb.polygon_rings(bytes(buf))


def _first_ring(buf) -> np.ndarray:
    return geometry._open_ring(_parts(buf)[0][0])


def _area(buf) -> float:
    return float(
        sum(geometry.polygon_area(rings) for rings in _parts(buf))
    )


def _length(buf) -> float:
    return float(
        sum(
            geometry.ring_perimeter(r)
            for rings in _parts(buf)
            for r in rings
        )
    )


def _centroid(buf) -> tuple[float, float]:
    """Area-weighted centroid over parts, holes subtracted."""
    wsum = 0.0
    cx = cy = 0.0
    for rings in _parts(buf):
        for i, r in enumerate(rings):
            a = abs(geometry.ring_area(r))
            x, y = geometry.ring_centroid(r)
            sgn = 1.0 if i == 0 else -1.0
            wsum += sgn * a
            cx += sgn * a * x
            cy += sgn * a * y
    if wsum == 0.0:
        return float("nan"), float("nan")
    return cx / wsum, cy / wsum


def _pair_pred(name):
    def fn(a, b) -> bool:
        d = geometry.polygon_pair_predicates(
            _first_ring(a), _first_ring(b)
        )
        return bool(d[name])

    return fn


def register_st_functions(spark) -> list[str]:
    """Register the ST function set; returns the registered names.
    Idempotent (re-registration replaces)."""

    def scalar_d(py):
        @pandas_udf("double")
        def u(s: pd.Series) -> pd.Series:
            return s.map(py).astype("float64")

        return u

    def pred(py):
        @pandas_udf("boolean")
        def u(a: pd.Series, b: pd.Series) -> pd.Series:
            return pd.Series(
                [py(x, y) for x, y in zip(a, b)], dtype="bool"
            )

        return u

    names: list[str] = []

    def reg(name, udf):
        spark.udf.register(name, udf)
        names.append(name)

    reg("st_area", scalar_d(_area))
    reg("st_length", scalar_d(_length))
    reg("st_perimeter", scalar_d(_length))
    reg("st_centroid_x", scalar_d(lambda b: _centroid(b)[0]))
    reg("st_centroid_y", scalar_d(lambda b: _centroid(b)[1]))

    for p in geometry._PREDICATES:
        reg(f"st_{p}", pred(_pair_pred(p)))

    @pandas_udf("binary")
    def _buf_udf(g: pd.Series, d: pd.Series) -> pd.Series:
        from .operators.geom_ops import buffer_polygon

        out = []
        for b, dist in zip(g, d):
            pieces, _ = buffer_polygon(bytes(b), float(dist))
            out.append(
                wkb.multipolygon(
                    [[np.vstack([p, p[:1]])] for p in pieces]
                )
            )
        return pd.Series(out)

    reg("st_buffer", _buf_udf)

    @pandas_udf("boolean")
    def _valid_udf(g: pd.Series) -> pd.Series:
        return pd.Series(
            [
                len(geometry.ring_self_intersections(_first_ring(b)))
                == 0
                for b in g
            ],
            dtype="bool",
        )

    reg("st_isvalid", _valid_udf)

    @pandas_udf("binary")
    def _mkvalid_udf(g: pd.Series) -> pd.Series:
        from .operators.geom_ops import make_valid_polygon

        out = []
        for b in g:
            pieces, _ = make_valid_polygon(bytes(b))
            out.append(
                wkb.multipolygon(
                    [[np.vstack([p, p[:1]])] for p in pieces]
                )
            )
        return pd.Series(out)

    reg("st_makevalid", _mkvalid_udf)

    @pandas_udf("long")
    def _npoints_udf(g: pd.Series) -> pd.Series:
        return pd.Series(
            [
                sum(len(r) for rings in _parts(b) for r in rings)
                for b in g
            ],
            dtype="int64",
        )

    reg("st_npoints", _npoints_udf)
    return names
