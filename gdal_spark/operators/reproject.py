"""Vector layer reprojection — the ``ogr2ogr -t_srs`` path
(``OGRGeometry::transform`` via OGRCoordinateTransformation,
``ogr/ogrgeometry.cpp:3380`` + the ct apply in ogrct.cpp; long-edge
densification per ``OGRGeometryFactory::transformWithOptions``).

One Arrow-batched kernel: parse WKB, stack EVERY coordinate of the
batch into one (N, 2) array, apply the picklable transform ONCE
(vectorized — the same callable protocol every transform family in
this package exports: proj/UTM/LCC, datum Helmert, GCP poly, TPS,
RPC, homography, geoloc, approx, compose), then re-encode. Per-batch
cost is one transform call regardless of geometry count — the
row loop only slices offsets.

``densify_max_len`` (source units) subdivides segments longer than
the threshold BEFORE transforming, so curved projections bend long
edges instead of cutting corners — transformWithOptions' option.

Scale: a pure map (no shuffle); composes with any source (shapefile
/ GPKG / GeoJSON / GeoParquet scans) and any sink.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .. import wkb as _wkb


def _densify(coords: np.ndarray, max_len: float) -> np.ndarray:
    if max_len <= 0 or len(coords) < 2:
        return coords
    out = [coords[:1]]
    for a, b in zip(coords[:-1], coords[1:]):
        d = float(np.hypot(b[0] - a[0], b[1] - a[1]))
        k = int(np.ceil(d / max_len))
        if k > 1:
            t = np.linspace(0.0, 1.0, k + 1)[1:, None]
            out.append(a[None, :] * (1 - t) + b[None, :] * t)
        else:
            out.append(b[None, :])
    return np.vstack(out)


def _geom_coords(gt: int, payload, max_len: float):
    """-> (list of coordinate arrays, rebuild closure)."""
    if gt == _wkb.POINT:
        arr = np.asarray([payload], dtype=np.float64)
        return [arr], lambda parts: _wkb.point(
            float(parts[0][0, 0]), float(parts[0][0, 1])
        )
    if gt == _wkb.LINESTRING:
        arr = _densify(np.asarray(payload, dtype=np.float64), max_len)
        return [arr], lambda parts: _wkb.linestring(parts[0].tolist())
    if gt == _wkb.POLYGON:
        rings = [
            _densify(np.asarray(r, dtype=np.float64), max_len)
            for r in payload
        ]
        return rings, lambda parts: _wkb.polygon(
            [p.tolist() for p in parts]
        )
    if gt == _wkb.MULTIPOINT:
        arr = np.asarray(payload, dtype=np.float64).reshape(-1, 2)
        import struct

        def rebuild(parts):
            pts = parts[0]
            return (
                b"\x01"
                + struct.pack("<II", _wkb.MULTIPOINT, len(pts))
                + b"".join(
                    _wkb.point(float(x), float(y)) for x, y in pts
                )
            )

        return [arr], rebuild
    if gt == _wkb.MULTILINESTRING:
        lines = [
            _densify(np.asarray(ls, dtype=np.float64), max_len)
            for ls in payload
        ]
        import struct

        def rebuild(parts):
            return (
                b"\x01"
                + struct.pack("<II", _wkb.MULTILINESTRING, len(parts))
                + b"".join(_wkb.linestring(p.tolist()) for p in parts)
            )

        return lines, rebuild
    if gt == _wkb.MULTIPOLYGON:
        flat: list[np.ndarray] = []
        shape: list[int] = []
        for poly in payload:
            shape.append(len(poly))
            for r in poly:
                flat.append(
                    _densify(np.asarray(r, dtype=np.float64), max_len)
                )

        def rebuild(parts):
            polys = []
            k = 0
            for nr in shape:
                polys.append([parts[k + j].tolist() for j in range(nr)])
                k += nr
            return _wkb.multipolygon(polys)

        return flat, rebuild
    raise ValueError(f"unsupported WKB type {gt}")


def transform_wkb_batch(
    bufs: list[bytes | None], transform, densify_max_len: float = 0.0
) -> list[bytes | None]:
    """Apply ``transform(x, y) -> (X, Y)`` to a batch of WKB blobs
    with ONE vectorized call over every coordinate in the batch."""
    parts_per_geom: list = []
    rebuilds: list = []
    arrays: list[np.ndarray] = []
    for buf in bufs:
        if buf is None:
            parts_per_geom.append(None)
            rebuilds.append(None)
            continue
        gt, payload = _wkb.parse(bytes(buf))
        parts, rebuild = _geom_coords(gt, payload, densify_max_len)
        parts_per_geom.append(parts)
        rebuilds.append(rebuild)
        arrays.extend(parts)
    if arrays:
        stacked = np.vstack(arrays)
        X, Y = transform(stacked[:, 0], stacked[:, 1])
        stacked = np.column_stack(
            [np.asarray(X, np.float64), np.asarray(Y, np.float64)]
        )
    out: list[bytes | None] = []
    k = 0
    for parts, rebuild in zip(parts_per_geom, rebuilds):
        if parts is None:
            out.append(None)
            continue
        new_parts = []
        for p in parts:
            new_parts.append(stacked[k : k + len(p)])
            k += len(p)
        out.append(rebuild(new_parts))
    return out


def reproject_geometries(
    df: DataFrame,
    transform,
    geometry_col: str = "geometry",
    densify_max_len: float = 0.0,
) -> DataFrame:
    """ogr2ogr -t_srs over a WKB column: schema-preserving map."""
    cols = df.columns
    schema = ", ".join(f"`{n}` {t}" for n, t in df.dtypes)

    def gen(batches):
        for pdf in batches:
            out = pdf.copy()
            out[geometry_col] = transform_wkb_batch(
                [
                    None if b is None else bytes(b)
                    for b in pdf[geometry_col]
                ],
                transform,
                densify_max_len,
            )
            yield out[cols]

    return df.mapInPandas(gen, schema)
