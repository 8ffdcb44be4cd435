"""OSM PBF source/sink — the OGR OSM driver analog
(``ogr/ogrsf_frmts/osm/osm2osm.cpp`` / ``osm_parser.cpp``), from the
PUBLIC OSM PBF format spec (fileformat.proto / osmformat.proto).

Wire layout (all public):
* file = sequence of [int32 BE header length][BlobHeader][Blob];
  BlobHeader { type (1, "OSMHeader"/"OSMData"), datasize (3) };
  Blob { raw (1) | raw_size (2) + zlib_data (3) }.
* OSMData blob = PrimitiveBlock { stringtable (1: repeated bytes s
  (1)), primitivegroup (2), granularity (17, default 100),
  lat_offset (19), lon_offset (20) }; PrimitiveGroup { dense (2),
  ways (3) }; DenseNodes { id (1, packed DELTA sint64), lat (8,
  packed delta sint64), lon (9, packed delta sint64), keys_vals
  (10, packed int32, 0-terminated per node) }; Way { id (1),
  keys/vals (2/3 packed), refs (8, packed delta sint64) }.
* degrees = 1e-9 * (offset + granularity * raw).

Protobuf primitives reuse the MVT module's hand-rolled wire codec —
one from-spec wire layer serves both formats.

Spark shape — the format's killer property is that every OSMData
blob decodes INDEPENDENTLY: :func:`blob_index` walks only the
framing (driver-side, ~16 bytes per blob touched via seeks),
:func:`read_osm_pbf` then fans the (offset, size) list out so each
task seek-reads and decodes its own blobs — a planet-scale .osm.pbf
scans with full cluster parallelism and zero feature bytes through
the driver (the same ranged-scan shape as the COG and .shx paths).
Tags surface as a canonical-JSON string column (Spark-native access
via get_json_object, like the GeoJSON source).
"""

from __future__ import annotations

import json
import struct
import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from .mvt import _Reader, _ld, _varint, _vi, _zigzag, _unzigzag


# ------------------------------------------------------------------
# packed helpers
# ------------------------------------------------------------------


def _packed_varints(buf: bytes) -> list[int]:
    r = _Reader(buf)
    out = []
    while r.pos < len(buf):
        out.append(r.varint())
    return out


def _pack_varints(vals) -> bytes:
    return b"".join(_varint(int(v)) for v in vals)


def _pack_delta_sint(vals) -> bytes:
    vals = np.asarray(vals, dtype=np.int64)
    deltas = np.diff(vals, prepend=np.int64(0))
    return b"".join(_varint(_zigzag(int(d))) for d in deltas)


def _unpack_delta_sint(buf: bytes) -> np.ndarray:
    raw = [_unzigzag(v) for v in _packed_varints(buf)]
    return np.cumsum(np.asarray(raw, dtype=np.int64))


# ------------------------------------------------------------------
# blob framing
# ------------------------------------------------------------------


def _frame_blob(btype: str, payload: bytes, compress: bool = True) -> bytes:
    if compress:
        z = zlib.compress(payload, 6)
        blob = _vi(2, len(payload)) + _ld(3, z)
    else:
        blob = _ld(1, payload)
    header = _ld(1, btype.encode()) + _vi(3, len(blob))
    return struct.pack(">i", len(header)) + header + blob


def _read_frames(buf: bytes):
    """Yield (btype, offset, header_end, blob_size) walking only the
    framing."""
    pos = 0
    while pos + 4 <= len(buf):
        (hlen,) = struct.unpack_from(">i", buf, pos)
        header = buf[pos + 4 : pos + 4 + hlen]
        btype = ""
        dsize = 0
        for f, v in _Reader(header).fields():
            if f == 1:
                btype = v.decode()
            elif f == 3:
                dsize = v
        yield btype, pos, pos + 4 + hlen, dsize
        pos = pos + 4 + hlen + dsize


def _blob_payload(blob: bytes) -> bytes:
    raw = None
    zdata = None
    for f, v in _Reader(blob).fields():
        if f == 1:
            raw = v
        elif f == 3:
            zdata = v
    if raw is not None:
        return raw
    if zdata is not None:
        return zlib.decompress(zdata)
    raise ValueError("blob carries no data")


# ------------------------------------------------------------------
# PrimitiveBlock codec
# ------------------------------------------------------------------


def encode_primitive_block(
    nodes: list[tuple[int, float, float, dict]],
    ways: list[tuple[int, list[int], dict]] | None = None,
    granularity: int = 100,
) -> bytes:
    """(id, lon, lat, tags) nodes + (id, refs, tags) ways -> one
    OSMData PrimitiveBlock payload (DenseNodes + Way messages)."""
    strings: list[bytes] = [b""]  # index 0 reserved (spec)
    sidx: dict[str, int] = {}

    def s_id(s: str) -> int:
        i = sidx.get(s)
        if i is None:
            i = len(strings)
            strings.append(s.encode("utf-8"))
            sidx[s] = i
        return i

    groups = b""
    if nodes:
        ids = [n[0] for n in nodes]
        lons = [round(n[1] * 1e9) // granularity for n in nodes]
        lats = [round(n[2] * 1e9) // granularity for n in nodes]
        kv: list[int] = []
        for n in nodes:
            for k, v in (n[3] or {}).items():
                kv.extend((s_id(k), s_id(str(v))))
            kv.append(0)
        dense = (
            _ld(1, _pack_delta_sint(ids))
            + _ld(8, _pack_delta_sint(lats))
            + _ld(9, _pack_delta_sint(lons))
            + _ld(10, _pack_varints(kv))
        )
        groups += _ld(2, _ld(2, dense))
    for wid, refs, tags in ways or []:
        w = _vi(1, wid)
        ks = [s_id(k) for k in (tags or {})]
        vs = [s_id(str(v)) for v in (tags or {}).values()]
        if ks:
            w += _ld(2, _pack_varints(ks)) + _ld(3, _pack_varints(vs))
        w += _ld(8, _pack_delta_sint(refs))
        groups += _ld(2, _ld(3, w))
    st = _ld(1, b"".join(_ld(1, s) for s in strings))
    block = st + groups + _vi(17, granularity)
    return block


def decode_primitive_block(payload: bytes):
    """PrimitiveBlock payload -> (nodes_df_dict, ways list)."""
    strings: list[str] = []
    granularity = 100
    lat_off = lon_off = 0
    groups: list[bytes] = []
    for f, v in _Reader(payload).fields():
        if f == 1:
            for sf, sv in _Reader(v).fields():
                if sf == 1:
                    strings.append(sv.decode("utf-8"))
        elif f == 2:
            groups.append(v)
        elif f == 17:
            granularity = v
        elif f == 19:
            lat_off = v
        elif f == 20:
            lon_off = v
    nodes = {"id": [], "lon": [], "lat": [], "tags": []}
    ways = []
    for g in groups:
        for gf, gv in _Reader(g).fields():
            if gf == 2:  # DenseNodes
                ids = lats = lons = None
                kv: list[int] = []
                for df_, dv in _Reader(gv).fields():
                    if df_ == 1:
                        ids = _unpack_delta_sint(dv)
                    elif df_ == 8:
                        lats = _unpack_delta_sint(dv)
                    elif df_ == 9:
                        lons = _unpack_delta_sint(dv)
                    elif df_ == 10:
                        kv = _packed_varints(dv)
                lat_deg = 1e-9 * (lat_off + granularity * lats)
                lon_deg = 1e-9 * (lon_off + granularity * lons)
                # split the 0-terminated keys_vals stream per node
                tags_per_node: list[dict] = []
                cur: dict = {}
                i = 0
                while i < len(kv):
                    if kv[i] == 0:
                        tags_per_node.append(cur)
                        cur = {}
                        i += 1
                    else:
                        cur[strings[kv[i]]] = strings[kv[i + 1]]
                        i += 2
                while len(tags_per_node) < len(ids):
                    tags_per_node.append({})
                nodes["id"].extend(int(x) for x in ids)
                nodes["lon"].extend(float(x) for x in lon_deg)
                nodes["lat"].extend(float(x) for x in lat_deg)
                nodes["tags"].extend(tags_per_node)
            elif gf == 3:  # Way
                wid = 0
                ks = vs = []
                refs = np.array([], dtype=np.int64)
                for wf, wv in _Reader(gv).fields():
                    if wf == 1:
                        wid = wv
                    elif wf == 2:
                        ks = _packed_varints(wv)
                    elif wf == 3:
                        vs = _packed_varints(wv)
                    elif wf == 8:
                        refs = _unpack_delta_sint(wv)
                tags = {
                    strings[k]: strings[v] for k, v in zip(ks, vs)
                }
                ways.append((int(wid), [int(r) for r in refs], tags))
    return nodes, ways


# ------------------------------------------------------------------
# file-level API
# ------------------------------------------------------------------


def write_osm_pbf(
    path: str,
    nodes: list[tuple[int, float, float, dict]],
    ways: list[tuple[int, list[int], dict]] | None = None,
    nodes_per_block: int = 8000,
) -> int:
    """Write an .osm.pbf (OSMHeader + OSMData blobs, zlib). Returns
    the blob count. Test-fixture writer AND sink primitive."""
    header = _ld(4, b"OsmSchema-V0.6") + _ld(16, b"gdal_spark")
    blobs = [_frame_blob("OSMHeader", header)]
    for i in range(0, max(len(nodes), 1), nodes_per_block):
        chunk = nodes[i : i + nodes_per_block]
        w = ways if i + nodes_per_block >= len(nodes) else []
        blobs.append(
            _frame_blob(
                "OSMData", encode_primitive_block(chunk, w)
            )
        )
    with open(path, "wb") as f:
        for b in blobs:
            f.write(b)
    return len(blobs)


def blob_index(path: str, opener=None) -> list[tuple[int, int, int]]:
    """(header_end_offset, blob_size, seq) of every OSMData blob —
    walks only the framing: read the 4-byte length + BlobHeader, then
    ``seek(datasize, 1)`` past the blob body. Bytes touched on the
    driver are O(blobs × ~16 B), never the file size — a planet-scale
    ~80 GB .osm.pbf indexes without buffering any feature bytes."""
    from .io import local_opener

    out = []
    seq = 0
    with (opener or local_opener)(path) as f:
        while True:
            lenbuf = f.read(4)
            if len(lenbuf) < 4:
                break
            (hlen,) = struct.unpack(">i", lenbuf)
            header = f.read(hlen)
            if len(header) < hlen:
                break
            btype = ""
            dsize = 0
            for fld, v in _Reader(header).fields():
                if fld == 1:
                    btype = v.decode()
                elif fld == 3:
                    dsize = v
            hend = f.tell()
            if btype == "OSMData":
                out.append((hend, dsize, seq))
            f.seek(dsize, 1)
            seq += 1
    return out


_NODE_SCHEMA = "id long, lon double, lat double, tags string"


def read_osm_pbf(
    spark: SparkSession, path: str, blobs_per_task: int = 4,
    opener=None,
) -> DataFrame:
    """Distributed node scan: the driver walks ONLY the blob framing;
    (offset, size) pairs fan out and each task seek-reads + inflates
    + decodes its own OSMData blobs. Tags land as canonical JSON.
    ``opener`` (picklable path→file-like; default shared-FS open —
    gdal_spark.io) is the object-store seam for every byte."""
    from .io import local_opener

    opener = opener or local_opener
    idx = blob_index(path, opener=opener)

    def gen(batches):
        for pdf in batches:
            for off, size in zip(pdf["off"], pdf["size"]):
                with opener(path) as f:
                    f.seek(int(off))
                    blob = f.read(int(size))
                nodes, _ways = decode_primitive_block(
                    _blob_payload(blob)
                )
                if nodes["id"]:
                    yield pd.DataFrame(
                        {
                            "id": nodes["id"],
                            "lon": nodes["lon"],
                            "lat": nodes["lat"],
                            "tags": [
                                json.dumps(
                                    t, sort_keys=True,
                                    separators=(",", ":"),
                                )
                                for t in nodes["tags"]
                            ],
                        }
                    )

    pdf = spark.createDataFrame(
        [(o, s) for o, s, _ in idx], "off long, size long"
    )
    n_parts = max(1, len(idx) // blobs_per_task)
    return pdf.repartition(min(n_parts, 256)).mapInPandas(
        gen, _NODE_SCHEMA
    )


def read_osm_ways(
    spark: SparkSession, path: str, opener=None
) -> DataFrame:
    """Distributed way scan: (id, refs array<long>, tags json)."""
    from .io import local_opener

    opener = opener or local_opener
    idx = blob_index(path, opener=opener)

    def gen(batches):
        for pdf in batches:
            for off, size in zip(pdf["off"], pdf["size"]):
                with opener(path) as f:
                    f.seek(int(off))
                    blob = f.read(int(size))
                _nodes, ways = decode_primitive_block(
                    _blob_payload(blob)
                )
                if ways:
                    yield pd.DataFrame(
                        {
                            "id": [w[0] for w in ways],
                            "refs": [w[1] for w in ways],
                            "tags": [
                                json.dumps(
                                    w[2], sort_keys=True,
                                    separators=(",", ":"),
                                )
                                for w in ways
                            ],
                        }
                    )

    pdf = spark.createDataFrame(
        [(o, s) for o, s, _ in idx], "off long, size long"
    )
    return pdf.repartition(min(max(1, len(idx)), 64)).mapInPandas(
        gen, "id long, refs array<long>, tags string"
    )
