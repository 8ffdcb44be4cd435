"""NTv2 grid-shift datum transforms (.gsb) — from-spec.

The reference applies grid-based datum shifts (NAD27→NAD83,
OSGB36→ETRS89, ...) through PROJ's ``hgridshift`` with NTv2 grids
(its autotest ships them under ``autotest/proj_grids/*.gsb``; the
raster driver view of the format is frmts/ntv2/ntv2dataset.cpp).
PROJ is external to the reference tree, so — like the Krüger/Snyder
series in :mod:`gdal_spark.proj` — this is a from-spec
implementation of the published National Transformation v2 format
(Geodetic Survey of Canada) and its standard evaluation:

* ``.gsb`` layout: an 11-record overview header, then per-subgrid
  11-record headers + ``GS_COUNT`` 16-byte nodes of four float32s
  (lat shift, lon shift, two accuracies), all shifts in ARC-SECONDS
  with longitude POSITIVE WEST; nodes run east→west fastest, then
  south→north.
* evaluation: bilinear interpolation of the two shift surfaces at
  the source coordinate; ``target_lat = lat + Δlat/3600``,
  ``target_lon = lon − Δlon/3600`` (west-positive Δlon against
  east-positive longitudes). The inverse is the standard fixed-point
  iteration (PROJ hgridshift inverse, 4 rounds).
* subgrid selection: the FINEST (smallest LAT_INC) subgrid whose
  extent contains the point — the parent/child refinement NTv2
  encodes via the PARENT record. Points outside every subgrid pass
  through unshifted.

:class:`NTv2Shift` is a picklable ``(lon, lat) → (lon, lat)``
vectorized numpy kernel, so it drops into
:func:`gdal_spark.proj.compose` and the distributed warp gather like
every other transform step: executors each parse the (broadcast-
sized — real national grids are a few MB) grid bytes once per
process; no per-point Python, no driver stage.
"""

from __future__ import annotations

import struct

import numpy as np

_OREC = [
    "NUM_OREC", "NUM_SREC", "NUM_FILE", "GS_TYPE ", "VERSION ",
    "SYSTEM_F", "SYSTEM_T", "MAJOR_F ", "MINOR_F ", "MAJOR_T ",
    "MINOR_T ",
]
_SREC = [
    "SUB_NAME", "PARENT  ", "CREATED ", "UPDATED ", "S_LAT   ",
    "N_LAT   ", "E_LONG  ", "W_LONG  ", "LAT_INC ", "LONG_INC",
    "GS_COUNT",
]


def _rec_str(name: str, val: str) -> bytes:
    return name.encode("ascii") + val.ljust(8)[:8].encode("ascii")


def _rec_int(name: str, val: int) -> bytes:
    return name.encode("ascii") + struct.pack("<i4x", int(val))


def _rec_dbl(name: str, val: float) -> bytes:
    return name.encode("ascii") + struct.pack("<d", float(val))


def gsb_encode(
    subgrids: list[dict],
    system_f: str = "NAD27",
    system_t: str = "NAD83",
) -> bytes:
    """Serialize subgrid dicts into a little-endian ``.gsb`` byte
    string. Each dict: ``name``, ``parent`` ("NONE" for top-level),
    ``s_lat n_lat e_long w_long lat_inc long_inc`` (arc-seconds,
    longitude positive west, so ``e_long < w_long``), and
    ``lat_shift`` / ``lon_shift`` — (nrows, ncols) float arrays in
    arc-seconds, row 0 at S_LAT, column 0 at E_LONG (stored float32,
    the format's node precision)."""
    parts = [
        _rec_int("NUM_OREC", 11),
        _rec_int("NUM_SREC", 11),
        _rec_int("NUM_FILE", len(subgrids)),
        _rec_str("GS_TYPE ", "SECONDS"),
        _rec_str("VERSION ", "NTv2.0"),
        _rec_str("SYSTEM_F", system_f),
        _rec_str("SYSTEM_T", system_t),
        _rec_dbl("MAJOR_F ", 6378206.4),
        _rec_dbl("MINOR_F ", 6356583.8),
        _rec_dbl("MAJOR_T ", 6378137.0),
        _rec_dbl("MINOR_T ", 6356752.314),
    ]
    for sg in subgrids:
        la = np.ascontiguousarray(sg["lat_shift"], dtype=np.float32)
        lo = np.ascontiguousarray(sg["lon_shift"], dtype=np.float32)
        nrows, ncols = la.shape
        if lo.shape != la.shape:
            raise ValueError("lat/lon shift shapes differ")
        exp_rows = round(
            (sg["n_lat"] - sg["s_lat"]) / sg["lat_inc"]
        ) + 1
        exp_cols = round(
            (sg["w_long"] - sg["e_long"]) / sg["long_inc"]
        ) + 1
        if (nrows, ncols) != (exp_rows, exp_cols):
            raise ValueError(
                f"grid {la.shape} != extent/incs {(exp_rows, exp_cols)}"
            )
        parts += [
            _rec_str("SUB_NAME", sg["name"]),
            _rec_str("PARENT  ", sg.get("parent", "NONE")),
            _rec_str("CREATED ", "        "),
            _rec_str("UPDATED ", "        "),
            _rec_dbl("S_LAT   ", sg["s_lat"]),
            _rec_dbl("N_LAT   ", sg["n_lat"]),
            _rec_dbl("E_LONG  ", sg["e_long"]),
            _rec_dbl("W_LONG  ", sg["w_long"]),
            _rec_dbl("LAT_INC ", sg["lat_inc"]),
            _rec_dbl("LONG_INC", sg["long_inc"]),
            _rec_int("GS_COUNT", nrows * ncols),
        ]
        node = np.zeros((nrows * ncols, 4), dtype="<f4")
        node[:, 0] = la.ravel()
        node[:, 1] = lo.ravel()
        parts.append(node.tobytes())
    parts.append(_rec_str("END     ", ""))
    return b"".join(parts)


def gsb_parse(buf: bytes) -> list[dict]:
    """Parse a ``.gsb`` byte string → subgrid dicts (see
    :func:`gsb_encode`; shift arrays come back float64 for the
    interpolation kernel). Handles both byte orders (big-endian
    files flag themselves via an implausible NUM_OREC)."""
    if len(buf) < 16 * 11:
        raise ValueError("truncated NTv2 file")
    end = "<"
    n_orec = struct.unpack_from("<i", buf, 8)[0]
    if n_orec != 11:
        if struct.unpack_from(">i", buf, 8)[0] == 11:
            end = ">"
        else:
            raise ValueError("not an NTv2 .gsb (NUM_OREC != 11)")
    pos = 16
    n_srec = struct.unpack_from(end + "i", buf, pos + 8)[0]
    pos += 16
    n_file = struct.unpack_from(end + "i", buf, pos + 8)[0]
    pos = 16 * 11
    if n_srec != 11:
        raise ValueError("NUM_SREC != 11")
    out = []
    for _ in range(n_file):
        hdr = {}
        for i in range(11):
            name = buf[pos:pos + 8].decode("ascii")
            if name in ("S_LAT   ", "N_LAT   ", "E_LONG  ",
                        "W_LONG  ", "LAT_INC ", "LONG_INC"):
                hdr[name.strip()] = struct.unpack_from(
                    end + "d", buf, pos + 8
                )[0]
            elif name == "GS_COUNT":
                hdr["GS_COUNT"] = struct.unpack_from(
                    end + "i", buf, pos + 8
                )[0]
            else:
                hdr[name.strip()] = (
                    buf[pos + 8:pos + 16].decode("ascii").strip()
                )
            pos += 16
        cnt = hdr["GS_COUNT"]
        node = np.frombuffer(
            buf, dtype=end + "f4", count=cnt * 4, offset=pos
        ).reshape(cnt, 4)
        pos += cnt * 16
        ncols = round((hdr["W_LONG"] - hdr["E_LONG"])
                      / hdr["LONG_INC"]) + 1
        nrows = round((hdr["N_LAT"] - hdr["S_LAT"])
                      / hdr["LAT_INC"]) + 1
        if nrows * ncols != cnt:
            raise ValueError("GS_COUNT inconsistent with extent")
        out.append(
            {
                "name": hdr["SUB_NAME"],
                "parent": hdr["PARENT"],
                "s_lat": hdr["S_LAT"],
                "n_lat": hdr["N_LAT"],
                "e_long": hdr["E_LONG"],
                "w_long": hdr["W_LONG"],
                "lat_inc": hdr["LAT_INC"],
                "long_inc": hdr["LONG_INC"],
                "lat_shift": node[:, 0].astype(np.float64)
                .reshape(nrows, ncols),
                "lon_shift": node[:, 1].astype(np.float64)
                .reshape(nrows, ncols),
            }
        )
    return out


def _interp_shifts(sgs: list[dict], lon_deg, lat_deg):
    """Bilinear (Δlat, Δlon) arc-seconds at east-positive degree
    coords; finest containing subgrid wins; outside-all → 0."""
    lon_w = -np.asarray(lon_deg, dtype=np.float64) * 3600.0
    lat_s = np.asarray(lat_deg, dtype=np.float64) * 3600.0
    dlat = np.zeros_like(lat_s)
    dlon = np.zeros_like(lon_w)
    todo = np.ones(lat_s.shape, dtype=bool)
    for sg in sorted(sgs, key=lambda g: g["lat_inc"]):
        m = (
            todo
            & (lat_s >= sg["s_lat"]) & (lat_s <= sg["n_lat"])
            & (lon_w >= sg["e_long"]) & (lon_w <= sg["w_long"])
        )
        if not m.any():
            continue
        nrows, ncols = sg["lat_shift"].shape
        x = (lon_w[m] - sg["e_long"]) / sg["long_inc"]
        y = (lat_s[m] - sg["s_lat"]) / sg["lat_inc"]
        i = np.clip(np.floor(x).astype(np.int64), 0, ncols - 2)
        j = np.clip(np.floor(y).astype(np.int64), 0, nrows - 2)
        fx, fy = x - i, y - j
        for tgt, grid in ((dlat, sg["lat_shift"]),
                          (dlon, sg["lon_shift"])):
            v = (
                grid[j, i] * (1 - fx) * (1 - fy)
                + grid[j, i + 1] * fx * (1 - fy)
                + grid[j + 1, i] * (1 - fx) * fy
                + grid[j + 1, i + 1] * fx * fy
            )
            tgt[m] = v
        todo &= ~m
    return dlat, dlon


class NTv2Shift:
    """Picklable ``(lon, lat) → (lon, lat)`` datum-shift step over an
    NTv2 grid. ``inverse=False`` shifts SYSTEM_F → SYSTEM_T (the
    grid's stored direction); ``inverse=True`` runs the fixed-point
    inverse (4 rounds — the PROJ hgridshift inverse; converges to
    float64 noise because shift fields vary slowly vs their own
    magnitude). Carries the raw grid BYTES through pickle and parses
    once per executor process."""

    def __init__(self, gsb_bytes: bytes, inverse: bool = False,
                 iters: int = 4):
        self.gsb_bytes = bytes(gsb_bytes)
        self.inverse = bool(inverse)
        self.iters = int(iters)
        self._grids = None

    def __getstate__(self):
        return {
            "gsb_bytes": self.gsb_bytes,
            "inverse": self.inverse,
            "iters": self.iters,
        }

    def __setstate__(self, st):
        self.__dict__.update(st)
        self._grids = None

    def _g(self):
        if self._grids is None:
            self._grids = gsb_parse(self.gsb_bytes)
        return self._grids

    def __call__(self, lon, lat):
        lon = np.asarray(lon, dtype=np.float64)
        lat = np.asarray(lat, dtype=np.float64)
        g = self._g()
        if not self.inverse:
            dlat, dlon = _interp_shifts(g, lon, lat)
            return lon - dlon / 3600.0, lat + dlat / 3600.0
        src_lon, src_lat = lon.copy(), lat.copy()
        for _ in range(self.iters):
            dlat, dlon = _interp_shifts(g, src_lon, src_lat)
            src_lon = lon + dlon / 3600.0
            src_lat = lat - dlat / 3600.0
        return src_lon, src_lat
