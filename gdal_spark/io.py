"""Byte-range I/O contract for the ranged sources (object-store hook).

Every ranged reader in this engine (GeoTIFF/COG, FlatGeobuf, PMTiles,
OSM PBF, Shapefile) reduces its file access to one primitive: open a
path, ``seek`` to a byte offset, ``read`` a length. On a shared
POSIX filesystem that is ``open(path, "rb")``; on an object store it
is a ranged GET — the reference reaches the same abstraction through
its VSI layer (port/cpl_vsil*.cpp: VSIFOpenL/VSIFSeekL/VSIFReadL,
with /vsis3/, /vsigs/, … backends).

This module is the engine's VSI seam: readers take an ``opener`` —
a PICKLABLE callable ``path -> binary file-like with seek/read`` —
defaulting to :func:`local_opener`. A cluster against an object
store passes an fsspec-style opener (``s3fs``/``gcsfs`` file objects
satisfy exactly this contract and translate seek+read into ranged
GETs); nothing else in any reader changes, because no reader ever
does more than seek/read on byte ranges.

``PrefixOpener`` is the in-tree proof (and test instrument): it
remaps paths, so a read that bypasses the opener fails loudly.
"""

from __future__ import annotations


def local_opener(path: str):
    """The default: shared-FS / POSIX open."""
    return open(path, "rb")


class PrefixOpener:
    """Picklable opener that serves ``path`` from ``path + suffix`` —
    a stand-in for a remote-FS scheme translation. Any byte read that
    bypasses the opener (a bare ``open(path)``) misses the shadow
    file and fails, which is exactly what the tests pin."""

    def __init__(self, suffix: str = ".shadow"):
        self.suffix = suffix

    def __call__(self, path: str):
        return open(path + self.suffix, "rb")
