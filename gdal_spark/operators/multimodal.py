"""Multimodal (image/audio/video) columns as opaque binary + typed metadata.

Mirrors the engine's raster posture (SURVEY.md §1.2: pixels at rest are
``BinaryType`` + dtype tag): media travel as ``binary`` columns with a
typed metadata struct; decode / feature-extract / resize / frame-sample
are Arrow-batched ``mapInPandas`` stages.

Image decode dispatches by magic number to REAL from-spec codecs where
the engine has them — PNG (``gdal_spark.png``, RFC 2083) and baseline
JPEG (``gdal_spark.jpeg``, ITU-T T.81) — plus the deterministic
raw-gray FAKEIMG container used by fixtures. Other image formats
(WebP, AVIF, ...) and all video codecs would need Pillow / libav,
which are NOT in this container, and raise ``NotImplementedError`` at
the clearly marked stub; FAKEVID exercises the full distributed video
plumbing (schema, batch shape, 1→N frame explode).

Container formats (deterministic, self-describing):
    FAKEIMG ``b"FIMG" + uint16 w + uint16 h + w*h uint8 gray pixels``
    FAKEVID ``b"FVID" + uint16 w + uint16 h + uint16 n_frames + frames``
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

IMG_MAGIC = b"FIMG"
VID_MAGIC = b"FVID"


# ---------------------------------------------------------------------------
# codecs (numpy-side; used inside UDFs and for fixture synthesis)
# ---------------------------------------------------------------------------


def encode_fake_image(arr: np.ndarray) -> bytes:
    h, w = arr.shape
    return IMG_MAGIC + struct.pack("<HH", w, h) + arr.astype(np.uint8).tobytes()


def decode_image_bytes(buf: bytes) -> np.ndarray:
    """Decode one image payload → 2-D uint8 array (color inputs are
    reduced to BT.601 luma so every downstream stage sees one plane).

    Dispatch by magic: FAKEIMG (fixtures), PNG (from-spec
    ``gdal_spark.png``), baseline JPEG (from-spec ``gdal_spark.jpeg``).

    STUB BOUNDARY: other formats (WebP/AVIF/TIFF-in-image-pipe) would
    dispatch to Pillow — absent in this environment."""
    if buf[:4] == IMG_MAGIC:
        w, h = struct.unpack("<HH", buf[4:8])
        return np.frombuffer(buf[8 : 8 + w * h], dtype=np.uint8).reshape(h, w)
    if buf[:8] == b"\x89PNG\r\n\x1a\n":
        from .. import png as _png

        arr = _png.png_decode(bytes(buf))
    elif buf[:2] == b"\xff\xd8":
        from .. import jpeg as _jpeg

        arr = _jpeg.jpeg_decode(bytes(buf))
    else:
        raise NotImplementedError(
            "image codecs beyond FAKEIMG/PNG/JPEG (e.g. WebP via Pillow) "
            "are stubbed out in this environment"
        )
    if arr.ndim == 3:  # RGB(A) → luma plane
        rgb = arr[..., :3].astype(np.float64)
        arr = np.clip(
            np.floor(
                0.299 * rgb[..., 0]
                + 0.587 * rgb[..., 1]
                + 0.114 * rgb[..., 2]
                + 0.5
            ),
            0,
            255,
        ).astype(np.uint8)
    return arr


def encode_fake_video(frames: np.ndarray) -> bytes:
    n, h, w = frames.shape
    return (
        VID_MAGIC
        + struct.pack("<HHH", w, h, n)
        + frames.astype(np.uint8).tobytes()
    )


def decode_video_bytes(buf: bytes) -> np.ndarray:
    if buf[:4] == VID_MAGIC:
        w, h, n = struct.unpack("<HHH", buf[4:10])
        return np.frombuffer(
            buf[10 : 10 + n * w * h], dtype=np.uint8
        ).reshape(n, h, w)
    raise NotImplementedError(
        "real video codecs are stubbed out; only FAKEVID is decodable"
    )


def fake_image(seed: int, w: int = 32, h: int = 24) -> np.ndarray:
    x = np.arange(w, dtype=np.int64)[None, :]
    y = np.arange(h, dtype=np.int64)[:, None]
    return ((x * 3 + y * 5 + seed) % 256).astype(np.uint8)


def media_pdf(n: int, n_frames: int = 6) -> pd.DataFrame:
    """Fixture: n images + n videos with typed metadata."""
    rows = []
    for i in range(n):
        img = fake_image(i)
        rows.append(
            {
                "media_id": i,
                "kind": "image",
                "media": encode_fake_image(img),
                "width": img.shape[1],
                "height": img.shape[0],
                "format": "FAKEIMG",
            }
        )
    for i in range(n):
        frames = np.stack([fake_image(i * 100 + f, 16, 12) for f in range(n_frames)])
        rows.append(
            {
                "media_id": n + i,
                "kind": "video",
                "media": encode_fake_video(frames),
                "width": 16,
                "height": 12,
                "format": "FAKEVID",
            }
        )
    return pd.DataFrame(rows)


# ---------------------------------------------------------------------------
# Spark operators
# ---------------------------------------------------------------------------

IMG_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_q", T.LongType()),   # round(mean * 1000)
        T.StructField("std_q", T.LongType()),    # round(std * 1000)
        T.StructField("hist", T.ArrayType(T.LongType())),  # 16 bins
    ]
)


def image_features(df: DataFrame) -> DataFrame:
    """Decode + per-image stats (mean/std/16-bin histogram), one
    Arrow batch at a time. Quantized to integers so results are
    partitioning-independent."""

    def run(batches):
        for pdf in batches:
            out = []
            for mid, buf in zip(pdf["media_id"], pdf["media"]):
                arr = decode_image_bytes(bytes(buf)).astype(np.float64)
                out.append(
                    (
                        int(mid), arr.shape[1], arr.shape[0],
                        int(round(arr.mean() * 1000)),
                        int(round(arr.std() * 1000)),
                        np.bincount(
                            (arr.astype(np.int64) // 16).ravel(), minlength=16
                        ).tolist(),
                    )
                )
            yield pd.DataFrame(
                out, columns=[f.name for f in IMG_FEATURES_SCHEMA]
            )

    return df.filter(df.kind == "image").select("media_id", "media").mapInPandas(
        run, IMG_FEATURES_SCHEMA
    )


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("media", T.BinaryType()),
    ]
)


def resize_images(df: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize (same index math as the warp kernel's
    NEAREST path: src = floor((i + 0.5) * scale))."""

    def run(batches):
        for pdf in batches:
            out = []
            for mid, buf in zip(pdf["media_id"], pdf["media"]):
                arr = decode_image_bytes(bytes(buf))
                h, w = arr.shape
                sx = np.floor(
                    (np.arange(out_w) + 0.5) * (w / out_w)
                ).astype(np.int64)
                sy = np.floor(
                    (np.arange(out_h) + 0.5) * (h / out_h)
                ).astype(np.int64)
                res = arr[sy[:, None], sx[None, :]]
                out.append(
                    (int(mid), out_w, out_h, encode_fake_image(res))
                )
            yield pd.DataFrame(
                out, columns=[f.name for f in RESIZE_SCHEMA]
            )

    return df.filter(df.kind == "image").select("media_id", "media").mapInPandas(
        run, RESIZE_SCHEMA
    )


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_no", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("media", T.BinaryType()),  # FAKEIMG per frame
    ]
)


def sample_frames(df: DataFrame, every: int = 2) -> DataFrame:
    """Video → every ``every``-th frame as an image row (1→N explode
    via mapInPandas, the table-function pattern of SURVEY.md §2.13)."""

    def run(batches):
        for pdf in batches:
            out = []
            for mid, buf in zip(pdf["media_id"], pdf["media"]):
                frames = decode_video_bytes(bytes(buf))
                for fno in range(0, frames.shape[0], every):
                    out.append(
                        (
                            int(mid), fno,
                            frames.shape[2], frames.shape[1],
                            encode_fake_image(frames[fno]),
                        )
                    )
            yield pd.DataFrame(
                out, columns=[f.name for f in FRAME_SCHEMA]
            )

    return df.filter(df.kind == "video").select("media_id", "media").mapInPandas(
        run, FRAME_SCHEMA
    )
