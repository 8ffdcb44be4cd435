"""Nearblack — collar removal, the ``nearblack`` utility analog.

Reference semantics: ``apps/nearblack_lib.cpp`` —
* a pixel is "near" when EVERY band is within ``near_dist`` of the
  corresponding band of ANY color in the color list (ProcessLine's
  color/band loops, :577-601); the default color is all-black (or
  all-white with ``white=True``), and the replacement value is white
  only for the single all-white color (:552-556);
* TOP-DOWN pass over rows, each row processed forward then backward
  (:424-431), with per-column counters carrying the VERTICAL check
  down the image and an in-row counter implementing the HORIZONTAL
  scan that stops after ``max_non_black`` consecutive non-near
  pixels (and may re-arm when the column's vertical history is
  all-near, :739-744);
* then a BOTTOM-UP pass over the top-down result with fresh
  counters and ``max_non_black`` forced to 0 on the horizontal scan
  (:471, :644-646).

The recurrence is sequential along and across scanlines BY
CONSTRUCTION (exactly like the reference, which streams one line at
a time through a single thread), so the kernel runs per granule:
one image per task, file-parallel across an imagery corpus via
``mapInPandas`` — the same distribution contract as the codec and
dither kernels. The per-row color test is vectorized numpy; only
the stop/re-arm scan is a Python loop over row width.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def _nonblack_mask(
    row: np.ndarray, colors: np.ndarray, near: int
) -> np.ndarray:
    """row (w, nb) uint8 -> bool[w]: True where the pixel is NOT
    within near of any listed color (vectorized ProcessLine color
    test)."""
    r = row.astype(np.int64)[:, None, :]  # (w, 1, nb)
    c = colors.astype(np.int64)[None, :, :]  # (1, nc, nb)
    within = (np.abs(r - c) <= near).all(axis=2)  # (w, nc)
    return ~within.any(axis=1)


def nearblack_image(
    img: np.ndarray,
    near_dist: int = 15,
    max_non_black: int = 2,
    white: bool = False,
    colors: list[list[int]] | None = None,
) -> np.ndarray:
    """Run the full two-pass nearblack over one (h, w, nb) uint8
    image; returns the collar-flattened copy. Faithful transcription
    of nearblack_lib.cpp's ProcessLine driver (top-down fwd+bwd with
    vertical counters, bottom-up fwd+bwd with fresh counters and
    horizontal max forced to 0)."""
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, nb = img.shape
    out = img.copy()
    if colors is None:
        colors = [[255] * nb] if white else [[0] * nb]
    carr = np.asarray(colors, dtype=np.int64).reshape(-1, nb)
    replace = (
        255
        if len(carr) == 1 and carr[0][0] == 255
        else 0
    )

    def process_line(y, counts, forward, vertical, bottom_up, line_idx):
        row = out[y]
        nbm = _nonblack_mask(row, carr, near_dist)
        if vertical:
            active = counts <= max_non_black
            inc = active & nbm
            counts[inc] += 1
            still = counts <= max_non_black
            if line_idx == 0 and max_non_black > 0:
                # first line: non-black pixels arm the counter past
                # the max instead of being replaced (:611-616)
                arm = inc & still
                counts[arm] = max_non_black + 1
                repl = active & ~inc
            else:
                repl = active & (~inc | still)
            row[repl] = replace
            nbm = _nonblack_mask(row, carr, near_dist)
        # horizontal
        mnb = 0 if bottom_up else max_non_black
        idxs = range(w - 1) if forward else range(w - 1, 0, -1)
        start = 0 if forward else w - 1
        do_test = True
        non_black_pixels = 0
        for i in idxs:
            if do_test:
                is_nb = bool(nbm[i])
                if is_nb:
                    if counts[i] <= mnb:
                        non_black_pixels = int(counts[i])
                    else:
                        non_black_pixels += 1
                if non_black_pixels > mnb:
                    do_test = False
                    continue
                if is_nb and mnb > 0 and i == start:
                    do_test = False
                    continue
                row[i] = replace
                nbm[i] = _nonblack_mask(row[i : i + 1], carr, near_dist)[0]
            elif counts[i] == 0:
                do_test = True
                non_black_pixels = 0

    counts = np.zeros(w, dtype=np.int64)
    for y in range(h):
        process_line(y, counts, True, True, False, y)
        process_line(y, counts, False, False, False, y)
    counts[:] = 0
    for y in range(h - 1, -1, -1):
        process_line(y, counts, True, True, True, h - 1 - y)
        process_line(y, counts, False, False, True, h - 1 - y)
    return out if nb > 1 else out[:, :, 0]


_OUT_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.LongType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("bands", T.IntegerType()),
        T.StructField("data", T.BinaryType()),
    ]
)


def nearblack_granules(
    images: DataFrame,
    near_dist: int = 15,
    max_non_black: int = 2,
    white: bool = False,
) -> DataFrame:
    """Distributed collar removal over an imagery corpus: one image
    per task row (image_id, w, h, bands, data) — file-parallel like
    the codec sinks; no shuffle, the kernel is a pure map."""
    nd, mnb, wh = int(near_dist), int(max_non_black), bool(white)

    def gen(batches):
        for pdf in batches:
            rows = []
            for iid, w, h, nb, data in zip(
                pdf["image_id"], pdf["w"], pdf["h"],
                pdf["bands"], pdf["data"],
            ):
                w, h, nb = int(w), int(h), int(nb)
                img = np.frombuffer(data, np.uint8)[: w * h * nb].reshape(
                    h, w, nb
                )
                res = nearblack_image(img, nd, mnb, white=wh)
                rows.append((int(iid), w, h, nb, res.tobytes()))
            yield pd.DataFrame(
                rows, columns=["image_id", "w", "h", "bands", "data"]
            )

    return images.mapInPandas(gen, _OUT_SCHEMA)
