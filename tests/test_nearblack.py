"""Nearblack (apps/nearblack_lib.cpp) tests: collar flattening,
interior preservation, white mode, multi-band nearness, and the
distributed granule wrapper."""

import numpy as np
from pyspark.sql import types as T

from gdal_spark.operators import nearblack as nbk


def _collar_image(h=24, w=32, collar=4, val=180, noise=True):
    """Bright core with a near-black collar (values 0..12)."""
    img = np.full((h, w), val, dtype=np.uint8)
    rng = np.random.default_rng(3)
    c = collar
    mask = np.zeros((h, w), dtype=bool)
    mask[:c, :] = mask[-c:, :] = True
    mask[:, :c] = mask[:, -c:] = True
    img[mask] = rng.integers(0, 13, mask.sum()) if noise else 0
    return img, mask


def test_collar_flattened_interior_untouched():
    img, mask = _collar_image()
    out = nbk.nearblack_image(img, near_dist=15, max_non_black=0)
    # collar becomes exactly 0
    assert (out[mask] == 0).all()
    # interior preserved (max_non_black=0: no speckle shell is eaten)
    assert (out[~mask] == img[~mask]).all()


def test_max_non_black_eats_speckle_shell():
    """The reference's vertical rule flattens the first max_non_black
    NON-black pixels per column too (nearblack_lib.cpp:603-616: the
    counter increments, and while it is still <= max the pixel falls
    through to the replace) — so a 2-tolerance run eats a 2-px shell
    into the core from the scanned edges."""
    img, mask = _collar_image(noise=False)
    out = nbk.nearblack_image(img, near_dist=15, max_non_black=2)
    c = 4
    assert (out[mask] == 0).all()
    # 2-px shell inside the collar is flattened top-down + bottom-up
    assert (out[c : c + 2, c + 2 : -c - 2] == 0).all()
    assert (out[-c - 2 : -c, c + 2 : -c - 2] == 0).all()
    # the deep interior survives
    inner = out[c + 2 : -c - 2, c + 2 : -c - 2]
    assert (inner == img[c + 2 : -c - 2, c + 2 : -c - 2]).all()


def test_no_collar_is_identity():
    img = np.full((16, 20), 200, dtype=np.uint8)
    out = nbk.nearblack_image(img, near_dist=15, max_non_black=2)
    np.testing.assert_array_equal(out, img)


def test_interior_black_hole_not_eaten():
    """A black region NOT connected to the edge scan must survive:
    the horizontal scan stops at the bright rim before reaching it."""
    img = np.full((21, 21), 200, dtype=np.uint8)
    img[8:13, 8:13] = 3  # interior near-black blob
    out = nbk.nearblack_image(img, near_dist=15, max_non_black=0)
    np.testing.assert_array_equal(out[8:13, 8:13], img[8:13, 8:13])


def test_white_mode():
    img = np.full((16, 16), 60, dtype=np.uint8)
    img[:3, :] = 250
    img[:, :3] = 247
    out = nbk.nearblack_image(img, near_dist=10, max_non_black=0,
                              white=True)
    assert (out[:3, :] == 255).all()
    assert (out[3:, 3:] == 60).all()


def test_multiband_nearness_requires_all_bands():
    """(10, 10, 200) is NOT near black even though two bands are —
    the band loop breaks on the first far band (:589-596)."""
    img = np.zeros((8, 12, 3), dtype=np.uint8)
    img[:, :, 2] = 200  # every pixel far in band 3
    out = nbk.nearblack_image(img, near_dist=15, max_non_black=0)
    np.testing.assert_array_equal(out, img)


def test_max_non_black_tolerates_speckles():
    """A 1-px bright speck inside the collar is flattened when
    max_non_black >= 1 (the scan runs past it)."""
    img, mask = _collar_image(noise=False)
    img[2, 5] = 190  # speck inside the top collar
    out0 = nbk.nearblack_image(img, near_dist=15, max_non_black=0)
    out2 = nbk.nearblack_image(img, near_dist=15, max_non_black=2)
    assert out0[2, 5] == 190 or out0[2, 6:].max() > 0  # scan stopped
    assert out2[2, 5] == 0  # tolerated and flattened
    # collar beyond the speck still flattened with tolerance
    assert (out2[2, 6:-4] == 0).all()


def test_granules_wrapper_matches_kernel(spark):
    imgs = []
    for k in range(4):
        img, _ = _collar_image(16 + 2 * k, 20, 3)
        imgs.append(img)
    schema = T.StructType(
        [
            T.StructField("image_id", T.LongType()),
            T.StructField("w", T.IntegerType()),
            T.StructField("h", T.IntegerType()),
            T.StructField("bands", T.IntegerType()),
            T.StructField("data", T.BinaryType()),
        ]
    )
    df = spark.createDataFrame(
        [
            (i, im.shape[1], im.shape[0], 1, im.tobytes())
            for i, im in enumerate(imgs)
        ],
        schema,
    ).repartition(3)
    got = {
        r["image_id"]: np.frombuffer(r["data"], np.uint8).reshape(
            r["h"], r["w"]
        )
        for r in nbk.nearblack_granules(df).collect()
    }
    for i, im in enumerate(imgs):
        want = nbk.nearblack_image(im, 15, 2)
        np.testing.assert_array_equal(got[i], want)
