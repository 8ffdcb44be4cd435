"""Multimodal plumbing tests: binary media columns through mapInPandas."""

import numpy as np
import pytest

from gdal_spark.operators import multimodal as mm


def test_fake_image_roundtrip():
    img = mm.fake_image(7)
    buf = mm.encode_fake_image(img)
    np.testing.assert_array_equal(mm.decode_image_bytes(buf), img)


def test_fake_video_roundtrip():
    frames = np.stack([mm.fake_image(i, 8, 6) for i in range(4)])
    buf = mm.encode_fake_video(frames)
    np.testing.assert_array_equal(mm.decode_video_bytes(buf), frames)


def test_real_codec_is_stubbed():
    # PNG/JPEG now decode for real (from-spec codecs); formats beyond
    # them stay behind the documented stub
    with pytest.raises(NotImplementedError, match="stubbed"):
        mm.decode_image_bytes(b"RIFFxxxxWEBPgarbage")


def test_image_features_distributed(spark):
    pdf = mm.media_pdf(12)
    df = spark.createDataFrame(pdf).repartition(4)
    feats = mm.image_features(df).toPandas().sort_values("media_id")
    assert len(feats) == 12  # only images, not videos
    for _, r in feats.iterrows():
        img = mm.fake_image(int(r["media_id"])).astype(np.float64)
        assert r["mean_q"] == round(img.mean() * 1000)
        assert r["std_q"] == round(img.std() * 1000)
        assert sum(r["hist"]) == img.size
    # partitioning independence
    feats1 = (
        mm.image_features(spark.createDataFrame(pdf).repartition(1))
        .toPandas().sort_values("media_id").reset_index(drop=True)
    )
    assert feats.reset_index(drop=True).drop(columns=["hist"]).equals(
        feats1.drop(columns=["hist"])
    )


def test_resize_images(spark):
    df = spark.createDataFrame(mm.media_pdf(3))
    out = mm.resize_images(df, 8, 6).toPandas()
    assert set(out["width"]) == {8} and set(out["height"]) == {6}
    r = out[out["media_id"] == 0].iloc[0]
    arr = mm.decode_image_bytes(bytes(r["media"]))
    src = mm.fake_image(0)
    sx = np.floor((np.arange(8) + 0.5) * (src.shape[1] / 8)).astype(int)
    sy = np.floor((np.arange(6) + 0.5) * (src.shape[0] / 6)).astype(int)
    np.testing.assert_array_equal(arr, src[sy[:, None], sx[None, :]])


def test_sample_frames_explodes(spark):
    df = spark.createDataFrame(mm.media_pdf(4, n_frames=6))
    out = mm.sample_frames(df, every=2).toPandas()
    # 4 videos x frames {0, 2, 4}
    assert len(out) == 12
    assert sorted(out["frame_no"].unique()) == [0, 2, 4]
    r = out[(out["media_id"] == 4) & (out["frame_no"] == 2)].iloc[0]
    np.testing.assert_array_equal(
        mm.decode_image_bytes(bytes(r["media"])),
        mm.fake_image(0 * 100 + 2, 16, 12),
    )
