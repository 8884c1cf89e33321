"""Multimodal plumbing: typed binary payloads + metadata, decode /
resize / feature / frame-sample stages over Arrow batches; stubbed
decodes raise clearly for unsupported real formats."""

import numpy as np
import pytest

from web_archive_downloader_spark.content.imagecodec import decode_png
from web_archive_downloader_spark.operators.multimodal import (
    audio_features_stage,
    decode_audio,
    decode_video,
    gen_multimodal,
    image_resize_stage,
    media_df,
    resize_pixels,
    video_frame_sample_stage,
)


def test_image_resize_stage(spark):
    media = media_df(spark, n=24)
    out = image_resize_stage(media, out_h=8, out_w=8).collect()
    assert len(out) == 8  # every 3rd row is an image
    for r in out:
        px = decode_png(bytes(r.resized_png))
        assert px.shape == (8, 8, 3)
    # distributed result == driver-side kernel (shared, deterministic)
    rows = {x["media_id"]: x for x in gen_multimodal(24) if x["kind"] == "image"}
    from web_archive_downloader_spark.content.imagecodec import decode_image, encode_png

    for r in out:
        px = decode_image(rows[r.media_id]["bytes"], "png")
        assert bytes(r.resized_png) == encode_png(resize_pixels(px, 8, 8))


def test_audio_features_stage(spark):
    media = media_df(spark, n=24)
    out = audio_features_stage(media).collect()
    assert len(out) == 8
    for r in out:
        assert r.duration_sec == 1.0
        assert 1000 < r.rms < 6000
        assert 0 < r.zero_cross_rate < 1


def test_video_frame_sampling(spark):
    media = media_df(spark, n=24)
    out = video_frame_sample_stage(media, every_k=4).collect()
    # 8 videos x frames 0,4,8
    assert len(out) == 24
    assert {r.frame_idx for r in out} == {0, 4, 8}


def test_stubbed_decodes_are_marked():
    with pytest.raises(NotImplementedError):
        decode_audio(b"ID3\x04real-mp3-bytes")
    with pytest.raises(NotImplementedError):
        decode_video(b"\x00\x00\x00 ftypmp42")
