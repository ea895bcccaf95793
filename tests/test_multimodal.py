"""Multimodal plumbing: binary columns + typed metadata + frame sampling
(decode stubbed — libs absent by design)."""

import pytest

from ocr_corrector_spark.operators.multimodal import (
    decode_image,
    media_schema,
    pack_header,
    sample_video_frames,
    with_media_metadata,
)


@pytest.fixture(scope="module")
def media_df(spark):
    rows = [
        (1, "conv-0", 0, bytearray(pack_header("image", 640, 480, 1, b"\x01" * 100))),
        (2, "conv-0", 1, bytearray(pack_header("audio", 0, 0, 0, b"\x02" * 64))),
        (3, "conv-1", 0, bytearray(pack_header("video", 1280, 720, 95, b"\x03" * 256))),
        (4, "conv-1", 1, bytearray(b"\x00\x01")),  # truncated/garbage
    ]
    return spark.createDataFrame(rows, media_schema())


def test_media_metadata(spark, media_df):
    out = {r.media_id: r.media_meta for r in with_media_metadata(media_df).collect()}
    assert out[1].media_type == "image" and out[1].width == 640 and out[1].height == 480
    assert out[1].payload_bytes == 100
    assert out[2].media_type == "audio"
    assert out[3].media_type == "video" and out[3].n_frames == 95
    assert out[4].media_type is None  # garbage header → typed nulls, no crash


def test_video_frame_sampling(spark, media_df):
    out = {r.media_id: r for r in sample_video_frames(media_df, every_n=10).collect()}
    assert list(out[3].sampled_frames) == list(range(0, 95, 10))
    assert list(out[1].sampled_frames) == []


def test_decode_is_stubbed(spark, media_df):
    with pytest.raises(NotImplementedError):
        decode_image(media_df)
