from __future__ import annotations

import hashlib

import pytest

from lion_parcel_etl_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    decode_media,
    extract_features,
    fake_features,
    frame_sample_plan,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image", bytes(range(256)) * 4, ("image/png", 16, 16, None)),
        (2, "audio", b"\x01\x02" * 500, ("audio/wav", None, None, 2000)),
        (3, "video", b"\xff" * 100, ("video/mp4", 640, 480, 3500)),
        (4, "image", b"", ("image/png", 0, 0, None)),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_decode_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        decode_media(b"abc", "image")


def test_extract_features_shapes(spark, media):
    out = extract_features(media).collect()
    assert len(out) == 4
    by_id = {r.media_id: r for r in out}
    assert by_id[1].n_bytes == 1024
    assert by_id[1].digest == hashlib.md5(bytes(range(256)) * 4).hexdigest()
    assert len(by_id[1].features) == 8
    assert by_id[4].features == [0.0] * 8  # empty payload
    # deterministic
    assert by_id[2].features == fake_features(b"\x01\x02" * 500)


def test_frame_sample_plan(spark, media):
    frames = frame_sample_plan(media, every_ms=1000).collect()
    # only the video row explodes; 3500ms at 1000ms -> ts 0,1000,2000,3000
    assert {r.media_id for r in frames} == {3}
    assert sorted(r.frame_ts_ms for r in frames) == [0, 1000, 2000, 3000]


def test_resize_images_geometry_and_payload(spark, media):
    from lion_parcel_etl_spark.operators.multimodal import resize_images

    out = {r["media_id"]: r for r in resize_images(media, max_edge=8).collect()}
    # only image rows survive the kind filter
    assert set(out) == {1, 4}
    r = out[1]  # 16x16 -> fits to 8x8, aspect preserved
    assert (r["width"], r["height"]) == (8, 8)
    assert (r["orig_width"], r["orig_height"]) == (16, 16)
    assert r["payload"] == bytes(range(256)) * 4  # stub passes bytes through
    # degenerate 0x0 image clamps to 1x1, never divides by zero
    assert (out[4]["width"], out[4]["height"]) == (1, 1)


def test_resize_never_upscales(spark, media):
    from lion_parcel_etl_spark.operators.multimodal import resize_images

    out = {r["media_id"]: r for r in resize_images(media, max_edge=1000).collect()}
    assert (out[1]["width"], out[1]["height"]) == (16, 16)


def test_extract_features_single_scan_no_estimate(spark, media):
    """Without a caller-supplied size estimate there must be NO sizing
    scan and NO repartition exchange — one pass over the payloads
    (VERDICT r01: the old octet_length+collect pre-pass was a wasted
    full table scan at 100 TB)."""
    from lion_parcel_etl_spark.operators.bucketing import plan_string
    from lion_parcel_etl_spark.operators.multimodal import extract_features

    plan = plan_string(extract_features(media))
    assert "Exchange" not in plan

    # caller-supplied estimate → byte-budget repartition appears
    plan2 = plan_string(extract_features(media, batch_bytes=1024, total_bytes=10 * 1024))
    assert "Exchange" in plan2
