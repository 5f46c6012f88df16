"""Multimodal column plumbing: metadata decode, resize, 1→N frame
sampling — FAKEIMG/FAKEVID stub payloads, real Spark schema/batching."""

import struct

import pytest

from table_ocr_spark.operators.multimodal import (
    _FAKE_MAGIC,
    encode_fake_video,
    image_metadata,
    resize_images,
    sample_frames,
)


def fake_img(w, h, mean=0.0):
    return _FAKE_MAGIC + struct.pack("<HH", w, h) + struct.pack("<f", mean)


@pytest.fixture(scope="module")
def images(spark):
    rows = [("u1", fake_img(640, 480, 10.0)), ("u2", fake_img(100, 50, 3.5))]
    return spark.createDataFrame(rows, "url string, payload binary")


def test_image_metadata(spark, images):
    got = {r["url"]: r for r in image_metadata(images).collect()}
    assert got["u1"]["width"] == 640 and got["u1"]["height"] == 480
    assert got["u1"]["mime"] == "image/x-fake"
    assert got["u2"]["gray_mean"] == 3.5


def test_resize_preserves_aspect_and_roundtrips(spark, images):
    out = {r["url"]: r for r in resize_images(images, max_dim=256).collect()}
    assert out["u1"]["width"] == 256 and out["u1"]["height"] == 192
    # small image untouched
    assert out["u2"]["width"] == 100 and out["u2"]["height"] == 50
    # output payload decodes again (binary-in/binary-out pipeline composes)
    meta = image_metadata(
        spark.createDataFrame(
            [("u1", bytes(out["u1"]["payload"]))], "url string, payload binary"
        )
    ).collect()[0]
    assert (meta["width"], meta["height"]) == (256, 192)


def test_sample_frames_one_to_n(spark):
    frames = [fake_img(8, 8, float(i)) for i in range(5)]
    vid = encode_fake_video(frames)
    df = spark.createDataFrame([("v1", vid)], "url string, payload binary")
    got = sorted(
        sample_frames(df, every_nth=2).collect(), key=lambda r: r["frame_idx"]
    )
    assert [r["frame_idx"] for r in got] == [0, 2, 4]
    assert bytes(got[1]["frame"]) == frames[2]


def test_null_payloads_do_not_crash(spark):
    from table_ocr_spark.operators.multimodal import (
        image_metadata,
        resize_images,
        sample_frames,
    )

    imgs = spark.createDataFrame(
        [("u1", None)], "url string, payload binary"
    )
    meta = image_metadata(imgs).collect()
    assert len(meta) == 1 and meta[0]["mime"] is None
    rs = resize_images(imgs).collect()
    assert len(rs) == 1 and rs[0]["payload"] is None
    assert sample_frames(imgs).count() == 0


def test_malformed_payloads_degrade_per_row(spark):
    from table_ocr_spark.operators.multimodal import (
        encode_fake_video,
        image_metadata,
        sample_frames,
    )

    imgs = spark.createDataFrame(
        [("trunc", bytearray(b"FAKEIMG")),        # header only
         ("ok", bytearray(b"FAKEIMG" + b"\x10\x00\x08\x00" + b"\x00\x00\x00\x00"))],
        "url string, payload binary",
    )
    rows = {r["url"]: r for r in image_metadata(imgs).collect()}
    assert rows["trunc"]["width"] is None          # degraded, not crashed
    assert rows["ok"]["width"] == 16

    # FAKEVID declaring more frames than present: keeps what's readable
    good_frame = b"FAKEIMG" + b"\x10\x00\x08\x00" + b"\x00\x00\x00\x00"
    payload = bytearray(encode_fake_video([good_frame])[:-2])  # truncate
    vids = spark.createDataFrame(
        [("v", payload)], "url string, payload binary"
    )
    assert sample_frames(vids, every_nth=1).count() in (0, 1)  # no crash
