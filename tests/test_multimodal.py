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


# --- real-payload header parsing without codecs (VERDICT r2 #4) -----

def make_real_png(w, h):
    """A fully spec-valid RGB PNG built from public format knowledge
    (RFC 2083): signature, IHDR, one zlib IDAT of filter-0 scanlines,
    IEND — PIL would decode these same bytes wherever it exists."""
    import zlib

    def chunk(typ, data):
        body = typ + data
        return struct.pack(">I", len(data)) + body + struct.pack(
            ">I", zlib.crc32(body) & 0xFFFFFFFF
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB
    raw = b"".join(b"\x00" + b"\x7f" * (3 * w) for _ in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def make_jpeg_header(w, h):
    """SOI + APP0(JFIF) + DQT stub + SOF0 carrying (h, w) + EOI — a
    spec-shaped marker stream (ITU T.81 §B.2.2) exercising the walk
    over variable-length segments before the SOF."""
    app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    dqt = b"\x00" + bytes(64)
    sof0 = struct.pack(">BHHB", 8, h, w, 3) + b"\x01\x11\x00\x02\x11\x01\x03\x11\x01"
    out = b"\xff\xd8"
    out += b"\xff\xe0" + struct.pack(">H", 2 + len(app0)) + app0
    out += b"\xff\xdb" + struct.pack(">H", 2 + len(dqt)) + dqt
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof0)) + sof0
    out += b"\xff\xd9"
    return out


def test_real_png_jpeg_metadata_without_codecs(spark):
    # runs IN THIS CONTAINER (no PIL): dimensions come from the pure-
    # Python IHDR/SOF0 header parsers; gray_mean needs a decoder -> None
    # unless PIL happens to be installed (then it's a real float)
    rows = [
        ("png", bytearray(make_real_png(320, 200))),
        ("jpg", bytearray(make_jpeg_header(640, 360))),
        ("bad_png", bytearray(b"\x89PNG\r\n\x1a\ntrunc")),
    ]
    df = spark.createDataFrame(rows, "url string, payload binary")
    got = {r["url"]: r for r in image_metadata(df).collect()}
    assert got["png"]["width"] == 320 and got["png"]["height"] == 200
    assert got["png"]["mime"] == "image/png"
    assert got["jpg"]["width"] == 640 and got["jpg"]["height"] == 360
    assert got["jpg"]["mime"] == "image/jpeg"
    # malformed header degrades per-row, mime still sniffed
    assert got["bad_png"]["width"] is None
    assert got["bad_png"]["mime"] == "image/png"


def test_header_parsers_unit():
    from table_ocr_spark.operators.multimodal import (
        image_dimensions,
        parse_jpeg_dimensions,
        parse_png_dimensions,
    )

    assert parse_png_dimensions(make_real_png(7, 9)) == (7, 9)
    assert parse_jpeg_dimensions(make_jpeg_header(1024, 768)) == (1024, 768)
    assert image_dimensions(fake_img(12, 34)) == (12, 34)
    assert image_dimensions(b"GIF89a??????") is None  # unknown format
    with pytest.raises(ValueError):
        parse_png_dimensions(b"\x89PNG\r\n\x1a\n\x00\x00")  # truncated
    with pytest.raises(ValueError):
        parse_jpeg_dimensions(b"\xff\xd8\xff\xd9")  # EOI before SOF
    with pytest.raises(ValueError):
        parse_jpeg_dimensions(b"\xff\xd8\x00\x00\x00\x00")  # bad marker


def test_pil_parity_when_available(spark):
    # wherever PIL exists, the header parsers and the real decoder must
    # agree on dimensions for the same bytes (skips in this container)
    Image = pytest.importorskip("PIL.Image")
    import io

    img = Image.open(io.BytesIO(make_real_png(320, 200)))
    assert (img.width, img.height) == (320, 200)


def test_jpeg_sof_segment_length_guard():
    # ADVICE r4: a SOF whose declared seg_len is 2-6 must raise, not
    # return bytes of the NEXT segment as dimensions
    import struct as _struct

    import pytest as _pytest

    from table_ocr_spark.operators.multimodal import parse_jpeg_dimensions

    for seg_len in (2, 3, 6):
        bad = (
            b"\xff\xd8"
            + b"\xff\xc0" + _struct.pack(">H", seg_len) + b"\x00" * seg_len
            + b"\xff\xdb" + _struct.pack(">H", 8) + b"\x01\x02\x03\x04\x05\x06"
        )
        with _pytest.raises(ValueError):
            parse_jpeg_dimensions(bad)
    # a well-formed SOF still parses
    good = (
        b"\xff\xd8"
        + b"\xff\xc0" + _struct.pack(">H", 11) + b"\x08"
        + _struct.pack(">HH", 240, 320) + b"\x01" + b"\x00" * 3
    )
    assert parse_jpeg_dimensions(good) == (320, 240)

def test_truncated_fakevid_frame_not_emitted(spark):
    """Round-5 regression (confirmed by execution pre-fix): a FAKEVID
    cut short AFTER a frame's length prefix emitted the truncated
    frame bytes as a normal row. The guard drops it."""
    from table_ocr_spark.operators.multimodal import (
        encode_fake_video,
        sample_frames,
    )

    full = encode_fake_video([b"AAAA", b"BBBB"])
    rows = [
        ("ok", bytearray(full)),
        ("cut", bytearray(full[:-2])),  # second frame payload short
    ]
    vids = spark.createDataFrame(rows, "url string, payload binary")
    got = sorted(
        (r["url"], r["frame_idx"], bytes(r["frame"]))
        for r in sample_frames(vids, every_nth=1).collect()
    )
    assert got == [
        ("cut", 0, b"AAAA"),  # intact frame kept, truncated one dropped
        ("ok", 0, b"AAAA"),
        ("ok", 1, b"BBBB"),
    ]

