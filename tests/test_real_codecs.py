"""Real-codec branch coverage (round-1 verdict #6): the PIL / PyMuPDF /
pyav paths behind the FAKE-payload fast paths, exercised wherever the
library exists via ``pytest.importorskip`` — in this container they
SKIP (the libs are absent, which is exactly the documented constraint);
on any host with the codecs installed they run for real, so the gated
branches are no longer zero-evidence code.

Every test drives the SAME kernel entry points the Spark operators call
(``_decode_image``, ``parse_pdf_payload``, the ``sample_frames``
kernel), so a passing run is evidence about the production path, not a
parallel reimplementation.
"""

import io

import pytest


def test_pil_decode_real_png():
    pytest.importorskip("PIL")
    from PIL import Image

    from table_ocr_spark.operators.multimodal import _decode_image, _sniff_mime

    img = Image.new("L", (10, 6), color=128)
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    payload = buf.getvalue()

    assert _sniff_mime(payload) == "image/png"
    w, h, mean = _decode_image(payload)
    assert (w, h) == (10, 6)
    assert abs(mean - 128.0) < 1.0


def test_pil_decode_real_jpeg_mime():
    pytest.importorskip("PIL")
    from PIL import Image

    from table_ocr_spark.operators.multimodal import _decode_image, _sniff_mime

    img = Image.new("RGB", (8, 8), color=(255, 0, 0))
    buf = io.BytesIO()
    img.save(buf, format="JPEG")
    payload = buf.getvalue()

    assert _sniff_mime(payload) == "image/jpeg"
    w, h, _ = _decode_image(payload)
    assert (w, h) == (8, 8)


def test_fitz_parse_real_pdf():
    fitz = pytest.importorskip("fitz")

    from table_ocr_spark.kernel.layout import extract_pdf, parse_pdf_payload

    doc = fitz.open()
    page = doc.new_page()
    page.insert_text((72, 72), "hello world from a real pdf")
    payload = doc.tobytes()

    pages = parse_pdf_payload(payload)
    assert len(pages) == 1
    joined = " ".join(s.text for s in pages[0])
    assert "hello world" in joined

    # whole-kernel path: segmentation over real spans
    r = extract_pdf(payload)
    assert "hello world" in r.text


def test_av_decode_real_video(spark):
    av = pytest.importorskip("av")
    np = pytest.importorskip("numpy")

    from table_ocr_spark.operators.multimodal import sample_frames

    # encode a 4-frame video in-memory, then run it through the actual
    # sample_frames operator (mapInPandas kernel, real-codec branch)
    buf = io.BytesIO()
    with av.open(buf, mode="w", format="mp4") as container:
        stream = container.add_stream("mpeg4", rate=4)
        stream.width, stream.height, stream.pix_fmt = 32, 16, "yuv420p"
        for i in range(4):
            arr = np.full((16, 32), i * 40, dtype=np.uint8)
            frame = av.VideoFrame.from_ndarray(arr, format="gray")
            for packet in stream.encode(frame.reformat(format="yuv420p")):
                container.mux(packet)
        for packet in stream.encode():
            container.mux(packet)

    videos = spark.createDataFrame(
        [("v1", bytearray(buf.getvalue()))], "url string, payload binary"
    )
    rows = sample_frames(videos, every_nth=2).collect()
    assert [r["frame_idx"] for r in rows] == [0, 2]
    assert all(len(r["frame"]) > 0 for r in rows)  # raw luma plane bytes
