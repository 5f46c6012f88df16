"""Multimodal column plumbing: opaque ``binary`` payloads + typed
metadata, processed in Arrow-batched ``mapInPandas`` kernels.

This is the Spark-side analogue of the reference's page-image path
(``table_ocr/core.py:90-155``: PIL image prep, MIME sniffing, embedded
-image fast path, grayscale/crop transforms). The image/audio decode
libraries are NOT in this container, so the decode step is STUBBED
(clearly marked) behind a deterministic fake for ``FAKEIMG``-magic
payloads; the Spark plumbing — schema, batch shape, partitioning — is
real and tested.
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("gray_mean", T.DoubleType()),
    ]
)

_FAKE_MAGIC = b"FAKEIMG"


def _sniff_mime(payload: bytes) -> str:
    """MIME sniff by magic bytes (reference ``core.py:100-119`` uses
    mimetypes.guess_type + PNG default)."""
    if payload.startswith(b"\x89PNG"):
        return "image/png"
    if payload.startswith(b"\xff\xd8"):
        return "image/jpeg"
    if payload.startswith(_FAKE_MAGIC):
        return "image/x-fake"
    return "image/png"  # reference default


def _decode_image(payload: bytes):
    """STUB: real decode needs PIL/cv2 (absent here). Deterministic fake
    path: ``FAKEIMG<w:u16><h:u16><mean:f32>``. Anything else raises."""
    if payload.startswith(_FAKE_MAGIC):
        w, h = struct.unpack("<HH", payload[7:11])
        (mean,) = struct.unpack("<f", payload[11:15])
        return w, h, float(mean)
    try:
        from PIL import Image  # pragma: no cover - not in container
        import io

        img = Image.open(io.BytesIO(payload))
        return img.width, img.height, 0.0
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError(
            "image decode requires PIL/cv2 (not available in this container); "
            "use FAKEIMG payloads in tests"
        ) from e


def image_metadata(images: DataFrame) -> DataFrame:
    """``(url, payload binary)`` → typed image metadata, Arrow-batched."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, payload in zip(pdf["url"], pdf["payload"]):
                b = bytes(payload)
                w, h, mean = _decode_image(b)
                rows.append((url, _sniff_mime(b), w, h, mean))
            yield pd.DataFrame(
                rows, columns=["url", "mime", "width", "height", "gray_mean"]
            )

    return images.select("url", "payload").mapInPandas(kernel, IMAGE_META_SCHEMA)
