"""PNG codec tests: the real decode path behind the multimodal operators.

Covers round-trips across shapes and all five scanline filters, chunk/CRC
validation, the fast header path, the media decode dispatcher, and the
decoded-pixel checksum contract that the ``media_resize`` oracle relies on.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np
import pytest

from tscd_datalake_adapter_spark.operators.multimodal import (
    _decode_media,
    _png_pixels,
    _wav_payload,
    nearest_resize,
)
from tscd_datalake_adapter_spark.operators.png_codec import (
    PNG_SIGNATURE,
    png_decode,
    png_encode,
    png_header,
    png_parse_chunks,
)


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
@pytest.mark.parametrize(
    "shape", [(6, 8), (12, 16, 3), (5, 9, 4), (1, 1), (3, 200, 3)]
)
def test_round_trip_all_filters(shape, filter_type):
    """encode→decode is the identity for every filter type (None/Sub/Up/
    Average/Paeth) and color layout — i.e. the unfilter paths are real."""
    rng = np.random.default_rng(hash((shape, filter_type)) % 2**32)
    arr = rng.integers(0, 256, size=shape, dtype=np.uint8)
    dec = png_decode(png_encode(arr, filter_type=filter_type))
    assert dec.shape == arr.shape
    assert (dec == arr).all()


def test_header_fast_path():
    arr = np.zeros((11, 23), dtype=np.uint8)
    w, h, ch = png_header(png_encode(arr))
    assert (w, h, ch) == (23, 11, 1)


def test_rejects_malformed():
    arr = np.arange(64, dtype=np.uint8).reshape(8, 8)
    good = png_encode(arr)
    with pytest.raises(ValueError, match="signature"):
        png_decode(b"nope" + good[4:])
    # corrupt one IDAT byte → CRC failure
    idat_pos = good.index(b"IDAT")
    bad = bytearray(good)
    bad[idat_pos + 6] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        png_decode(bytes(bad))
    with pytest.raises(ValueError, match="truncated"):
        png_parse_chunks(good[:20])
    # truncation INSIDE a struct field (CRC cut short) must surface as
    # ValueError too — struct.error is not a ValueError subclass and would
    # escape the decode pipelines' drop-row handling
    with pytest.raises(ValueError):
        png_parse_chunks(good[:-2])
    # corrupt DEFLATE stream -> ValueError (zlib.error wrapped)
    idat_body = bytearray(good)
    idat_body[idat_pos + 10] ^= 0xFF
    import zlib as _zlib

    fixed_crc = bytearray(idat_body)
    # recompute the IDAT CRC so corruption reaches the inflate stage
    length = int.from_bytes(good[idat_pos - 4 : idat_pos], "big")
    data = bytes(idat_body[idat_pos + 4 : idat_pos + 4 + length])
    crc = _zlib.crc32(b"IDAT" + data) & 0xFFFFFFFF
    fixed_crc[idat_pos + 4 + length : idat_pos + 8 + length] = crc.to_bytes(
        4, "big"
    )
    with pytest.raises(ValueError):
        png_decode(bytes(fixed_crc))
    # 16-bit depth is out of scope and must be refused, not mis-decoded
    ihdr = struct.pack(">IIBBBBB", 8, 8, 16, 0, 0, 0, 0)
    deep = (
        PNG_SIGNATURE
        + struct.pack(">I", 13)
        + b"IHDR"
        + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
    )
    with pytest.raises(ValueError, match="bit depth"):
        png_decode(deep)


def test_decode_media_dispatch_png():
    """PNG payloads decode for REAL: stats come from actual pixels, matching
    the generating formula independently recomputed here."""
    for doc_id in (0, 3, 42, 99):
        pix = _png_pixels(doc_id)
        meta = _decode_media(png_encode(pix))
        h, w = pix.shape
        assert (meta["width"], meta["height"]) == (w, h)
        expected_mean = int(pix.astype(np.int64).sum()) / (pix.size * 256)
        assert meta["mean_intensity"] == expected_mean
        assert meta["feature"] == [
            (int(b) / 256.0) * 2.0 - 1.0 for b in pix[0, :8]
        ]


def test_decode_media_dispatch_wav_against_stdlib_wave():
    """Our WAV payloads are real: the stdlib ``wave`` module parses them
    and agrees on every header field and the raw sample bytes."""
    for doc_id in (1, 7, 61):
        payload = _wav_payload(doc_id)
        with wave.open(io.BytesIO(payload)) as wf:
            assert wf.getframerate() == 8000
            assert wf.getnchannels() == 1
            assert wf.getsampwidth() == 1
            frames = wf.readframes(wf.getnframes())
        n = 50 + doc_id % 20
        assert frames == bytes((11 * doc_id + 5 * i) % 256 for i in range(n))
        meta = _decode_media(payload)
        assert meta["width"] is None and meta["height"] is None
        assert meta["mean_intensity"] == sum(frames) / (n * 256)


def test_decode_media_fallback_and_empty():
    fake = _decode_media(b"not a png or wav")
    assert 64 <= fake["width"] <= 255  # sha-derived stub ranges
    with pytest.raises(ValueError):
        _decode_media(b"")


def test_nearest_resize_matches_naive():
    rng = np.random.default_rng(11)
    arr = rng.integers(0, 256, size=(13, 17), dtype=np.uint8)
    out = nearest_resize(arr, 64, 48)
    assert out.shape == (48, 64)
    for y in (0, 7, 47):
        for x in (0, 31, 63):
            assert out[y, x] == arr[(y * 13) // 48, (x * 17) // 64]


def test_resize_checksum_matches_formula(spark):
    """End-to-end: encode the formula image, push it through the Spark
    ``resize_media`` pipeline, and check the decoded-pixel checksum against
    a pure-Python recomputation from the formula (what the SQL oracle does)."""
    import pandas as pd

    from tscd_datalake_adapter_spark.operators.multimodal import resize_media
    from tscd_datalake_adapter_spark.operators.png_codec import png_encode

    ids = [0, 5, 17, 42]
    media = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": ids,
                "media_type": ["image"] * len(ids),
                "payload": [png_encode(_png_pixels(i)) for i in ids],
            }
        )
    )
    got = {r.doc_id: r for r in resize_media(media).collect()}
    for did in ids:
        w = 8 + did % 9
        h = 6 + did % 7
        out_h = (h * 64) // w
        expected = 0
        for y in range(out_h):
            sy = (y * h) // out_h
            for x in range(64):
                sx = (x * w) // 64
                expected += ((7 * sx + 13 * sy + did) % 256) * (
                    y * 64 + x + 1
                )
        r = got[did]
        assert (r.width, r.height, r.out_h) == (w, h, out_h)
        assert r.resized_checksum == expected


def test_header_rejects_non_ihdr_first_chunk():
    """Round-5 ADVICE pin: a valid-CRC first chunk that is NOT a 13-byte
    IHDR must raise ValueError (the module contract), not struct.error
    or garbage dimensions."""
    body = b"x" * 5
    payload = (
        PNG_SIGNATURE
        + struct.pack(">I", len(body))
        + b"teXt"
        + body
        + struct.pack(">I", zlib.crc32(b"teXt" + body) & 0xFFFFFFFF)
    )
    with pytest.raises(ValueError, match="IHDR"):
        png_header(payload)
    # short-but-valid-CRC IHDR data is equally malformed
    short = b"\x00" * 9
    payload2 = (
        PNG_SIGNATURE
        + struct.pack(">I", len(short))
        + b"IHDR"
        + short
        + struct.pack(">I", zlib.crc32(b"IHDR" + short) & 0xFFFFFFFF)
    )
    with pytest.raises(ValueError, match="IHDR"):
        png_header(payload2)


def test_resize_media_clamps_wide_images(spark):
    """Round-5 ADVICE pin: a wider-than-64*h image floors to out_h == 0;
    resize_media must clamp to 1 output row and keep the row instead of
    raising IndexError inside the task."""
    from tscd_datalake_adapter_spark.operators.multimodal import resize_media

    arr = np.arange(3 * 200, dtype=np.uint8).reshape(3, 200)
    df = spark.createDataFrame(
        [(1, "image", bytearray(png_encode(arr)))],
        "doc_id long, media_type string, payload binary",
    )
    out = resize_media(df).collect()
    assert len(out) == 1
    assert out[0]["out_h"] == 1 and out[0]["width"] == 200
