"""From-scratch GIF codec: LZW + container roundtrips, an external
known-good byte string, and the strict ValueError contract."""

from __future__ import annotations

import random

import numpy as np
import pytest

from tscd_datalake_adapter_spark.operators.gif_codec import (
    gif_decode,
    gif_encode,
    lzw_decode,
    lzw_encode,
)

# Canonical hand-assembled 1x1 GIF89a (2-color palette, pixel 0) — bytes
# NOT produced by this codec, so the decoder is pinned against an
# independent encoding, not just its own mirror.
TINY_GIF = (
    b"GIF89a\x01\x00\x01\x00\x80\x00\x00\xff\xff\xff\x00\x00\x00"
    b"\x21\xf9\x04\x01\x00\x00\x00\x00"
    b"\x2c\x00\x00\x00\x00\x01\x00\x01\x00\x00\x02\x02\x44\x01\x00\x3b"
)


def test_lzw_roundtrip_fuzz():
    rng = random.Random(7)
    for _ in range(100):
        data = bytes(rng.randrange(256) for _ in range(rng.randrange(0, 2000)))
        assert lzw_decode(lzw_encode(data)) == data
    # repetitive data grows the dictionary fast (deep code chains)
    data = bytes([i % 7 for i in range(20000)])
    assert lzw_decode(lzw_encode(data)) == data
    # enough random bytes to exhaust the 4096-entry table -> mid-stream
    # CLEAR + 12-bit codes exercised
    data = bytes(rng.randrange(256) for _ in range(60000))
    assert lzw_decode(lzw_encode(data)) == data


def test_gif_roundtrip_fuzz():
    rng = random.Random(11)
    for _ in range(20):
        h, w = rng.randrange(1, 20), rng.randrange(1, 20)
        frames = [
            np.array(
                [[rng.randrange(256) for _ in range(w)] for _ in range(h)],
                dtype=np.uint8,
            )
            for _ in range(rng.randrange(1, 8))
        ]
        out, w2, h2 = gif_decode(gif_encode(frames))
        assert (w2, h2) == (w, h) and len(out) == len(frames)
        for a, b in zip(frames, out):
            assert (a == b).all()


def test_decodes_external_gif():
    frames, w, h = gif_decode(TINY_GIF)
    assert (w, h) == (1, 1)
    assert len(frames) == 1
    assert frames[0].tolist() == [[0]]


def test_partial_frame_composites_onto_canvas():
    base = np.arange(12, dtype=np.uint8).reshape(3, 4)
    full = gif_encode([base])
    # splice in a second 1x2 frame at (left=1, top=1) by hand
    import struct

    from tscd_datalake_adapter_spark.operators.gif_codec import (
        _sub_blocks,
    )

    patch = bytes([250, 251])
    frame2 = (
        b"\x2c" + struct.pack("<HHHH", 1, 1, 2, 1) + b"\x00" + b"\x08"
        + _sub_blocks(lzw_encode(patch))
    )
    spliced = full[:-1] + frame2 + b"\x3b"
    frames, w, h = gif_decode(spliced)
    assert len(frames) == 2
    assert (frames[0] == base).all()
    want = base.copy()
    want[1, 1:3] = [250, 251]
    assert (frames[1] == want).all()


@pytest.mark.parametrize(
    "mutate",
    [
        lambda b: b"",
        lambda b: b"NOTAGIF" + b[6:],
        lambda b: b[:-1],  # missing trailer
        lambda b: b[:25],  # truncated mid-structure
        # image separator lives at 13 (header) + 768 (palette) + 8 (GCE);
        # overwrite it with an unknown block tag
        lambda b: b[:789] + b"\x2d" + b[790:],
    ],
)
def test_malformed_raises_valueerror(mutate):
    good = gif_encode([np.zeros((2, 2), dtype=np.uint8)])
    with pytest.raises(ValueError):
        gif_decode(mutate(good))


def test_media_decode_dispatch_real_gif(spark, sf_dir):
    """End to end through the library surface: the video arm's payload is
    a real animated GIF whose decoded frame pixels match the generator."""
    from tscd_datalake_adapter_spark.operators.multimodal import (
        _decode_media,
        _gif_frames,
    )

    for doc_id in (2, 5, 17, 44):
        frames = _gif_frames(doc_id)
        meta = _decode_media(gif_encode(frames))
        assert meta["n_frames"] == len(frames) == 2 + doc_id % 7
        assert meta["width"] == 8 + doc_id % 9
        total = sum(int(f.astype(np.int64).sum()) for f in frames)
        size = len(frames) * frames[0].size * 256
        assert meta["mean_intensity"] == total / size
