"""From-scratch animated GIF (GIF87a/GIF89a) codec on the Python stdlib —
no PIL/ffmpeg (neither exists in this container; SURVEY.md build
constraints). This closes the last multimodal stub: video-typed media rows
now carry REAL multi-frame payloads whose frames genuinely round-trip
through LZW, so frame sampling / frame feature extraction operate on actual
decoded pixels (the PNG-codec precedent — ``png_codec.py`` — applied to the
animated tier).

Scope (deliberately the subset the media fixtures need, strictly parsed):
- 8-bit global grayscale palette (palette[i] = (i, i, i)), so a decoded
  palette INDEX equals the pixel intensity — the same convention the PNG
  arm uses, which keeps every oracle a pure integer formula.
- Multi-frame: one Graphic Control Extension + Image Descriptor per frame,
  frames composited left/top onto the logical screen (disposal "leave in
  place"), non-interlaced.
- GIF-variant LZW with variable code width 9→12 bits, LSB-first packing,
  CLEAR/EOI codes, mid-stream CLEAR on table exhaustion.

Contract (mirrors png_codec): every malformed input raises ``ValueError``;
decode(encode(x)) is bit-exact; unit tests additionally pin the decoder
against a hand-assembled known-good GIF byte string.
"""

from __future__ import annotations

import struct

GIF_SIGNATURES = (b"GIF87a", b"GIF89a")

_CLEAR_BASE = 8  # min LZW code size for an 8-bit palette
_MAX_CODE_SIZE = 12


# ---------------------------------------------------------------------------
# LZW (GIF variant)
# ---------------------------------------------------------------------------


class _BitWriter:
    """LSB-first bit packer (GIF packs the low bit of each code first)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, width: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def finish(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # bit position

    def read(self, width: int) -> int:
        end = self.pos + width
        if end > len(self.data) * 8:
            raise ValueError("gif: LZW stream truncated")
        val = 0
        got = 0
        while got < width:
            byte = self.data[(self.pos + got) // 8]
            bit_off = (self.pos + got) % 8
            take = min(8 - bit_off, width - got)
            val |= ((byte >> bit_off) & ((1 << take) - 1)) << got
            got += take
        self.pos = end
        return val


def lzw_encode(data: bytes, min_code_size: int = _CLEAR_BASE) -> bytes:
    """GIF LZW. The encoder mirrors the decoder's (next_code, code_size)
    evolution: the decoder registers one table entry per emitted data code
    EXCEPT the first after a CLEAR, so it runs one entry behind the
    encoder — hence the encoder widens at ``next_code == 2^cs + 1`` where
    the decoder widens at ``next_code == 2^cs`` (the classic GIF
    off-by-one, here made explicit instead of folkloric)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    bw = _BitWriter()

    def reset():
        return (
            {bytes([i]): i for i in range(clear)},
            eoi + 1,
            min_code_size + 1,
        )

    table, next_code, cs = reset()
    bw.write(clear, cs)
    w = b""
    for b in data:
        wc = w + bytes([b])
        if wc in table:
            w = wc
            continue
        bw.write(table[w], cs)
        table[wc] = next_code
        next_code += 1
        if next_code == (1 << cs) + 1 and cs < _MAX_CODE_SIZE:
            cs += 1
        if next_code > (1 << _MAX_CODE_SIZE):
            bw.write(clear, cs)
            table, next_code, cs = reset()
        w = bytes([b])
    if w:
        bw.write(table[w], cs)
        next_code += 1
        if next_code == (1 << cs) + 1 and cs < _MAX_CODE_SIZE:
            cs += 1
    bw.write(eoi, cs)
    return bw.finish()


def lzw_decode(data: bytes, min_code_size: int = _CLEAR_BASE) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    br = _BitReader(data)
    out = bytearray()

    def reset():
        return {i: bytes([i]) for i in range(clear)}, eoi + 1, min_code_size + 1

    table, next_code, cs = reset()
    prev: bytes | None = None
    while True:
        code = br.read(cs)
        if code == clear:
            table, next_code, cs = reset()
            prev = None
            continue
        if code == eoi:
            return bytes(out)
        if prev is None:
            if code >= clear:
                raise ValueError("gif: first LZW code not a literal")
            entry = table[code]
        elif code < next_code:
            entry = table[code]
        elif code == next_code:
            entry = prev + prev[:1]
        else:
            raise ValueError("gif: LZW code out of range")
        out += entry
        if prev is not None:
            table[next_code] = prev + entry[:1]
            next_code += 1
            if next_code == (1 << cs) and cs < _MAX_CODE_SIZE:
                cs += 1
        prev = entry


# ---------------------------------------------------------------------------
# Container
# ---------------------------------------------------------------------------


def _sub_blocks(payload: bytes) -> bytes:
    """Split ``payload`` into <=255-byte GIF data sub-blocks + terminator."""
    out = bytearray()
    for i in range(0, len(payload), 255):
        chunk = payload[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def gif_encode(frames, delay_cs: int = 10) -> bytes:
    """Encode ``frames`` (list of equal-shaped 2-D uint8 arrays / nested
    lists of palette indices == intensities) as an animated GIF89a with a
    256-entry grayscale global color table."""
    import numpy as np

    if not frames:
        raise ValueError("gif: no frames")
    arrs = [np.asarray(f, dtype=np.uint8) for f in frames]
    h, w = arrs[0].shape
    if h < 1 or w < 1 or h > 0xFFFF or w > 0xFFFF:
        raise ValueError("gif: bad dimensions")
    for a in arrs:
        if a.shape != (h, w):
            raise ValueError("gif: frame shape mismatch")
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out.append(0xF7)  # global table, 8-bit, 256 entries
    out += b"\x00\x00"  # bg index, aspect
    for i in range(256):
        out += bytes((i, i, i))
    for a in arrs:
        out += b"\x21\xf9\x04\x00" + struct.pack("<H", delay_cs) + b"\x00\x00"
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
        out.append(_CLEAR_BASE)
        out += _sub_blocks(lzw_encode(a.tobytes()))
    out += b"\x3b"
    return bytes(out)


def _read_sub_blocks(payload: bytes, pos: int) -> tuple[bytes, int]:
    out = bytearray()
    while True:
        if pos >= len(payload):
            raise ValueError("gif: unterminated sub-blocks")
        n = payload[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        if pos + n > len(payload):
            raise ValueError("gif: sub-block overruns payload")
        out += payload[pos : pos + n]
        pos += n


def gif_decode(payload: bytes):
    """Decode an animated GIF into (frames, width, height): composited
    full-canvas uint8 index frames (grayscale palettes make index ==
    intensity; for other palettes callers map through the returned frames
    themselves — the fixtures only use grayscale). Strict: any structural
    defect raises ValueError."""
    import numpy as np

    if len(payload) < 13 or payload[:6] not in GIF_SIGNATURES:
        raise ValueError("gif: bad signature")
    w, h = struct.unpack_from("<HH", payload, 6)
    if w < 1 or h < 1:
        raise ValueError("gif: bad screen dimensions")
    packed = payload[10]
    pos = 13
    if packed & 0x80:
        n_colors = 2 << (packed & 0x07)
        if pos + 3 * n_colors > len(payload):
            raise ValueError("gif: global color table truncated")
        pos += 3 * n_colors
    canvas = np.zeros((h, w), dtype=np.uint8)
    frames = []
    while True:
        if pos >= len(payload):
            raise ValueError("gif: missing trailer")
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            if not frames:
                raise ValueError("gif: no image data")
            return frames, w, h
        if block == 0x21:  # extension: label + sub-blocks, skipped
            if pos >= len(payload):
                raise ValueError("gif: truncated extension")
            pos += 1
            _, pos = _read_sub_blocks(payload, pos)
            continue
        if block != 0x2C:
            raise ValueError(f"gif: unknown block 0x{block:02x}")
        if pos + 9 > len(payload):
            raise ValueError("gif: truncated image descriptor")
        left, top, fw, fh = struct.unpack_from("<HHHH", payload, pos)
        fpacked = payload[pos + 8]
        pos += 9
        if fpacked & 0x40:
            raise ValueError("gif: interlaced frames unsupported")
        if fpacked & 0x80:
            n_colors = 2 << (fpacked & 0x07)
            if pos + 3 * n_colors > len(payload):
                raise ValueError("gif: local color table truncated")
            pos += 3 * n_colors
        if left + fw > w or top + fh > h:
            raise ValueError("gif: frame exceeds logical screen")
        if pos >= len(payload):
            raise ValueError("gif: missing LZW min code size")
        mcs = payload[pos]
        pos += 1
        if not 2 <= mcs <= 11:
            raise ValueError("gif: bad LZW min code size")
        raw, pos = _read_sub_blocks(payload, pos)
        idx = lzw_decode(raw, mcs)
        if len(idx) != fw * fh:
            raise ValueError("gif: pixel count mismatch")
        patch = np.frombuffer(idx, dtype=np.uint8).reshape(fh, fw)
        canvas[top : top + fh, left : left + fw] = patch
        frames.append(canvas.copy())
