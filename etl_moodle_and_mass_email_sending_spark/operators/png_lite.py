"""[EXT] Dependency-free PNG codec (round 9, VERDICT r8 item 5).

Pillow is not available in every runtime, so the ``engine="real"``
image seam in operators/multimodal.py gets a stdlib fallback: PNG is
just zlib + per-scanline byte filters (RFC 2083), so ``zlib`` +
``struct`` decode it exactly. Scope: 8-bit depth, color types
0 (gray) / 2 (RGB) / 3 (palette) / 4 (gray+alpha) / 6 (RGBA),
non-interlaced — i.e. what every real-world screenshot/thumbnail
encoder emits. Anything outside that raises ValueError so the caller
can fall back to Pillow when present.

Scale note: the de-filter loop is per-byte Python, which is fine for
the metadata/geometry path (one IHDR read is O(1)) and acceptable for
small thumbnails inside an Arrow batch; a production cluster with
image-heavy corpora should install Pillow(-SIMD), which the multimodal
seam prefers automatically when importable.

The encoder (filter-0 rows, one IDAT) exists so tests can build real
PNG fixtures without any imaging dependency.
"""

from __future__ import annotations

import struct
import zlib

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

# color type -> samples per pixel
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def is_png(data: bytes) -> bool:
    return bytes(data[:8]) == PNG_SIGNATURE


def _chunks(data: bytes):
    pos = 8
    n = len(data)
    while pos + 8 <= n:
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) < length:
            raise ValueError("truncated PNG chunk")
        yield ctype, body
        pos += 12 + length  # length + type + body + CRC
        if ctype == b"IEND":
            return


def png_size(data: bytes) -> tuple[int, int]:
    """(width, height) from IHDR only — O(1), no inflate."""
    data = bytes(data)
    if not is_png(data):
        raise ValueError("not a PNG (bad signature)")
    for ctype, body in _chunks(data):
        if ctype == b"IHDR":
            w, h = struct.unpack(">II", body[:8])
            return w, h
        break
    raise ValueError("PNG missing IHDR")


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _unfilter(raw: bytes, height: int, stride: int, bpp: int) -> bytearray:
    """Undo the per-scanline filters (types 0-4) in place-ish."""
    out = bytearray(height * stride)
    prev = bytearray(stride)
    pos = 0
    for y in range(height):
        ft = raw[pos]
        pos += 1
        line = bytearray(raw[pos : pos + stride])
        pos += stride
        if ft == 0:
            pass
        elif ft == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ft == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                c = prev[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + _paeth(a, prev[i], c)) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ft}")
        out[y * stride : (y + 1) * stride] = line
        prev = line
    return out


def decode_png(data: bytes):
    """PNG bytes -> numpy uint8 array of shape (h, w, channels).

    Palette images are expanded to RGB; gray stays single-channel
    (shape (h, w, 1)). Raises ValueError outside the supported scope.
    """
    import numpy as np

    data = bytes(data)
    if not is_png(data):
        raise ValueError("not a PNG (bad signature)")
    width = height = None
    color_type = bit_depth = None
    palette = None
    idat = bytearray()
    for ctype, body in _chunks(data):
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
            if bit_depth != 8:
                raise ValueError(f"unsupported PNG bit depth {bit_depth}")
            if color_type not in _CHANNELS:
                raise ValueError(f"unsupported PNG color type {color_type}")
            if comp != 0 or filt != 0:
                raise ValueError("nonstandard PNG compression/filter method")
            if interlace != 0:
                raise ValueError("interlaced PNG not supported")
        elif ctype == b"PLTE":
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.extend(body)
    if width is None:
        raise ValueError("PNG missing IHDR")
    if not idat:
        raise ValueError("PNG missing IDAT")
    channels = _CHANNELS[color_type]
    stride = width * channels
    raw = zlib.decompress(bytes(idat))
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG pixel data length mismatch")
    flat = _unfilter(raw, height, stride, channels)
    arr = np.frombuffer(bytes(flat), dtype=np.uint8).reshape(
        height, width, channels
    )
    if color_type == 3:
        if palette is None:
            raise ValueError("palette PNG missing PLTE")
        arr = palette[arr[:, :, 0]]
    return arr


def encode_png(arr) -> bytes:
    """numpy uint8 (h, w) / (h, w, 1) / (h, w, 3) / (h, w, 4) -> PNG
    bytes (8-bit, filter 0, single IDAT)."""
    import numpy as np

    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, ch = a.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    raw = bytearray()
    for y in range(h):
        raw.append(0)  # filter type None
        raw.extend(a[y].tobytes())

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        PNG_SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + chunk(b"IEND", b"")
    )
