"""[EXT] Dependency-free COMPRESSED-video container: AVI/RIFF with
per-frame PNG payloads (round 13, VERDICT r12 item 5).

The pyav seam (operators/av_codec.py) makes mp4/webm real where the
``av`` wheel exists, but that wheel is absent in this container, so
``engine="real"`` compressed video had never executed in CI. This
module closes that hole the way png_lite/y4m_lite did for images and
raw video: a REAL RIFF/AVI container (the 'MJPG'-in-AVI lineage the
verdict prescribes — 'LIST hdrl' avih/strh/strf headers, 'LIST movi'
``00dc`` frame chunks, ``idx1`` index, word-aligned chunks), with each
frame chunk a genuine DEFLATE-compressed PNG decoded by the existing
stdlib codec (operators/png_lite.py).

Frame pixel profile (documented engine convention, fourcc ``MPNG`` —
the registered Motion-PNG FOURCC): each ``00dc`` chunk is an 8-bit
GRAYSCALE PNG of geometry ``width x (height*3/2)`` whose scanlines are
the frame's planar yuv420p payload (Y plane, then U, then V — exactly
a Y4M C420 frame body). Carrying the planar payload losslessly keeps
the decode contract BYTE-IDENTICAL to y4m_lite/av_codec —
``video_info``/``video_frames`` shapes and frame bytes match the Y4M
twin exactly, which is what the fake-engine oracles and the scene/
sample consumers assume — while the container stays genuinely
compressed (zlib entropy coding per frame).

Scale note: identical to the other codecs — parse + per-frame inflate
run inside the Arrow-batched mapInPandas workers, per row; no driver
work, no shuffle shape change. The per-byte PNG unfilter loop bounds
practical payloads to thumbnail-scale clips, the same documented bound
as png_lite; clusters with heavy video corpora install pyav and the
seam prefers it automatically for non-AVI containers.
"""

from __future__ import annotations

import struct

FOURCC = b"MPNG"


def is_avi(data: bytes) -> bool:
    d = bytes(data[:12])
    return len(d) == 12 and d[:4] == b"RIFF" and d[8:12] == b"AVI "


def _chunks(data: bytes, pos: int, end: int):
    """Yield (ckid, body_start, body_size) for the RIFF chunks in
    [pos, end); honors word alignment."""
    while pos + 8 <= end:
        ckid = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = pos + 8
        if body + size > end:
            raise ValueError("truncated RIFF chunk")
        yield ckid, body, size
        pos = body + size + (size & 1)


def _find_list(data: bytes, pos: int, end: int, list_type: bytes):
    """(body_start, body_end) of the first LIST of ``list_type``."""
    for ckid, body, size in _chunks(data, pos, end):
        if ckid == b"LIST" and data[body : body + 4] == list_type:
            return body + 4, body + size
    raise ValueError(f"AVI missing LIST {list_type!r}")


def _headers(data: bytes):
    """(width, height, fps_num, fps_den, movi_start, movi_end,
    stream_prefix) where ``stream_prefix`` is the two-ASCII-digit movi
    chunk prefix of the MPNG video stream (``b"00"`` for stream 0).

    Validates the codec up front: the strl cursor walks the stream
    lists in stream order (movi chunk ids encode that index), requires
    exactly one ``vids`` stream whose strf ``biCompression`` is the
    MPNG FOURCC, and raises a descriptive 'unsupported codec' error
    otherwise — so a multi-stream or foreign-codec AVI fails here with
    a clear message instead of deep inside png_lite on container bytes
    that were never a PNG (ADVICE r13)."""
    data = bytes(data)
    if not is_avi(data):
        raise ValueError("not an AVI (bad RIFF signature)")
    (riff_size,) = struct.unpack("<I", data[4:8])
    end = min(len(data), 8 + riff_size)
    hdrl_start, hdrl_end = _find_list(data, 12, end, b"hdrl")
    width = height = None
    fps_num, fps_den = 25, 1
    stream_idx = -1  # position of the current strl within hdrl
    vids_stream = None
    for ckid, body, size in _chunks(data, hdrl_start, hdrl_end):
        if ckid == b"avih":
            # dwMicroSecPerFrame .. dwStreams .. dwWidth dwHeight
            fields = struct.unpack("<10I", data[body : body + 40])
            width, height = fields[8], fields[9]
        elif ckid == b"LIST" and data[body : body + 4] == b"strl":
            stream_idx += 1
            is_vids = False
            for c2, b2, s2 in _chunks(data, body + 4, body + size):
                if c2 == b"strh" and data[b2 : b2 + 4] == b"vids":
                    is_vids = True
                    handler = data[b2 + 4 : b2 + 8]
                    if handler != FOURCC:
                        raise ValueError(
                            "unsupported AVI codec: strh handler "
                            f"{handler!r} (this decoder reads only "
                            f"{FOURCC!r} Motion-PNG; install pyav for "
                            "other codecs)"
                        )
                    # fccType fccHandler dwFlags wPrio/wLang dwInitial
                    # dwScale dwRate ...
                    scale, rate = struct.unpack(
                        "<II", data[b2 + 20 : b2 + 28]
                    )
                    if scale and rate:
                        fps_num, fps_den = rate, scale
                elif c2 == b"strf" and is_vids:
                    # BITMAPINFOHEADER: biCompression at offset 16
                    compression = data[b2 + 16 : b2 + 20]
                    if compression != FOURCC:
                        raise ValueError(
                            "unsupported AVI codec: strf biCompression"
                            f" {compression!r} != {FOURCC!r}"
                        )
            if is_vids:
                if vids_stream is not None:
                    raise ValueError(
                        "unsupported AVI: multiple video streams"
                    )
                vids_stream = stream_idx
    if width is None or height is None:
        raise ValueError("AVI missing avih header")
    if vids_stream is None:
        raise ValueError("unsupported AVI: no MPNG video stream")
    movi_start, movi_end = _find_list(data, 12, end, b"movi")
    prefix = b"%02d" % vids_stream
    return width, height, fps_num, fps_den, movi_start, movi_end, prefix


def avi_info(data: bytes):
    """(width, height, fps_num, fps_den, n_frames) — the y4m_info /
    av_codec.video_info contract. Frame count walks the movi chunk
    list (size arithmetic only, no frame decode)."""
    data = bytes(data)
    w, h, fn, fd, ms, me, prefix = _headers(data)
    n = sum(
        1
        for ckid, _, _ in _chunks(data, ms, me)
        if ckid[:2] == prefix and ckid[2:4] in (b"dc", b"db")
    )
    return w, h, fn, fd, n


def avi_frames(
    data: bytes, every_n: int = 1, max_frames: int | None = None
):
    """Yield (frame_index, planar yuv420p bytes) for every
    ``every_n``-th frame — the y4m_frames / av_codec.video_frames
    contract; payload bytes identical to a Y4M C420 frame body."""
    from . import png_lite

    data = bytes(data)
    w, h, _, _, ms, me, prefix = _headers(data)
    fsize = w * h * 3 // 2
    emitted = 0
    i = -1
    for ckid, body, size in _chunks(data, ms, me):
        if ckid[:2] != prefix or ckid[2:4] not in (b"dc", b"db"):
            continue  # e.g. a 'rec ' LIST, audio, or other-stream chunk
        i += 1
        if i % every_n:
            continue
        if max_frames is not None and emitted >= max_frames:
            return
        arr = png_lite.decode_png(data[body : body + size])
        buf = arr.tobytes()
        if len(buf) != fsize:
            raise ValueError(
                f"MPNG frame carries {len(buf)} bytes, yuv420p at "
                f"{w}x{h} needs {fsize}"
            )
        yield i, buf
        emitted += 1


def encode_avi_mpng(
    frames, width: int, height: int, fps: int = 25
) -> bytes:
    """Build a genuine AVI clip (hdrl/movi/idx1, word-aligned chunks)
    from raw yuv420p planar frame buffers, each frame stored as a
    grayscale PNG of the planar payload — the encode_y4m/encode_mp4
    twin for unconditional in-container e2e fixtures."""
    import numpy as np

    from . import png_lite

    if width % 2 or height % 2:
        raise ValueError("yuv420p needs even dimensions")
    fsize = width * height * 3 // 2
    payloads = []
    for f in frames:
        f = bytes(f)
        if len(f) != fsize:
            raise ValueError(
                f"frame is {len(f)} bytes, yuv420p at "
                f"{width}x{height} needs {fsize}"
            )
        arr = np.frombuffer(f, dtype=np.uint8).reshape(
            height * 3 // 2, width
        )
        payloads.append(png_lite.encode_png(arr))

    def chunk(ckid: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return ckid + struct.pack("<I", len(body)) + body + pad

    def lst(list_type: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", list_type + body)

    n = len(payloads)
    max_bytes = max((len(p) for p in payloads), default=0)
    avih = struct.pack(
        "<10I16x",
        1_000_000 // fps,  # dwMicroSecPerFrame
        max_bytes * fps,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        0x10,  # dwFlags: AVIF_HASINDEX
        n,  # dwTotalFrames
        0,  # dwInitialFrames
        1,  # dwStreams
        max_bytes,  # dwSuggestedBufferSize
        width,
        height,
    )
    strh = (
        b"vids"
        + FOURCC
        + struct.pack(
            "<IHHIIIIIIIi4H",
            0,  # dwFlags
            0, 0,  # wPriority, wLanguage
            0,  # dwInitialFrames
            1,  # dwScale
            fps,  # dwRate
            0,  # dwStart
            n,  # dwLength (frames)
            max_bytes,  # dwSuggestedBufferSize
            0,  # dwQuality
            -1,  # dwSampleSize (unused for vids; -1 per convention)
            0, 0, width, height,  # rcFrame
        )
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40,  # biSize
        width,
        height,
        1,  # biPlanes
        8,  # biBitCount (grayscale payload rows)
        FOURCC,  # biCompression
        fsize,  # biSizeImage
        0, 0, 0, 0,
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_chunks = []
    offsets = []  # offset of each ckid relative to 'movi' tag start
    pos = 4  # after the 'movi' list-type tag
    for p in payloads:
        offsets.append(pos)
        c = chunk(b"00dc", p)
        movi_chunks.append(c)
        pos += len(c)
    movi = lst(b"movi", b"".join(movi_chunks))
    idx1 = chunk(
        b"idx1",
        b"".join(
            b"00dc"
            + struct.pack("<III", 0x10, off, len(p))  # AVIIF_KEYFRAME
            for off, p in zip(offsets, payloads)
        ),
    )
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body
