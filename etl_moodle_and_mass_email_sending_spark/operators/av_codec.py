"""[EXT] Optional pyav-backed COMPRESSED-video codec (round 12,
VERDICT r11 item 7).

The multimodal ``engine="real"`` video path is live for Y4M through
the stdlib parser (operators/y4m_lite.py); compressed containers
(mp4/webm/mkv) need a real demuxer+decoder, which only ships as the
optional heavyweight ``av`` (PyAV/FFmpeg) wheel. This module is the
plug-in behind the three documented seams in operators/multimodal.py
(decode_media, sample_frames, detect_scene_changes): import-gated, it
exposes the SAME shapes y4m_lite proved —

  ``video_info(data)``   -> (width, height, fps_num, fps_den, n_frames)
  ``video_frames(data)`` -> yields (frame_index, yuv420p planar bytes)

so every downstream consumer (duration arithmetic, frame hex payloads,
Y-plane luma deltas) is byte-layout-compatible with the Y4M path: a
frame is w*h Y bytes followed by the two quarter-size chroma planes,
exactly a Y4M C420 frame payload.

Where the wheel is absent (this container), callers fall through to
the existing NotImplementedError seam text; the pytest e2e is
skip-gated on ``pytest.importorskip("av")`` and the fake-engine
oracles are untouched either way.

Scale note: decode cost lives inside the Arrow-batched mapInPandas
workers exactly like the Y4M path — per-row ffmpeg decode, no
driver-side work, no shuffle shape change.
"""

from __future__ import annotations

import io


def have_av() -> bool:
    try:
        import av  # noqa: F401

        return True
    except Exception:
        return False


def _open_video(data: bytes):
    import av

    container = av.open(io.BytesIO(bytes(data)))
    stream = container.streams.video[0]
    return container, stream


def video_info(data: bytes):
    """(width, height, fps_num, fps_den, n_frames) — the y4m_info
    contract for a compressed container. Frame count walks the decoded
    stream (container metadata lies too often to trust)."""
    container, stream = _open_video(data)
    try:
        width = int(stream.codec_context.width)
        height = int(stream.codec_context.height)
        rate = stream.average_rate or stream.base_rate
        fps_num = int(rate.numerator) if rate else 25
        fps_den = int(rate.denominator) if rate else 1
        n_frames = sum(1 for _ in container.decode(stream))
        return width, height, fps_num, fps_den, n_frames
    finally:
        container.close()


def video_frames(
    data: bytes, every_n: int = 1, max_frames: int | None = None
):
    """Yield (frame_index, planar yuv420p bytes) for every
    ``every_n``-th frame, at most ``max_frames`` — the y4m_frames
    contract; each payload is byte-identical in layout to a Y4M C420
    frame (Y plane, then U, then V)."""
    container, stream = _open_video(data)
    try:
        emitted = 0
        for i, frame in enumerate(container.decode(stream)):
            if i % every_n:
                continue
            if max_frames is not None and emitted >= max_frames:
                return
            planar = frame.reformat(format="yuv420p")
            buf = b"".join(
                bytes(plane) for plane in planar.planes
            )
            yield i, buf
            emitted += 1
    finally:
        container.close()


def encode_mp4(
    frames, width: int, height: int, fps: int = 25
) -> bytes:
    """Build a genuine mp4 clip from raw yuv420p planar frame buffers —
    the encode_y4m twin for the skip-gated e2e (mpeg4 encoder: bundled
    in every FFmpeg build PyAV ships with)."""
    import av
    import numpy as np

    fsize = width * height * 3 // 2
    buf = io.BytesIO()
    container = av.open(buf, mode="w", format="mp4")
    stream = container.add_stream("mpeg4", rate=fps)
    stream.width = width
    stream.height = height
    stream.pix_fmt = "yuv420p"
    for f in frames:
        f = bytes(f)
        if len(f) != fsize:
            raise ValueError(
                f"frame is {len(f)} bytes, yuv420p at "
                f"{width}x{height} needs {fsize}"
            )
        flat = np.frombuffer(f, dtype=np.uint8)
        # VideoFrame.from_ndarray(yuv420p) wants (h*3/2, w)
        arr = flat.reshape(height * 3 // 2, width)
        vf = av.VideoFrame.from_ndarray(arr, format="yuv420p")
        for packet in stream.encode(vf):
            container.mux(packet)
    for packet in stream.encode():
        container.mux(packet)
    container.close()
    return buf.getvalue()
