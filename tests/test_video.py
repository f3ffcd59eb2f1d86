"""Video pipeline: the pure-Python MJPEG-AVI muxer and the
VideoRenderStream dispatch (the reference's VideoRenderStream counterpart;
reference: utils.py:33-70)."""

import io
import struct

import numpy as np

from ppi_tpu.utils.video import MjpegAviWriter, VideoRenderStream


def _walk_riff(data):
    """Parse the AVI RIFF container; return (lists, chunks) as dicts of
    fourcc -> payload slices (top level only, movi frames collected)."""
    assert data[:4] == b"RIFF"
    total = struct.unpack("<I", data[4:8])[0]
    assert data[8:12] == b"AVI "
    assert total == len(data) - 8
    pos = 12
    frames, idx = [], None
    headers = {}
    while pos < len(data):
        tag = data[pos:pos + 4]
        size = struct.unpack("<I", data[pos + 4:pos + 8])[0]
        body = data[pos + 8:pos + 8 + size]
        if tag == b"LIST":
            kind = body[:4]
            headers[kind] = body
            if kind == b"movi":
                q = 4
                while q < len(body):
                    ctag = body[q:q + 4]
                    csize = struct.unpack("<I", body[q + 4:q + 8])[0]
                    if ctag == b"00dc":
                        frames.append(body[q + 8:q + 8 + csize])
                    q += 8 + csize + (csize % 2)
        elif tag == b"idx1":
            idx = body
        pos += 8 + size + (size % 2)
    return headers, frames, idx


def _gradient_frame(t, h=32, w=48):
    x = np.linspace(0, 255, w, dtype=np.uint8)
    frame = np.zeros((h, w, 3), np.uint8)
    frame[..., 0] = x[None, :]
    frame[..., 1] = (t * 37) % 256
    return frame


class TestMjpegAvi:
    def test_container_structure_and_frames(self, tmp_path):
        path = tmp_path / "clip.avi"
        n = 7
        with MjpegAviWriter(path, fps=10) as w:
            for t in range(n):
                w.append(_gradient_frame(t))
        data = path.read_bytes()
        headers, frames, idx = _walk_riff(data)
        assert b"hdrl" in headers and b"movi" in headers
        assert len(frames) == n
        assert idx is not None and len(idx) == 16 * n
        # header fields: total frames and stream length patched on close
        hdrl = headers[b"hdrl"]
        avih = hdrl[hdrl.index(b"avih") + 8:]
        total_frames = struct.unpack("<I", avih[16:20])[0]
        assert total_frames == n
        # each frame chunk is a decodable JPEG matching its input
        from PIL import Image
        for t, blob in enumerate(frames):
            img = np.asarray(Image.open(io.BytesIO(blob)).convert("RGB"))
            ref = _gradient_frame(t)
            assert img.shape == ref.shape
            assert np.mean(np.abs(img.astype(int) - ref.astype(int))) < 6.0

        # idx1 offsets point at the corresponding 00dc chunks inside movi
        movi = headers[b"movi"]
        for k in range(n):
            tag, flags, off, size = struct.unpack_from("<4sIII", idx, 16 * k)
            assert tag == b"00dc" and flags == 0x10
            assert movi[off:off + 4] == b"00dc"

    def test_stream_fallback_rewrites_mp4_to_avi(self, tmp_path):
        # no ffmpeg backend in this image: .mp4 degrades to MJPEG .avi
        stream = VideoRenderStream(tmp_path / "clip.mp4", fps=5)
        with stream as s:
            for t in range(3):
                s.append(_gradient_frame(t))
        assert stream.path.suffix in (".avi", ".mp4")
        assert stream.path.exists() and stream.path.stat().st_size > 0

    def test_stream_gif(self, tmp_path):
        stream = VideoRenderStream(tmp_path / "clip.gif", fps=5)
        with stream as s:
            for t in range(3):
                s.append(_gradient_frame(t))
        assert (tmp_path / "clip.gif").stat().st_size > 0
