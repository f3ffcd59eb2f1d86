"""Streaming video writer.

Counterpart of the reference's ``VideoRenderStream`` (reference:
utils.py:33-70 — an imageio-ffmpeg frame pipe writing mp4). This image has
no ffmpeg binary and no imageio-ffmpeg wheel, so the default backend is a
pure-Python **MJPEG-in-AVI** muxer (JPEG frames in a RIFF container —
playable by every mainstream player and by ffmpeg-based tools). When
imageio-ffmpeg IS available the requested .mp4 is produced through it
unchanged; otherwise the suffix degrades to .avi (logged).

The writer is streaming like the reference's pipe: frames are appended one
at a time, the RIFF sizes and the idx1 index are patched on close — memory
use is O(1) in episode length.
"""

import io
import logging
import struct
from pathlib import Path

import numpy as np

__all__ = ["VideoRenderStream", "MjpegAviWriter"]


def _fourcc(tag: bytes) -> bytes:
    assert len(tag) == 4
    return tag


class MjpegAviWriter:
    """Minimal AVI (RIFF) muxer for MJPEG streams, stdlib + PIL only."""

    def __init__(self, path, fps: int = 25, quality: int = 90):
        self.path = Path(path)
        self.fps = int(fps)
        self.quality = int(quality)
        self._f = None
        self._frames = 0
        self._index = []       # (offset_in_movi, size) per frame
        self._wh = None

    # -- RIFF plumbing ------------------------------------------------------
    def _u32(self, v):
        return struct.pack("<I", int(v) & 0xFFFFFFFF)

    def _open(self, w, h):
        self._wh = (w, h)
        f = self._f = open(self.path, "wb")
        f.write(b"RIFF" + self._u32(0) + b"AVI ")          # patched on close
        # hdrl list
        strh = (b"vids" + b"MJPG" + self._u32(0) + self._u32(0)
                + self._u32(0)
                + self._u32(1) + self._u32(self.fps)       # scale, rate
                + self._u32(0) + self._u32(0)              # start, length*
                + self._u32(w * h * 3) + self._u32(10_000)
                + self._u32(0)
                + struct.pack("<4h", 0, 0, w, h))
        strf = (self._u32(40) + self._u32(w) + self._u32(h)
                + struct.pack("<HH", 1, 24) + b"MJPG"
                + self._u32(w * h * 3) + self._u32(0) + self._u32(0)
                + self._u32(0) + self._u32(0))
        strl = (b"LIST" + self._u32(4 + 8 + len(strh) + 8 + len(strf))
                + b"strl"
                + b"strh" + self._u32(len(strh)) + strh
                + b"strf" + self._u32(len(strf)) + strf)
        avih = (self._u32(1_000_000 // self.fps) + self._u32(0)
                + self._u32(0) + self._u32(0x10)           # AVIF_HASINDEX
                + self._u32(0)                             # total frames*
                + self._u32(0) + self._u32(1) + self._u32(10_000)
                + self._u32(w) + self._u32(h)
                + self._u32(0) * 4)
        hdrl = (b"LIST"
                + self._u32(4 + 8 + len(avih) + len(strl))
                + b"hdrl"
                + b"avih" + self._u32(len(avih)) + avih
                + strl)
        f.write(hdrl)
        # positions of the fields patched on close (*)
        self._pos_total_frames = 12 + 8 + 4 + 8 + 16
        self._pos_stream_length = 12 + 8 + 4 + 8 + len(avih) + 8 + 4 + 8 + 32
        f.write(b"LIST" + self._u32(0) + b"movi")          # patched on close
        self._movi_start = f.tell() - 4                    # points at 'movi'

    def append(self, frame: np.ndarray):
        """frame: (H, W, 3) uint8 RGB."""
        from PIL import Image

        frame = np.ascontiguousarray(frame)
        h, w = frame.shape[:2]
        if self._f is None:
            self._open(w, h)
        assert (w, h) == self._wh, "frame size changed mid-stream"
        buf = io.BytesIO()
        Image.fromarray(frame).save(buf, format="JPEG",
                                    quality=self.quality)
        data = buf.getvalue()
        if len(data) % 2:
            data += b"\x00"
        offset = self._f.tell() - self._movi_start         # rel to 'movi'
        self._f.write(b"00dc" + self._u32(len(data)) + data)
        self._index.append((offset, len(data)))
        self._frames += 1

    def close(self):
        if self._f is None:
            return
        f = self._f
        movi_end = f.tell()
        # idx1
        f.write(b"idx1" + self._u32(16 * len(self._index)))
        for offset, size in self._index:
            f.write(b"00dc" + self._u32(0x10) + self._u32(offset)
                    + self._u32(size))
        riff_end = f.tell()
        f.seek(4)
        f.write(self._u32(riff_end - 8))
        f.seek(self._pos_total_frames)
        f.write(self._u32(self._frames))
        f.seek(self._pos_stream_length)
        f.write(self._u32(self._frames))
        f.seek(self._movi_start - 4)
        f.write(self._u32(movi_end - self._movi_start))
        f.close()
        self._f = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class VideoRenderStream:
    """Streaming frame sink with the reference's context-manager contract
    (reference: utils.py:33-70): ``with VideoRenderStream(path) as v:
    v.append(frame)``. Prefers mp4 via imageio-ffmpeg; falls back to the
    pure-Python MJPEG AVI muxer (suffix rewritten to .avi)."""

    def __init__(self, path, fps: int = 25):
        self.path = Path(path)
        self.fps = fps
        self._writer = None
        self._backend = None

    def _ensure(self, frame):
        if self._writer is not None:
            return
        if self.path.suffix == ".mp4":
            try:
                import imageio.v2 as imageio
                w = imageio.get_writer(self.path, fps=self.fps,
                                       format="FFMPEG")
                self._writer, self._backend = w, "ffmpeg"
                return
            except Exception:
                self.path = self.path.with_suffix(".avi")
                logging.info("no ffmpeg backend; writing MJPEG %s", self.path)
        if self.path.suffix == ".avi":
            self._writer = MjpegAviWriter(self.path, fps=self.fps)
            self._backend = "mjpeg-avi"
        else:  # .gif and anything else imageio handles natively
            import imageio.v2 as imageio
            self._writer = imageio.get_writer(self.path, fps=self.fps)
            self._backend = "imageio"

    def append(self, frame: np.ndarray):
        frame = np.asarray(frame, np.uint8)
        self._ensure(frame)
        if self._backend == "mjpeg-avi":
            self._writer.append(frame)
        else:
            self._writer.append_data(frame)

    def close(self):
        if self._writer is not None:
            self._writer.close()
            self._writer = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
