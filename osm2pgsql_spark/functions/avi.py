"""Pure-python AVI (RIFF) container codec for MJPEG video.

Video support for the multimodal column operators: the container
format is plain binary parsing (RIFF chunk walk — public spec:
Microsoft "AVI RIFF File Reference"), and Motion-JPEG frames are
baseline JPEGs, which functions/jpeg.py already decodes from spec.
Together they make `sample_frames(fake=False)` a REAL video path:
parse the container, pick frames by timestamp, hand each to the JPEG
codec.  No external media libraries are needed or available in this
container.

Scope (honest limits, mirroring the codec family's style):
- one 'vids' stream, MJPG/raw-DIB handlers; audio streams are
  skipped, not errored;
- OpenDML (AVIX) extension lists are ignored beyond the first RIFF
  chunk — fine for the bounded payload sizes a media column carries
  (multi-GB files should be split upstream, as the operator docs for
  binary columns already require);
- no b-frame reordering (MJPEG has none by construction).

Layout written by encode_avi_mjpeg (all little-endian):

  RIFF <sz> 'AVI '
    LIST <sz> 'hdrl'
      'avih' 56B  main header (usec/frame, total frames, w, h, ...)
      LIST <sz> 'strl'
        'strh' 56B  stream header (fccType='vids', handler, scale,
                    rate, length)
        'strf' 40B  BITMAPINFOHEADER (biCompression='MJPG')
    LIST <sz> 'movi'
      '00dc' <sz> <jpeg frame bytes> [pad to even] ...
    'idx1' <sz>  16B entries (ckid, flags, offset, size)
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np

_AVIF_HASINDEX = 0x00000010
_AVIIF_KEYFRAME = 0x00000010


@dataclass
class AviVideo:
    """Decoded container: frame payloads stay compressed (JPEG bytes)
    so sampling N of M frames only pays N JPEG decodes."""

    width: int
    height: int
    fps: float
    handler: str  # 'MJPG' or 'DIB ' (raw)
    frames: list = field(default_factory=list)  # list[bytes]

    @property
    def n_frames(self) -> int:
        return len(self.frames)

    @property
    def duration_ms(self) -> int:
        return int(round(self.n_frames * 1000.0 / self.fps)) if self.fps else 0

    def frame_at_ms(self, ts_ms: int) -> int:
        """Frame index whose presentation interval contains ts_ms."""
        i = int(ts_ms * self.fps / 1000.0)
        return min(max(i, 0), self.n_frames - 1)


def _chunks(data: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_size) walking a RIFF
    chunk run; chunk payloads are padded to even sizes."""
    p = start
    while p + 8 <= end:
        fcc = data[p : p + 4]
        (sz,) = struct.unpack_from("<I", data, p + 4)
        yield fcc, p + 8, sz
        p += 8 + sz + (sz & 1)


def decode_avi(data: bytes) -> AviVideo:
    """Parse an AVI container; returns headers + per-frame compressed
    payloads.  Raises ValueError on structural corruption and
    NotImplementedError for handlers this codec family can't decode
    (the caller surfaces which frames those are only when it actually
    decodes them — container-level sampling still works)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI file")
    (riff_sz,) = struct.unpack_from("<I", data, 4)
    end = min(len(data), 8 + riff_sz)

    usec_per_frame = 0
    width = height = 0
    scale = rate = 0
    handler = ""
    frames: list[bytes] = []
    in_video_stream = False

    def walk(start: int, stop: int) -> None:
        nonlocal usec_per_frame, width, height, scale, rate, handler
        nonlocal in_video_stream
        for fcc, ps, sz in _chunks(data, start, stop):
            if ps + sz > len(data):
                raise ValueError("truncated AVI chunk")
            if fcc == b"LIST":
                ltype = data[ps : ps + 4]
                if ltype == b"strl":
                    in_video_stream = False  # set by strh below
                walk(ps + 4, ps + sz)
            elif fcc == b"avih":
                (usec_per_frame,) = struct.unpack_from("<I", data, ps)
                width, height = struct.unpack_from("<II", data, ps + 32)
            elif fcc == b"strh":
                fcc_type = data[ps : ps + 4]
                in_video_stream = fcc_type == b"vids"
                if in_video_stream:
                    handler = data[ps + 4 : ps + 8].decode("ascii", "replace").strip("\0")
                    scale, rate = struct.unpack_from("<II", data, ps + 20)
            elif fcc == b"strf" and in_video_stream and sz >= 40 and not width:
                width, height = struct.unpack_from("<ii", data, ps + 4)
                height = abs(height)
            elif fcc[2:4] in (b"dc", b"db") and fcc[:2].isdigit():
                # stream 00 assumed video (single-video-stream scope);
                # audio chunks are NNwb and fall through
                if fcc[:2] == b"00":
                    frames.append(bytes(data[ps : ps + sz]))

    walk(12, end)
    if scale and rate:
        fps = rate / scale
    elif usec_per_frame:
        fps = 1_000_000.0 / usec_per_frame
    else:
        raise ValueError("AVI has no frame-rate information")
    return AviVideo(width=width, height=height, fps=fps, handler=handler or "MJPG", frames=frames)


def decode_avi_frame(video: AviVideo, index: int) -> np.ndarray:
    """Decode one frame to a numpy array (grayscale (h,w) or RGB
    (h,w,3) uint8, matching decode_jpeg's convention)."""
    payload = video.frames[index]
    if video.handler.upper() in ("MJPG", "MJPEG", ""):
        from osm2pgsql_spark.functions import jpeg

        return jpeg.decode_jpeg(payload)
    if video.handler == "DIB":
        # raw bottom-up BGR24 rows padded to 4 bytes (uncompressed AVI)
        w, h = video.width, video.height
        stride = (w * 3 + 3) & ~3
        rows = np.frombuffer(payload[: stride * h], dtype=np.uint8).reshape(h, stride)
        bgr = rows[:, : w * 3].reshape(h, w, 3)[::-1]
        return bgr[:, :, ::-1].copy()
    raise NotImplementedError(
        f"no pure-python codec for AVI stream handler {video.handler!r}"
    )


def _chunk(fcc: bytes, payload: bytes) -> bytes:
    pad = b"\0" if len(payload) & 1 else b""
    return fcc + struct.pack("<I", len(payload)) + payload + pad


def _list(ltype: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", ltype + payload)


def encode_avi_mjpeg(
    frames: list[np.ndarray], fps: float = 10.0, quality: int = 85
) -> bytes:
    """Assemble an MJPEG AVI from numpy frames (gray (h,w) or RGB
    (h,w,3) uint8); each frame is baseline-JPEG encoded by the in-repo
    codec.  All frames must share one size (the container carries a
    single geometry)."""
    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[:2]
    for f in frames:
        if f.shape[:2] != (h, w):
            raise ValueError("all frames must share one (h, w)")
    from osm2pgsql_spark.functions import jpeg

    payloads = [jpeg.encode_jpeg(f, quality=quality) for f in frames]
    max_sz = max(len(p) for p in payloads)
    scale, rate = 1000, int(round(fps * 1000))

    avih = struct.pack(
        "<IIIIIIIIII4I",
        int(round(1_000_000.0 / fps)),  # dwMicroSecPerFrame
        int(max_sz * fps),  # dwMaxBytesPerSec (advisory)
        0,  # dwPaddingGranularity
        _AVIF_HASINDEX,
        len(payloads),  # dwTotalFrames
        0,  # dwInitialFrames
        1,  # dwStreams
        max_sz,  # dwSuggestedBufferSize
        w,
        h,
        0, 0, 0, 0,
    )
    strh = (
        b"vids"
        + b"MJPG"
        + struct.pack(
            "<IHHIIIIIIII4H",
            0,  # dwFlags
            0, 0,  # priority, language
            0,  # dwInitialFrames
            scale,
            rate,
            0,  # dwStart
            len(payloads),  # dwLength (frames)
            max_sz,  # dwSuggestedBufferSize
            0xFFFFFFFF,  # dwQuality (default)
            0,  # dwSampleSize (0 = varying)
            0, 0, w, h,  # rcFrame
        )
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih) + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )

    movi_body = b""
    idx_entries = []
    for p in payloads:
        # idx1 offsets are relative to the 'movi' fourcc position
        idx_entries.append((4 + len(movi_body), len(p)))
        movi_body += _chunk(b"00dc", p)
    movi = _list(b"movi", movi_body)
    idx1 = _chunk(
        b"idx1",
        b"".join(
            b"00dc" + struct.pack("<III", _AVIIF_KEYFRAME, off, sz)
            for off, sz in idx_entries
        ),
    )
    riff_payload = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_payload)) + riff_payload
