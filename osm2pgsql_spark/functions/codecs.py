"""Pure-python media codecs: PNG, BMP, WAV.

The multimodal operators (operators/multimodal.py) need real decode
for the formats a pure-python implementation can reasonably cover —
no image/audio libraries exist in this environment, and none are
needed for these three:

- PNG: zlib inflate + the five scanline filters (None/Sub/Up/
  Average/Paeth, per the public PNG spec), 8-bit gray / RGB / RGBA.
- BMP: uncompressed BI_RGB 24-bit, bottom-up rows, 4-byte padding.
- WAV: RIFF/PCM 16-bit (any channel count; channels averaged).

Encoders for PNG-gray (shared with sinks/png.py), BMP and WAV exist
so tests can round-trip real files through the Spark pipeline.
Baseline JPEG lives in functions/jpeg.py (decode SOF0 incl. 4:2:0 +
restarts; encode 4:4:4 for round-trip tests).  MP3/video stay
honestly unimplemented (operators raise).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


# ------------------------------------------------------------- PNG

def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    p = a.astype(np.int32) + b.astype(np.int32) - c.astype(np.int32)
    pa = np.abs(p - a)
    pb = np.abs(p - b)
    pc = np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def decode_png(data: bytes) -> np.ndarray:
    """(h, w) uint8 for grayscale, (h, w, ch) for RGB/RGBA.  8-bit
    depths only; interlacing unsupported (raises)."""
    if data[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    pos = 8
    w = h = None
    bit_depth = color_type = interlace = None
    idat = b""
    while pos < len(data):
        (ln,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + ln]
        if tag == b"IHDR":
            w, h, bit_depth, color_type, _comp, _filt, interlace = struct.unpack_from(
                ">IIBBBBB", payload, 0
            )
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if bit_depth != 8:
        raise NotImplementedError(f"PNG bit depth {bit_depth}")
    if interlace:
        raise NotImplementedError("interlaced PNG")
    channels = {0: 1, 2: 3, 6: 4}.get(color_type)
    if channels is None:
        raise NotImplementedError(f"PNG color type {color_type}")

    raw = zlib.decompress(idat)
    stride = w * channels
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for r in range(h):
        row = raw[r * (stride + 1) : (r + 1) * (stride + 1)]
        ftype = row[0]
        cur = np.frombuffer(row[1:], dtype=np.uint8).copy()
        if ftype == 0:
            pass
        elif ftype == 2:  # Up
            cur += prev
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth need a scan
            left = np.zeros(channels, dtype=np.uint8)
            for x in range(0, stride, channels):
                seg = cur[x : x + channels]
                up = prev[x : x + channels]
                ul = (
                    out[r - 1, x - channels : x] if (r > 0 and x > 0)
                    else np.zeros(channels, dtype=np.uint8)
                )
                if r == 0:
                    up = np.zeros(channels, dtype=np.uint8)
                if ftype == 1:
                    seg += left
                elif ftype == 3:
                    seg += ((left.astype(np.uint16) + up.astype(np.uint16)) // 2).astype(
                        np.uint8
                    )
                else:
                    seg += _paeth(left, up, ul)
                left = seg
        else:
            raise ValueError(f"bad PNG filter {ftype}")
        out[r] = cur
        prev = cur
    if channels == 1:
        return out
    return out.reshape(h, w, channels)


def _png_chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray) -> bytes:
    """8-bit grayscale (h,w) or RGB/RGBA (h,w,ch), filter 0 rows."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        color_type, channels = 0, 1
    elif img.ndim == 3 and img.shape[2] == 3:
        color_type, channels = 2, 3
    elif img.ndim == 3 and img.shape[2] == 4:
        color_type, channels = 6, 4
    else:
        raise ValueError("expected (h,w), (h,w,3) or (h,w,4)")
    h, w = img.shape[:2]
    body = img.reshape(h, w * channels)
    raw = b"".join(b"\x00" + body[r].tobytes() for r in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


# ------------------------------------------------------------- BMP

def decode_bmp(data: bytes) -> np.ndarray:
    """(h, w, 3) uint8 RGB from an uncompressed 24-bit BI_RGB BMP."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    (pixel_offset,) = struct.unpack_from("<I", data, 10)
    (hdr_size,) = struct.unpack_from("<I", data, 14)
    if hdr_size < 40:
        raise NotImplementedError("BMP core header")
    w, h = struct.unpack_from("<ii", data, 18)
    (bpp,) = struct.unpack_from("<H", data, 28)
    (compression,) = struct.unpack_from("<I", data, 30)
    if bpp != 24 or compression != 0:
        raise NotImplementedError(f"BMP bpp={bpp} compression={compression}")
    flipped = h > 0
    h = abs(h)
    row_bytes = (w * 3 + 3) & ~3
    out = np.empty((h, w, 3), dtype=np.uint8)
    for r in range(h):
        row = np.frombuffer(
            data, dtype=np.uint8, count=w * 3, offset=pixel_offset + r * row_bytes
        ).reshape(w, 3)
        # BMP stores BGR bottom-up
        out[h - 1 - r if flipped else r] = row[:, ::-1]
    return out


def encode_bmp(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> 24-bit BI_RGB BMP (bottom-up)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w = img.shape[:2]
    row_bytes = (w * 3 + 3) & ~3
    pad = b"\x00" * (row_bytes - w * 3)
    body = b"".join(img[r, :, ::-1].tobytes() + pad for r in range(h - 1, -1, -1))
    pixel_offset = 14 + 40
    header = (
        b"BM"
        + struct.pack("<IHHI", pixel_offset + len(body), 0, 0, pixel_offset)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    )
    return header + body


# ------------------------------------------------------------- WAV

def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """(sample_rate, float64 mono samples in [-1, 1]) from RIFF PCM
    16-bit; multi-channel input is averaged to mono."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    pos = 12
    rate = channels = None
    samples = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (ln,) = struct.unpack_from("<I", data, pos + 4)
        payload = data[pos + 8 : pos + 8 + ln]
        if tag == b"fmt ":
            fmt, channels, rate = struct.unpack_from("<HHI", payload, 0)
            (bits,) = struct.unpack_from("<H", payload, 14)
            if fmt != 1 or bits != 16:
                raise NotImplementedError(f"WAV fmt={fmt} bits={bits}")
        elif tag == b"data":
            samples = np.frombuffer(payload, dtype="<i2")
        pos += 8 + ln + (ln & 1)
    if rate is None or samples is None:
        raise ValueError("WAV missing fmt/data chunk")
    x = samples.astype(np.float64) / 32768.0
    if channels > 1:
        x = x[: (x.size // channels) * channels].reshape(-1, channels).mean(axis=1)
    return rate, x


def encode_wav(rate: int, mono: np.ndarray) -> bytes:
    """float [-1,1] mono -> 16-bit PCM RIFF."""
    pcm = np.clip(np.asarray(mono, dtype=np.float64), -1.0, 1.0)
    pcm = (pcm * 32767.0).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(pcm)) + pcm
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
