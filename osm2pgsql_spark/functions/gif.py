"""Pure-python GIF codec (GIF87a/89a): LZW decode/encode, palettes,
interlace, animation frames with disposal + transparency.

Completes the multimodal codec family (functions/codecs.py PNG/BMP/
WAV, functions/jpeg.py JPEG, functions/avi.py AVI): GIF is the last
common still/animated image container, and an animated GIF is a
second real video-ish input for sample_frames-style operators.
Written from the public GIF89a specification (CompuServe, 1990) —
the same from-spec style as the JPEG codec; no external libraries.

Decode returns RGB uint8 frames composited per the animation
disposal semantics (None -> keep, background -> clear the frame
rect, previous -> restore), so frame N is what a viewer shows at
step N.  Encode writes one global palette built from the frames
(exact if <=256 distinct colors, else a 6x7x6 uniform quantization)
and per-frame delays.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np


@dataclass
class GifImage:
    width: int
    height: int
    frames: list = field(default_factory=list)  # list[np.ndarray (h,w,3) uint8]
    delays_ms: list = field(default_factory=list)  # per frame
    loop: bool = False

    @property
    def n_frames(self) -> int:
        return len(self.frames)

    @property
    def duration_ms(self) -> int:
        return int(sum(self.delays_ms))


# ---------------------------------------------------------------------------
# LZW (variable-width codes, GIF flavor: per-spec CLEAR/EOI codes)
# ---------------------------------------------------------------------------


def _lzw_decode(data: bytes, min_code_size: int, expect: int) -> np.ndarray:
    """GIF-LZW decompress to `expect` palette indices."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = np.empty(expect, dtype=np.uint8)
    n_out = 0

    # dictionary as prefix links: code -> (prev_code, tail_byte)
    max_codes = 4096
    prev_link = np.zeros(max_codes, dtype=np.int32)
    tail = np.zeros(max_codes, dtype=np.uint8)

    def reset():
        return clear + 2, min_code_size + 1

    next_code, width = reset()
    bitbuf = bitcnt = 0
    pos = 0
    prev = -1
    buf = np.empty(max_codes, dtype=np.uint8)  # expansion scratch

    while pos < len(data) or bitcnt >= width:
        while bitcnt < width and pos < len(data):
            bitbuf |= data[pos] << bitcnt
            bitcnt += 8
            pos += 1
        if bitcnt < width:
            break
        code = bitbuf & ((1 << width) - 1)
        bitbuf >>= width
        bitcnt -= width

        if code == clear:
            next_code, width = reset()
            prev = -1
            continue
        if code == eoi:
            break
        if code >= next_code and not (code == next_code and prev != -1):
            raise ValueError("corrupt GIF LZW stream")

        # expand code (or prev+firstchar for the KwKwK case)
        c = prev if code == next_code else code
        n = 0
        while c >= clear:
            buf[n] = tail[c]
            c = prev_link[c]
            n += 1
        first = c
        seq_len = n + 1 + (1 if code == next_code else 0)
        if n_out + seq_len > expect:
            raise ValueError("GIF LZW produced too many pixels")
        out[n_out] = first
        out[n_out + 1 : n_out + 1 + n] = buf[:n][::-1]
        if code == next_code:
            out[n_out + n + 1] = first
        n_out += seq_len

        if prev != -1 and next_code < max_codes:
            prev_link[next_code] = prev
            tail[next_code] = first
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = code
        if n_out == expect:
            break
    if n_out != expect:
        raise ValueError(f"GIF LZW ended early: {n_out}/{expect} pixels")
    return out


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    table: dict[tuple[int, int], int] = {}
    next_code = clear + 2
    width = min_code_size + 1

    out = bytearray()
    bitbuf = bitcnt = 0

    def emit(code: int):
        nonlocal bitbuf, bitcnt
        bitbuf |= code << bitcnt
        bitcnt += width
        while bitcnt >= 8:
            out.append(bitbuf & 0xFF)
            bitbuf >>= 8
            bitcnt -= 8

    emit(clear)
    prev = -1
    for v in indices:
        v = int(v)
        if prev == -1:
            prev = v
            continue
        key = (prev, v)
        if key in table:
            prev = table[key]
            continue
        emit(prev)
        if next_code < 4096:
            table[key] = next_code
            next_code += 1
            if next_code - 1 == (1 << width) and width < 12:
                width += 1
        else:
            emit(clear)
            table.clear()
            next_code = clear + 2
            width = min_code_size + 1
        prev = v
    if prev != -1:
        emit(prev)
    emit(eoi)
    if bitcnt:
        out.append(bitbuf & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# container
# ---------------------------------------------------------------------------

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    out = np.empty_like(rows)
    src = 0
    for start, step in _INTERLACE_PASSES:
        for y in range(start, h, step):
            out[y] = rows[src]
            src += 1
    return out


def decode_gif(data: bytes) -> GifImage:
    """Decode all frames, compositing per GIF89a disposal semantics."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF file")
    w, h, flags, bg_idx, _ar = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
        pos += 3 * n

    img = GifImage(width=w, height=h)
    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    if gct is not None and len(gct) > bg_idx:
        canvas[:] = gct[bg_idx]
    # pending graphic-control state for the next image
    delay_ms, transparent, disposal = 0, -1, 0

    def read_subblocks(p: int) -> tuple[bytes, int]:
        chunks = []
        while True:
            if p >= len(data):
                raise ValueError("truncated GIF sub-blocks")
            n = data[p]
            p += 1
            if n == 0:
                return b"".join(chunks), p
            chunks.append(data[p : p + n])
            p += n

    while pos < len(data):
        b = data[pos]
        pos += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            label = data[pos]
            pos += 1
            blk, pos = read_subblocks(pos)
            if label == 0xF9 and len(blk) >= 4:  # graphic control
                gc_flags, delay_cs, t_idx = struct.unpack_from("<BHB", blk, 0)
                disposal = (gc_flags >> 2) & 7
                transparent = t_idx if (gc_flags & 1) else -1
                delay_ms = delay_cs * 10
            elif label == 0xFF and blk[:11] in (b"NETSCAPE2.0", b"ANIMEXTS1.0"):
                img.loop = True
            continue
        if b != 0x2C:
            raise ValueError(f"unknown GIF block 0x{b:02x}")
        # image descriptor
        ix, iy, iw, ih, iflags = struct.unpack_from("<HHHHB", data, pos)
        pos += 9
        lct = gct
        if iflags & 0x80:
            n = 2 << (iflags & 7)
            lct = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
            pos += 3 * n
        if lct is None:
            raise ValueError("GIF image has no color table")
        min_code = data[pos]
        pos += 1
        lzw, pos = read_subblocks(pos)
        idx = _lzw_decode(lzw, min_code, iw * ih).reshape(ih, iw)
        if iflags & 0x40:
            idx = _deinterlace(idx)

        prev_canvas = canvas.copy() if disposal == 3 else None
        rect = canvas[iy : iy + ih, ix : ix + iw]
        rgb = lct[np.minimum(idx, len(lct) - 1)]
        if transparent >= 0:
            mask = idx != transparent
            rect[mask] = rgb[mask]
        else:
            rect[:] = rgb
        img.frames.append(canvas.copy())
        img.delays_ms.append(delay_ms)

        if disposal == 2:  # restore to background
            bg = gct[bg_idx] if gct is not None and len(gct) > bg_idx else 0
            canvas[iy : iy + ih, ix : ix + iw] = bg
        elif disposal == 3 and prev_canvas is not None:
            canvas = prev_canvas
        delay_ms, transparent, disposal = 0, -1, 0
    if not img.frames:
        raise ValueError("GIF contains no image data")
    return img


def _build_palette(frames: list[np.ndarray]) -> tuple[np.ndarray, list[np.ndarray]]:
    """Global palette + per-frame index maps.  Exact when the frames
    hold <=256 distinct colors; else a 6x7x6 uniform cube."""
    colors = np.unique(
        np.concatenate([f.reshape(-1, 3) for f in frames], axis=0), axis=0
    )
    if len(colors) <= 256:
        lut = {tuple(c): i for i, c in enumerate(colors)}
        idx_frames = []
        for f in frames:
            flat = f.reshape(-1, 3)
            # vectorized exact lookup via structured view
            key = (
                flat[:, 0].astype(np.int64) << 16
                | flat[:, 1].astype(np.int64) << 8
                | flat[:, 2].astype(np.int64)
            )
            ckey = (
                colors[:, 0].astype(np.int64) << 16
                | colors[:, 1].astype(np.int64) << 8
                | colors[:, 2].astype(np.int64)
            )
            idx = np.searchsorted(ckey, key)
            idx_frames.append(idx.astype(np.uint8).reshape(f.shape[:2]))
        pal = np.zeros((256, 3), dtype=np.uint8)
        pal[: len(colors)] = colors
        return pal, idx_frames
    # uniform 6*7*6 = 252-entry cube
    r = np.linspace(0, 255, 6).astype(np.uint8)
    g = np.linspace(0, 255, 7).astype(np.uint8)
    bl = np.linspace(0, 255, 6).astype(np.uint8)
    pal = np.zeros((256, 3), dtype=np.uint8)
    k = 0
    for rr in r:
        for gg in g:
            for bb in bl:
                pal[k] = (rr, gg, bb)
                k += 1
    idx_frames = []
    for f in frames:
        ri = np.rint(f[:, :, 0] / 255 * 5).astype(np.int32)
        gi = np.rint(f[:, :, 1] / 255 * 6).astype(np.int32)
        bi = np.rint(f[:, :, 2] / 255 * 5).astype(np.int32)
        idx_frames.append((ri * 42 + gi * 6 + bi).astype(np.uint8))
    return pal, idx_frames


def encode_gif(
    frames: list[np.ndarray], delays_ms: list[int] | None = None, loop: bool = True
) -> bytes:
    """Animated (or single-frame) GIF89a from RGB/gray uint8 frames
    sharing one size."""
    if not frames:
        raise ValueError("need at least one frame")
    rgb = []
    for f in frames:
        f = np.asarray(f, dtype=np.uint8)
        if f.ndim == 2:
            f = np.stack([f, f, f], axis=2)
        rgb.append(f)
    h, w = rgb[0].shape[:2]
    if any(f.shape[:2] != (h, w) for f in rgb):
        raise ValueError("all frames must share one (h, w)")
    if delays_ms is None:
        delays_ms = [100] * len(rgb)
    pal, idx_frames = _build_palette(rgb)

    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0x80 | 7, 0, 0)  # 256-entry GCT
    out += pal.tobytes()
    if loop and len(rgb) > 1:
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    for idx, delay in zip(idx_frames, delays_ms):
        out += b"\x21\xf9\x04" + struct.pack("<BHB", 0, delay // 10, 0) + b"\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        min_code = 8
        out.append(min_code)
        lzw = _lzw_encode(idx.ravel(), min_code)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out += b"\x3b"
    return bytes(out)
