"""Pure-python TIFF codec with GeoTIFF georeferencing tags.

Completes the raster story of the gen pipeline: the reference writes
generalized rasters to PNG tiles / DB rows; real GIS consumers want
GeoTIFF.  Written from the public TIFF 6.0 specification (Adobe,
1992) and the OGC GeoTIFF standard; no external libraries.

Scope:
- decode: II/MM byte orders, baseline strips (no tiles), 8- and
  16-bit grayscale and 8-bit RGB, PlanarConfiguration=1,
  Compression none(1) / LZW(5, with horizontal-differencing
  predictor 2) / PackBits(32773);
- encode: the same sample formats, uncompressed or PackBits strips,
  optional GeoTIFF georeferencing (ModelPixelScale + ModelTiepoint +
  a minimal GeoKeyDirectory carrying the EPSG code);
- TIFF-LZW is NOT GIF-LZW: codes pack MSB-first and the code width
  bumps one code EARLY (when next_code+1 hits 2^width) — both
  implemented per spec section 13.

web_mercator_geo() derives the GeoTIFF placement of a z/x/y tile in
EPSG 3857 — the bridge from the gen pipeline's tile grid
(functions/tiles.py) to a georeferenced raster.
"""

from __future__ import annotations

import math
import struct
from dataclasses import dataclass, field

import numpy as np


@dataclass
class GeoRef:
    """GeoTIFF placement: raster (0,0) maps to (origin_x, origin_y),
    pixel size (scale_x, scale_y [positive; y decreases down rows]),
    CRS by EPSG code."""

    origin_x: float
    origin_y: float
    scale_x: float
    scale_y: float
    epsg: int


@dataclass
class TiffImage:
    image: np.ndarray  # (h,w) uint8/uint16 or (h,w,3) uint8
    geo: GeoRef | None = None
    tags: dict = field(default_factory=dict)


_EARTH_CIRC = 2.0 * math.pi * 6378137.0


def web_mercator_geo(z: int, x: int, y: int, extent_px: int) -> GeoRef:
    """GeoRef of web-mercator tile z/x/y rendered at extent_px²
    (the gen raster canvas size), EPSG 3857."""
    tile_m = _EARTH_CIRC / (1 << z)
    ox = -_EARTH_CIRC / 2.0 + x * tile_m
    oy = _EARTH_CIRC / 2.0 - y * tile_m
    return GeoRef(ox, oy, tile_m / extent_px, tile_m / extent_px, 3857)


# ------------------------------------------------------------- TIFF-LZW

def _tiff_lzw_decode(data: bytes, expect: int) -> bytes:
    """TIFF 6.0 §13 LZW: MSB-first bit packing, early width change."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    table: list[bytes] = []

    def reset():
        nonlocal table
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        return 9

    width = reset()
    bitbuf = bitcnt = 0
    prev: bytes | None = None
    for byte in data:
        bitbuf = (bitbuf << 8) | byte
        bitcnt += 8
        while bitcnt >= width:
            code = (bitbuf >> (bitcnt - width)) & ((1 << width) - 1)
            bitcnt -= width
            if code == CLEAR:
                width = reset()
                prev = None
                continue
            if code == EOI:
                return bytes(out[:expect])
            if code < len(table):
                entry = table[code]
            elif code == len(table) and prev is not None:
                entry = prev + prev[:1]
            else:
                raise ValueError("corrupt TIFF LZW stream")
            out += entry
            if prev is not None:
                table.append(prev + entry[:1])
            prev = entry
            # spec §13 decoder: grow at 510/1022/2046 — one code
            # earlier than the encoder's 511/1023/2047, because the
            # decoder's table lags the encoder's by one entry
            if len(table) == (1 << width) - 2 and width < 12:
                width += 1
            if len(out) >= expect:
                return bytes(out[:expect])
    return bytes(out[:expect])


def _tiff_lzw_encode(data: bytes) -> bytes:
    CLEAR, EOI = 256, 257
    out = bytearray()
    bitbuf = bitcnt = 0

    def emit(code: int, width: int):
        nonlocal bitbuf, bitcnt
        bitbuf = (bitbuf << width) | code
        bitcnt += width
        while bitcnt >= 8:
            out.append((bitbuf >> (bitcnt - 8)) & 0xFF)
            bitcnt -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    emit(CLEAR, width)
    prev = b""
    for b in data:
        cur = prev + bytes([b])
        if cur in table:
            prev = cur
            continue
        emit(table[prev], width)
        table[cur] = next_code
        next_code += 1
        # spec §13 encoder: grow at NextCode == 511/1023/2047
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
        if next_code == 4094:  # leave room per spec
            emit(CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        prev = bytes([b])
    if prev:
        emit(table[prev], width)
    emit(EOI, width)
    if bitcnt:
        out.append((bitbuf << (8 - bitcnt)) & 0xFF)
    return bytes(out)


# ------------------------------------------------------------- PackBits

def _packbits_decode(data: bytes, expect: int) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < expect:
        n = data[i]
        i += 1
        if n < 128:
            out += data[i : i + n + 1]
            i += n + 1
        elif n > 128:
            out += bytes([data[i]]) * (257 - n)
            i += 1
        # n == 128: no-op
    return bytes(out[:expect])


def _packbits_encode(row: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(row)
    while i < n:
        # find run
        j = i
        while j + 1 < n and row[j + 1] == row[j] and j - i < 127:
            j += 1
        if j > i:  # run of j-i+1 (>=2)
            out.append(257 - (j - i + 1))
            out.append(row[i])
            i = j + 1
            continue
        # literal stretch until the next run of >=3
        j = i
        while (
            j + 1 < n
            and j - i < 127
            and not (j + 2 < n and row[j + 1] == row[j + 2] == row[j])
        ):
            j += 1
        out.append(j - i)
        out += row[i : j + 1]
        i = j + 1
    return bytes(out)


# ------------------------------------------------------------- container

_TAG_FMT = {1: "B", 2: "c", 3: "H", 4: "I", 5: "II", 11: "f", 12: "d", 16: "Q"}
_TAG_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 11: 4, 12: 8, 16: 8}


def decode_tiff(data: bytes) -> TiffImage:
    if data[:2] == b"II":
        bo = "<"
    elif data[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError("not a TIFF file")
    (magic,) = struct.unpack_from(bo + "H", data, 2)
    if magic != 42:
        raise ValueError("bad TIFF magic")
    (ifd_off,) = struct.unpack_from(bo + "I", data, 4)
    (n_entries,) = struct.unpack_from(bo + "H", data, ifd_off)

    tags: dict[int, tuple] = {}
    for i in range(n_entries):
        off = ifd_off + 2 + 12 * i
        tag, typ, count = struct.unpack_from(bo + "HHI", data, off)
        if typ not in _TAG_SIZE:
            continue
        total = _TAG_SIZE[typ] * count
        if total <= 4:
            voff = off + 8
        else:
            (voff,) = struct.unpack_from(bo + "I", data, off + 8)
        if typ == 5:  # RATIONAL
            vals = tuple(
                a / b if b else 0.0
                for a, b in (
                    struct.unpack_from(bo + "II", data, voff + 8 * k)
                    for k in range(count)
                )
            )
        elif typ == 2:
            vals = (data[voff : voff + count].split(b"\0")[0].decode("latin1"),)
        else:
            vals = struct.unpack_from(bo + str(count) + _TAG_FMT[typ], data, voff)
        tags[tag] = vals

    def one(tag, default=None):
        v = tags.get(tag)
        return default if v is None else v[0]

    w = one(256)
    h = one(257)
    if w is None or h is None:
        raise ValueError("TIFF missing dimensions")
    spp = one(277, 1)
    bps = tags.get(258, (8,) * spp)
    compression = one(259, 1)
    planar = one(284, 1)
    predictor = one(317, 1)
    if planar != 1:
        raise NotImplementedError("TIFF PlanarConfiguration=2")
    if 322 in tags or 323 in tags:
        raise NotImplementedError("tiled TIFF (strips only)")
    if spp not in (1, 3) or len(set(bps)) != 1 or bps[0] not in (8, 16):
        raise NotImplementedError(
            f"TIFF samples={spp} bits={bps} (gray8/gray16/rgb8 supported)"
        )
    if spp == 3 and bps[0] == 16:
        raise NotImplementedError("48-bit RGB TIFF")

    offsets = tags.get(273)
    counts = tags.get(279)
    if offsets is None or counts is None:
        raise ValueError("TIFF missing strip layout")
    rows_per_strip = one(278, h)
    bpp = spp * bps[0] // 8
    row_bytes = w * bpp

    raw = bytearray()
    row0 = 0
    for so, sc in zip(offsets, counts):
        nrows = min(rows_per_strip, h - row0)
        expect = nrows * row_bytes
        chunk = data[so : so + sc]
        if compression == 1:
            raw += chunk[:expect]
        elif compression == 5:
            raw += _tiff_lzw_decode(chunk, expect)
        elif compression == 32773:
            raw += _packbits_decode(chunk, expect)
        else:
            raise NotImplementedError(f"TIFF compression {compression}")
        row0 += nrows
    if len(raw) < h * row_bytes:
        raise ValueError("TIFF strips truncated")

    if bps[0] == 16:
        arr = np.frombuffer(bytes(raw), dtype=bo + "u2", count=h * w).reshape(h, w)
        img = arr.astype(np.uint16)
    else:
        arr = np.frombuffer(bytes(raw), dtype=np.uint8, count=h * w * spp)
        img = arr.reshape(h, w, spp) if spp == 3 else arr.reshape(h, w)
    if predictor == 2:
        img = np.cumsum(img.astype(np.int64), axis=1).astype(img.dtype) \
            if img.ndim == 2 else np.cumsum(img.astype(np.int64), axis=1).astype(img.dtype)
    img = img.copy()

    geo = None
    if 33550 in tags and 33922 in tags:
        sx, sy = tags[33550][0], tags[33550][1]
        tp = tags[33922]
        # tiepoint (i,j,k)->(x,y,z); raster origin from pixel tiepoint
        ox = tp[3] - tp[0] * sx
        oy = tp[4] + tp[1] * sy
        epsg = 0
        gk = tags.get(34735)
        if gk:
            # GeoKeyDirectory: header + key entries of 4 shorts
            for k in range(4, len(gk), 4):
                key_id, loc, cnt, val = gk[k : k + 4]
                if key_id in (2048, 3072) and loc == 0:
                    epsg = val
        geo = GeoRef(ox, oy, sx, sy, epsg)
    return TiffImage(image=img, geo=geo, tags={k: v for k, v in tags.items()})


def encode_tiff(
    img: np.ndarray,
    geo: GeoRef | None = None,
    compression: str = "none",  # 'none' | 'packbits'
) -> bytes:
    """Little-endian baseline TIFF; one strip per 64 rows."""
    img = np.asarray(img)
    if img.ndim == 2 and img.dtype in (np.uint8, np.uint16):
        spp, bps = 1, img.dtype.itemsize * 8
    elif img.ndim == 3 and img.shape[2] == 3 and img.dtype == np.uint8:
        spp, bps = 3, 8
    else:
        raise ValueError("encode_tiff wants gray8/gray16/rgb8")
    h, w = img.shape[:2]
    row_bytes = w * spp * (bps // 8)
    rows_per_strip = 64

    strips = []
    for r0 in range(0, h, rows_per_strip):
        block = img[r0 : r0 + rows_per_strip]
        raw = block.astype("<u2").tobytes() if bps == 16 else block.tobytes()
        if compression == "packbits":
            enc = bytearray()
            for rr in range(block.shape[0]):
                enc += _packbits_encode(raw[rr * row_bytes : (rr + 1) * row_bytes])
            strips.append(bytes(enc))
        elif compression == "none":
            strips.append(raw)
        else:
            raise ValueError(f"unknown compression {compression!r}")
    comp_tag = 1 if compression == "none" else 32773

    # layout: header(8) | strip data | IFD | external values
    entries: list[tuple[int, int, int, bytes | int]] = []

    def entry(tag, typ, vals):
        entries.append((tag, typ, vals))

    data_off = 8
    strip_offsets = []
    p = data_off
    for s in strips:
        strip_offsets.append(p)
        p += len(s)
    ifd_off = p + (p & 1)

    entry(256, 4, [w])
    entry(257, 4, [h])
    entry(258, 3, [bps] * spp)
    entry(259, 3, [comp_tag])
    entry(262, 3, [2 if spp == 3 else 1])  # RGB / BlackIsZero
    entry(273, 4, strip_offsets)
    entry(277, 3, [spp])
    entry(278, 4, [rows_per_strip])
    entry(279, 4, [len(s) for s in strips])
    entry(284, 3, [1])
    if geo is not None:
        entry(33550, 12, [geo.scale_x, geo.scale_y, 0.0])
        entry(33922, 12, [0.0, 0.0, 0.0, geo.origin_x, geo.origin_y, 0.0])
        # minimal GeoKeyDirectory: version 1.1.0, 2 keys:
        # GTModelType (1024): 1=projected / 2=geographic;
        # ProjectedCSType (3072) or GeographicType (2048) = EPSG
        projected = geo.epsg not in (4326, 4258, 4269)
        model = 1 if projected else 2
        cs_key = 3072 if projected else 2048
        entry(34735, 3, [1, 1, 0, 2, 1024, 0, 1, model, cs_key, 0, 1, geo.epsg])

    entries.sort(key=lambda e: e[0])
    n = len(entries)
    ext_off = ifd_off + 2 + 12 * n + 4
    ifd = struct.pack("<H", n)
    ext = bytearray()
    fmt = {3: ("H", 2), 4: ("I", 4), 12: ("d", 8)}
    for tag, typ, vals in entries:
        code, size = fmt[typ]
        total = size * len(vals)
        packed = struct.pack("<" + code * len(vals), *vals)
        if total <= 4:
            ifd += struct.pack("<HHI", tag, typ, len(vals)) + packed.ljust(4, b"\0")
        else:
            ifd += struct.pack("<HHII", tag, typ, len(vals), ext_off + len(ext))
            ext += packed
    ifd += struct.pack("<I", 0)  # next IFD

    out = bytearray(struct.pack("<2sHI", b"II", 42, ifd_off))
    for s in strips:
        out += s
    out += b"\0" * (ifd_off - len(out))
    out += ifd
    out += ext
    return bytes(out)
