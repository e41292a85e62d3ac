"""Pure-python JPEG codec (decode + encode), baseline + progressive.

Implements the DCT processes from the public JPEG specification
(ITU-T T.81): 8x8 forward/inverse DCT, Annex-K-style quantization
tables scaled by the libjpeg quality formula, canonical Huffman coding
of DC differences and AC run/size symbols, JFIF YCbCr color, 0xFF
byte stuffing, and restart markers.

Scope (honest limits, mirrored in operators/multimodal.py):
- decode: baseline sequential (SOF0/SOF1) and PROGRESSIVE (SOF2,
  T.81 Annex G: DC first/refine, AC spectral selection with EOB runs,
  AC successive-approximation refinement with correction bits), 8-bit
  1 or 3 components, sampling factors 1-2 (4:4:4 / 4:2:2 / 4:2:0),
  DRI/RSTn handled; 12-BIT sequential grayscale (SOF1, Pq=1 16-bit
  quant tables, returns uint16); arithmetic coding, hierarchical,
  lossless, 12-bit progressive and 12-bit color raise
  NotImplementedError.
- encode: grayscale or RGB, 4:4:4, optional restart markers; optional
  progressive scan script (DC successive approximation + AC spectral
  bands with EOB-run coding, flat Kraft-complete AC table carrying the
  EOBn symbols the baseline Annex-K tables lack); encode_jpeg12 for
  12-bit grayscale (level shift 2048, extended-category flat Huffman
  tables).  Round-trips through the decoder bit-identically vs the
  baseline path, which is how tests pin correctness without an
  external image library.

The reference engine has no JPEG path at all (it is a geo pipeline);
this exists for the multimodal training-data operators
(operators/multimodal.py image decode / feature extraction).
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag scan order: zigzag position -> raster index in the 8x8 block
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Annex K base quantization tables (raster order)
QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.float64)
QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.float64)

# Annex K Huffman table specs: (bits[1..16], values)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


# Progressive AC scans need EOBn symbols (r<<4, r=1..14) that the
# Annex-K baseline AC tables do not contain; this flat canonical table
# (255 symbols at 8 bits + 1 at 9, Kraft-complete) covers every
# possible RS byte and is emitted in place of the baseline AC tables
# when encoding progressive streams.
PROG_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 255, 1, 0, 0, 0, 0, 0, 0, 0]
PROG_AC_VALS = list(range(255)) + [255]


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8x8 DCT-II basis: spatial = A.T @ coeffs @ A."""
    a = np.zeros((8, 8))
    for u in range(8):
        c = np.sqrt(1.0 / 8.0) if u == 0 else np.sqrt(2.0 / 8.0)
        for x in range(8):
            a[u, x] = c * np.cos((2 * x + 1) * u * np.pi / 16.0)
    return a


_A = _dct_matrix()


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """libjpeg quality scaling of the Annex K base tables."""
    q = max(1, min(100, int(quality)))
    scale = 5000.0 / q if q < 50 else 200.0 - 2.0 * q
    out = []
    for base in (QT_LUMA, QT_CHROMA):
        t = np.floor((base * scale + 50.0) / 100.0)
        out.append(np.clip(t, 1, 255))
    return out[0], out[1]


# ------------------------------------------------------------ huffman

def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) in canonical JPEG order."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol."""
    out: dict[tuple[int, int], int] = {}
    for sym, (code, length) in _canonical_codes(bits, vals).items():
        out[(length, code)] = sym
    return out


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)  # byte stuffing

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s
        return bytes(self.buf)


class _BitReader:
    """Entropy-coded segment reader: unstuffs FF00, stops at markers."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise EOFError("truncated JPEG stream")
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else 0xD9
            if nxt == 0x00:
                self.pos += 2
            else:
                # a real marker: signal it, feed zero bits (spec says
                # a decoder that reads past the segment pads with 0)
                self.marker = nxt
                self.acc = (self.acc << 8)
                self.nbits += 8
                return
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid huffman code in JPEG stream")

    def align_restart(self) -> None:
        """Consume the pending RSTn marker and realign to byte."""
        self.acc = 0
        self.nbits = 0
        # skip to the marker bytes in the raw stream
        while self.pos + 1 < len(self.data):
            if (
                self.data[self.pos] == 0xFF
                and 0xD0 <= self.data[self.pos + 1] <= 0xD7
            ):
                self.pos += 2
                self.marker = None
                return
            self.pos += 1
        raise EOFError("expected restart marker")


def _extend(v: int, t: int) -> int:
    """T.81 EXTEND: map the t-bit magnitude to a signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _magnitude(v: int) -> tuple[int, int]:
    """signed value -> (category bits, code bits)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    t = a.bit_length()
    code = v if v > 0 else v + (1 << t) - 1
    return t, code


# ------------------------------------------------------------- encode

def _rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    r = img[:, :, 0].astype(np.float64)
    g = img[:, :, 1].astype(np.float64)
    b = img[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=2)


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.stack([r, g, b], axis=2).round(), 0, 255).astype(np.uint8)


def _encode_plane_blocks(
    plane: np.ndarray, qt: np.ndarray, level: float = 128.0
) -> np.ndarray:
    """Plane (padded to 8s) -> quantized zigzag coefficients
    [n_blocks_y, n_blocks_x, 64].  level = 2^(P-1) sample level shift
    (128 for 8-bit, 2048 for 12-bit)."""
    h, w = plane.shape
    by, bx = h // 8, w // 8
    blocks = plane.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3).astype(np.float64)
    blocks -= level
    # forward DCT on every block at once: A @ b @ A.T
    coeffs = np.einsum("ux,abxy,vy->abuv", _A, blocks, _A)
    qraster = np.round(coeffs / qt.reshape(8, 8)).astype(np.int64)
    return qraster.reshape(by, bx, 64)[:, :, ZIGZAG]


def _pad_to8(plane: np.ndarray) -> np.ndarray:
    h, w = plane.shape
    ph, pw = -h % 8, -w % 8
    return np.pad(plane, ((0, ph), (0, pw)), mode="edge")


def _encode_progressive_scans(comp_blocks: list[np.ndarray]) -> list[tuple[bytes, bytes]]:
    """Progressive scan script (T.81 Annex G): DC first at Al=1 ->
    DC refinement -> per-component AC spectral-selection bands 1-5 and
    6-63 (Al=0, with EOB-run accumulation).  Returns
    [(sos_payload, entropy_bytes)] in scan order."""
    ncomp = len(comp_blocks)
    dc_codes = [
        _canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS) if ci == 0
        else _canonical_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
        for ci in range(ncomp)
    ]
    prog_ac = _canonical_codes(PROG_AC_BITS, PROG_AC_VALS)
    ac_codes = [prog_ac for _ci in range(ncomp)]
    by, bx = comp_blocks[0].shape[:2]
    scans: list[tuple[bytes, bytes]] = []

    def sos(comp_specs: list[tuple[int, int]], ss: int, se: int, ah: int, al: int) -> bytes:
        p = bytes([len(comp_specs)])
        for cid, tt in comp_specs:
            p += bytes([cid, tt])
        return p + bytes([ss, se, (ah << 4) | al])

    # ---- scan 1: DC first pass, Al=1 (arithmetic >> on signed DCs)
    bw = _BitWriter()
    pred = [0] * ncomp
    for yb in range(by):
        for xb in range(bx):
            for ci in range(ncomp):
                v = int(comp_blocks[ci][yb, xb, 0]) >> 1
                t, code = _magnitude(v - pred[ci])
                pred[ci] = v
                c, ln = dc_codes[ci][t]
                bw.write(c, ln)
                if t:
                    bw.write(code, t)
    scans.append((sos([(ci + 1, (ci and 1) << 4) for ci in range(ncomp)], 0, 0, 0, 1), bw.flush()))

    # ---- scan 2: DC refinement, one bit per block
    bw = _BitWriter()
    for yb in range(by):
        for xb in range(bx):
            for ci in range(ncomp):
                bw.write(int(comp_blocks[ci][yb, xb, 0]) & 1, 1)
    scans.append((sos([(ci + 1, (ci and 1) << 4) for ci in range(ncomp)], 0, 0, 1, 0), bw.flush()))

    # ---- AC spectral-selection bands per component
    for ci in range(ncomp):
        for ss, se in ((1, 5), (6, 63)):
            bw = _BitWriter()
            act = ac_codes[ci]
            eobrun = 0

            def flush_eob() -> None:
                nonlocal eobrun
                if eobrun == 0:
                    return
                r = eobrun.bit_length() - 1
                c, ln = act[r << 4]
                bw.write(c, ln)
                if r:
                    bw.write(eobrun - (1 << r), r)
                eobrun = 0

            for yb in range(by):
                for xb in range(bx):
                    band = comp_blocks[ci][yb, xb, ss:se + 1]
                    nz = np.nonzero(band)[0]
                    if len(nz) == 0:
                        eobrun += 1
                        if eobrun == 32767:
                            flush_eob()
                        continue
                    flush_eob()
                    run = 0
                    last = int(nz[-1])
                    for k in range(last + 1):
                        v = int(band[k])
                        if v == 0:
                            run += 1
                            continue
                        while run > 15:
                            c, ln = act[0xF0]
                            bw.write(c, ln)
                            run -= 16
                        t, code = _magnitude(v)
                        c, ln = act[(run << 4) | t]
                        bw.write(c, ln)
                        bw.write(code, t)
                        run = 0
                    if last < se - ss:
                        eobrun = 1  # this block's EOB starts a new run
            flush_eob()
            tt = (0 if ci == 0 else 1)  # AC table id (Td unused)
            scans.append((sos([(ci + 1, tt)], ss, se, 0, 0), bw.flush()))
    return scans


def encode_jpeg(
    img: np.ndarray, quality: int = 85, restart_interval: int = 0,
    progressive: bool = False,
) -> bytes:
    """JFIF encode of uint8 gray [H,W] or RGB [H,W,3], 4:4:4.

    restart_interval > 0 emits a DRI segment and RSTn markers every N
    MCUs (byte-aligned, DC predictors reset) — mainly so the decoder's
    restart path has a round-trip test without external files.

    progressive=True writes SOF2 with the Annex-G scan script from
    _encode_progressive_scans (DC successive approximation + AC
    spectral selection with EOB runs); ignores restart_interval."""
    if img.dtype != np.uint8:
        raise ValueError("encode_jpeg wants uint8")
    color = img.ndim == 3
    h, w = img.shape[:2]
    qt_l, qt_c = _quality_tables(quality)

    if color:
        ycc = _rgb_to_ycbcr(img)
        planes = [ycc[:, :, i] for i in range(3)]
    else:
        planes = [img.astype(np.float64)]

    comp_blocks = []
    for ci, plane in enumerate(planes):
        qt = qt_l if ci == 0 else qt_c
        comp_blocks.append(_encode_plane_blocks(_pad_to8(plane), qt))

    if progressive:
        scan_pairs = _encode_progressive_scans(comp_blocks)
        return _assemble_jpeg(
            h, w, qt_l, qt_c, img.ndim == 3, 0, scan_pairs, sof_marker=0xC2,
            prog_ac=True,
        )

    dc_l = _canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = _canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _canonical_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _canonical_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)

    bw = _BitWriter()
    pred = [0] * len(planes)
    by, bx = comp_blocks[0].shape[:2]
    mcu_i = 0
    rst = 0
    for yb in range(by):
        for xb in range(bx):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                # flush (1-pad) to byte boundary, emit RSTn, reset DC
                bw.buf = bytearray(bw.flush())
                bw.acc = 0
                bw.nbits = 0
                bw.buf += bytes([0xFF, 0xD0 + (rst & 7)])
                rst += 1
                pred = [0] * len(planes)
            mcu_i += 1
            for ci in range(len(planes)):
                dct, act = (dc_l, ac_l) if ci == 0 else (dc_c, ac_c)
                zz = comp_blocks[ci][yb, xb]
                diff = int(zz[0]) - pred[ci]
                pred[ci] = int(zz[0])
                t, code = _magnitude(diff)
                c, ln = dct[t]
                bw.write(c, ln)
                if t:
                    bw.write(code, t)
                run = 0
                last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
                for k in range(1, 64):
                    v = int(zz[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        c, ln = act[0xF0]  # ZRL
                        bw.write(c, ln)
                        run -= 16
                    t, code = _magnitude(v)
                    c, ln = act[(run << 4) | t]
                    bw.write(c, ln)
                    bw.write(code, t)
                    run = 0
                    if k == last_nz:
                        break
                if last_nz < 63:
                    c, ln = act[0x00]  # EOB
                    bw.write(c, ln)
    scan = bw.flush()
    sos = bytes([3 if color else 1])
    for ci in range(3 if color else 1):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += b"\x00\x3f\x00"
    return _assemble_jpeg(
        h, w, qt_l, qt_c, color, restart_interval, [(sos, scan)], sof_marker=0xC0
    )


def encode_jpeg12(
    img: np.ndarray, quality: int = 85, restart_interval: int = 0
) -> bytes:
    """Extended-sequential (SOF1) 12-bit GRAYSCALE encode of uint16
    [H,W] samples in 0..4095 — the medical/DNG precision class.

    Differences from the 8-bit path, per ITU-T T.81: sample precision
    12 in SOF, level shift 2048, DQT written with Pq=1 (16-bit
    entries), and Huffman tables sized for the larger magnitude
    categories (DC SSSS up to 15, AC size up to 14) — flat canonical
    tables (all DC codes 5 bits, all AC codes 8 bits) rather than the
    8-bit Annex K defaults, which stop at categories baseline needs.
    Round-trips through decode_jpeg (returns uint16)."""
    if img.dtype != np.uint16 or img.ndim != 2:
        raise ValueError("encode_jpeg12 wants uint16 gray [H,W]")
    if img.max() > 4095:
        raise ValueError("12-bit samples must be <= 4095")
    qt_l, _ = _quality_tables(quality)
    zz_blocks = _encode_plane_blocks(
        _pad_to8(img.astype(np.float64)), qt_l, level=2048.0
    )

    # flat canonical tables: 16 DC categories at 5 bits; EOB + ZRL +
    # 16 runs x 14 sizes = 226 AC symbols at 8 bits (Kraft: 226/256)
    dc_bits = [0, 0, 0, 0, 16] + [0] * 11
    dc_vals = list(range(16))
    ac_vals = [0x00, 0xF0] + [
        (r << 4) | s for r in range(16) for s in range(1, 15)
    ]
    ac_bits = [0, 0, 0, 0, 0, 0, 0, len(ac_vals)] + [0] * 8
    dct = _canonical_codes(dc_bits, dc_vals)
    act = _canonical_codes(ac_bits, ac_vals)

    bw = _BitWriter()
    pred = 0
    by, bx = zz_blocks.shape[:2]
    mcu_i = 0
    rst = 0
    for yb in range(by):
        for xb in range(bx):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                bw.buf = bytearray(bw.flush())
                bw.acc = 0
                bw.nbits = 0
                bw.buf += bytes([0xFF, 0xD0 + (rst & 7)])
                rst += 1
                pred = 0
            mcu_i += 1
            zz = zz_blocks[yb, xb]
            diff = int(zz[0]) - pred
            pred = int(zz[0])
            t, code = _magnitude(diff)
            c, ln = dct[t]
            bw.write(c, ln)
            if t:
                bw.write(code, t)
            run = 0
            last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
            for k in range(1, 64):
                v = int(zz[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    c, ln = act[0xF0]
                    bw.write(c, ln)
                    run -= 16
                t, code = _magnitude(v)
                c, ln = act[(run << 4) | t]
                bw.write(c, ln)
                bw.write(code, t)
                run = 0
                if k == last_nz:
                    break
            if last_nz < 63:
                c, ln = act[0x00]
                bw.write(c, ln)
    scan = bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    h, w = img.shape
    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(
        0xDB,
        bytes([0x10]) + qt_l[ZIGZAG].astype(">u2").tobytes(),  # Pq=1
    )
    out += seg(0xC1, struct.pack(">BHHB", 12, h, w, 1) + bytes([1, 0x11, 0]))
    out += seg(0xC4, bytes([0x00]) + bytes(dc_bits) + bytes(dc_vals))
    out += seg(0xC4, bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    out += seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    out += scan
    out += b"\xff\xd9"
    return bytes(out)


def _assemble_jpeg(
    h: int, w: int, qt_l: np.ndarray, qt_c: np.ndarray, color: bool,
    restart_interval: int, scan_pairs: list[tuple[bytes, bytes]],
    sof_marker: int, prog_ac: bool = False,
) -> bytes:
    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0]) + bytes(qt_l[ZIGZAG].astype(np.uint8)))
    if color:
        out += seg(0xDB, bytes([1]) + bytes(qt_c[ZIGZAG].astype(np.uint8)))
    ncomp = 3 if color else 1
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    out += seg(sof_marker, sof)

    def dht(cls: int, tid: int, bits: list[int], vals: list[int]) -> bytes:
        return seg(0xC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))

    out += dht(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
    out += dht(1, 0, PROG_AC_BITS if prog_ac else AC_LUMA_BITS,
               PROG_AC_VALS if prog_ac else AC_LUMA_VALS)
    if color:
        out += dht(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
        out += dht(1, 1, PROG_AC_BITS if prog_ac else AC_CHROMA_BITS,
                   PROG_AC_VALS if prog_ac else AC_CHROMA_VALS)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    for sos_payload, entropy in scan_pairs:
        out += seg(0xDA, sos_payload)
        out += entropy
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ------------------------------------------------------------- decode

def decode_jpeg(data: bytes) -> np.ndarray:
    """JFIF decode -> uint8 gray [H,W] or RGB [H,W,3].

    Supports baseline sequential (SOF0), extended sequential huffman
    (SOF1 — decode-identical) and PROGRESSIVE (SOF2): spectral
    selection + successive approximation scans per ITU-T T.81 Annex G
    (DC first/refine, AC first with EOB runs, AC refinement with
    correction bits), with restart markers in any scan type."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    comps: list[dict] = []
    h = w = 0
    prec = 8
    restart_interval = 0
    progressive = False
    out_planes: dict[int, np.ndarray] = {}
    coef: dict[int, np.ndarray] = {}  # progressive coefficient store

    while pos < len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        pos += 2
        if marker in (0x01,) or 0xD0 <= marker <= 0xD9:
            if marker == 0xD9:
                break
            continue
        (seglen,) = struct.unpack(">H", data[pos:pos + 2])
        payload = data[pos + 2:pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0xF
                t = np.zeros(64)
                if pq == 0:
                    t[ZIGZAG] = np.frombuffer(payload[p + 1:p + 65], dtype=np.uint8)
                    p += 65
                else:  # Pq=1: 16-bit entries (12-bit sample precision)
                    t[ZIGZAG] = np.frombuffer(
                        payload[p + 1:p + 129], dtype=">u2"
                    ).astype(np.float64)
                    p += 129
                qtables[tq] = t
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(payload):
                cls, tid = payload[p] >> 4, payload[p] & 0xF
                bits = list(payload[p + 1:p + 17])
                n = sum(bits)
                vals = list(payload[p + 17:p + 17 + n])
                htables[(cls, tid)] = _decode_table(bits, vals)
                p += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 progressive
            progressive = marker == 0xC2
            prec, h, w, nc = struct.unpack(">BHHB", payload[:6])
            if prec not in (8, 12):
                raise NotImplementedError(f"{prec}-bit JPEG")
            if prec == 12 and progressive:
                raise NotImplementedError(
                    "12-bit progressive JPEG (sequential 12-bit is "
                    "supported; progressive reconstruction is 8-bit-only)"
                )
            if prec == 12 and nc != 1:
                raise NotImplementedError(
                    "12-bit color JPEG (12-bit support is grayscale — "
                    "the medical/DNG use case)"
                )
            for ci in range(nc):
                cid, hv, tq = payload[6 + 3 * ci:9 + 3 * ci]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq}
                )
            if progressive:
                hmax = max(c["h"] for c in comps)
                vmax = max(c["v"] for c in comps)
                mcux = (w + 8 * hmax - 1) // (8 * hmax)
                mcuy = (h + 8 * vmax - 1) // (8 * vmax)
                for c in comps:
                    # full MCU-grid allocation; non-interleaved scans
                    # cover the (possibly smaller) per-component grid
                    coef[c["id"]] = np.zeros(
                        (mcuy * c["v"], mcux * c["h"], 64), dtype=np.int32
                    )
                    c["bw_s"] = (-(-(w * c["h"]) // hmax) + 7) // 8
                    c["bh_s"] = (-(-(h * c["v"]) // vmax) + 7) // 8
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF{marker - 0xC0}: lossless/arithmetic/"
                f"hierarchical processes unsupported"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", payload[:2])
        elif marker == 0xDA:  # SOS
            ns = payload[0]
            scan_comps = []
            for ci in range(ns):
                cid, tt = payload[1 + 2 * ci], payload[2 + 2 * ci]
                comp = next(c for c in comps if c["id"] == cid)
                comp["td"], comp["ta"] = tt >> 4, tt & 0xF
                scan_comps.append(comp)
            ss, se, ahal = payload[1 + 2 * ns:4 + 2 * ns]
            pos += seglen
            if progressive:
                pos = _decode_scan_prog(
                    data, pos, scan_comps, comps, htables, coef,
                    ss, se, ahal >> 4, ahal & 0xF, restart_interval,
                )
            else:
                pos, out_planes = _decode_scan(
                    data, pos, scan_comps, qtables, htables, h, w,
                    restart_interval, prec,
                )
            continue
        pos += seglen

    if progressive:
        if not coef:
            raise ValueError("progressive JPEG has no scans")
        for c in comps:
            zz = coef[c["id"]].astype(np.float64)
            qt = qtables[c["tq"]]
            by, bx = zz.shape[:2]
            raster = np.zeros((by, bx, 64))
            raster[:, :, ZIGZAG] = zz
            raster *= qt
            blocks = np.einsum(
                "xu,abuv,yv->abxy", _A.T, raster.reshape(by, bx, 8, 8), _A.T
            ) + 128.0
            plane = np.clip(blocks.round(), 0, 255).astype(np.uint8)
            out_planes[c["id"]] = (
                plane.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
            )

    if not out_planes:
        raise ValueError("JPEG has no decoded scan")
    if len(comps) == 1:
        return out_planes[comps[0]["id"]][:h, :w]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    full = []
    for c in comps:
        plane = out_planes[c["id"]]
        plane = np.repeat(plane, hmax // c["h"], axis=1)
        plane = np.repeat(plane, vmax // c["v"], axis=0)
        full.append(plane[:h, :w].astype(np.float64))
    return _ycbcr_to_rgb(full[0], full[1], full[2])


def _skip_to_marker(data: bytes, p: int) -> int:
    """Advance past entropy bytes to the next real (non-RST) marker."""
    while p + 1 < len(data):
        if data[p] == 0xFF and data[p + 1] not in (0x00,) and not (
            0xD0 <= data[p + 1] <= 0xD7
        ):
            break
        p += 1
    return p


def _decode_scan_prog(
    data, pos, scan_comps, all_comps, htables, coef, ss, se, ah, al,
    restart_interval,
):
    """One progressive scan (T.81 Annex G.2): updates the coefficient
    store in place, returns the stream position after the scan."""
    br = _BitReader(data, pos)

    if ss == 0:
        # ---- DC scan (interleaved over scan comps, MCU order)
        if se != 0:
            raise ValueError("progressive DC scan must have Se=0")
        hmax = max(c["h"] for c in all_comps)
        vmax = max(c["v"] for c in all_comps)
        any_id = scan_comps[0]["id"]
        if len(all_comps) == 1 or len(scan_comps) == 1:
            # single-component scan: per-component block grid
            c0 = scan_comps[0]
            mcux, mcuy = c0["bw_s"], c0["bh_s"]
        else:
            mcux = coef[any_id].shape[1] // scan_comps[0]["h"]
            mcuy = coef[any_id].shape[0] // scan_comps[0]["v"]
        pred = {c["id"]: 0 for c in scan_comps}
        mcu_count = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                    br.align_restart()
                    pred = {c["id"]: 0 for c in scan_comps}
                for c in scan_comps:
                    nbx = c["h"] if len(scan_comps) > 1 else 1
                    nby = c["v"] if len(scan_comps) > 1 else 1
                    for iy in range(nby):
                        for ix in range(nbx):
                            by = my * nby + iy
                            bx = mx * nbx + ix
                            cc = coef[c["id"]]
                            if by >= cc.shape[0] or bx >= cc.shape[1]:
                                continue
                            if ah == 0:
                                t = br.decode_symbol(htables[(0, c["td"])])
                                diff = _extend(br.read_bits(t), t)
                                pred[c["id"]] += diff
                                cc[by, bx, 0] = pred[c["id"]] << al
                            else:
                                if br.read_bit():
                                    cc[by, bx, 0] |= 1 << al
                mcu_count += 1
    else:
        # ---- AC scan: always single-component, non-interleaved
        if len(scan_comps) != 1:
            raise ValueError("progressive AC scan must be single-component")
        c = scan_comps[0]
        cc = coef[c["id"]]
        act = htables[(1, c["ta"])]
        nbx, nby = c["bw_s"], c["bh_s"]
        eobrun = 0
        blk = 0
        p1, m1 = 1 << al, -1 << al
        for by in range(nby):
            for bx in range(nbx):
                if restart_interval and blk and blk % restart_interval == 0:
                    br.align_restart()
                    eobrun = 0
                blk += 1
                z = cc[by, bx]
                if ah == 0:
                    # ---- first pass for this bit position
                    if eobrun > 0:
                        eobrun -= 1
                        continue
                    k = ss
                    while k <= se:
                        rs = br.decode_symbol(act)
                        r, s = rs >> 4, rs & 0xF
                        if s == 0:
                            if r == 15:
                                k += 16  # ZRL
                                continue
                            eobrun = (1 << r) - 1
                            if r:
                                eobrun += br.read_bits(r)
                            break
                        k += r
                        if k > se:
                            raise ValueError("AC index out of band")
                        z[k] = _extend(br.read_bits(s), s) << al
                        k += 1
                else:
                    # ---- refinement pass (G.1.2.3): correction bits
                    # for already-nonzero coefficients, run/sign codes
                    # for newly significant ones
                    def refine(kk: int) -> None:
                        if br.read_bit() and (z[kk] & p1) == 0:
                            z[kk] += p1 if z[kk] > 0 else m1

                    k = ss
                    if eobrun > 0:
                        eobrun -= 1
                        while k <= se:
                            if z[k] != 0:
                                refine(k)
                            k += 1
                        continue
                    while k <= se:
                        rs = br.decode_symbol(act)
                        r, s = rs >> 4, rs & 0xF
                        if s == 0:
                            if r < 15:
                                eobrun = (1 << r) - 1
                                if r:
                                    eobrun += br.read_bits(r)
                                # EOB: refine the remaining history
                                while k <= se:
                                    if z[k] != 0:
                                        refine(k)
                                    k += 1
                                break
                            val = 0  # ZRL: skip 16 zero-history coeffs
                        elif s == 1:
                            val = p1 if br.read_bit() else m1
                        else:
                            raise ValueError("refinement size must be 1")
                        # advance over r zero-history positions,
                        # refining nonzero ones along the way
                        while k <= se:
                            if z[k] != 0:
                                refine(k)
                            else:
                                if r == 0:
                                    break
                                r -= 1
                            k += 1
                        if val != 0 and k <= se:
                            z[k] = val
                        k += 1

    return _skip_to_marker(data, br.pos)


def _decode_scan(data, pos, scan_comps, qtables, htables, h, w, restart_interval,
                 prec=8):
    hmax = max(c["h"] for c in scan_comps)
    vmax = max(c["v"] for c in scan_comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    level = float(1 << (prec - 1))
    maxval = (1 << prec) - 1
    dtype = np.uint8 if prec == 8 else np.uint16
    planes = {
        c["id"]: np.zeros((mcuy * 8 * c["v"], mcux * 8 * c["h"]), dtype=dtype)
        for c in scan_comps
    }
    br = _BitReader(data, pos)
    pred = {c["id"]: 0 for c in scan_comps}
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                br.align_restart()
                pred = {c["id"]: 0 for c in scan_comps}
            for c in scan_comps:
                dct = htables[(0, c["td"])]
                act = htables[(1, c["ta"])]
                qt = qtables[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.float64)
                        t = br.decode_symbol(dct)
                        diff = _extend(br.read_bits(t), t)
                        pred[c["id"]] += diff
                        zz[0] = pred[c["id"]]
                        k = 1
                        while k < 64:
                            rs = br.decode_symbol(act)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC index out of range")
                            zz[k] = _extend(br.read_bits(s), s)
                            k += 1
                        coeffs = np.zeros(64)
                        coeffs[ZIGZAG] = zz * qt[ZIGZAG]
                        block = _A.T @ coeffs.reshape(8, 8) @ _A + level
                        block = np.clip(block.round(), 0, maxval).astype(dtype)
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[c["id"]][y0:y0 + 8, x0:x0 + 8] = block
            mcu_count += 1
    # skip to end of entropy data (next non-RST marker)
    p = br.pos
    while p + 1 < len(data):
        if data[p] == 0xFF and data[p + 1] not in (0x00,) and not (
            0xD0 <= data[p + 1] <= 0xD7
        ):
            break
        p += 1
    return p, planes
