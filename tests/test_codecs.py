"""Pure-python codec round-trips + real-decode multimodal pipeline."""

import numpy as np
import pytest

from osm2pgsql_spark.functions import codecs


def _img_gray(h=13, w=17, seed=3):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w), dtype=np.uint8)


def _img_rgb(h=9, w=11, seed=4):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def test_png_roundtrip_gray_and_rgb():
    g = _img_gray()
    assert np.array_equal(codecs.decode_png(codecs.encode_png(g)), g)
    c = _img_rgb()
    assert np.array_equal(codecs.decode_png(codecs.encode_png(c)), c)


def test_png_all_filters_decode():
    """Hand-build one PNG per filter type and check exact decode."""
    import struct
    import zlib

    g = _img_gray(h=6, w=8, seed=9)
    h, w = g.shape
    for ftype in (0, 1, 2, 3, 4):
        rows = []
        prev = np.zeros(w, dtype=np.uint8)
        for r in range(h):
            cur = g[r]
            if ftype == 0:
                enc = cur
            elif ftype == 1:  # Sub
                enc = (cur.astype(int) - np.concatenate(([0], cur[:-1])).astype(int)) % 256
            elif ftype == 2:  # Up
                enc = (cur.astype(int) - prev.astype(int)) % 256
            elif ftype == 3:  # Average
                left = np.concatenate(([0], cur[:-1])).astype(int)
                enc = (cur.astype(int) - (left + prev.astype(int)) // 2) % 256
            else:  # Paeth
                left = np.concatenate(([0], cur[:-1])).astype(np.uint8)
                ul = np.concatenate(([0], prev[:-1])).astype(np.uint8)
                pred = codecs._paeth(left, prev, ul)
                enc = (cur.astype(int) - pred.astype(int)) % 256
            rows.append(bytes([ftype]) + np.asarray(enc, dtype=np.uint8).tobytes())
            prev = cur
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
        data = (
            b"\x89PNG\r\n\x1a\n"
            + codecs._png_chunk(b"IHDR", ihdr)
            + codecs._png_chunk(b"IDAT", zlib.compress(b"".join(rows)))
            + codecs._png_chunk(b"IEND", b"")
        )
        assert np.array_equal(codecs.decode_png(data), g), f"filter {ftype}"


def test_bmp_roundtrip():
    c = _img_rgb(h=5, w=7)  # odd width exercises row padding
    assert np.array_equal(codecs.decode_bmp(codecs.encode_bmp(c)), c)


def test_wav_roundtrip():
    t = np.arange(8000) / 8000.0
    x = 0.5 * np.sin(2 * np.pi * 440 * t)
    rate, y = codecs.decode_wav(codecs.encode_wav(8000, x))
    assert rate == 8000
    assert y.shape == x.shape
    # int16 truncation plus the 32767/32768 encode/decode scale skew
    assert float(np.abs(y - x).max()) < 1.0 / 12000


def test_multimodal_real_decode_pipeline(spark):
    """Real PNG/BMP decode + WAV features through the mapInPandas
    operators (no fake path)."""
    from osm2pgsql_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        audio_features,
        image_features,
        resize_images,
    )

    g = _img_gray(h=16, w=16, seed=1)
    rgb = _img_rgb(h=12, w=10, seed=2)
    t = np.arange(4000) / 16000.0
    wav = codecs.encode_wav(16000, 0.25 * np.sin(2 * np.pi * 220 * t))

    rows = [
        (1, bytearray(codecs.encode_png(g)), ("png", 16, 16, None, None)),
        (2, bytearray(codecs.encode_bmp(rgb)), ("bmp", 10, 12, None, None)),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    feats = {r["media_id"]: r for r in image_features(media).collect()}
    assert feats[1]["mean_val"] == pytest.approx(float(g.mean()))
    luma = (rgb[:, :, :3].astype(np.float64) @ np.array([0.299, 0.587, 0.114])).astype(
        np.uint8
    )
    assert feats[2]["mean_val"] == pytest.approx(float(luma.mean()))

    resized = {r["media_id"]: r for r in resize_images(media, 8, 8).collect()}
    out1 = codecs.decode_png(bytes(resized[1]["payload"]))
    assert out1.shape == (8, 8)
    yi = (np.arange(8) * 16 // 8).astype(int)
    assert np.array_equal(out1, g[np.ix_(yi, yi)])

    audio = spark.createDataFrame(
        [(3, bytearray(wav), ("wav", None, None, 250, 16000))], MEDIA_SCHEMA
    )
    af = audio_features(audio).collect()[0]
    assert af["sample_rate"] == 16000
    assert af["n_samples"] == 4000
    assert af["duration_ms"] == 250
    assert af["rms"] == pytest.approx(0.25 / np.sqrt(2), rel=1e-3)

    with pytest.raises(Exception, match="jpeg|NotImplemented|no pure-python"):
        jm = spark.createDataFrame(
            [(4, bytearray(b"\xff\xd8\xff"), ("jpeg", 4, 4, None, None))], MEDIA_SCHEMA
        )
        image_features(jm).collect()


def test_jpeg_roundtrip_gray():
    import numpy as np

    from osm2pgsql_spark.functions import jpeg

    x = np.linspace(0, 255, 48)
    img = np.clip(np.add.outer(np.linspace(0, 120, 40), x), 0, 255).astype(np.uint8)
    dec = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=90))
    assert dec.shape == img.shape
    assert int(np.abs(dec.astype(int) - img.astype(int)).max()) <= 6

    # flat image survives quantization exactly
    u = np.full((24, 16), 77, dtype=np.uint8)
    assert (jpeg.decode_jpeg(jpeg.encode_jpeg(u, quality=75)) == 77).all()


def test_jpeg_roundtrip_rgb_and_multimodal_path():
    import numpy as np

    from osm2pgsql_spark.functions import jpeg
    from osm2pgsql_spark.operators import multimodal

    rng = np.random.default_rng(7)
    smooth = rng.integers(0, 256, (33, 29, 3)).astype(np.float64)
    for _ in range(6):
        smooth[1:-1, 1:-1] = (
            smooth[:-2, 1:-1] + smooth[2:, 1:-1] + smooth[1:-1, :-2]
            + smooth[1:-1, 2:] + smooth[1:-1, 1:-1]
        ) / 5
    rgb = smooth.astype(np.uint8)
    enc = jpeg.encode_jpeg(rgb, quality=92)
    dec = jpeg.decode_jpeg(enc)
    assert dec.shape == rgb.shape
    assert float(np.abs(dec.astype(float) - rgb.astype(float)).mean()) < 6.0

    # the multimodal image path accepts jpeg now (gray conversion)
    g = multimodal._decode_image(enc, "jpeg")
    assert g.ndim == 2 and g.shape == rgb.shape[:2]


def test_jpeg_progressive_roundtrip_matches_baseline():
    """Progressive (SOF2) decode: the Annex-G scan script (DC
    successive approximation + AC spectral bands with EOB runs) must
    reconstruct EXACTLY the same pixels as the baseline path — both
    carry the identical quantized coefficients."""
    import numpy as np

    from osm2pgsql_spark.functions import jpeg

    rng = np.random.RandomState(3)
    gray = (
        np.outer(np.linspace(0, 255, 37), np.ones(29))
        + rng.randint(0, 30, (37, 29))
    ).clip(0, 255).astype(np.uint8)
    rgb = rng.randint(0, 256, (33, 41, 3), dtype=np.uint8)
    # smooth image: most high-frequency bands are all-zero, so the
    # encoder accumulates EOB runs > 1 (decoder EOBRUN path)
    smooth = (
        np.outer(np.linspace(40, 200, 64), np.linspace(40, 200, 64)) / 2 + 60
    ).astype(np.uint8)
    for img, q in ((gray, 85), (rgb, 70), (smooth, 50)):
        base = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=q))
        prog = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=q, progressive=True))
        assert np.array_equal(base, prog)


def test_jpeg_progressive_ac_refinement_scan():
    """Hand-crafted successive-approximation AC scans (first pass at
    Al=1 then a refinement pass with correction bits, ZRL-in-refine
    and newly-significant coefficients) — the G.1.2.3 path the
    encoder's spectral-selection-only script doesn't emit."""
    import numpy as np

    from osm2pgsql_spark.functions import jpeg

    # one 8x8 block; zigzag coefficients: DC=24, then
    # k=1: 5 (history, refine bit 1), k=3: -1 (newly significant),
    # k=10: -6 (history, refine bit 0), k=20: +1 (newly significant)
    dc_val = 24
    ac = {1: 5, 3: -1, 10: -6, 20: 1}
    qt_l, _ = jpeg._quality_tables(85)

    dc_codes = jpeg._canonical_codes(jpeg.DC_LUMA_BITS, jpeg.DC_LUMA_VALS)
    prog_ac = jpeg._canonical_codes(jpeg.PROG_AC_BITS, jpeg.PROG_AC_VALS)

    def wsym(bw, codes, sym):
        c, ln = codes[sym]
        bw.write(c, ln)

    # ---- baseline twin stream with identical coefficients
    ac_codes = jpeg._canonical_codes(jpeg.AC_LUMA_BITS, jpeg.AC_LUMA_VALS)
    bw = jpeg._BitWriter()
    t, code = jpeg._magnitude(dc_val)
    wsym(bw, dc_codes, t)
    bw.write(code, t)
    prev = 0
    for k in sorted(ac):
        run = k - prev - 1
        while run > 15:
            wsym(bw, ac_codes, 0xF0)
            run -= 16
        t, code = jpeg._magnitude(ac[k])
        wsym(bw, ac_codes, (run << 4) | t)
        bw.write(code, t)
        prev = k
    wsym(bw, ac_codes, 0x00)
    sos = bytes([1, 1, 0x00]) + b"\x00\x3f\x00"
    baseline = jpeg._assemble_jpeg(
        8, 8, qt_l, qt_l, False, 0, [(sos, bw.flush())], sof_marker=0xC0
    )

    # ---- progressive: DC scan (Al=0), AC first (Al=1), AC refine
    scans = []
    bw = jpeg._BitWriter()
    t, code = jpeg._magnitude(dc_val)
    wsym(bw, dc_codes, t)
    bw.write(code, t)
    scans.append((bytes([1, 1, 0x00, 0, 0, 0x00]), bw.flush()))

    # AC first pass, Al=1: send sign * (|v| >> 1); |v|==1 stays zero
    bw = jpeg._BitWriter()
    prev = 0
    firsts = {k: (1 if v > 0 else -1) * (abs(v) >> 1) for k, v in ac.items()}
    for k in sorted(k for k, v in firsts.items() if v != 0):
        run = k - prev - 1
        # skip zero positions incl. the not-yet-significant ones
        while run > 15:
            wsym(bw, prog_ac, 0xF0)
            run -= 16
        t, code = jpeg._magnitude(firsts[k])
        wsym(bw, prog_ac, (run << 4) | t)
        bw.write(code, t)
        prev = k
    wsym(bw, prog_ac, 0x00)  # EOB
    scans.append((bytes([1, 1, 0x00, 1, 63, 0x01]), bw.flush()))

    # AC refinement pass Ah=1 Al=0: correction bits for history
    # coefficients, run/sign codes for newly significant +-1s
    bw = jpeg._BitWriter()
    # k=1 history -> pending bit 1; k=2 zero (r=1); k=3 new -1
    wsym(bw, prog_ac, 0x11)
    bw.write(0, 1)  # sign: negative
    bw.write(1, 1)  # pending correction bit for k=1 (|5| & 1)
    # k=4..9 zeros (6), k=10 history (bit 0), k=11..19 zeros (9), k=20 new +1
    wsym(bw, prog_ac, 0xF1)
    bw.write(1, 1)  # sign: positive
    bw.write(0, 1)  # correction bit for k=10 (|6| & 1)
    wsym(bw, prog_ac, 0x00)  # EOB for the trailing zeros
    scans.append((bytes([1, 1, 0x00, 1, 63, 0x10]), bw.flush()))

    progressive = jpeg._assemble_jpeg(
        8, 8, qt_l, qt_l, False, 0, scans, sof_marker=0xC2, prog_ac=True
    )
    assert np.array_equal(
        jpeg.decode_jpeg(progressive), jpeg.decode_jpeg(baseline)
    )


def test_jpeg_restart_markers_roundtrip():
    """DRI/RSTn decode path: encoder emits restart markers so the
    decoder's byte-realign + DC-predictor reset is round-trip
    testable without external files."""
    import numpy as np

    from osm2pgsql_spark.functions import jpeg

    x = np.linspace(0, 255, 64)
    img = np.clip(np.add.outer(np.linspace(0, 200, 48), x), 0, 255).astype(np.uint8)
    for ri in (1, 3, 7):
        dec = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=90, restart_interval=ri))
        assert int(np.abs(dec.astype(int) - img.astype(int)).max()) <= 6
    rgb = np.stack([img, img[::-1], np.roll(img, 7, axis=1)], axis=2)
    dec3 = jpeg.decode_jpeg(jpeg.encode_jpeg(rgb, quality=92, restart_interval=2))
    assert dec3.shape == rgb.shape


def test_jpeg_progressive_420_subsampled():
    """Hand-crafted 4:2:0 progressive stream (Y at 2x2 sampling, 4
    blocks; chroma at 1x1): pins the interleaved-DC MCU walk and the
    per-component (non-MCU) AC block grids, plus an EOBRUN spanning 3
    blocks.  Expected pixels computed from the same IDCT basis."""
    import struct

    import numpy as np

    from osm2pgsql_spark.functions import jpeg

    qt = np.ones(64)  # flat quant table: exact coefficient math
    dc_l = jpeg._canonical_codes(jpeg.DC_LUMA_BITS, jpeg.DC_LUMA_VALS)
    dc_c = jpeg._canonical_codes(jpeg.DC_CHROMA_BITS, jpeg.DC_CHROMA_VALS)
    prog_ac = jpeg._canonical_codes(jpeg.PROG_AC_BITS, jpeg.PROG_AC_VALS)
    ydc, cbdc, crdc, yac1 = [8, 16, 24, 32], 4, -4, 3

    def wsym(bw, codes, sym):
        c, ln = codes[sym]
        bw.write(c, ln)

    def wmag(bw, codes, v):
        t, code = jpeg._magnitude(v)
        wsym(bw, codes, t)
        if t:
            bw.write(code, t)

    # scan 1: interleaved DC (Y 2x2 raster, then Cb, Cr)
    bw = jpeg._BitWriter()
    pred = 0
    for v in ydc:
        wmag(bw, dc_l, v - pred)
        pred = v
    wmag(bw, dc_c, cbdc)
    wmag(bw, dc_c, crdc)
    scans = [(bytes([3, 1, 0x00, 2, 0x10, 3, 0x10, 0, 0, 0x00]), bw.flush())]

    # scan 2: Y AC band — block 1 has one coefficient, EOBRUN=3 covers
    # the remaining blocks
    bw = jpeg._BitWriter()
    t, code = jpeg._magnitude(yac1)
    wsym(bw, prog_ac, t)
    bw.write(code, t)
    wsym(bw, prog_ac, 0x00)  # EOB block 1
    wsym(bw, prog_ac, 0x10)  # EOBn r=1
    bw.write(1, 1)  # eobrun = 2^1 + 1 = 3 blocks
    scans.append((bytes([1, 1, 0x00, 1, 63, 0x00]), bw.flush()))
    for cid in (2, 3):  # chroma AC: all-zero -> one EOB
        bw = jpeg._BitWriter()
        wsym(bw, prog_ac, 0x00)
        scans.append((bytes([1, cid, 0x00, 1, 63, 0x00]), bw.flush()))

    def seg(marker, payload):
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0]) + bytes(qt[jpeg.ZIGZAG].astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, 16, 16, 3)
    sof += bytes([1, 0x22, 0]) + bytes([2, 0x11, 0]) + bytes([3, 0x11, 0])
    out += seg(0xC2, sof)
    out += seg(0xC4, bytes([0x00]) + bytes(jpeg.DC_LUMA_BITS) + bytes(jpeg.DC_LUMA_VALS))
    out += seg(0xC4, bytes([0x01]) + bytes(jpeg.DC_CHROMA_BITS) + bytes(jpeg.DC_CHROMA_VALS))
    out += seg(0xC4, bytes([0x10]) + bytes(jpeg.PROG_AC_BITS) + bytes(jpeg.PROG_AC_VALS))
    for sp, sc in scans:
        out += seg(0xDA, sp) + sc
    out += b"\xff\xd9"

    img = jpeg.decode_jpeg(bytes(out))
    assert img.shape == (16, 16, 3)

    A = jpeg._A

    def block(dc, ac1=0):
        z = np.zeros(64)
        z[jpeg.ZIGZAG[0]] = dc
        if ac1:
            z[jpeg.ZIGZAG[1]] = ac1
        return A.T @ z.reshape(8, 8) @ A + 128.0

    Y = np.zeros((16, 16))
    Y[0:8, 0:8] = block(ydc[0], yac1)
    Y[0:8, 8:16] = block(ydc[1])
    Y[8:16, 0:8] = block(ydc[2])
    Y[8:16, 8:16] = block(ydc[3])
    Y = np.clip(Y.round(), 0, 255)
    cb = np.clip(np.full((16, 16), block(cbdc)[0, 0]).round(), 0, 255)
    cr = np.clip(np.full((16, 16), block(crdc)[0, 0]).round(), 0, 255)
    exp = jpeg._ycbcr_to_rgb(Y, cb, cr)
    assert int(np.abs(img.astype(int) - exp.astype(int)).max()) <= 1


def test_jpeg12_roundtrip_smooth_and_random():
    """12-bit sequential grayscale: uint16 in/out, near-lossless on
    smooth content at q95, sub-LSB mean error on noise at q100."""
    from osm2pgsql_spark.functions import jpeg

    y, x = np.mgrid[0:40, 0:56]
    img = ((np.sin(x / 9.0) + np.cos(y / 7.0) + 2.0) * 1000).astype(np.uint16)
    out = jpeg.decode_jpeg(jpeg.encode_jpeg12(img, quality=95))
    assert out.dtype == np.uint16 and out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 4

    rng = np.random.default_rng(3)
    img2 = rng.integers(0, 4096, size=(24, 24)).astype(np.uint16)
    out2 = jpeg.decode_jpeg(jpeg.encode_jpeg12(img2, quality=100))
    assert np.abs(out2.astype(int) - img2.astype(int)).mean() < 1.0

    # restart markers reset the 12-bit DC predictor too
    out3 = jpeg.decode_jpeg(jpeg.encode_jpeg12(img, quality=95, restart_interval=3))
    assert np.abs(out3.astype(int) - img.astype(int)).max() <= 4


def test_jpeg12_honest_limits():
    import pytest as _pytest

    from osm2pgsql_spark.functions import jpeg

    with _pytest.raises(ValueError):
        jpeg.encode_jpeg12(np.zeros((8, 8), dtype=np.uint8))
    with _pytest.raises(ValueError):
        jpeg.encode_jpeg12(np.full((8, 8), 5000, dtype=np.uint16))
    # 12-bit progressive / color decode raise with explanatory messages
    data = bytearray(jpeg.encode_jpeg12(np.zeros((8, 8), dtype=np.uint16)))
    sof = bytes(data).index(b"\xff\xc1")
    patched = bytearray(data)
    patched[sof + 1] = 0xC2  # claim progressive
    with _pytest.raises(NotImplementedError):
        jpeg.decode_jpeg(bytes(patched))
