"""GIF codec: LZW round-trips, animation, interlace, disposal."""

import struct

import numpy as np
import pytest

from osm2pgsql_spark.functions import gif


def _gray(h=24, w=31, seed=5):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w), dtype=np.uint8)


def test_gif_single_frame_exact_roundtrip_gray():
    g = _gray()
    img = gif.decode_gif(gif.encode_gif([g]))
    assert (img.width, img.height, img.n_frames) == (31, 24, 1)
    want = np.stack([g, g, g], axis=2)
    assert np.array_equal(img.frames[0], want)


def test_gif_rgb_under_256_colors_exact():
    rng = np.random.default_rng(6)
    pal = rng.integers(0, 256, size=(40, 3), dtype=np.uint8)
    idx = rng.integers(0, 40, size=(17, 23))
    f = pal[idx]
    img = gif.decode_gif(gif.encode_gif([f]))
    assert np.array_equal(img.frames[0], f)


def test_gif_animation_frames_delays_loop():
    frames = [np.full((8, 8), v, dtype=np.uint8) for v in (0, 96, 200)]
    data = gif.encode_gif(frames, delays_ms=[100, 250, 50], loop=True)
    img = gif.decode_gif(data)
    assert img.n_frames == 3
    assert img.delays_ms == [100, 250, 50]
    assert img.duration_ms == 400
    assert img.loop
    for f, v in zip(img.frames, (0, 96, 200)):
        assert np.array_equal(f, np.full((8, 8, 3), v, dtype=np.uint8))


def test_gif_lzw_kwkwk_pattern():
    """aaaa... stresses the code==next_code (KwKwK) decode branch."""
    g = np.zeros((16, 16), dtype=np.uint8)
    img = gif.decode_gif(gif.encode_gif([g]))
    assert np.array_equal(img.frames[0], np.zeros((16, 16, 3), dtype=np.uint8))
    # long runs of two alternating colors also exercise table growth
    g2 = np.tile(np.array([[7, 7, 7, 7, 9, 9, 9, 9]], dtype=np.uint8), (32, 16))
    img2 = gif.decode_gif(gif.encode_gif([g2]))
    assert np.array_equal(img2.frames[0][:, :, 0], g2)


def test_gif_over_256_colors_quantizes_close():
    rng = np.random.default_rng(8)
    f = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    img = gif.decode_gif(gif.encode_gif([f]))
    err = np.abs(img.frames[0].astype(int) - f.astype(int)).mean()
    assert err < 16  # 6x7x6 cube: max per-channel error ~26, mean far lower


def test_gif_interlaced_decodes():
    """Hand-build an interlaced GIF: rows stored in pass order must
    come back in display order."""
    g = np.repeat(np.arange(16, dtype=np.uint8)[:, None] * 16, 8, axis=1)
    # pass order per GIF89a: 0,8 then 4,12 then 2,6,10,14 then odd rows
    order = [0, 8, 4, 12, 2, 6, 10, 14, 1, 3, 5, 7, 9, 11, 13, 15]
    stored = g[order]
    pal = np.zeros((256, 3), dtype=np.uint8)
    pal[:, 0] = pal[:, 1] = pal[:, 2] = np.arange(256, dtype=np.uint8)
    out = bytearray()
    out += b"GIF89a" + struct.pack("<HHBBB", 8, 16, 0x80 | 7, 0, 0) + pal.tobytes()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, 8, 16, 0x40)  # interlaced
    out.append(8)
    lzw = gif._lzw_encode(stored.ravel(), 8)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    out += b"\x3b"
    img = gif.decode_gif(bytes(out))
    assert np.array_equal(img.frames[0][:, :, 0], g)


def test_gif_transparency_and_disposal_background():
    """Frame 2 paints a transparent-holed sub-rect; the hole shows
    frame 1's pixels.  Disposal=2 then clears the rect for frame 3."""
    pal = np.zeros((256, 3), dtype=np.uint8)
    pal[1] = (255, 0, 0)
    pal[2] = (0, 255, 0)
    out = bytearray()
    out += b"GIF89a" + struct.pack("<HHBBB", 4, 4, 0x80 | 7, 0, 0) + pal.tobytes()

    def add_frame(idx_arr, x, y, w, h, transparent=-1, disposal=0):
        gc_flags = (disposal << 2) | (1 if transparent >= 0 else 0)
        out.extend(
            b"\x21\xf9\x04"
            + struct.pack("<BHB", gc_flags, 10, max(transparent, 0))
            + b"\x00"
        )
        out.extend(b"\x2c" + struct.pack("<HHHHB", x, y, w, h, 0))
        out.append(8)
        lzw = gif._lzw_encode(idx_arr.ravel(), 8)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out.append(len(chunk))
            out.extend(chunk)
        out.append(0)

    add_frame(np.full((4, 4), 1, dtype=np.uint8), 0, 0, 4, 4)  # all red
    sub = np.full((2, 2), 2, dtype=np.uint8)
    sub[0, 0] = 0  # transparent hole
    add_frame(sub, 1, 1, 2, 2, transparent=0, disposal=2)
    add_frame(np.full((1, 1), 2, dtype=np.uint8), 0, 0, 1, 1)
    out += b"\x3b"

    img = gif.decode_gif(bytes(out))
    f1, f2, f3 = img.frames
    assert np.array_equal(f1[0, 0], (255, 0, 0))
    assert np.array_equal(f2[1, 1], (255, 0, 0))  # hole keeps red
    assert np.array_equal(f2[1, 2], (0, 255, 0))
    assert np.array_equal(f3[1, 1], (0, 0, 0))  # disposal=2 cleared rect
    assert np.array_equal(f3[0, 0], (0, 255, 0))
    assert np.array_equal(f3[3, 3], (255, 0, 0))  # outside rect untouched


def test_gif_rejects_corruption():
    data = gif.encode_gif([_gray(8, 8)])
    with pytest.raises(ValueError):
        gif.decode_gif(b"NOTGIF" + data[6:])
    with pytest.raises(ValueError):
        gif.decode_gif(data[: len(data) // 2])


def test_gif_in_multimodal_pipeline(spark):
    from osm2pgsql_spark.functions import codecs
    from osm2pgsql_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        image_features,
        sample_frames,
    )

    frames = [np.full((8, 8), v, dtype=np.uint8) for v in (10, 120, 240)]
    anim = gif.encode_gif(frames, delays_ms=[200, 200, 200])
    still = gif.encode_gif([_gray(8, 8, seed=11)])
    rows = [
        (0, bytearray(anim), ("gif", 8, 8, 600, 0)),
        (1, bytearray(still), ("gif", 8, 8, 0, 0)),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)

    feats = {r["media_id"]: r for r in image_features(media, fake=False).collect()}
    assert feats[0]["mean_val"] == pytest.approx(10.0)  # first frame
    assert feats[1]["mean_val"] > 0

    got = sample_frames(media.where("media_id = 0"), every_ms=200, fake=False).collect()
    assert [r["ts_ms"] for r in got] == [0, 200, 400]
    vals = [codecs.decode_png(bytes(r["frame"]))[:, :, 0].mean() for r in got]
    assert vals == [10, 120, 240]


def test_gif_lzw_property_random_streams():
    """Property: GIF-LZW round-trips arbitrary index streams,
    including runs that overflow the 4096-entry table."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        st.lists(st.integers(0, 255), min_size=1, max_size=4000),
        st.integers(2, 8),
    )
    def check(vals, mcs):
        idx = np.array([v % (1 << mcs) for v in vals], dtype=np.uint8)
        enc = gif._lzw_encode(idx, mcs)
        dec = gif._lzw_decode(enc, mcs, len(idx))
        assert np.array_equal(dec, idx)

    check()


def test_gif_roundtrip_property_random_images():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=15, deadline=None)
    @given(st.integers(1, 24), st.integers(1, 24), st.integers(2, 200), st.integers(0, 2**32 - 1))
    def check(h, w, ncolors, seed):
        rng = np.random.default_rng(seed)
        pal = rng.integers(0, 256, size=(ncolors, 3), dtype=np.uint8)
        f = pal[rng.integers(0, ncolors, size=(h, w))]
        img = gif.decode_gif(gif.encode_gif([f]))
        assert np.array_equal(img.frames[0], f)

    check()
