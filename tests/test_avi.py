"""AVI/MJPEG container codec + real video operators.

Reference scope note: video is beyond /root/reference (training-data
pipeline extension); the container layout follows the public
Microsoft AVI RIFF spec, frames are the in-repo baseline JPEG codec.
"""

import numpy as np
import pytest

from osm2pgsql_spark.functions import avi, jpeg


def _frames(n=6, h=32, w=48):
    out = []
    for i in range(n):
        g = np.zeros((h, w), dtype=np.uint8)
        g[:, : (w // n) * (i + 1)] = 200
        g += (np.arange(w, dtype=np.uint8) // 4)[None, :]
        out.append(g)
    return out


def test_avi_roundtrip_headers_and_frames():
    frames = _frames()
    data = avi.encode_avi_mjpeg(frames, fps=4.0, quality=90)
    v = avi.decode_avi(data)
    assert (v.width, v.height) == (48, 32)
    assert v.fps == pytest.approx(4.0)
    assert v.handler == "MJPG"
    assert v.n_frames == len(frames)
    assert v.duration_ms == 1500
    for i, f in enumerate(frames):
        img = avi.decode_avi_frame(v, i)
        assert img.shape == f.shape
        # q=90 on these shallow gradients decodes exactly
        assert np.abs(img.astype(int) - f.astype(int)).mean() < 2.0


def test_avi_rgb_frames_roundtrip():
    rng = np.random.default_rng(7)
    base = rng.integers(60, 196, size=(16, 16, 3), dtype=np.uint8)
    frames = [base, np.roll(base, 4, axis=1)]
    v = avi.decode_avi(avi.encode_avi_mjpeg(frames, fps=2.0, quality=95))
    for i, f in enumerate(frames):
        img = avi.decode_avi_frame(v, i)
        assert img.shape == f.shape
        assert np.abs(img.astype(int) - f.astype(int)).mean() < 8.0


def test_avi_frame_at_ms_clamps():
    v = avi.decode_avi(avi.encode_avi_mjpeg(_frames(4), fps=4.0))
    assert [v.frame_at_ms(t) for t in (0, 249, 250, 999, 10_000)] == [0, 0, 1, 3, 3]
    assert v.frame_at_ms(-5) == 0


def test_avi_rejects_corruption():
    data = avi.encode_avi_mjpeg(_frames(2), fps=4.0)
    with pytest.raises(ValueError):
        avi.decode_avi(b"RIFX" + data[4:])
    with pytest.raises(ValueError):
        avi.decode_avi(data[:40])  # truncated inside hdrl
    # unknown handler: container parses, frame decode raises
    broken = bytearray(data)
    pos = data.index(b"vidsMJPG")
    broken[pos + 4 : pos + 8] = b"H264"
    v = avi.decode_avi(bytes(broken))
    with pytest.raises(NotImplementedError):
        avi.decode_avi_frame(v, 0)


def test_avi_skips_audio_chunks():
    """A foreign-stream chunk ('01wb') inside movi must not be
    counted as a video frame."""
    import struct

    data = avi.encode_avi_mjpeg(_frames(3), fps=4.0)
    movi_at = data.index(b"movi")
    # splice an audio chunk right after the 'movi' list type tag
    audio = b"01wb" + struct.pack("<I", 4) + b"\x01\x02\x03\x04"
    out = bytearray(data)
    out[movi_at + 4 : movi_at + 4] = audio
    # fix RIFF + movi LIST sizes
    struct.pack_into("<I", out, 4, struct.unpack_from("<I", out, 4)[0] + len(audio))
    struct.pack_into(
        "<I", out, movi_at - 4, struct.unpack_from("<I", data, movi_at - 4)[0] + len(audio)
    )
    v = avi.decode_avi(bytes(out))
    assert v.n_frames == 3


def test_sample_frames_real_avi(spark):
    from osm2pgsql_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        image_features,
        sample_frames,
        video_features,
    )

    rows = []
    for mid, (n, fps) in enumerate([(6, 4.0), (3, 2.0)]):
        payload = avi.encode_avi_mjpeg(_frames(n), fps=fps, quality=90)
        dur = int(round(n * 1000.0 / fps))
        rows.append((mid, bytearray(payload), ("avi", 48, 32, dur, 0)))
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)

    got = sample_frames(media, every_ms=500, fake=False).collect()
    by_id = {}
    for r in got:
        by_id.setdefault(r["media_id"], []).append(r)
    assert len(by_id[0]) == 3  # 1500ms @ 500ms
    assert len(by_id[1]) == 3  # 1500ms @ 500ms
    # sampled frames are decodable JPEGs of the container geometry
    for r in got:
        img = jpeg.decode_jpeg(bytes(r["frame"]))
        assert img.shape == (32, 48)
    # frames at 0/500/1000ms of the fps=4 clip are source frames 0/2/4
    src = _frames(6)
    for r in by_id[0]:
        want = src[int(r["ts_ms"] * 4.0 / 1000)]
        img = jpeg.decode_jpeg(bytes(r["frame"]))
        assert np.abs(img.astype(int) - want.astype(int)).mean() < 2.0

    vf = {r["media_id"]: r for r in video_features(media, pixel_sample=1).collect()}
    assert vf[0]["n_frames"] == 6 and vf[0]["fps"] == pytest.approx(4.0)
    assert vf[1]["duration_ms"] == 1500
    assert vf[0]["mean_frame_delta"] > 0.0  # the gradient clip moves

    # sampled frames feed the image pipeline unchanged
    frames_df = sample_frames(media, every_ms=500, fake=False)
    feat_in = frames_df.selectExpr(
        "media_id",
        "frame as payload",
        "named_struct('format','jpeg','width',48,'height',32,"
        "'duration_ms',0L,'sample_rate',0) as meta",
    )
    feats = image_features(feat_in, fake=False).collect()
    assert len(feats) == 6 and all(f["mean_val"] > 0 for f in feats)


def test_multimodal_pipeline_example(spark, tmp_path):
    """The end-to-end media curation example: real decodes across all
    six formats, video frames through the shared image kernel,
    near-dup pruning narrows, output lands."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from examples.multimodal_pipeline import curate_media

    counts = curate_media(spark, str(tmp_path / "out"))
    assert counts["input"] == 56  # 8 of each of 7 kinds
    assert counts["formats"] == 7
    assert counts["sampled_frames"] > 0
    assert counts["image_features"] == 40 + counts["sampled_frames"]
    assert counts["audio_rows"] == 8
    assert 0 < counts["after_near_dup"] <= counts["image_features"]
    assert counts["written"] == counts["after_near_dup"]
