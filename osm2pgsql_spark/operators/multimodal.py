"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, with decode/feature/resize/frame-sample operators.

Beyond the reference's surface (training-data pipeline extension).
Design rules for 100 TB of media:
- payloads are opaque BINARY columns; metadata (format, width,
  height, duration, sample_rate) is a typed STRUCT column so filters
  prune on metadata without touching bytes (column pruning keeps the
  binary out of scans that don't need it — check ReadSchema);
- decode / transform kernels run via mapInPandas in Arrow batches,
  sized by bytes not rows (spark.sql.execution.arrow.maxRecordsPerBatch
  + maxPartitionBytes are the knobs);
- codecs: REAL pure-python decoders for PNG (all five scanline
  filters, gray/RGB/RGBA), BMP (24-bit BI_RGB), WAV (PCM 16-bit),
  JPEG (baseline + progressive, functions/jpeg.py), GIF (87a/89a
  LZW incl. interlace/animation/disposal, functions/gif.py) and
  MJPEG-in-AVI video (functions/avi.py: RIFF container walk + the
  JPEG codec per frame) — no external image/audio libs needed or
  available.
  Formats with no pure-python codec (e.g. H.264 video) raise
  NotImplementedError, and `fake=True` substitutes a deterministic
  fake decode so the plumbing (schemas, batching, partitioning)
  stays testable for every format.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_TYPE = T.StructType(
    [
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", MEDIA_META_TYPE),
    ]
)


def synthesize_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media corpus for plumbing tests: payload =
    repeatable pseudo-random bytes, meta filled in."""
    rows = []
    for i in range(n):
        h = hashlib.sha256(f"{seed}:{i}".encode()).digest()
        payload = (h * 32)[: 256 + (i % 7) * 64]
        rows.append(
            (
                i,
                bytearray(payload),
                ("png" if i % 2 == 0 else "wav", 32 + i % 16, 32 + i % 8, 1000 + i, 16000),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_decode(payload: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic fake 'decode': bytes -> (h, w) uint8 grid derived
    from a rolling hash.  Stands in for a real codec."""
    h = hashlib.sha256(payload).digest()
    arr = np.frombuffer((h * ((width * height) // len(h) + 1))[: width * height], dtype=np.uint8)
    return arr.reshape(height, width)


def _decode_image(payload: bytes, fmt: str) -> np.ndarray:
    """Real decode to a grayscale uint8 array (RGB via Rec.601 luma).
    PNG/BMP are pure-python (functions/codecs.py); anything else has
    no pure-python codec and raises."""
    from osm2pgsql_spark.functions import codecs

    if fmt == "png":
        img = codecs.decode_png(payload)
    elif fmt == "bmp":
        img = codecs.decode_bmp(payload)
    elif fmt in ("jpeg", "jpg"):
        from osm2pgsql_spark.functions import jpeg

        img = jpeg.decode_jpeg(payload)
    elif fmt == "gif":
        from osm2pgsql_spark.functions import gif

        img = gif.decode_gif(payload).frames[0]
    elif fmt in ("tiff", "tif"):
        from osm2pgsql_spark.functions import tiff

        img = tiff.decode_tiff(payload).image
        if img.dtype == np.uint16:
            img = (img >> 8).astype(np.uint8)
    else:
        raise NotImplementedError(
            f"no pure-python codec for image format {fmt!r}"
        )
    if img.ndim == 3:
        rgb = img[:, :, :3].astype(np.float64)
        img = (rgb @ np.array([0.299, 0.587, 0.114])).astype(np.uint8)
    return img


FEATURE_SCHEMA = "media_id bigint, n_bytes bigint, mean_val double, feature array<float>"


def image_features(media: DataFrame, fake: bool = False, feat_dim: int = 8) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow batches).

    fake=False decodes for real (PNG/BMP); fake=True keeps the
    deterministic stand-in for formats without a pure-python codec —
    the Spark-side plumbing is identical either way."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for _, row in pdf.iterrows():
                payload = bytes(row["payload"])
                meta = row["meta"]
                if fake:
                    img = _fake_decode(payload, int(meta["width"]), int(meta["height"]))
                else:
                    img = _decode_image(payload, str(meta["format"]))
                flat = img.ravel()
                flat = flat[: (flat.size // feat_dim) * feat_dim]
                pooled = flat.reshape(feat_dim, -1).mean(axis=1).astype("float32")
                out.append(
                    {
                        "media_id": row["media_id"],
                        "n_bytes": len(payload),
                        "mean_val": float(img.mean()),
                        "feature": pooled,
                    }
                )
            yield pd.DataFrame(out)

    return media.select("media_id", "payload", "meta").mapInPandas(batches, FEATURE_SCHEMA)


RESIZE_SCHEMA = "media_id bigint, width int, height int, payload binary"


def resize_images(media: DataFrame, width: int, height: int, fake: bool = False) -> DataFrame:
    """Resize operator: decode -> nearest-neighbor resample ->
    re-encode.  Real path emits a PNG payload; fake path emits raw
    grid bytes from the deterministic stand-in decode."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from osm2pgsql_spark.functions import codecs

        for pdf in it:
            out = []
            for _, row in pdf.iterrows():
                meta = row["meta"]
                if fake:
                    img = _fake_decode(
                        bytes(row["payload"]), int(meta["width"]), int(meta["height"])
                    )
                else:
                    img = _decode_image(bytes(row["payload"]), str(meta["format"]))
                yi = (np.arange(height) * img.shape[0] // height).astype(int)
                xi = (np.arange(width) * img.shape[1] // width).astype(int)
                resized = img[np.ix_(yi, xi)]
                payload = (
                    resized.tobytes() if fake else codecs.encode_png(resized)
                )
                out.append(
                    {
                        "media_id": row["media_id"],
                        "width": width,
                        "height": height,
                        "payload": bytearray(payload),
                    }
                )
            yield pd.DataFrame(out)

    return media.select("media_id", "payload", "meta").mapInPandas(batches, RESIZE_SCHEMA)


AUDIO_SCHEMA = (
    "media_id bigint, sample_rate int, n_samples bigint, duration_ms bigint, "
    "rms double, zero_crossings bigint"
)


def audio_features(media: DataFrame) -> DataFrame:
    """WAV (PCM 16-bit) decode + summary features — real pure-python
    codec, Arrow-batched like the image path."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from osm2pgsql_spark.functions import codecs

        for pdf in it:
            out = []
            for _, row in pdf.iterrows():
                rate, x = codecs.decode_wav(bytes(row["payload"]))
                out.append(
                    {
                        "media_id": row["media_id"],
                        "sample_rate": rate,
                        "n_samples": int(x.size),
                        "duration_ms": int(x.size * 1000 // rate) if rate else 0,
                        "rms": float(np.sqrt(np.mean(x * x))) if x.size else 0.0,
                        "zero_crossings": int(np.count_nonzero(np.diff(np.signbit(x)))),
                    }
                )
            yield pd.DataFrame(out)

    return media.select("media_id", "payload").mapInPandas(batches, AUDIO_SCHEMA)


FRAME_SCHEMA = "media_id bigint, frame_no int, ts_ms bigint, frame binary"


def sample_frames(media: DataFrame, every_ms: int = 250, fake: bool = True) -> DataFrame:
    """Frame-sampling for video: one row per sampled frame (explode in
    the kernel, so batch size scales with output).

    fake=False is a REAL decode for MJPEG-in-AVI payloads
    (functions/avi.py): the container is parsed once per row, frames
    are picked by timestamp against the container's own frame rate,
    and `frame` carries the sampled frame's compressed JPEG payload
    (extract-frames semantics — only the container walk is paid, not
    a pixel decode of every frame; pipe into image_features for
    pixels).  Formats other than AVI raise NotImplementedError."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from osm2pgsql_spark.functions import avi as avi_codec

        for pdf in it:
            out = []
            for _, row in pdf.iterrows():
                meta = row["meta"]
                payload = bytes(row["payload"])
                if fake:
                    dur = int(meta["duration_ms"])
                    for k, ts in enumerate(range(0, dur, every_ms)):
                        frame = hashlib.sha256(
                            payload + ts.to_bytes(8, "little")
                        ).digest()
                        out.append(
                            {
                                "media_id": row["media_id"],
                                "frame_no": k,
                                "ts_ms": ts,
                                "frame": bytearray(frame),
                            }
                        )
                    continue
                fmt = str(meta["format"])
                if fmt == "avi":
                    video = avi_codec.decode_avi(payload)
                    for k, ts in enumerate(range(0, video.duration_ms, every_ms)):
                        out.append(
                            {
                                "media_id": row["media_id"],
                                "frame_no": k,
                                "ts_ms": ts,
                                "frame": bytearray(
                                    video.frames[video.frame_at_ms(ts)]
                                ),
                            }
                        )
                elif fmt == "gif":
                    # animated GIF: frames are deltas, so compositing
                    # decodes everything once; sampled frames re-encode
                    # as PNG (lossless) for downstream decoders
                    from osm2pgsql_spark.functions import codecs, gif

                    g = gif.decode_gif(payload)
                    starts = np.cumsum([0] + list(g.delays_ms[:-1]))
                    for k, ts in enumerate(range(0, g.duration_ms, every_ms)):
                        i = int(np.searchsorted(starts, ts, side="right")) - 1
                        out.append(
                            {
                                "media_id": row["media_id"],
                                "frame_no": k,
                                "ts_ms": ts,
                                "frame": bytearray(
                                    codecs.encode_png(g.frames[max(i, 0)])
                                ),
                            }
                        )
                else:
                    raise NotImplementedError(
                        f"no pure-python video codec for format {fmt!r} "
                        "(avi/MJPEG and animated gif are the real paths; "
                        "use fake=True for plumbing tests of other formats)"
                    )
            yield pd.DataFrame(out)

    return media.select("media_id", "payload", "meta").mapInPandas(batches, FRAME_SCHEMA)


VIDEO_SCHEMA = (
    "media_id bigint, n_frames int, fps double, width int, height int, "
    "duration_ms bigint, mean_frame_bytes double, mean_frame_delta double"
)


def video_features(media: DataFrame, pixel_sample: int = 4) -> DataFrame:
    """Container + content summary per video (real AVI path): frame
    count/rate/geometry from the container walk, plus a motion proxy
    (mean |Δ| between consecutive sampled frames' decoded pixels —
    every `pixel_sample`-th frame is pixel-decoded, the rest are only
    counted).  The training-data use is filtering static/broken clips
    without paying a full decode."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from osm2pgsql_spark.functions import avi as avi_codec

        for pdf in it:
            out = []
            for _, row in pdf.iterrows():
                video = avi_codec.decode_avi(bytes(row["payload"]))
                idxs = list(range(0, video.n_frames, max(pixel_sample, 1)))
                prev = None
                deltas = []
                for i in idxs:
                    img = avi_codec.decode_avi_frame(video, i)
                    if img.ndim == 3:
                        img = img.mean(axis=2)
                    img = img.astype(np.float64)
                    if prev is not None and prev.shape == img.shape:
                        deltas.append(float(np.abs(img - prev).mean()))
                    prev = img
                out.append(
                    {
                        "media_id": row["media_id"],
                        "n_frames": video.n_frames,
                        "fps": float(video.fps),
                        "width": video.width,
                        "height": video.height,
                        "duration_ms": video.duration_ms,
                        "mean_frame_bytes": float(
                            np.mean([len(f) for f in video.frames])
                        ) if video.frames else 0.0,
                        "mean_frame_delta": float(np.mean(deltas)) if deltas else 0.0,
                    }
                )
            yield pd.DataFrame(out)

    return media.select("media_id", "payload").mapInPandas(batches, VIDEO_SCHEMA)


def media_stats(media: DataFrame) -> DataFrame:
    """Metadata-only aggregation — must not touch payload bytes (check
    ReadSchema excludes `payload` when reading from parquet)."""
    return media.groupBy(F.col("meta.format").alias("format")).agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("meta.width").alias("avg_width"),
        F.sum("meta.duration_ms").alias("total_ms"),
    )
