"""Multimodal curation example: mixed image/audio/video corpus ->
decode -> features -> near-dup pruning -> curated parquet.

Composes the round-5 codec work end-to-end with REAL decodes only
(no fakes): PNG/BMP stills, GIF stills + animations, JPEG (baseline/
progressive), MJPEG-in-AVI video, WAV audio, GeoTIFF rasters.  Every
stage is a DataFrame plan; pixels only ever exist inside Arrow
batches on executors.

Stages:
  1. synthesize a deterministic mixed-format corpus (stand-in for a
     100 TB media lake; payloads are REAL encoded files);
  2. metadata triage — media_stats never touches payload bytes
     (check ReadSchema if you doubt it);
  3. video: container-level frame sampling (compressed frames out),
     then the shared image feature kernel over the sampled frames;
  4. stills: decode + pooled features;
  5. audio: WAV summary features;
  6. near-dup pruning on the pooled feature vectors (the embedding
     RP-band path — no cross join);
  7. curated parquet: one row per kept medium + its feature vector.

Run: python examples/multimodal_pipeline.py [out_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import functions as F


def synthesize_corpus(spark, n_per_kind: int = 8):
    """Real encoded payloads across 6 formats, deterministic."""
    from osm2pgsql_spark.functions import avi, codecs, gif, jpeg, tiff
    from osm2pgsql_spark.operators.multimodal import MEDIA_SCHEMA

    rows = []
    mid = 0

    def base_img(i, h=24, w=32):
        g = np.zeros((h, w), dtype=np.uint8)
        g[:, : (i % w)] = 180
        g += (np.arange(w, dtype=np.uint8) // 3)[None, :]
        return g

    for i in range(n_per_kind):
        img = base_img(i)
        rows.append((mid, bytearray(codecs.encode_png(img)), ("png", 32, 24, 0, 0))); mid += 1
        rgb = np.repeat(img[:, :, None], 3, axis=2)  # BMP encoder wants RGB
        rows.append((mid, bytearray(codecs.encode_bmp(rgb)), ("bmp", 32, 24, 0, 0))); mid += 1
        rows.append((mid, bytearray(jpeg.encode_jpeg(img, quality=90)), ("jpeg", 32, 24, 0, 0))); mid += 1
        rows.append((mid, bytearray(gif.encode_gif([img])), ("gif", 32, 24, 0, 0))); mid += 1
        geo = tiff.web_mercator_geo(10, 530 + i, 336, 32)
        rows.append((mid, bytearray(tiff.encode_tiff(img, geo=geo)), ("tiff", 32, 24, 0, 0))); mid += 1
        frames = [base_img(i + k) for k in range(4)]
        payload = avi.encode_avi_mjpeg(frames, fps=4.0, quality=90)
        rows.append((mid, bytearray(payload), ("avi", 32, 24, 1000, 0))); mid += 1
        t = np.arange(8000) / 8000.0
        wave = (0.4 * np.sin(2 * np.pi * (220 + 20 * i) * t)).astype(np.float64)
        rows.append(
            (mid, bytearray(codecs.encode_wav(8000, wave)), ("wav", 0, 0, 1000, 8000))
        ); mid += 1
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def curate_media(spark, out_dir: str) -> dict[str, int]:
    from osm2pgsql_spark.operators import ann
    from osm2pgsql_spark.operators.multimodal import (
        audio_features,
        image_features,
        media_stats,
        sample_frames,
        video_features,
    )

    media = synthesize_corpus(spark).localCheckpoint()  # feeds many branches
    counts = {"input": media.count()}

    # 1. metadata-only triage (payload never read)
    stats = {r["format"]: r["n"] for r in media_stats(media).collect()}
    counts["formats"] = len(stats)

    # 2. video path: container sampling -> shared image kernel
    vids = media.where(F.col("meta.format") == "avi")
    vstats = video_features(vids, pixel_sample=2)
    moving = vstats.where(F.col("mean_frame_delta") > 0.0).select("media_id")
    frames = sample_frames(
        vids.join(moving, "media_id", "leftsemi"), every_ms=500, fake=False
    )
    frame_media = frames.selectExpr(
        "media_id * 1000 + frame_no as media_id",
        "frame as payload",
        "named_struct('format','jpeg','width',32,'height',24,"
        "'duration_ms',0L,'sample_rate',0) as meta",
    )
    counts["sampled_frames"] = frame_media.count()

    # 3. stills + sampled frames through ONE image feature kernel
    stills = media.where(
        F.col("meta.format").isin("png", "bmp", "jpeg", "gif", "tiff")
    )
    feats = image_features(
        stills.unionByName(frame_media), fake=False, feat_dim=8
    ).localCheckpoint()
    counts["image_features"] = feats.count()

    # 4. audio features
    audio = audio_features(media.where(F.col("meta.format") == "wav"))
    counts["audio_rows"] = audio.count()

    # 5. near-dup pruning on pooled features (RP bands, no cross join)
    emb = feats.select(
        F.col("media_id").alias("vec_id"),
        F.col("feature").alias("embedding"),
    )
    pairs = ann.rp_near_dup_pairs(emb, threshold=0.999, dim=8)
    drop = pairs.select(F.col("id_b").alias("media_id")).distinct()
    kept = feats.join(drop, "media_id", "left_anti")
    counts["after_near_dup"] = kept.count()

    kept.write.mode("overwrite").parquet(out_dir)
    counts["written"] = spark.read.parquet(out_dir).count()
    return counts


def main() -> None:
    from osm2pgsql_spark.session import get_spark

    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/curated_media"
    spark = get_spark("multimodal-pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    for k, v in curate_media(spark, out_dir).items():
        print(f"{k}: {v}")


if __name__ == "__main__":
    main()
