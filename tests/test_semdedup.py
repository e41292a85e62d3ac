"""SemDeDup-style semantic dedup (operators/semdedup.py): greedy
within-cluster cosine pruning against a brute-force Python twin on
the driver-generated embeddings table."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from osm2pgsql_spark.operators.ivf import train_kmeans
from osm2pgsql_spark.operators.semdedup import semantic_dedup

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


def _python_twin(rows, centroids, threshold):
    """Exact twin of assign+greedy: cosine-nearest centroid (the IVF
    assigner's argmax, ties -> lowest cluster id), then ascending-id
    greedy keep scan on the 1e-6-quantized integer similarity (the
    operator's cross-engine discipline)."""
    thr_int = int(np.floor(threshold * 1e12 + 0.5))
    cu = centroids / np.maximum(
        np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12)
    by_cluster = {}
    for vid, vec in sorted(rows):
        v = np.asarray(vec, dtype="f8")
        u = v / max(np.linalg.norm(v), 1e-12)
        by_cluster.setdefault(int(np.argmax(cu @ u)), []).append((vid, v))
    keep, dup_of = {}, {}
    for c, items in by_cluster.items():
        kept = []
        for vid, v in items:  # already ascending id
            u = v / (np.linalg.norm(v) or 1.0)
            uq = np.floor(u * 1e6 + 0.5).astype("i8")
            hit = None
            best = None
            for kvid, ku in kept:
                s = int(ku @ uq)
                if best is None or s > best:
                    best, hit = s, kvid
            if kept and best >= thr_int:
                keep[vid] = False
                dup_of[vid] = hit
            else:
                keep[vid] = True
                dup_of[vid] = -1
                kept.append((vid, uq))
    return keep, dup_of


def test_semantic_dedup_matches_python_twin(spark, emb):
    centroids = train_kmeans(emb, nlist=8, iters=3, round_decimals=6)
    got = {r["vec_id"]: r for r in
           semantic_dedup(emb, centroids=centroids,
                          threshold=0.25).collect()}
    rows = [(r["vec_id"], list(r["embedding"])) for r in
            emb.select("vec_id", "embedding").collect()]
    keep, dup_of = _python_twin(rows, centroids, 0.25)
    assert len(got) == len(rows) == 500
    for vid in keep:
        assert got[vid]["keep"] == keep[vid], vid
        assert got[vid]["dup_of"] == dup_of[vid], vid
    # something was actually deduped at this threshold and plenty kept
    dropped = sum(1 for v in keep.values() if not v)
    assert 0 < dropped < 500


def test_semantic_dedup_filter_join(spark, emb):
    """The keep-decision frame prunes the corpus with one semi-join —
    the consumption pattern at scale (decisions are tiny vs vectors)."""
    decisions = semantic_dedup(emb, nlist=8, iters=2, threshold=0.25)
    kept = emb.join(decisions.where("keep").select("vec_id"),
                    "vec_id", "leftsemi")
    assert 0 < kept.count() < 500
    # deterministic: run twice, same decisions
    again = semantic_dedup(emb, nlist=8, iters=2, threshold=0.25)
    a = decisions.select("vec_id", "keep", "dup_of")
    b = again.select("vec_id", "keep", "dup_of")
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0
