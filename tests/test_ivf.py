"""IVF ANN tests: recall against the exact brute-force baseline."""

import pytest
from pyspark.sql import functions as F

from osm2pgsql_spark.operators import ann, ivf
from osm2pgsql_spark.sources.testdata import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def corpus(spark):
    return load_table(spark, SF, "embeddings").cache()


def test_kmeans_and_index(spark, corpus):
    cents = ivf.train_kmeans(corpus, nlist=8, iters=3)
    assert cents.shape == (8, 64)
    index = ivf.build_index(corpus, cents)
    sizes = index.groupBy("cluster").count().collect()
    assert sum(r["count"] for r in sizes) == corpus.count()
    assert len(sizes) >= 4  # clusters actually used


def test_ivf_recall_vs_exact(spark, corpus):
    cents = ivf.train_kmeans(corpus, nlist=8, iters=3)
    index = ivf.build_index(corpus, cents)
    queries = corpus.where(F.col("vec_id") < 10)

    exact = ann.brute_force_topk(corpus, queries, k=5)
    approx = ivf.search(index, queries, cents, k=5, nprobe=4)

    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    # random embeddings are a worst case for IVF; half the lists
    # probed must still recover most of the true top-5
    assert recall >= 0.5

    # full probe == exact
    full = ivf.search(index, queries, cents, k=5, nprobe=8)
    f = {(r["query_id"], r["neighbor_id"]) for r in full.collect()}
    assert f == e


def test_local_and_distributed_training_agree(spark, corpus, monkeypatch):
    """The data-size-gated local Lloyd path must produce the same
    grid-quantized centroids as the distributed path (the 1e-6
    rounding absorbs summation-order ulps — the same argument that
    makes the DuckDB oracle twin match)."""
    local = ivf.train_kmeans(corpus, nlist=8, iters=3, round_decimals=6)
    monkeypatch.setattr(ivf, "_LOCAL_TRAIN_MAX_ROWS", 0)
    dist = ivf.train_kmeans(corpus, nlist=8, iters=3, round_decimals=6)
    assert local.shape == dist.shape
    import numpy as np
    np.testing.assert_array_equal(local, dist)
