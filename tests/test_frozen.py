"""Frozen-artifact drift pins (tools/freeze_artifacts.py).

The semdedup_decisions / ann_ivfpq_topk / bpe_encode driver gates
embed trained models as literals (osm2pgsql_spark/frozen.py) in both
the Spark query and the DuckDB oracle.  These tests retrain at the
same scale with the same hyperparameters and assert bit-equality with
the committed literals — if a trainer's semantics change, this fails
before the driver gate can silently compare a stale model.
"""

import numpy as np
import pytest

from osm2pgsql_spark import frozen

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet(f"{SF}/embeddings.parquet").cache()
    yield df
    df.unpersist()  # don't leak the cache into later tests' plans


def test_semdedup_centroids_reproduce(spark, emb):
    from osm2pgsql_spark.operators.ivf import train_kmeans

    got = train_kmeans(emb, nlist=8, iters=4, round_decimals=6)
    np.testing.assert_array_equal(
        got, np.asarray(frozen.SEMDEDUP_CENTROIDS, dtype="f8")
    )


def test_ivfpq_model_reproduces(spark, emb):
    from osm2pgsql_spark.operators.pq import train_ivfpq

    cents, books = train_ivfpq(
        emb, nlist=8, m=4, ksub=8, coarse_iters=2, pq_iters=2,
        round_decimals=6,
    )
    np.testing.assert_array_equal(
        cents, np.asarray(frozen.IVFPQ_CENTS, dtype="f8")
    )
    np.testing.assert_array_equal(
        books, np.asarray(frozen.IVFPQ_BOOKS, dtype="f8")
    )


def test_bpe_merges_reproduce(spark):
    from osm2pgsql_spark.operators.bpe import train_bpe

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = train_bpe(docs, num_merges=25)
    assert got == list(frozen.BPE_MERGES)


def test_quality_weights_reproduce(spark):
    from osm2pgsql_spark.operators.curation import train_hashed_linear

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    w, bias = train_hashed_linear(docs, n_buckets=256, epochs=3)
    assert w == dict(frozen.QUALITY_WEIGHTS)
    assert bias == frozen.QUALITY_BIAS
    assert frozen.QUALITY_BUCKETS == 256
    # the artifact is non-trivial (a real trained model, not zeros)
    assert len(w) > 5 and any(v > 0 for v in w.values()) \
        and any(v < 0 for v in w.values())
