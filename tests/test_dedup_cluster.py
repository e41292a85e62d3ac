"""Near-dup clustering: connected components + keep decisions."""

import pytest
from pyspark.sql import functions as F

from osm2pgsql_spark.operators.dedup import cluster_pairs, dedup_decisions


def test_cluster_pairs_chain(spark):
    # chain 1-2, 2-3 and isolated pair 10-11
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "doc_a bigint, doc_b bigint"
    )
    got = {r["doc_id"]: r["cluster_id"] for r in cluster_pairs(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_dedup_decisions(spark):
    docs = spark.range(1, 7).select(F.col("id").alias("doc_id"))
    pairs = spark.createDataFrame([(2, 4), (4, 5)], "doc_a bigint, doc_b bigint")
    rows = {r["doc_id"]: (r["keep"], r["cluster_id"]) for r in dedup_decisions(docs, pairs).collect()}
    assert rows[1] == (True, 1)
    assert rows[2] == (True, 2)   # cluster head
    assert rows[4] == (False, 2)
    assert rows[5] == (False, 2)
    assert rows[3] == (True, 3) and rows[6] == (True, 6)
    assert sum(1 for k, (keep, _) in rows.items() if keep) == 4
