"""Bucketed-join tests: the nodes side of the core join must scan
without an Exchange when persisted bucketed (the 100 TB design
position from PERF_NOTES.md)."""

import pytest
from pyspark.sql import functions as F

from osm2pgsql_spark.sinks.bucketed import write_bucketed


@pytest.fixture()
def warehouse(spark, tmp_path_factory):
    return spark


def test_bucketed_nodes_join_no_shuffle_on_build_side(spark, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    try:
        nodes = spark.range(0, 10000).select(
            F.col("id"), (F.col("id") % 360).cast("double").alias("lon"),
            (F.col("id") % 170).cast("double").alias("lat"),
        )
        write_bucketed(nodes, "nodes_bucketed", bucket_col="id", n_buckets=8)

        refs = spark.range(0, 50000).select(
            (F.col("id") % 5000).alias("ref"), (F.col("id") % 700).alias("way_id")
        )
        bucketed = spark.table("nodes_bucketed")
        joined = refs.join(bucketed, refs["ref"] == bucketed["id"])
        plan = joined._jdf.queryExecution().executedPlan().toString()

        # exactly one Exchange: the refs side. The bucketed scan joins
        # without one.
        assert plan.count("Exchange hashpartitioning") == 1
        n = joined.count()
        assert n == 50000  # every ref < 5000 resolves
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS nodes_bucketed")
