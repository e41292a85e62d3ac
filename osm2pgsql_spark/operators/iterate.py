"""Iteration helpers for fixpoint operators.

checkpoint() — localCheckpoint with origin-statistics stripping.

Why stripping matters: Spark's Dataset.localCheckpoint propagates the
ORIGIN plan's Statistics onto the resulting LogicalRDD so AQE/join
planning can keep using them.  In an iterative fixpoint that is
catastrophic: the size-only stats visitor multiplies child sizeInBytes
across joins, so round N's checkpoint carries a BigInteger whose bit
length grows ~(refs_per_hop ^ hops) PER ROUND.  By round ~5 of a
4-hop-per-round relaxation the carried sizeInBytes is a multi-million-
bit BigInteger and Catalyst spends MINUTES in
BigInteger.multiplyKaratsuba just estimating stats (measured: a round
that computes in 1.5s took 196s, all of it driver-side stats math).

The fix rebuilds the DataFrame over the checkpointed InternalRow RDD
via SparkSession.internalCreateDataFrame, which creates a fresh
LogicalRDD with DEFAULT stats (one defaultSizeInBytes leaf, 63 bits).
No data movement: the RDD is the already-materialized checkpoint.
Falls back to the plain checkpoint if the internal API is unavailable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def checkpoint(df: DataFrame) -> DataFrame:
    """Eager localCheckpoint that does NOT carry origin plan statistics.

    Use this instead of .localCheckpoint() inside iterative loops —
    carried stats compound exponentially across rounds (see module
    docstring)."""
    ck = df.localCheckpoint()
    spark = df.sparkSession
    try:
        jdf = spark._jsparkSession.internalCreateDataFrame(
            ck._jdf.queryExecution().toRdd(), ck._jdf.schema(), False
        )
        return DataFrame(jdf, spark)
    except Exception:  # pragma: no cover - internal API moved
        return ck
