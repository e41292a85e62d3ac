"""Portable HyperLogLog (operators/sketch.py): merge property,
accuracy envelope, small-range branch, determinism."""

import pytest
from pyspark.sql import functions as F

from osm2pgsql_spark.operators import sketch


@pytest.fixture(scope="module")
def values(spark):
    # 5000 rows, 1000 distinct
    return spark.range(5000).select((F.col("id") % 1000).alias("v")).cache()


def test_registers_merge_by_max(spark, values):
    """sketch(A ∪ B) == element-wise max of sketch(A), sketch(B) —
    the property that makes per-shard sketches combinable without
    touching raw values again."""
    a = values.where(F.col("v") < 600)
    b = values.where(F.col("v") >= 400)
    merged = (
        sketch.hll_registers(a, "v")
        .unionByName(sketch.hll_registers(b, "v"))
        .groupBy("bucket").agg(F.max("rho").alias("rho"))
    )
    whole = sketch.hll_registers(values, "v")
    assert merged.exceptAll(whole).count() == 0
    assert whole.exceptAll(merged).count() == 0
    est_m = sketch.hll_estimate(merged).first()["hll_estimate"]
    est_w = sketch.hll_estimate(whole).first()["hll_estimate"]
    assert est_m == est_w


def test_accuracy_envelope(spark, values):
    """p=8 (256 registers): standard error 1.04/sqrt(m) ~ 6.5%; the
    estimate of 1000 distinct must land within a generous 4-sigma."""
    est = sketch.hll_distinct(values, "v").first()["hll_estimate"]
    assert abs(est - 1000) / 1000 < 0.26


def test_small_range_branch(spark):
    df = spark.range(40).select((F.col("id") % 7).alias("v"))
    est = sketch.hll_distinct(df, "v").first()["hll_estimate"]
    # linear counting is near-exact at tiny cardinalities
    assert abs(est - 7) < 1.0


def test_deterministic_and_layout_independent(spark, values):
    a = sketch.hll_distinct(values, "v").first()
    b = sketch.hll_distinct(values.repartition(13), "v").first()
    assert a["hll_estimate"] == b["hll_estimate"]
    assert a["n_registers_set"] == b["n_registers_set"]


def test_empty_input_estimates_zero(spark, values):
    empty = values.where(F.lit(False))
    row = sketch.hll_distinct(empty, "v").first()
    assert row["n_registers_set"] == 0
    assert row["hll_estimate"] == 0.0


def test_p_range_validated(spark, values):
    with pytest.raises(ValueError, match="p must be"):
        sketch.hll_registers(values, "v", p=2)
