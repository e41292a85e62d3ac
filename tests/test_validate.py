"""Input validation tests (reference src/input.cpp:24-60 semantics)."""

import pytest

from osm2pgsql_spark.model import NODE_SCHEMA
from osm2pgsql_spark.sources.validate import check_input, validate_ids


def _nodes(spark, ids):
    return spark.createDataFrame(
        [(i, 0.0, 0.0, {}, None, None, None, None, None, None) for i in ids], NODE_SCHEMA
    )


def test_validate_ok(spark):
    r = validate_ids(_nodes(spark, [1, 2, 5]))
    assert r.ok and r.n_rows == 3


def test_validate_duplicates_and_negative(spark):
    r = validate_ids(_nodes(spark, [1, 1, -3]))
    assert not r.ok
    assert r.n_duplicate_ids == 1
    assert r.n_nonpositive_ids == 1


def test_check_input_raises(spark):
    good = _nodes(spark, [1, 2])
    bad = _nodes(spark, [4, 4])
    with pytest.raises(ValueError, match="ways"):
        check_input(good, bad.withColumnRenamed("lat", "lat"), good)
