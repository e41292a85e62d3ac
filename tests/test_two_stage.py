"""Two-stage processing tests (reference stage-2 semantics:
output-flex.cpp:1506-1613 — route relations push refs onto ways)."""

import pytest
from pyspark.sql import functions as F

from osm2pgsql_spark.model import RELATION_SCHEMA, WAY_SCHEMA
from osm2pgsql_spark.plans.two_stage import (
    relation_attrs_for_members,
    select_relation_members,
    two_stage_ways,
)


@pytest.fixture()
def data(spark):
    w = lambda i, tags: (i, [1, 2], tags, None, None, None, None, None, None)
    ways = spark.createDataFrame(
        [w(10, {"highway": "x"}), w(11, {"highway": "y"}), w(12, {"highway": "z"})],
        WAY_SCHEMA,
    )
    r = lambda i, members, tags: (i, members, tags, None, None, None, None, None, None)
    rels = spark.createDataFrame(
        [
            r(100, [("w", 10, ""), ("w", 11, "")], {"type": "route", "ref": "R1"}),
            r(101, [("w", 11, "")], {"type": "route", "ref": "R2"}),
            r(102, [("w", 12, "")], {"type": "boundary", "ref": "B"}),
        ],
        RELATION_SCHEMA,
    )
    return ways, rels


def test_select_relation_members(spark, data):
    ways, rels = data
    marked = select_relation_members(rels, when=F.col("tags")["type"] == "route")
    assert {r["id"] for r in marked.collect()} == {10, 11}


def test_relation_attrs_for_members(spark, data):
    ways, rels = data
    refs = relation_attrs_for_members(
        rels, when=F.col("tags")["type"] == "route", ref=F.col("tags")["ref"]
    )
    got = {r["id"]: r["ref"] for r in refs.collect()}
    assert got == {10: "R1", 11: "R1,R2"}  # way 11 in two routes


def test_two_stage_union(spark, data):
    ways, rels = data
    marked = select_relation_members(rels, when=F.col("tags")["type"] == "route")

    def stage1(df):
        return df.select("id", "stage")

    def stage2(df):
        return df.select("id", "stage")

    out = {r["id"]: r["stage"] for r in two_stage_ways(ways, marked, stage1, stage2).collect()}
    assert out == {10: 2, 11: 2, 12: 1}
