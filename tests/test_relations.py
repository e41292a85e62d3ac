"""Relation assembly tests — FIXTURES.md F3 (multipolygon with hole)
and F4 (route relation -> merged multilinestring), mirroring the
reference BDD features (area.feature, route relations)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from osm2pgsql_spark.functions import geometry as G
from osm2pgsql_spark.model import NODE_SCHEMA, RELATION_SCHEMA, WAY_SCHEMA
from osm2pgsql_spark.operators.relations import (
    assemble_multipolygon,
    relation_multilinestrings,
    relation_multipolygons,
)


def test_assemble_simple_square():
    ring = np.asarray([(0, 0), (4, 0), (4, 4), (0, 4), (0, 0)], dtype="f8")
    g = assemble_multipolygon([ring])
    assert g[0] == "multipolygon"
    assert G.area(g) == pytest.approx(16.0)


def test_assemble_outer_with_hole():
    outer = np.asarray([(0, 0), (4, 0), (4, 4), (0, 4), (0, 0)], dtype="f8")
    inner = np.asarray([(1, 1), (2, 1), (2, 2), (1, 2), (1, 1)], dtype="f8")
    g = assemble_multipolygon([outer, inner])
    assert len(g[1]) == 1  # one polygon
    assert len(g[1][0]) == 2  # outer + inner
    assert G.area(g) == pytest.approx(15.0)


def test_assemble_from_open_ways():
    # square split into two open ways (endpoint stitching)
    w1 = np.asarray([(0, 0), (4, 0), (4, 4)], dtype="f8")
    w2 = np.asarray([(4, 4), (0, 4), (0, 0)], dtype="f8")
    g = assemble_multipolygon([w1, w2])
    assert G.area(g) == pytest.approx(16.0)


def test_assemble_reversed_member():
    w1 = np.asarray([(0, 0), (4, 0), (4, 4)], dtype="f8")
    w2 = np.asarray([(0, 0), (0, 4), (4, 4)], dtype="f8")  # runs backwards
    g = assemble_multipolygon([w1, w2])
    assert G.area(g) == pytest.approx(16.0)


def test_assemble_two_disjoint_outers():
    sq = lambda dx: np.asarray(
        [(dx, 0), (dx + 1, 0), (dx + 1, 1), (dx, 1), (dx, 0)], dtype="f8"
    )
    g = assemble_multipolygon([sq(0), sq(5)])
    assert len(g[1]) == 2
    assert G.area(g) == pytest.approx(2.0)


def test_assemble_dangling_dropped():
    ring = np.asarray([(0, 0), (4, 0), (4, 4), (0, 4), (0, 0)], dtype="f8")
    dangling = np.asarray([(10, 10), (11, 11)], dtype="f8")
    g = assemble_multipolygon([ring, dangling])
    assert G.area(g) == pytest.approx(16.0)


@pytest.fixture()
def rel_fixture(spark):
    def n(i, dx, dy):
        return (i, 50.0 + 0.1 * dy, 9.0 + 0.1 * dx, {}, None, None, None, None, None, None)

    # outer square nodes 1-4, inner square nodes 5-8, route nodes 10-13
    nodes = spark.createDataFrame(
        [
            n(1, 0, 0), n(2, 4, 0), n(3, 4, 4), n(4, 0, 4),
            n(5, 1, 1), n(6, 2, 1), n(7, 2, 2), n(8, 1, 2),
            n(10, 0, 0), n(11, 1, 0), n(12, 2, 0), n(13, 5, 5),
        ],
        NODE_SCHEMA,
    )
    w = lambda i, refs: (i, refs, {}, None, None, None, None, None, None)
    ways = spark.createDataFrame(
        [
            w(100, [1, 2, 3]),          # half of outer
            w(101, [3, 4, 1]),          # other half
            w(102, [5, 6, 7, 8, 5]),    # inner ring (closed)
            w(200, [10, 11]),           # route part a
            w(201, [11, 12]),           # route part b (connects to a)
            w(202, [13, 12]),           # route part c (connects, reversed)
        ],
        WAY_SCHEMA,
    )
    r = lambda i, members, tags: (i, members, tags, None, None, None, None, None, None)
    relations = spark.createDataFrame(
        [
            r(1000, [("w", 100, "outer"), ("w", 101, "outer"), ("w", 102, "inner")],
              {"type": "multipolygon", "natural": "water"}),
            r(2000, [("w", 200, ""), ("w", 201, ""), ("w", 202, "")],
              {"type": "route", "route": "bicycle"}),
        ],
        RELATION_SCHEMA,
    )
    return nodes, ways, relations


def test_relation_multipolygon_spark(spark, rel_fixture):
    nodes, ways, relations = rel_fixture
    mp = relation_multipolygons(
        relations.where(F.col("tags")["type"] == "multipolygon"), ways, nodes
    )
    rows = {r["rel_id"]: r for r in mp.collect()}
    g = G.from_wkb(rows[1000]["geom"])
    assert g[0] == "multipolygon"
    # outer 0.4x0.4 deg minus inner 0.1x0.1 deg
    assert G.area(g) == pytest.approx(0.16 - 0.01, rel=1e-6)


def test_relation_multilinestring_spark(spark, rel_fixture):
    nodes, ways, relations = rel_fixture
    ml = relation_multilinestrings(
        relations.where(F.col("tags")["type"] == "route"), ways, nodes
    )
    rows = {r["rel_id"]: r for r in ml.collect()}
    g = G.from_wkb(rows[2000]["geom"])
    assert g[0] == "multilinestring"
    assert len(g[1]) == 1  # all three parts merge into one chain
    assert g[1][0].shape[0] == 4
