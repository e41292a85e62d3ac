"""Append/diff tests — FIXTURES.md F5: applying a diff + recomputing
affected objects must equal a fresh import of the post-diff state
(the reference invariant from tests/bdd/regression/update.feature)."""

import pytest
from pyspark.sql import functions as F

from osm2pgsql_spark.model import NODE_SCHEMA, RELATION_SCHEMA, WAY_SCHEMA
from osm2pgsql_spark.operators import assembly
from osm2pgsql_spark.streaming.append import affected_ids, apply_diff, ways_to_recompute


def _node(i, lat, lon, tags=None, version=2):
    return (i, lat, lon, tags or {}, version, None, None, None, None, None)


def _way(i, refs, tags=None, version=2):
    return (i, refs, tags or {}, version, None, None, None, None, None)


def _rel(i, members, tags=None, version=2):
    return (i, members, tags or {}, version, None, None, None, None, None)


@pytest.fixture()
def base(spark):
    nodes = spark.createDataFrame(
        [_node(1, 50.0, 9.0), _node(2, 50.0, 9.1), _node(3, 50.1, 9.1), _node(4, 50.1, 9.0)],
        NODE_SCHEMA,
    )
    ways = spark.createDataFrame(
        [_way(10, [1, 2, 3]), _way(11, [3, 4]), _way(12, [1, 4])], WAY_SCHEMA
    )
    rels = spark.createDataFrame(
        [_rel(20, [("w", 10, ""), ("w", 11, "")]), _rel(21, [("n", 4, "")])],
        RELATION_SCHEMA,
    )
    return nodes, ways, rels


from pyspark.sql import types as T

# NB: StructType.add() mutates in place — build copies
DIFF_NODE_SCHEMA = T.StructType(list(NODE_SCHEMA.fields) + [T.StructField("op", T.StringType())])
DIFF_WAY_SCHEMA = T.StructType(list(WAY_SCHEMA.fields) + [T.StructField("op", T.StringType())])


def test_apply_diff_semantics(spark, base):
    nodes, ways, rels = base
    node_diff = spark.createDataFrame(
        [
            (*_node(2, 51.0, 9.5), "modify"),   # move node 2
            (*_node(4, 0.0, 0.0), "delete"),        # delete node 4
            (*_node(5, 52.0, 8.0, {}, 1), "create"),  # brand-new node
        ],
        DIFF_NODE_SCHEMA,
    )
    new_nodes = apply_diff(nodes, node_diff)
    got = {r["id"]: (r["lat"], r["lon"]) for r in new_nodes.collect()}
    assert set(got) == {1, 2, 3, 5}
    assert got[2] == (51.0, 9.5)


def test_dependency_propagation(spark, base):
    nodes, ways, rels = base
    node_diff = spark.createDataFrame([(*_node(2, 51.0, 9.5), "modify")], DIFF_NODE_SCHEMA)
    new_nodes = apply_diff(nodes, node_diff)
    sets = affected_ids(node_diff, None, None, ways, rels)
    # node 2 is in ways 10 only
    assert {r["id"] for r in sets.pending_ways.collect()} == {10}
    # way 10 is member of relation 20
    assert {r["id"] for r in sets.pending_rels.collect()} == {20}
    assert {r["id"] for r in ways_to_recompute(sets).collect()} == {10}

    # recomputing way 10 from the new snapshot gives the moved geometry
    refs = ways.select(F.col("id").alias("way_id"), F.posexplode("refs").alias("pos", "ref"))
    nloc = new_nodes.select(F.col("id").alias("node_id"), "lon", "lat")
    a = assembly.assemble_points(refs, nloc).where(F.col("way_id") == 10)
    pts = a.collect()[0]["pts"]
    assert pytest.approx(pts[1]["x"]) == 9.5


def test_version1_creates_skip_propagation(spark, base):
    nodes, ways, rels = base
    node_diff = spark.createDataFrame(
        [(*_node(5, 52.0, 8.0, {}, 1), "create")], DIFF_NODE_SCHEMA
    )
    sets = affected_ids(node_diff, None, None, ways, rels)
    assert sets.pending_ways.count() == 0
    assert sets.pending_rels.count() == 0


def test_node_member_triggers_relation(spark, base):
    nodes, ways, rels = base
    node_diff = spark.createDataFrame([(*_node(4, 50.2, 9.0), "modify")], DIFF_NODE_SCHEMA)
    sets = affected_ids(node_diff, None, None, ways, rels)
    # node 4 in ways 11, 12; relation 21 has node 4 directly; relation 20 has way 11
    assert {r["id"] for r in sets.pending_ways.collect()} == {11, 12}
    assert {r["id"] for r in sets.pending_rels.collect()} == {20, 21}


def test_diff_then_recompute_equals_fresh_import(spark, base):
    """The reference's core update invariant."""
    nodes, ways, rels = base
    node_diff = spark.createDataFrame(
        [(*_node(2, 51.0, 9.5), "modify"), (*_node(1, 49.9, 8.9), "modify")],
        DIFF_NODE_SCHEMA,
    )
    way_diff = spark.createDataFrame([(*_way(11, [3, 4, 1]), "modify")], DIFF_WAY_SCHEMA)
    new_nodes = apply_diff(nodes, node_diff)
    new_ways = apply_diff(ways, way_diff)

    # incremental: recompute only affected ways
    sets = affected_ids(node_diff, way_diff, None, new_ways, rels)
    recompute = ways_to_recompute(sets)
    refs = new_ways.select(F.col("id").alias("way_id"), F.posexplode("refs").alias("pos", "ref"))
    nloc = new_nodes.select(F.col("id").alias("node_id"), "lon", "lat")
    all_assembled = assembly.assemble_points(refs, nloc)
    incr = all_assembled.join(
        recompute.withColumnRenamed("id", "way_id"), "way_id", "left_semi"
    )

    # fresh import of post-diff state, restricted to the same ways
    fresh = assembly.assemble_points(refs, nloc).join(
        recompute.withColumnRenamed("id", "way_id"), "way_id", "left_semi"
    )

    a = {r["way_id"]: [(p["x"], p["y"]) for p in r["pts"]] for r in incr.collect()}
    b = {r["way_id"]: [(p["x"], p["y"]) for p in r["pts"]] for r in fresh.collect()}
    assert a == b
    assert set(a) == {10, 11, 12}  # ways touching nodes 1,2 + changed way 11


DIFF_NODE_SEQ_SCHEMA = T.StructType(
    list(NODE_SCHEMA.fields)
    + [T.StructField("op", T.StringType()), T.StructField("op_seq", T.LongType())]
)


def test_apply_diff_multiop_last_wins(spark, base):
    """Duplicate ids within one diff: the LAST op in document order
    wins (create+modify collapses to one row; modify-then-delete stays
    deleted) — reference applies ops sequentially, src/osmdata.cpp:55-70."""
    nodes, _, _ = base
    node_diff = spark.createDataFrame(
        [
            (*_node(5, 52.0, 8.0, {}, 1), "create", 0),
            (*_node(5, 53.0, 8.5), "modify", 1),   # same id, later op
            (*_node(2, 51.0, 9.5), "modify", 2),
            (*_node(2, 0.0, 0.0), "delete", 3),     # modify then delete
        ],
        DIFF_NODE_SEQ_SCHEMA,
    )
    got = {r["id"]: (r["lat"], r["lon"]) for r in apply_diff(nodes, node_diff).collect()}
    assert set(got) == {1, 3, 4, 5}          # node 2 deleted, not resurrected
    assert got[5] == (53.0, 8.5)             # later modify wins over create
