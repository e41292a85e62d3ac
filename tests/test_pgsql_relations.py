"""pgsql relation-row semantics beyond plain multipolygons
(reference src/output-pgsql.cpp:239-321 + tagtransform-c.cpp:223-343):

- type=boundary -> BOTH merged line rows and polygon rows (boundaries
  render linearly for admin borders and as polygons for forests);
- type=multipolygon WITH a boundary tag is treated as a boundary;
- boundary=administrative joins the roads table;
- type=route -> line rows only;
- a type-only relation contributes nothing anywhere;
- style filtering: out-tags keep only style keys, empty -> skipped.
"""

import pytest
from pyspark.sql import functions as F

from osm2pgsql_spark.functions import geometry as G
from osm2pgsql_spark.model import NODE_SCHEMA, RELATION_SCHEMA, WAY_SCHEMA
from osm2pgsql_spark.plans.pgsql_compat import planet_osm_tables


@pytest.fixture()
def world(spark):
    n = lambda i, x, y: (i, y, x, {}, None, None, None, None, None, None)
    # a 0.2 x 0.2 square of nodes 1-4 (two half ways), plus a path 5-6
    nodes = spark.createDataFrame(
        [
            n(1, 9.0, 50.0), n(2, 9.2, 50.0), n(3, 9.2, 50.2), n(4, 9.0, 50.2),
            n(5, 8.0, 49.0), n(6, 8.1, 49.1),
        ],
        NODE_SCHEMA,
    )
    w = lambda i, refs, tags: (i, refs, tags, None, None, None, None, None, None)
    ways = spark.createDataFrame(
        [
            w(10, [1, 2, 3], {}),
            w(11, [3, 4, 1], {}),
            w(12, [5, 6], {}),
        ],
        WAY_SCHEMA,
    )
    r = lambda i, members, tags: (i, members, tags, None, None, None, None, None, None)
    rels = spark.createDataFrame(
        [
            # admin boundary: line + roads + polygon
            r(100, [("w", 10, "outer"), ("w", 11, "outer")],
              {"type": "boundary", "boundary": "administrative", "name": "B"}),
            # multipolygon with a boundary tag -> boundary treatment
            r(101, [("w", 10, "outer"), ("w", 11, "outer")],
              {"type": "multipolygon", "boundary": "national_park", "name": "P"}),
            # route: line only
            r(102, [("w", 12, "")], {"type": "route", "route": "bicycle", "name": "R"}),
            # type-only: skipped entirely
            r(103, [("w", 10, "outer"), ("w", 11, "outer")], {"type": "multipolygon"}),
            # no style tag survives the filter: skipped
            r(104, [("w", 10, "outer"), ("w", 11, "outer")],
              {"type": "multipolygon", "random_tag": "x", "fixme": "y"}),
        ],
        RELATION_SCHEMA,
    )
    return nodes, ways, rels


def test_boundary_route_relation_rows(spark, world):
    nodes, ways, rels = world
    t = planet_osm_tables(nodes, ways, relations=rels)

    polys = {r["osm_id"]: r for r in t["planet_osm_polygon"].collect()}
    assert set(polys) == {-100, -101}
    for oid, name in ((-100, "B"), (-101, "P")):
        assert polys[oid]["name"] == name
        assert polys[oid]["way_area"] == pytest.approx(0.04, rel=1e-6)
        assert G.from_wkb(bytes(polys[oid]["way"]))[0] == "polygon"

    lines = {r["osm_id"]: r for r in t["planet_osm_line"].collect()}
    assert set(lines) == {-100, -101, -102}
    assert lines[-102]["name"] == "R"
    # boundary line rows are the merged member lines, one row per
    # split part (here: a single closed ring -> one LINESTRING row)
    kind, pts = G.from_wkb(bytes(lines[-100]["way"]))
    assert kind == "linestring" and pts.shape[0] == 5

    roads = {r["osm_id"] for r in t["planet_osm_roads"].collect()}
    assert roads == {-100}  # administrative only
