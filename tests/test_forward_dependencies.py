"""Forward change propagation through the pgsql pipeline
(/root/reference/tests/bdd/regression/forward_dependencies.feature):
a moved node must surface in the geometry of the way using it, and a
member-way rewrite that opens a relation's only ring must drop the
relation polygon — while untouched objects keep rendering.  The
Spark engine rebuilds tables from the folded snapshot, so forward
propagation is the recompute itself; these assertions pin that the
fold + rebuild reach the same final state as the reference's
dependency-tracked incremental update."""

import numpy as np
from pyspark.sql import functions as F

from osm2pgsql_spark.functions import geometry as G
from osm2pgsql_spark.plans.pgsql_compat import planet_osm_tables
from osm2pgsql_spark.sources.opl import read_opl
from osm2pgsql_spark.streaming.append import apply_diff

BASE = """
n10 v1 dV x1.0 y1.0
n11 v1 dV x1.0 y2.0
n12 v1 dV Tnatural=tree x2.0 y2.0
n13 v1 dV x3.0 y3.0
n14 v1 dV x3.1 y3.1
n15 v1 dV x0.0 y0.0
n16 v1 dV x0.0 y0.1
n17 v1 dV x0.1 y0.1
w20 v1 dV Tlanduse=forest Nn10,n11,n12,n10
w21 v1 dV Thighway=primary Nn13,n14
w22 v1 dV Nn15,n16
w23 v1 dV Nn16,n17,n15
r30 v1 dV Ttype=multipolygon,natural=water Mw22@,w23@
"""

DIFF = """
n13 v2 dV x3.1 y3.0
w23 v2 dV Nn16,n17
"""


def _op():
    return (
        F.when(~F.coalesce(F.col("visible"), F.lit(True)), F.lit("delete"))
        .when(F.col("version") == 1, F.lit("create"))
        .otherwise(F.lit("modify"))
    )


def test_forward_dependencies(spark):
    nodes, ways, rels = read_opl(spark, BASE.strip().splitlines())
    t = planet_osm_tables(nodes, ways, relations=rels)
    # import state: r30's two ways close a ring -> polygon -30 exists
    assert {r["osm_id"] for r in t["planet_osm_polygon"].collect()} == {20, -30}

    dn, dw, dr = read_opl(spark, DIFF.strip().splitlines())
    nodes2 = apply_diff(nodes, dn.withColumn("op", _op()))
    ways2 = apply_diff(ways, dw.withColumn("op", _op()))
    rels2 = apply_diff(rels, dr.withColumn("op", _op()))
    t2 = planet_osm_tables(nodes2, ways2, relations=rels2)

    points = {r["osm_id"] for r in t2["planet_osm_point"].collect()}
    assert points == {12}
    lines = t2["planet_osm_line"].select("osm_id", "way").collect()
    assert {r["osm_id"] for r in lines} == {21}
    # the moved node propagated into way 21's geometry
    pts = G.from_wkb(bytes(lines[0]["way"]))[1]
    assert round(float(pts[0][0]), 1) == 3.1 and round(float(pts[0][1]), 1) == 3.0
    roads = {r["osm_id"] for r in t2["planet_osm_roads"].collect()}
    assert roads == {21}
    # w23 v2 no longer returns to n15: r30's ring is open -> dropped
    polys = {r["osm_id"] for r in t2["planet_osm_polygon"].collect()}
    assert polys == {20}
