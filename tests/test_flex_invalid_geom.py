"""Broken-geometry tolerance scenarios from the reference BDD suite
(/root/reference/tests/bdd/flex/{invalid-geometries,missing-nodes}
.feature): ways referencing unknown nodes keep their resolved subset,
degenerate lines/rings drop to NULL geometry (filtered by not_null
tables), self-intersecting rings are rejected, and broken relation
multipolygons vanish while intact ones survive."""

import numpy as np
from pyspark.sql import functions as F

from osm2pgsql_spark.functions import geometry as G
from osm2pgsql_spark.plans.flex import ColumnDef, FlexConfig
from osm2pgsql_spark.sources.opl import grid_nodes, read_opl


def _run_ways(spark, lines):
    nodes, ways, rels = read_opl(spark, lines)
    cfg = FlexConfig()
    cfg.define_table(
        "line_t", ids="way",
        columns=[ColumnDef("geom", "linestring", not_null=True)],
    )
    cfg.define_table(
        "poly_t", ids="way",
        columns=[ColumnDef("geom", "geometry", not_null=True)],
    )

    def way_cb(obj):
        if obj["tags"].get("natural"):
            yield "poly_t", {"geom": obj["geom_poly"]}
        else:
            yield "line_t", {"geom": obj["geom_line"]}

    cfg.process("way", way_cb)
    return cfg.run(nodes=nodes, ways=ways, relations=rels)


def test_invalid_way_geometry_ignored(spark):
    """Ways with unknown / duplicate / single nodes: the resolved
    subset renders when >=2 distinct locations remain, everything else
    drops (invalid-geometries.feature scenario 1)."""
    grid = grid_nodes("""
        .  12
        10 11
    """)
    data = [
        "n14 v1 dV x9.0 y50.2",  # same location as n10
        "w20 v1 dV Thighway=primary,state=okay Nn10,n12",
        "w21 v1 dV Thighway=primary,state=unknown_node Nn10,n12,n13",
        "w22 v1 dV Thighway=primary,state=unknown_node_single Nn10,n13",
        "w23 v1 dV Thighway=primary,state=single_node Nn10",
        "w24 v1 dV Thighway=primary,state=double_node Nn10,n10",
        "w25 v1 dV Thighway=primary,state=double_location Nn10,n14",
    ]
    t = _run_ways(spark, grid + data)
    assert t["poly_t"].count() == 0
    lines = {r["osm_id"]: r for r in t["line_t"].collect()}
    assert set(lines) == {20, 21}
    # both render the 2-point 10->12 diagonal
    for oid in (20, 21):
        pts = G.from_wkb(bytes(lines[oid]["geom"]))[1]
        assert pts.shape[0] == 2


def test_invalid_area_from_way_ignored(spark):
    """Closed-ring tolerance: missing interior node still closes,
    overshot ring and unclosed ring drop
    (invalid-geometries.feature scenario 2)."""
    grid = grid_nodes("""
        10 11
        .  12
    """)
    data = [
        "w20 v1 dV Tnatural=wood,state=okay Nn10,n11,n12,n10",
        "w21 v1 dV Tnatural=wood,state=unknown_node Nn10,n11,n12,n13,n10",
        "w22 v1 dV Tnatural=wood,state=duplicate_segment Nn10,n11,n12,n10,n11",
        "w23 v1 dV Tnatural=wood,state=unclosed_ring Nn10,n11,n12",
    ]
    t = _run_ways(spark, grid + data)
    assert t["line_t"].count() == 0
    polys = {r["osm_id"] for r in t["poly_t"].collect()}
    assert polys == {20, 21}


def test_self_intersecting_area_ignored(spark):
    """The bowtie ring produces nothing in either table
    (invalid-geometries.feature scenario 3)."""
    grid = grid_nodes("""
        10 12
        11 13
    """)
    data = ["w20 v1 dV Tnatural=wood Nn10,n11,n12,n13,n10"]
    t = _run_ways(spark, grid + data)
    assert t["line_t"].count() == 0
    assert t["poly_t"].count() == 0


def test_invalid_relation_multipolygon_ignored(spark):
    """Unclosed / missing-member relation areas drop; the intact
    two-way ring survives (invalid-geometries.feature scenario 4)."""
    grid = grid_nodes("""
        10 11
        13 12
    """)
    data = [
        "w20 v1 dV Nn10,n11,n12",
        "w21 v1 dV Nn12,n13,n10",
        "r30 v1 dV Ttype=multipolygon,landuse=forest,state=okay Mw20@,w21@",
        "r31 v1 dV Ttype=multipolygon,landuse=forest,state=not_closed Mw20@",
        "r32 v1 dV Ttype=multipolygon,landuse=forest,state=missing_way Mw20@,w22@",
    ]
    nodes, ways, rels = read_opl(spark, grid + data)
    cfg = FlexConfig()
    cfg.define_table(
        "poly_t", ids="area",
        columns=[
            ColumnDef("landuse", "text"),
            ColumnDef("geom", "multipolygon", not_null=True),
        ],
    )
    cfg.insert(
        "poly_t",
        "relation",
        when=F.col("tags")["type"] == "multipolygon",
        landuse=F.col("tags")["landuse"],
    )
    t = cfg.run(nodes=nodes, ways=ways, relations=rels)
    assert {r["osm_id"] for r in t["poly_t"].collect()} == {-30}


def test_missing_nodes_keep_resolved_subset(spark):
    """missing-nodes.feature: a way referencing absent nodes renders
    from the nodes that do resolve."""
    lines = [
        "n10 v1 dV x10.0 y10.0",
        "n11 v1 dV x10.0 y11.0",
        "w20 v1 dV Thighway=primary Nn10,n11,n12,n13",
    ]
    t = _run_ways(spark, lines)
    rows = t["line_t"].collect()
    assert len(rows) == 1
    pts = G.from_wkb(bytes(rows[0]["geom"]))[1]
    assert pts.shape[0] == 2 and np.allclose(pts[:, 1], [10.0, 11.0])
