"""Flex DSL end-to-end on the FIXTURES.md F1/F2/F3 mini-fixtures
(mirrors reference BDD features tests/bdd/flex/area.feature etc.)."""

import math

import pytest
from pyspark.sql import functions as F

from osm2pgsql_spark.functions import geometry as G
from osm2pgsql_spark.model import NODE_SCHEMA, WAY_SCHEMA
from osm2pgsql_spark.plans.flex import ColumnDef, FlexConfig


@pytest.fixture()
def fixture_dfs(spark):
    # grid origin (9.0, 50.3), 0.1 deg cells — area.feature:3-7 style
    def n(i, dx, dy, tags=None):
        return (i, 50.3 + 0.1 * dy, 9.0 + 0.1 * dx, tags or {}, None, None, None, None, None, None)

    nodes = spark.createDataFrame(
        [
            n(1, 0, 0, {"amenity": "restaurant", "name": "N1"}),
            n(2, 1, 0),
            n(3, 1, 1),
            n(4, 0, 1),
            n(5, 3, 3, {"amenity": "cafe", "name": "N5"}),
            n(10, 5, 5),
            n(11, 6, 5),
            n(12, 6, 6),
        ],
        NODE_SCHEMA,
    )
    ways = spark.createDataFrame(
        [
            # closed square natural=water (F3)
            (100, [1, 2, 3, 4, 1], {"natural": "water", "name": "poly"}, None, None, None, None, None, None),
            # open highway (F2)
            (101, [10, 11, 12], {"highway": "primary"}, None, None, None, None, None, None),
            # way with missing node ref (skip-missing semantics)
            (102, [10, 999, 11], {"highway": "service"}, None, None, None, None, None, None),
            # single resolvable node -> null geometry
            (103, [10, 998], {"highway": "path"}, None, None, None, None, None, None),
        ],
        WAY_SCHEMA,
    )
    return nodes, ways


def test_flex_points_lines_polygons(spark, fixture_dfs):
    nodes, ways = fixture_dfs
    cfg = FlexConfig()
    cfg.define_table(
        "points",
        ids="node",
        columns=[
            ColumnDef("name", "text"),
            ColumnDef("geom", "point", srid=3857, not_null=True),
        ],
    )
    cfg.define_table(
        "lines",
        ids="way",
        columns=[
            ColumnDef("highway", "text"),
            ColumnDef("geom", "linestring", srid=4326, not_null=True),
        ],
    )
    cfg.define_table(
        "areas",
        ids="area",
        columns=[
            ColumnDef("name", "text"),
            ColumnDef("geom", "polygon", srid=4326, not_null=True),
        ],
    )

    cfg.insert(
        "points",
        "node",
        when=F.size("tags") > 0,
        name=F.col("tags")["name"],
    )
    cfg.insert(
        "lines",
        "way",
        when=F.col("tags")["highway"].isNotNull(),
        highway=F.col("tags")["highway"],
    )
    cfg.insert(
        "areas",
        "way",
        when=F.col("tags")["natural"] == "water",
        name=F.col("tags")["name"],
    )

    out = cfg.run(nodes=nodes, ways=ways)

    pts = {r["osm_id"]: r for r in out["points"].collect()}
    assert set(pts) == {1, 5}  # untagged nodes dropped
    g1 = G.from_wkb(pts[1]["geom"])
    assert g1[0] == "point"
    # 3857 x of lon 9.0
    assert g1[1][0] == pytest.approx(9.0 * math.pi / 180 * G.EARTH_RADIUS)
    assert pts[1]["name"] == "N1"

    lines = {r["osm_id"]: r for r in out["lines"].collect()}
    # way 103 has only 1 resolvable node -> null geom -> dropped (not_null)
    assert set(lines) == {101, 102}
    g101 = G.from_wkb(lines[101]["geom"])
    assert g101[0] == "linestring" and g101[1].shape[0] == 3
    # way 102: missing node 999 silently skipped -> 2 points
    g102 = G.from_wkb(lines[102]["geom"])
    assert g102[1].shape[0] == 2

    areas = {r["osm_id"]: r for r in out["areas"].collect()}
    assert set(areas) == {100}  # ways keep +id in area tables
    g100 = G.from_wkb(areas[100]["geom"])
    assert g100[0] == "polygon"
    assert G.area(g100) == pytest.approx(0.01, rel=1e-6)  # 0.1 x 0.1 cell


def test_flex_cast_semantics(spark):
    # F10-style: flex-write.cpp cast semantics via tag values
    nodes = spark.createDataFrame(
        [
            (1, 0.0, 0.0, {"b": "yes", "d": "-1", "i": "42", "big": "99999999999999999999"},
             None, None, None, None, None, None),
            (2, 0.0, 0.0, {"b": "maybe", "d": "yes", "i": "3.5", "big": "7"},
             None, None, None, None, None, None),
        ],
        NODE_SCHEMA,
    )
    cfg = FlexConfig()
    cfg.define_table(
        "t",
        ids="node",
        columns=[
            ColumnDef("b", "boolean"),
            ColumnDef("d", "direction"),
            ColumnDef("i", "int4"),
            ColumnDef("big", "int8"),
        ],
    )
    cfg.insert(
        "t",
        "node",
        b=F.col("tags")["b"],
        d=F.col("tags")["d"],
        i=F.col("tags")["i"],
        big=F.col("tags")["big"],
    )
    rows = {r["osm_id"]: r for r in cfg.run(nodes=nodes)["t"].collect()}
    assert rows[1]["b"] is True
    assert rows[1]["d"] == -1
    assert rows[1]["i"] == 42
    assert rows[1]["big"] is None  # int8 overflow -> NULL
    assert rows[2]["b"] is None  # unrecognized -> NULL
    assert rows[2]["d"] == 1  # "yes" -> 1
    assert rows[2]["i"] is None  # "3.5" not an integer literal
    assert rows[2]["big"] == 7


def test_flex_relation_multipolygon_and_tile_ids(spark, fixture_dfs):
    """Relation-kind rules assemble real geometry (as_multipolygon,
    reference src/output-flex.cpp:453-606) and the `tile` id scheme
    emits x/y columns (flex-table.hpp:40-49)."""
    from osm2pgsql_spark.model import RELATION_SCHEMA
    from osm2pgsql_spark.operators import geom_udfs

    nodes, ways = fixture_dfs
    # two ways forming a closed square: (1,2,3) + (3,4,1)
    ways2 = ways.union(
        spark.createDataFrame(
            [
                (200, [1, 2, 3], {}, None, None, None, None, None, None),
                (201, [3, 4, 1], {}, None, None, None, None, None, None),
            ],
            ways.schema,
        )
    )
    rels = spark.createDataFrame(
        [
            (
                300,
                [("w", 200, "outer"), ("w", 201, "outer")],
                {"type": "multipolygon", "landuse": "forest"},
                None, None, None, None, None, None,
            )
        ],
        RELATION_SCHEMA,
    )
    cfg = FlexConfig()
    cfg.define_table(
        "areas",
        ids="relation",
        columns=[
            ColumnDef("landuse", "text"),
            ColumnDef("geom", "multipolygon", not_null=True),
        ],
    )
    cfg.insert(
        "areas",
        "relation",
        when=F.col("tags")["type"] == "multipolygon",
        landuse=F.col("tags")["landuse"],
    )
    out = cfg.run(nodes=nodes, ways=ways2, relations=rels)["areas"]
    rows = out.select(
        "osm_id", "landuse",
        geom_udfs.wkb_num_geometries(F.col("geom")).alias("np"),
        geom_udfs.wkb_area(F.col("geom")).alias("area"),
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.osm_id, r.landuse, r.np) == (300, "forest", 1)
    assert math.isclose(r.area, 0.1 * 0.1, rel_tol=1e-9)

    # tile id scheme: x/y emitted from rule values
    cfg2 = FlexConfig()
    cfg2.define_table(
        "tiles",
        ids="tile",
        columns=[ColumnDef("n_ways", "int4")],
    )
    cfg2.insert(
        "tiles",
        "way",
        x=F.col("id") % 8,
        y=F.col("id") % 4,
        n_ways=F.lit("1"),
    )
    t = cfg2.run(nodes=nodes, ways=ways2).get("tiles")
    assert t is not None
    assert set(t.columns) == {"x", "y", "n_ways"}
    assert t.count() == 6


def test_flex_describe_debug_output():
    """taginfo/debug output (src/debug-output.cpp): the config dumps
    to a structured, json-serializable description."""
    import json

    cfg = FlexConfig()
    cfg.define_expire_output("exp", maxzoom=14, minzoom=10)
    cfg.define_table(
        "pois",
        ids="node",
        columns=[
            ColumnDef("name", "text", not_null=True),
            ColumnDef("geom", "point", srid=3857, expire="exp"),
        ],
    )
    cfg.insert("pois", "node", when=F.col("tags")["amenity"].isNotNull(),
               name=F.col("tags")["name"])
    d = cfg.describe()
    assert d["tables"][0]["name"] == "pois"
    assert d["tables"][0]["ids"] == "node"
    cols = {c["name"]: c for c in d["tables"][0]["columns"]}
    assert cols["name"]["not_null"] is True
    assert cols["geom"]["srid"] == 3857 and cols["geom"]["expire"] == "exp"
    assert d["expire_outputs"] == [
        {"name": "exp", "zoom": "10-14", "mode": "full_area", "buffer": 0.1}
    ]
    assert d["rules"][0] == {
        "table": "pois", "kind": "node", "filtered": True, "values": ["name"]
    }
    # round-trips through json
    assert json.loads(cfg.describe_json()) == json.loads(cfg.describe_json())


def test_flex_two_stage_route_refs(spark, fixture_dfs):
    """select_relation_members integration: route relations push their
    refs onto member ways, which see them (plus osm2pgsql.stage) during
    way-rule evaluation (reference src/output-flex.cpp:337-377 marks +
    :1506-1613 stage-2 reprocess)."""
    from osm2pgsql_spark.model import RELATION_SCHEMA

    nodes, ways = fixture_dfs
    rels = spark.createDataFrame(
        [
            (
                400,
                [("w", 101, ""), ("w", 102, "")],
                {"type": "route", "route": "bicycle", "ref": "R4"},
                None, None, None, None, None, None,
            ),
            (
                401,
                [("w", 101, "")],
                {"type": "route", "route": "bicycle", "ref": "R1"},
                None, None, None, None, None, None,
            ),
            (
                402,
                [("w", 103, "")],
                {"type": "road", "ref": "IGNORED"},
                None, None, None, None, None, None,
            ),
        ],
        RELATION_SCHEMA,
    )

    cfg = FlexConfig()
    cfg.define_table(
        "routes",
        ids="way",
        columns=[
            ColumnDef("highway", "text"),
            ColumnDef("rel_refs", "text"),
            ColumnDef("stage", "int4"),
        ],
    )
    cfg.select_relation_members(
        when=F.col("tags")["type"] == "route", ref=F.col("tags")["ref"]
    )
    cfg.insert(
        "routes",
        "way",
        when=F.col("tags")["highway"].isNotNull(),
        highway=F.col("tags")["highway"],
        rel_refs=F.col("ref"),
        stage=F.col("stage"),
    )
    out = cfg.run(nodes=nodes, ways=ways, relations=rels)["routes"]
    rows = {r["osm_id"]: r for r in out.collect()}

    assert rows[101]["stage"] == 2 and rows[101]["rel_refs"] == "R1,R4"
    assert rows[102]["stage"] == 2 and rows[102]["rel_refs"] == "R4"
    # way 103 is a member only of a non-route relation: stage 1, no refs
    assert rows[103]["stage"] == 1 and rows[103]["rel_refs"] is None
    assert "two_stage" in cfg.describe()


def test_flex_python_callback_general_path(spark, fixture_dfs):
    """process() — arbitrary Python callbacks (the Lua UDF surface's
    general path, src/output-flex.cpp:1469-1501): branching logic,
    multi-row + multi-table inserts, geometry pass-through."""
    nodes, ways = fixture_dfs
    cfg = FlexConfig()
    cfg.define_table(
        "poi",
        ids="node",
        columns=[
            ColumnDef("kind", "text"),
            ColumnDef("geom", "point", not_null=True),
        ],
    )
    cfg.define_table(
        "tag_rows",
        ids="any_object",
        columns=[ColumnDef("key", "text"), ColumnDef("val", "text")],
    )

    def handle_node(obj):
        if "amenity" in obj["tags"]:
            yield "poi", {"kind": obj["tags"]["amenity"], "geom": obj["geom_point"]}
            for k, v in sorted(obj["tags"].items()):
                yield "tag_rows", {"key": k, "val": v}

    def handle_way(obj):
        if obj["tags"].get("highway") and obj["geom_line"] is not None:
            yield "tag_rows", {"key": "highway", "val": obj["tags"]["highway"]}

    cfg.process("node", handle_node)
    cfg.process("way", handle_way)
    out = cfg.run(nodes=nodes, ways=ways)

    poi = {r["osm_id"]: r for r in out["poi"].collect()}
    assert set(poi) == {1, 5}
    assert poi[1]["kind"] == "restaurant" and poi[1]["geom"] is not None
    from osm2pgsql_spark.functions import geometry as G

    assert G.from_wkb(bytes(poi[5]["geom"]))[1] == pytest.approx((9.3, 50.6))

    tr = [(r["osm_type"], r["key"], r["val"]) for r in out["tag_rows"].collect()]
    # node 1 contributes 2 tag rows, node 5 contributes 2, highway
    # ways 101 (primary), 102 (service, unresolvable ref dropped ->
    # geom_line still built from 2 resolved pts), 103 (single pt ->
    # geom None -> skipped)
    assert ("n", "amenity", "restaurant") in tr
    assert ("n", "name", "N5") in tr
    assert ("w", "highway", "primary") in tr
    assert ("w", "highway", "service") in tr
    assert ("w", "highway", "path") not in tr


def test_flex_callback_hstore_column(spark, fixture_dfs):
    """Callback dict values land in hstore (map) columns."""
    nodes, ways = fixture_dfs
    cfg = FlexConfig()
    cfg.define_table(
        "tagged",
        ids="node",
        columns=[ColumnDef("tags", "hstore")],
    )

    def node(obj):
        if obj["tags"]:
            yield "tagged", {"tags": obj["tags"]}

    cfg.process("node", node)
    out = {r["osm_id"]: r["tags"] for r in cfg.run(nodes=nodes)["tagged"].collect()}
    assert out[1] == {"amenity": "restaurant", "name": "N1"}


def test_flex_callback_json_column_and_unknown_table(spark, fixture_dfs):
    """json columns pass the serialized dict through; inserting into an
    undefined table raises instead of silently dropping rows."""
    nodes, _ways = fixture_dfs
    cfg = FlexConfig()
    cfg.define_table("j", ids="node", columns=[ColumnDef("props", "json")])

    def node(obj):
        if obj["tags"]:
            yield "j", {"props": obj["tags"]}

    cfg.process("node", node)
    rows = {r["osm_id"]: r["props"] for r in cfg.run(nodes=nodes)["j"].collect()}
    import json

    assert json.loads(rows[1]) == {"amenity": "restaurant", "name": "N1"}

    bad = FlexConfig()
    bad.define_table("j", ids="node", columns=[ColumnDef("props", "json")])
    bad.process("node", lambda obj: [("typo_table", {"props": "x"})])
    with pytest.raises(Exception, match="undefined table"):
        bad.run(nodes=nodes)["j"].collect()


def test_flex_callback_node_without_location(spark, fixture_dfs):
    """ADVICE r2: visible=False / deleted nodes carry NULL lon/lat —
    the callback mapper must hand the function a None geom_point
    instead of crashing on float(None)."""
    nodes, _ = fixture_dfs
    from pyspark.sql import functions as F

    nodes_nl = nodes.withColumn(
        "lon", F.when(F.col("id") == 1, F.lit(None).cast("double")).otherwise(F.col("lon"))
    ).withColumn(
        "lat", F.when(F.col("id") == 1, F.lit(None).cast("double")).otherwise(F.col("lat"))
    )
    cfg = FlexConfig()
    cfg.define_table(
        "poi",
        ids="node",
        columns=[ColumnDef("kind", "text"), ColumnDef("geom", "point", not_null=True)],
    )

    seen_none = []

    def handle_node(obj):
        if obj["geom_point"] is None:
            seen_none.append(obj["id"])
            return
        if "amenity" in obj["tags"]:
            yield "poi", {"kind": obj["tags"]["amenity"], "geom": obj["geom_point"]}

    cfg.process("node", handle_node)
    out = cfg.run(nodes=nodes_nl)
    ids = {r["osm_id"] for r in out["poi"].collect()}
    assert 1 not in ids  # location-less node dropped, no crash
    assert 5 in ids
