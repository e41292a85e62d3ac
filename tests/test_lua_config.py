"""Lua flex-config reader (plans/lua_config.py): the declarative
compatibility subset over the reference's own flex-config examples
(/root/reference/flex-config/*.lua) — parse fidelity, honest rejection
of procedural configs, and end-to-end table equality between
generic.lua and the Python-DSL twin (examples/generic_import.py)."""

import os
import tempfile

import pytest

from osm2pgsql_spark.plans.lua_config import (
    LuaConfigError,
    load_lua_config,
    parse_lua_config,
)

FLEX = "/root/reference/flex-config"


class TestDeclarativeParse:
    def test_generic_tables(self):
        m = parse_lua_config(open(f"{FLEX}/generic.lua").read())
        names = [(t.name, t.kind) for t in m.tables]
        assert names == [
            ("points", "node"), ("lines", "way"), ("polygons", "area"),
            ("routes", "relation"), ("boundaries", "relation"),
        ]
        # local srid = 3857 substituted into every geom column
        for t in m.tables:
            geoms = [c for c in t.columns if c.column == "geom"]
            assert geoms and geoms[0].projection == 3857
            assert geoms[0].not_null
        assert len(m.delete_keys) == 66 and "note:*" in m.delete_keys
        assert m.clean_guard
        assert "building:part" in m.area_keys and len(m.area_keys) == 27

    def test_generic_callbacks(self):
        m = parse_lua_config(open(f"{FLEX}/generic.lua").read())
        assert [(i.table_var, i.geometry) for i in m.node_inserts] == [
            ("tables.points", "as_point")]
        assert [(i.table_var, i.geometry) for i in m.way_inserts] == [
            ("tables.polygons", "as_polygon"), ("tables.lines", "as_linestring")]
        assert [(i.table_var, i.geometry, i.line_merge)
                for i in m.relation_inserts] == [
            ("tables.routes", "as_multilinestring", False),
            ("tables.boundaries", "as_multilinestring", True),
            ("tables.polygons", "as_multipolygon", False),
        ]

    def test_simple_lua_parses(self):
        m = parse_lua_config(open(f"{FLEX}/simple.lua").read())
        assert {t.name for t in m.tables} == {
            "pois", "restaurants", "ways", "polygons"}
        # restaurant branch: condition + scalar tag values
        rest = [i for i in m.node_inserts if i.table_var == "tables.restaurants"]
        assert rest and rest[0].values["name"] == ("tag", "name")
        assert rest[0].values["cuisine"] == ("tag", "cuisine")

    def test_expire_lua_parses_expire_outputs(self):
        m = parse_lua_config(open(f"{FLEX}/expire.lua").read())
        eos = {e.var: e for e in m.expire_outputs}
        assert eos["expire_outputs.pois"].maxzoom == 14
        assert eos["expire_outputs.pois"].filename == "pois.tiles"
        assert eos["expire_outputs.polygons"].minzoom == 10
        # the column carries the expire wiring
        pois = next(t for t in m.tables if t.name == "pois")
        geom = next(c for c in pois.columns if c.column == "geom")
        assert geom.expire == "expire_outputs.pois"

    def test_declarative_sweep(self):
        """Every config that is declarative-shape parses; procedural
        ones fail with a clear LuaConfigError (honest boundary)."""
        ok, err = [], []
        for fn in sorted(os.listdir(FLEX)):
            if not fn.endswith(".lua"):
                continue
            try:
                parse_lua_config(open(os.path.join(FLEX, fn)).read())
                ok.append(fn)
            except LuaConfigError:
                err.append(fn)
        assert set(ok) >= {
            "generic.lua", "simple.lua", "expire.lua", "untagged.lua",
            "unitable.lua", "track-changes.lua", "with-schema.lua",
            "labelpoint.lua",
        }
        # procedural configs are rejected, not silently misread
        assert "bbox.lua" in err and "places.lua" in err

    def test_unknown_config_raises(self):
        with pytest.raises(LuaConfigError):
            load_lua_config("function f() while true do end end")

    def test_elseif_branch_conditions(self):
        """ADVICE r6 (high): elseif branches must carry their own
        condition AND the negation of earlier branches — indexes.lua's
        post_box insert used to inherit the pub condition."""
        m = parse_lua_config(open(f"{FLEX}/indexes.lua").read())
        conds = {i.table_var: i.condition for i in m.node_inserts}
        assert conds["tables.pois"] is None
        pub = conds["tables.pubs"]
        assert pub.op == "atom" and pub.atom.value == "pub"
        pb = conds["tables.postboxes"]
        assert pb.op == "and"
        assert pb.args[0].op == "not"
        assert pb.args[0].args[0].atom.value == "pub"
        assert pb.args[1].atom.value == "post_box"

    def test_nested_if_rejected_not_misread(self):
        """ADVICE r6 (high): an insert under a nested if must not be
        compiled with only the outer condition."""
        src = """
local t = osm2pgsql.define_node_table('t', {
    { column = 'name', type = 'text' },
})
function osm2pgsql.process_node(object)
    if object.tags.amenity then
        if object.tags.name then
            t:insert({ name = object.tags.name })
        end
    end
end
"""
        with pytest.raises(LuaConfigError, match="nested if"):
            parse_lua_config(src)

    def test_long_loop_header_do(self):
        """ADVICE r6 (low): a for-header longer than the old 40-char
        lookbehind must still pair with its `do`."""
        src = """
local t = osm2pgsql.define_node_table('t', {
    { column = 'name', type = 'text' },
})
function osm2pgsql.process_node(object)
    for extremely_long_variable_name_way_past_forty in some_extremely_long_iterator_expression_name(object) do
        x = 1
    end
    t:insert({ name = object.tags.name })
end
"""
        m = parse_lua_config(src)
        assert len(m.node_inserts) == 1


OPL = """n1 Tamenity=pub,name=A x9.0 y50.0
n2 x9.001 y50.0
n3 x9.001 y50.001
n4 x9.0 y50.001
n5 Tcreated_by=JOSM x9.1 y50.1
n10 Thighway=bus_stop x9.2 y50.2
w100 Thighway=residential Nn1,n2
w101 Tnatural=water Nn1,n2,n3,n4,n1
w102 Thighway=pedestrian Nn1,n2,n3,n4,n1
w103 Thighway=pedestrian,area=yes Nn1,n2,n3,n4,n1
w104 Tbuilding=yes,area=no Nn1,n2,n3,n4,n1
w105 Tsource=bing Nn1,n2
r200 Ttype=route,route=bus Mw100@
r201 Ttype=boundary,admin_level=2 Mw100@,w105@
r202 Ttype=multipolygon,boundary=administrative Mw101@outer
r203 Ttype=multipolygon,landuse=forest Mw101@outer
r204 Ttype=multipolygon Mw101@outer
"""


@pytest.fixture(scope="module")
def fixture_tables(spark):
    from examples.generic_import import generic_import
    from osm2pgsql_spark.sources.opl import read_opl

    with tempfile.NamedTemporaryFile("w", suffix=".opl", delete=False) as fh:
        fh.write(OPL)
        path = fh.name
    nodes, ways, rels = read_opl(spark, path)
    twin = generic_import(spark, nodes, ways, rels)
    cfg, model = load_lua_config(f"{FLEX}/generic.lua")
    lua = cfg.run(nodes=nodes, ways=ways, relations=rels)
    return twin, lua


class TestGenericLuaEndToEnd:
    @pytest.mark.parametrize(
        "table", ["points", "lines", "polygons", "routes", "boundaries"])
    def test_lua_matches_python_twin(self, fixture_tables, table):
        """flex-config/generic.lua drives the import and lands exactly
        the Python-DSL twin's rows (full contents incl. WKB)."""
        twin, lua = fixture_tables
        a = sorted(tuple(r) for r in twin[table].collect())
        b = sorted(tuple(r) for r in lua[table].collect())
        assert a == b

    def test_branch_routing(self, fixture_tables):
        """The generic.lua branch semantics land the right objects."""
        _, lua = fixture_tables
        ids = {t: sorted(r.osm_id for r in lua[t].collect())
               for t in ("points", "lines", "polygons", "routes", "boundaries")}
        assert ids["points"] == [1, 10]          # junk-only n5 cleaned away
        assert ids["lines"] == [100, 102, 104]   # open / closed-no-area / area=no
        # closed+area ways positive, multipolygon relation negative;
        # type-only r204 skipped (grab_tag empties it)
        assert ids["polygons"] == [-203, 101, 103]
        assert ids["routes"] == [200]
        assert ids["boundaries"] == [201, 202]   # boundary + mp-with-boundary


GEOM_OPL = """n1 Tamenity=pub,name=A x9.0 y50.0
n2 x9.001 y50.0
n3 x9.001 y50.001
n4 x9.0 y50.001
n5 x9.0 y52.5
w100 Thighway=residential Nn1,n2
w101 Tnatural=water Nn1,n2,n3,n4,n1
w102 Thighway=track Nn1,n5
r200 Ttype=multipolygon,landuse=forest Mw101@outer
r201 Ttype=boundary,boundary=administrative Mw100@
"""


@pytest.fixture(scope="module")
def geom_fixture(spark):
    from osm2pgsql_spark.sources.opl import read_opl

    with tempfile.NamedTemporaryFile("w", suffix=".opl", delete=False) as fh:
        fh.write(GEOM_OPL)
        path = fh.name
    return read_opl(spark, path)


class TestGeometryChains:
    """Round-6 extension: local geometry variables, is_null()
    fallbacks, method chains, and geometries() loops — hstore.lua and
    geometries.lua drive imports end-to-end."""

    def test_hstore_polygon_fallback(self, spark, geom_fixture):
        from osm2pgsql_spark.functions import geometry as G

        nodes, ways, rels = geom_fixture
        cfg, _m = load_lua_config(f"{FLEX}/hstore.lua")
        out = cfg.run(nodes=nodes, ways=ways, relations=rels)
        kinds = {r.osm_id: G.from_wkb(bytes(r.geom))[0]
                 for r in out["ways"].collect()}
        # closed way -> polygon; open ways fall back to linestring
        assert kinds[101] == "polygon"
        assert kinds[100] == "linestring" and kinds[102] == "linestring"
        # untagged nodes never reach process_node (implicit guard)
        assert {r.osm_id for r in out["nodes"].collect()} == {1}

    def test_geometries_lua_scalar_chains(self, spark, geom_fixture):
        import math

        nodes, ways, rels = geom_fixture
        cfg, _m = load_lua_config(f"{FLEX}/geometries.lua")
        out = cfg.run(nodes=nodes, ways=ways, relations=rels)
        rows = {r.osm_id: r for r in out["polygons"].collect()}
        # way polygon: area = geom:transform(3857):area() in mercator
        # m^2; spherical_area = real-world m^2; at lat 50 the mercator
        # inflation factor is 1/cos^2(50 deg)
        w = rows[101]
        assert w.spherical_area == pytest.approx(8050, rel=0.05)
        assert w.area / w.spherical_area == pytest.approx(
            1 / math.cos(math.radians(50.0)) ** 2, rel=0.01)
        # relation multipolygon lands with osm_id = -id and same areas
        assert rows[-200].area == pytest.approx(w.area, rel=1e-6)

    def test_geometries_lua_boundary_grab(self, spark, geom_fixture):
        nodes, ways, rels = geom_fixture
        cfg, _m = load_lua_config(f"{FLEX}/geometries.lua")
        out = cfg.run(nodes=nodes, ways=ways, relations=rels)
        b = {r.osm_id: r for r in out["boundaries"].collect()}
        # type = object:grab_tag('boundary'): value surfaced AND
        # removed from the stored tags
        assert b[201].type == "administrative"
        assert "boundary" not in b[201].tags

    def test_geometries_lua_segmentize_loop(self, spark, geom_fixture):
        from osm2pgsql_spark.functions import geometry as G

        nodes, ways, rels = geom_fixture
        cfg, _m = load_lua_config(f"{FLEX}/geometries.lua")
        out = cfg.run(nodes=nodes, ways=ways, relations=rels)
        # w102 spans 2.5 deg; segmentize(1) splits it into 3 parts and
        # the `for g in multi:geometries()` loop inserts one row each
        parts = [r for r in out["ways"].collect() if r.osm_id == 102]
        assert len(parts) == 3
        for r in parts:
            assert G.from_wkb(bytes(r.geom))[0] == "linestring"
        # short ways stay single-row
        assert len([r for r in out["ways"].collect() if r.osm_id == 100]) == 1

    def test_parse_sweep_includes_chain_configs(self):
        for fn in ("geometries.lua", "hstore.lua", "indexes.lua"):
            m = parse_lua_config(open(os.path.join(FLEX, fn)).read())
            assert m.tables
