"""Legacy Lua tag transform (--tag-transform-script) — calling
convention units plus the cross-engine Liechtenstein parity the
reference's own pgsql tests exercise via style.lua
(/root/reference/src/tagtransform-lua.cpp, tests/test-output-pgsql*)."""

import os

import pytest
from pyspark.sql import functions as F

from osm2pgsql_spark.plans.tagtransform import (
    LuaTagTransform,
    _lua_toint,
    _out_tags_of,
    _push_tags,
    planet_tables_lua,
)

PBF = "/root/reference/tests/data/liechtenstein-2013-08-03.osm.pbf"
DEFAULT_STYLE = "/root/reference/default.style"
STYLE_LUA = "/root/reference/style.lua"

SCRIPT = """
function filter_tags_generic(kv, n)
    if n == 0 then return 1, kv end
    kv["note"] = nil
    return 0, kv
end
function filter_tags_node(kv, n) return filter_tags_generic(kv, n) end
function filter_basic_tags_rel(kv, n) return filter_tags_generic(kv, n) end
function filter_tags_way(kv, n)
    local f
    f, kv = filter_tags_generic(kv, n)
    if f == 1 then return f, kv, 0, 0 end
    local poly = 0
    if kv["building"] then poly = 1 end
    kv["z_order"] = 42
    local roads = 0
    if kv["highway"] == "motorway" then roads = 1 end
    return 0, kv, poly, roads
end
function filter_tags_relation_member(kv, members, roles, n)
    kv["mcount"] = n
    kv["role1"] = roles[1]
    kv["m1hw"] = members[1] and members[1]["highway"] or nil
    local poly = 0
    if kv["type"] == "multipolygon" then poly = 1 end
    kv["type"] = nil
    return 0, kv, {}, 0, poly, 0
end
"""


# ---------------------------------------------------------------- units


def test_missing_function_error_wording():
    with pytest.raises(SystemExit, match=(
            "Tag transform style does not contain a function "
            "filter_tags_way")):
        LuaTagTransform("function filter_tags_node(kv, n) return 0, kv end")


def test_script_error_wording():
    with pytest.raises(SystemExit, match="Lua tag transform style error"):
        LuaTagTransform("this is not lua(")


def test_lua_tointeger_semantics():
    # C lua_tointeger: nil/boolean/table -> 0, integral numerals convert
    assert _lua_toint(None) == 0
    assert _lua_toint(True) == 0
    assert _lua_toint(False) == 0
    assert _lua_toint(3) == 3
    assert _lua_toint(3.0) == 3
    assert _lua_toint(3.5) == 0
    assert _lua_toint(" 7 ") == 7
    assert _lua_toint("x") == 0


def test_out_tags_type_enforcement():
    from osm2pgsql_spark.lua.interp import LuaRuntimeError, LuaTable

    t = LuaTable()
    t.set("z_order", 42)
    t.set("name", "x")
    assert _out_tags_of(t) == {"z_order": "42", "name": "x"}
    bad = LuaTable()
    bad.set(1, "x")  # non-string key
    with pytest.raises(LuaRuntimeError, match=(
            "Basic tag processing found incorrect data type 'number', "
            "use a string")):
        _out_tags_of(bad)
    bad2 = LuaTable()
    bad2.set("k", True)  # boolean value
    with pytest.raises(LuaRuntimeError, match="use a string"):
        _out_tags_of(bad2)


def test_push_tags_extra_attributes():
    import datetime

    rec = {
        "tags": {"amenity": "pub"},
        "version": 3,
        "uid": 17,
        "user": "alice",
        "changeset": 999,
        "ts": datetime.datetime(2013, 8, 3, 12, 0, 0),
    }
    kv, n = _push_tags(rec, extra_attributes=True)
    assert n == 6
    assert kv.get("osm_user") == "alice"
    assert kv.get("osm_uid") == "17"
    assert kv.get("osm_version") == "3"
    assert kv.get("osm_changeset") == "999"
    assert kv.get("osm_timestamp") == "2013-08-03T12:00:00Z"
    kv2, n2 = _push_tags(rec, extra_attributes=False)
    assert n2 == 1 and kv2.get("osm_user") is None


def test_way_transform_kernel(spark):
    from osm2pgsql_spark.model import WAY_SCHEMA

    tt = LuaTagTransform(SCRIPT)
    rows = [
        (100, [1, 2], {"building": "yes", "note": "drop me"},
         None, None, None, None, None, None),
        (101, [1, 2], {"highway": "motorway"},
         None, None, None, None, None, None),
        (102, [1, 2], {}, None, None, None, None, None, None),
    ]
    ways = spark.createDataFrame(rows, WAY_SCHEMA)
    out = {r["id"]: r for r in tt.transform(ways, "way").collect()}
    assert out[100]["keep"] and out[100]["polygon"] and not out[100]["roads"]
    assert out[100]["out"] == {"building": "yes", "z_order": "42"}
    assert out[101]["keep"] and not out[101]["polygon"] and out[101]["roads"]
    # zero tags -> filtered (numberofkeys == 0 branch)
    assert not out[102]["keep"]


def test_relation_member_kernel(spark):
    from osm2pgsql_spark.model import RELATION_SCHEMA, WAY_SCHEMA

    tt = LuaTagTransform(SCRIPT)
    ways = spark.createDataFrame(
        [(10, [1, 2], {"highway": "path"},
          None, None, None, None, None, None),
         (11, [2, 3], {"highway": "track"},
          None, None, None, None, None, None)],
        WAY_SCHEMA,
    )
    rels = spark.createDataFrame(
        [(500,
          [("w", 10, "outer"), ("w", 99, "outer"), ("w", 11, "inner"),
           ("n", 1, "admin_centre")],
          {"type": "multipolygon", "landuse": "forest"},
          None, None, None, None, None, None)],
        RELATION_SCHEMA,
    )
    pref = tt.transform(rels, "relation").where("keep")
    inp = pref.select("id", "out").join(
        rels.select("id", "members"), "id")
    out = {r["id"]: r for r in
           tt.rel_member_transform(inp, ways).collect()}
    r = out[500]
    # way 99 doesn't exist in the middle -> only 2 members reach Lua
    # (reference rel_members_get + get_rolelist)
    assert r["out"]["mcount"] == "2"
    assert r["out"]["role1"] == "outer"
    assert r["out"]["m1hw"] == "path"
    assert r["polygon"] and not r["boundary"]
    assert "type" not in r["out"]


# -------------------------------------------- Liechtenstein parity


@pytest.fixture(scope="module")
def li(spark):
    from osm2pgsql_spark.sources.pbf import read_pbf

    nodes, ways, rels = read_pbf(spark, PBF)
    return nodes.cache(), ways.cache(), rels.cache()


@pytest.mark.skipif(not os.path.exists(PBF), reason="fixture missing")
@pytest.mark.slow
class TestStyleLuaVsCTransform:
    """The shipped style.lua (Lua path) vs the C transform
    (plans/pgsql_style) with the same default.style on the real
    extract: point/line/roads agree row-for-row on shared ways;
    polygon counts differ only by the documented polygon_keys-vs-
    style-flags policy delta (style.lua forces e.g. harbour/water
    keys polygon regardless of the style file's flags)."""

    @pytest.fixture(scope="class")
    def outputs(self, spark, li):
        from osm2pgsql_spark.plans.pgsql_style import (
            StylePlan,
            planet_tables_styled,
        )
        from osm2pgsql_spark.plans.style_file import read_style_file

        nodes, ways, rels = li
        exlist, enable_way_area = read_style_file(DEFAULT_STYLE)
        plan = StylePlan(exlist, enable_way_area=enable_way_area)
        tt = LuaTagTransform(open(STYLE_LUA).read())
        lua = planet_tables_lua(
            nodes, ways, rels, transform=tt, plan=plan, srid=3857)
        c = planet_tables_styled(
            nodes, ways, rels, plan=plan, srid=3857)
        lua = {k: v.localCheckpoint() for k, v in lua.items()}
        c = {k: v.localCheckpoint() for k, v in c.items()}
        return lua, c

    def test_pinned_counts(self, outputs):
        lua, c = outputs
        assert {k: v.count() for k, v in lua.items()} == {
            "planet_osm_point": 1342,
            "planet_osm_line": 3299,
            "planet_osm_polygon": 4137,
            "planet_osm_roads": 375,
        }
        assert {k: v.count() for k, v in c.items()} == {
            "planet_osm_point": 1342,
            "planet_osm_line": 3299,
            "planet_osm_polygon": 4131,
            "planet_osm_roads": 375,
        }

    def test_point_ids_identical(self, outputs):
        lua, c = outputs
        a = lua["planet_osm_point"].select("osm_id")
        b = c["planet_osm_point"].select("osm_id")
        assert a.exceptAll(b).count() == 0
        assert b.exceptAll(a).count() == 0

    def test_shared_way_tag_routing_agrees(self, outputs):
        # z_order is NOT expected to agree: style.lua defines its own
        # scheme (10*layer + 3..10) vs the C transform's 100*layer +
        # 1..39 (tagtransform-c.cpp:28-89) — switching transforms
        # changes z values in the reference too.  The cross-engine
        # invariant is the tag routing: shared rows carry the same
        # column values for regular tags.
        lua, c = outputs
        lz = lua["planet_osm_line"].where(F.col("osm_id") > 0).select(
            "osm_id", F.col("highway").alias("lh"),
            F.col("name").alias("ln")).distinct()
        cz = c["planet_osm_line"].where(F.col("osm_id") > 0).select(
            "osm_id", F.col("highway").alias("ch"),
            F.col("name").alias("cn")).distinct()
        shared = lz.join(cz, "osm_id")
        assert shared.count() > 2900
        mism = shared.where(
            ~(F.col("lh").eqNullSafe(F.col("ch")))
            | ~(F.col("ln").eqNullSafe(F.col("cn")))).count()
        assert mism == 0

    def test_z_order_and_roads_match_python_twin(self, outputs, li):
        """Every positive-id line row's z_order equals an exact Python
        twin of style.lua's add_z_order over the way's original tags;
        roads membership likewise (pinning style of compatible.lua's
        z_order test)."""
        _, ways, _ = li
        zordering = [
            ("railway", None, 5, 1), ("boundary", "administrative", 0, 1),
            ("bridge", "yes", 10, 0), ("bridge", "true", 10, 0),
            ("tunnel", "yes", -10, 0), ("tunnel", "true", -10, 0),
            ("highway", "minor", 3, 0), ("highway", "road", 3, 0),
            ("highway", "unclassified", 3, 0),
            ("highway", "residential", 3, 0),
            ("highway", "tertiary_link", 4, 0),
            ("highway", "tertiary", 4, 0),
            ("highway", "secondary_link", 6, 1),
            ("highway", "secondary", 6, 1),
            ("highway", "primary_link", 7, 1),
            ("highway", "primary", 7, 1),
            ("highway", "trunk_link", 8, 1), ("highway", "trunk", 8, 1),
            ("highway", "motorway_link", 9, 1),
            ("highway", "motorway", 9, 1),
        ]  # the {bridge/tunnel, 1} entries compare string==number in
        # Lua and can never match; left out of the twin on purpose

        def twin(tags):
            z, roads = 0, 0
            layer = tags.get("layer")
            if layer is not None:
                try:
                    z = 10 * int(layer.strip())
                except ValueError:
                    pass  # tonumber(layer) falsy/float: Lua float z
                # stays rare; Liechtenstein layers are integral
            for k, v, dz, rd in zordering:
                tv = tags.get(k)
                if (v is not None and tv == v) or (v is None and
                                                  tv is not None):
                    if rd == 1:
                        roads = 1
                    z += dz
            return z, roads

        way_tags = {r["id"]: r["tags"] for r in
                    ways.where(F.size("tags") > 0)
                    .select("id", "tags").collect()}
        lua, _ = outputs
        line_rows = (lua["planet_osm_line"].where(F.col("osm_id") > 0)
                     .select("osm_id", "z_order").distinct().collect())
        roads_ids = {r["osm_id"] for r in
                     lua["planet_osm_roads"].where(F.col("osm_id") > 0)
                     .select("osm_id").distinct().collect()}
        assert len(line_rows) > 2900
        for r in line_rows:
            z, roads = twin(way_tags[r["osm_id"]])
            assert r["z_order"] == z, r["osm_id"]
            assert (r["osm_id"] in roads_ids) == (roads == 1), r["osm_id"]

    def test_shared_polygon_way_area_agree(self, outputs):
        lua, c = outputs
        la = lua["planet_osm_polygon"].where(F.col("osm_id") > 0).select(
            "osm_id", F.col("way_area").alias("la")).distinct()
        ca = c["planet_osm_polygon"].where(F.col("osm_id") > 0).select(
            "osm_id", F.col("way_area").alias("ca")).distinct()
        shared = la.join(ca, "osm_id")
        assert shared.count() > 3900
        # identical expressions on both paths -> bit-equal
        assert shared.where(
            ~F.col("la").eqNullSafe(F.col("ca"))).count() == 0

    def test_roads_subset_of_line(self, outputs):
        lua, _ = outputs
        r = lua["planet_osm_roads"].select("osm_id").distinct()
        l = lua["planet_osm_line"].select("osm_id").distinct()
        assert r.exceptAll(l).count() == 0
