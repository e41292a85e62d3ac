"""BDD features that were 'n/a (Lua-API)' before the interpreter
landed, now ported: empty-insert, invalid-lua, lua-basics,
lua-callbacks, lua-table-definitions (reference
tests/bdd/flex/*.feature).  Error messages are pinned to the reference
wording the BDD steps grep for."""

import os

import pytest

from osm2pgsql_spark.lua.interp import LuaRuntimeError, LuaSyntaxError
from osm2pgsql_spark.plans.lua_flex import LuaFlexRuntime

PBF = "/root/reference/tests/data/liechtenstein-2013-08-03.osm.pbf"


class TestLuaTableDefinitions:
    """tests/bdd/flex/lua-table-definitions.feature — all 8."""

    def test_needs_table_parameter(self):
        with pytest.raises(
                LuaRuntimeError,
                match=r"Argument #1 to 'define_table' must be a table\."):
            LuaFlexRuntime("local t = osm2pgsql.define_table()")

    def test_needs_name(self):
        with pytest.raises(
                LuaRuntimeError,
                match=r"The table must contain a 'name' string field\."):
            LuaFlexRuntime("local t = osm2pgsql.define_table({})")

    def test_name_must_be_string(self):
        with pytest.raises(
                LuaRuntimeError,
                match=r"The table must contain a 'name' string field\."):
            LuaFlexRuntime(
                "local t = osm2pgsql.define_table({ name = false })")

    def test_needs_columns(self):
        with pytest.raises(
                LuaRuntimeError,
                match=r"No 'columns' field \(or not an array\) in table 'foo'\."):
            LuaFlexRuntime(
                "local t = osm2pgsql.define_table({ name = 'foo' })")

    def test_columns_must_be_table(self):
        with pytest.raises(
                LuaRuntimeError,
                match=r"No 'columns' field \(or not an array\) in table 'foo'\."):
            LuaFlexRuntime(
                "local t = osm2pgsql.define_table({ name = 'foo', "
                "columns = 123 })")

    def test_empty_columns_without_ids_fails(self):
        with pytest.raises(
                LuaRuntimeError,
                match=r"No columns defined for table 'foo'\."):
            LuaFlexRuntime(
                "local t = osm2pgsql.define_table({ name = 'foo', "
                "columns = {} })")

    def test_empty_columns_with_ids_ok(self):
        rt = LuaFlexRuntime("""
            local t = osm2pgsql.define_table({
                name = 'foo',
                ids = { type = 'node', id_column = 'node_id' },
                columns = {}
            })
            function osm2pgsql.process_node(object)
                t:insert({})
            end
        """)
        assert "foo" in rt.specs
        assert rt.specs["foo"].columns == []

    def test_duplicate_table_name_fails(self):
        with pytest.raises(LuaRuntimeError):
            LuaFlexRuntime("""
                local t1 = osm2pgsql.define_node_table('foo', {
                    { column = 'bar' }
                })
                local t2 = osm2pgsql.define_node_table('foo', {
                    { column = 'baz' }
                })
            """)


class TestEmptyInsert:
    """tests/bdd/flex/empty-insert.feature: insert() without a row
    errors with the reference's 'Need two parameters' wording."""

    def test_empty_insert_fails(self):
        rt = LuaFlexRuntime("""
            local points = osm2pgsql.define_table{
                name = 'osm2pgsql_test_points',
                ids = { type = 'node', id_column = 'node_id' },
                columns = {
                    { column = 'geom', type = 'point' },
                }
            }
            function osm2pgsql.process_node(object)
                points:insert()
            end
        """)
        with pytest.raises(LuaRuntimeError, match="Need two parameters"):
            rt.process("node", {"id": 1, "tags": {"natural": "water"},
                                "lon": 1.0, "lat": 2.0})


class TestInvalidLua:
    """tests/bdd/flex/invalid-lua.feature: a syntactically invalid
    config fails at load."""

    def test_invalid_lua_fails(self):
        with pytest.raises(LuaSyntaxError):
            LuaFlexRuntime("this-is-not-valid-lua")


class TestLuaBasics:
    """tests/bdd/flex/lua-basics.feature: the osm2pgsql object's
    version/mode/stage/Table and the properties table (string
    values)."""

    def test_osm2pgsql_object(self, capsys):
        LuaFlexRuntime("""
            print("version=" .. osm2pgsql.version)
            print("mode=" .. osm2pgsql.mode)
            print("stage=" .. osm2pgsql.stage)
            print("Table=" .. type(osm2pgsql.Table))
        """)
        out = capsys.readouterr().out
        assert "mode=create" in out
        assert "stage=1" in out
        assert "Table=table" in out

    def test_no_tables_is_an_error(self):
        from osm2pgsql_spark.plans.lua_config import LuaConfigError
        from osm2pgsql_spark.plans.lua_flex import LuaFlexAdapter

        with pytest.raises(LuaConfigError, match="no tables"):
            LuaFlexAdapter("print('hi')")

    def test_properties(self, capsys):
        LuaFlexRuntime("""
            local p = osm2pgsql.properties
            print("attributes=" .. p.attributes)
            print("prefix=" .. p.prefix)
            local t = osm2pgsql.define_node_table('t', {{column='a'}})
        """)
        out = capsys.readouterr().out
        assert "attributes=false" in out
        assert "prefix=planet_osm" in out


@pytest.mark.skipif(not os.path.exists(PBF), reason="fixture missing")
class TestLuaCallbacks:
    """tests/bdd/flex/lua-callbacks.feature: process_* called once per
    TAGGED object (1562 nodes / 7105 ways / 113 relations on the
    Liechtenstein extract — of 65733 total nodes, pinning the untagged
    pre-filter), verified through inserted row counts.  The feature's
    printed per-boundary counters rely on single-threaded accumulation;
    the distributed twin counts via table rows instead."""

    def test_callback_counts_liechtenstein(self, spark):
        from osm2pgsql_spark.plans.lua_flex import LuaFlexAdapter
        from osm2pgsql_spark.sources.pbf import read_pbf

        nodes, ways, rels = read_pbf(spark, PBF)
        adapter = LuaFlexAdapter("""
            local n = osm2pgsql.define_node_table('n_calls', {{column='a'}})
            local w = osm2pgsql.define_way_table('w_calls', {{column='a'}})
            local r = osm2pgsql.define_relation_table('r_calls', {{column='a'}})
            function osm2pgsql.process_node(object)
                n:insert({})
            end
            function osm2pgsql.process_way(object)
                w:insert({})
            end
            function osm2pgsql.process_relation(object)
                r:insert({})
            end
        """)
        t = adapter.run(nodes=nodes, ways=ways, relations=rels)
        assert t["n_calls"].count() == 1562
        assert t["w_calls"].count() == 7105
        assert t["r_calls"].count() == 113

    def test_after_callbacks_fire_in_file_order(self):
        rt = LuaFlexRuntime("""
            local log = {}
            local t = osm2pgsql.define_node_table('t', {{column='a'}})
            osm2pgsql.after_nodes = function() log[#log + 1] = 'n' end
            osm2pgsql.after_ways = function() log[#log + 1] = 'w' end
            osm2pgsql.after_relations = function() log[#log + 1] = 'r' end
            function osm2pgsql.get_log() return table.concat(log, ',') end
            function osm2pgsql.process_node(object) end
        """)
        # the relation phase sees after_nodes + after_ways fired
        rt.run_after_callbacks("relation")
        got = rt.interp.call(rt._osm_table.get("get_log"), [])
        assert got == ["n,w"]
        # stage 2 sees all three
        rt2 = LuaFlexRuntime("""
            local log = {}
            local t = osm2pgsql.define_node_table('t', {{column='a'}})
            osm2pgsql.after_nodes = function() log[#log + 1] = 'n' end
            osm2pgsql.after_ways = function() log[#log + 1] = 'w' end
            osm2pgsql.after_relations = function() log[#log + 1] = 'r' end
            function osm2pgsql.get_log() return table.concat(log, ',') end
            function osm2pgsql.process_node(object) end
        """)
        rt2.run_after_callbacks("way", stage=2)
        got2 = rt2.interp.call(rt2._osm_table.get("get_log"), [])
        assert got2 == ["n,w,r"]


class TestDeletedCallbacks:
    """track-changes.lua in append mode: process_* logs A/M for
    added/modified objects (file_reading_in_progress true during the
    diff read), process_deleted_* logs D for deletes
    (output-flex.cpp:1212-1245)."""

    def test_track_changes_append(self, spark):
        import tempfile

        from osm2pgsql_spark.plans.lua_flex import LuaFlexAdapter
        from osm2pgsql_spark.sources.opl import read_opl

        src = open("/root/reference/flex-config/track-changes.lua").read()
        adapter = LuaFlexAdapter(src, mode="append")

        # the diff's surviving objects (create v1 / modify v2)
        opl = (
            "n1 v1 t2024-01-01T00:00:00Z Tamenity=pub x9.0 y50.0\n"
            "n2 v2 t2024-01-02T00:00:00Z Thighway=bus_stop x9.1 y50.1\n"
            "w10 v1 t2024-01-03T00:00:00Z Thighway=track Nn1,n2\n"
        )
        with tempfile.NamedTemporaryFile("w", suffix=".opl", delete=False) as fh:
            fh.write(opl)
            path = fh.name
        nodes, ways, rels = read_opl(spark, path)
        t = adapter.run(nodes=nodes, ways=ways, relations=rels)
        log = {(r["osm_type"], r["osm_id"]): (r["action"], r["version"])
               for r in t["change_log"].collect()}
        # version 1 -> 'A', higher -> 'M' (track-changes.lua:46)
        assert log[("node", 1)] == ("A", 1)
        assert log[("node", 2)] == ("M", 2)
        assert log[("way", 10)] == ("A", 1)

        # deleted objects route through process_deleted_*
        del_opl = "n9 v3 t2024-01-04T00:00:00Z x9.9 y50.9\n"
        with tempfile.NamedTemporaryFile("w", suffix=".opl", delete=False) as fh:
            fh.write(del_opl)
            dpath = fh.name
        dn, dw, dr = read_opl(spark, dpath)
        dt = adapter.run_deleted(nodes=dn)
        dlog = {(r["osm_type"], r["osm_id"]): (r["action"], r["version"])
                for r in dt["change_log"].collect()}
        assert dlog == {("node", 9): ("D", 3)}

    def test_create_mode_logs_nothing(self, spark):
        import tempfile

        from osm2pgsql_spark.plans.lua_flex import LuaFlexAdapter
        from osm2pgsql_spark.sources.opl import read_opl

        src = open("/root/reference/flex-config/track-changes.lua").read()
        adapter = LuaFlexAdapter(src, mode="create")
        with tempfile.NamedTemporaryFile("w", suffix=".opl", delete=False) as fh:
            fh.write("n1 v1 Tamenity=pub x9.0 y50.0\n")
            path = fh.name
        nodes, ways, rels = read_opl(spark, path)
        t = adapter.run(nodes=nodes, ways=ways, relations=rels)
        assert t["change_log"].count() == 0


class TestLuaIndexDefinitions:
    """tests/bdd/flex/lua-index-definitions.feature — the validation
    and construction scenarios (DDL itself is pinned by the FlexIndex
    transcript tests in test_live_sink)."""

    BASE = """
        local t = osm2pgsql.define_table({{
            name = 'mytable',
            ids = {{ type = 'node', id_column = 'node_id' }},
            columns = {{
                {{ column = 'name', type = 'text' }},
                {{ column = 'tags', type = 'jsonb' }},
                {{ column = 'geom', type = 'geometry' }},
            }},
            {indexes}
        }})
    """

    def rt(self, indexes):
        return LuaFlexRuntime(self.BASE.format(indexes=indexes))

    def test_indexes_must_be_array(self):
        with pytest.raises(
                LuaRuntimeError,
                match=r"The 'indexes' field in definition of table "
                      r"'mytable' is not an array\."):
            self.rt("indexes = true")

    def test_default_index_is_gist_on_geometry(self):
        rt = self.rt("")
        ix = rt.specs["mytable"].indexes
        assert len(ix) == 1
        assert ix[0].method == "gist"
        assert list(ix[0].columns) == ["geom"]
        assert ix[0].fillfactor == 100  # non-updatable default

    def test_empty_indexes_gets_none(self):
        rt = self.rt("indexes = {}")
        assert rt.specs["mytable"].indexes == []

    def test_explicit_column_index(self):
        rt = self.rt("indexes = { { column = 'name', method = 'btree' } }")
        ix = rt.specs["mytable"].indexes
        assert [(i.method, list(i.columns)) for i in ix] == [("btree", ["name"])]

    def test_multiple_indexes(self):
        rt = self.rt(
            "indexes = { { column = 'name', method = 'btree' }, "
            "{ column = 'geom', method = 'gist' } }")
        assert len(rt.specs["mytable"].indexes) == 2

    def test_method_missing(self):
        with pytest.raises(
                LuaRuntimeError,
                match=r"Index definition must contain a 'method' string field\."):
            self.rt("indexes = { { column = 'name' } }")

    def test_method_must_be_valid(self):
        with pytest.raises(LuaRuntimeError,
                           match=r"Unknown index method 'ERROR'\."):
            self.rt("indexes = { { column = 'name', method = 'ERROR' } }")

    def test_column_missing(self):
        with pytest.raises(
                LuaRuntimeError,
                match=r"You must set either the 'column' or the "
                      r"'expression' field in index definition\."):
            self.rt("indexes = { { method = 'btree' } }")

    def test_column_and_expression_conflict(self):
        with pytest.raises(
                LuaRuntimeError,
                match=r"You must set either the 'column' or the "
                      r"'expression' field"):
            self.rt("indexes = { { column = 'name', "
                    "expression = 'lower(name)', method = 'btree' } }")

    def test_column_must_exist(self):
        with pytest.raises(LuaRuntimeError,
                           match=r"Unknown column 'foo' in table 'mytable'\."):
            self.rt("indexes = { { column = 'foo', method = 'btree' } }")

    def test_expression_index_with_name(self):
        rt = self.rt(
            "indexes = { { expression = 'lower(name)', method = 'btree', "
            "name = 'my_idx' } }")
        ix = rt.specs["mytable"].indexes[0]
        assert ix.expression == "lower(name)"
        assert ix.name == "my_idx"

    def test_include_field_validation(self):
        with pytest.raises(
                LuaRuntimeError,
                match=r"The 'include' field in an index definition must "
                      r"contain a string or an array\."):
            self.rt("indexes = { { column = 'name', method = 'btree', "
                    "include = true } }")
        with pytest.raises(LuaRuntimeError,
                           match=r"Unknown column 'zzz' in table 'mytable'\."):
            self.rt("indexes = { { column = 'name', method = 'btree', "
                    "include = 'zzz' } }")
        rt = self.rt("indexes = { { column = 'name', method = 'btree', "
                     "include = 'tags' } }")
        assert list(rt.specs["mytable"].indexes[0].include_columns) == ["tags"]

    def test_indexes_feed_pg_ddl(self):
        """indexes.lua specs flow into the real CREATE INDEX DDL
        through the transcript writer."""
        from osm2pgsql_spark.plans.lua_flex import LuaFlexAdapter
        from osm2pgsql_spark.sinks.live import pg_import_transcript

        a = LuaFlexAdapter(
            open("/root/reference/flex-config/indexes.lua").read())
        tables = {
            "roads": ([("name", "text"), ("type", "text"), ("ref", "text"),
                       ("geom", "geometry(LineString,3857)")], []),
        }
        sql = pg_import_transcript(tables, a.pg_indexes())
        assert 'CREATE INDEX ON "roads" USING btree ("name","ref")' in sql
        assert "WHERE type='primary'" in sql


class TestLocatorApiErrors:
    """tests/bdd/flex/locator.feature — the 7 Lua-API error/definition
    scenarios (the 3 functional ones run e2e in test_lua_locator)."""

    def wrap(self, body):
        return LuaFlexRuntime(
            body + "\nlocal t = osm2pgsql.define_node_table('t', "
            "{{column='a'}})\nfunction osm2pgsql.process_node(object) end")

    def test_define_without_parameter_ok_and_nonables(self):
        # no parameter and no name are both okay
        self.wrap("local l = osm2pgsql.define_locator()")
        self.wrap("local l = osm2pgsql.define_locator({})")
        rt = self.wrap("local l = osm2pgsql.define_locator({ name = 'x' })\n"
                       "print('name=' .. l:name())")
        assert "x" in rt.locators

    def test_define_with_non_table_fails(self):
        with pytest.raises(
                LuaRuntimeError,
                match=r"Argument #1 to 'define_locator' must be a Lua table\."):
            self.wrap("local l = osm2pgsql.define_locator('nope')")

    def test_dot_call_instead_of_colon(self):
        with pytest.raises(
                LuaRuntimeError,
                match=r"Argument #1 has to be of type osm2pgsql\.Locator\."):
            self.wrap("local l = osm2pgsql.define_locator({ name = 'x' })\n"
                      "print(l.name())")

    def test_first_intersecting_without_geometry(self):
        rt = LuaFlexRuntime("""
            local l = osm2pgsql.define_locator({ name = 'x' })
            local t = osm2pgsql.define_node_table('t', {{column='a'}})
            function osm2pgsql.process_node(object)
                l:first_intersecting()
            end
        """)
        with pytest.raises(
                LuaRuntimeError,
                match=r"Error in 'first_intersecting': Need locator and "
                      r"geometry arguments"):
            rt.process("node", {"id": 1, "tags": {"x": "y"},
                                "lon": 1.0, "lat": 2.0})

    def test_all_intersecting_without_geometry(self):
        rt = LuaFlexRuntime("""
            local l = osm2pgsql.define_locator({ name = 'x' })
            local t = osm2pgsql.define_node_table('t', {{column='a'}})
            function osm2pgsql.process_node(object)
                l:all_intersecting()
            end
        """)
        with pytest.raises(
                LuaRuntimeError,
                match=r"Error in 'all_intersecting': Need locator and "
                      r"geometry arguments"):
            rt.process("node", {"id": 1, "tags": {"x": "y"},
                                "lon": 1.0, "lat": 2.0})


class TestExpireOutputDefinitions:
    """tests/bdd/flex/lua-expire-output-definitions.feature — the
    validation scenarios."""

    def test_non_table_argument(self):
        with pytest.raises(
                LuaRuntimeError,
                match=r"Argument #1 to 'define_expire_output' must be a "
                      r"Lua table\."):
            LuaFlexRuntime("local e = osm2pgsql.define_expire_output(7)")

    @pytest.mark.parametrize("fld,dflt", [
        ("filename", "''"), ("schema", "'public'"), ("table", "''"),
    ])
    def test_string_fields(self, fld, dflt):
        with pytest.raises(
                LuaRuntimeError,
                match=rf"The expire output field must contain a '{fld}' "
                      rf"string field \(or nil for default: {dflt}\)\."):
            LuaFlexRuntime(
                f"local e = osm2pgsql.define_expire_output({{ {fld} = 1 }})")

    @pytest.mark.parametrize("fld", ["maxzoom", "minzoom"])
    def test_zoom_must_be_integer(self, fld):
        with pytest.raises(
                LuaRuntimeError,
                match=rf"The '{fld}' field in a expire output must contain "
                      rf"an integer\."):
            LuaFlexRuntime(
                f"local e = osm2pgsql.define_expire_output("
                f"{{ {fld} = 'high', table = 'x' }})")

    def test_maxzoom_range(self):
        with pytest.raises(
                LuaRuntimeError,
                match=r"The 'maxzoom' field in a expire output must be "
                      r"between 1 and 20\."):
            LuaFlexRuntime(
                "local e = osm2pgsql.define_expire_output("
                "{ maxzoom = 99, table = 'x' })")

    def test_minzoom_range(self):
        with pytest.raises(
                LuaRuntimeError,
                match=r"The 'minzoom' field in a expire output must be "
                      r"between 1 and 'maxzoom'\."):
            LuaFlexRuntime(
                "local e = osm2pgsql.define_expire_output("
                "{ maxzoom = 10, minzoom = 12, table = 'x' })")

    def test_valid_definition_ok(self):
        rt = LuaFlexRuntime("""
            local e = osm2pgsql.define_expire_output({
                maxzoom = 14, minzoom = 10, table = 'tiles' })
            local t = osm2pgsql.define_node_table('t', {{column='a'}})
        """)
        assert rt.expire_specs[0]["maxzoom"] == 14
        assert rt.expire_specs[0]["minzoom"] == 10


class TestLuaTableIds:
    """tests/bdd/flex/lua-table-ids.feature — all 16 scenarios."""

    def define(self, ids):
        return LuaFlexRuntime(
            "local t = osm2pgsql.define_table({ name = 'foo', "
            + ids +
            " columns = {{ column = 'bar', type = 'text' }} })")

    def test_without_ids_okay(self):
        rt = self.define("")
        assert rt.specs["foo"].ids_type == "none"

    def test_empty_ids_not_allowed(self):
        with pytest.raises(
                LuaRuntimeError,
                match=r"The ids field must contain a 'type' string field\."):
            self.define("ids = {},")

    def test_type_must_be_string(self):
        with pytest.raises(LuaRuntimeError, match=r"Unknown ids type: 123\."):
            self.define("ids = { type = 123 },")

    def test_unknown_type(self):
        with pytest.raises(LuaRuntimeError, match=r"Unknown ids type: nodes\."):
            self.define("ids = { type = 'nodes', id_column = 'x' },")

    def test_id_column_required(self):
        with pytest.raises(
                LuaRuntimeError,
                match=r"The ids field must contain a 'id_column' string field\."):
            self.define("ids = { type = 'node' },")

    def test_id_column_must_be_string(self):
        with pytest.raises(
                LuaRuntimeError,
                match=r"The ids field must contain a 'id_column' string field\."):
            self.define("ids = { type = 'node', id_column = 7 },")

    @pytest.mark.parametrize(
        "idtype", ["node", "way", "relation", "area", "any", "tile"])
    def test_all_id_types_accepted(self, idtype):
        if idtype == "tile":
            rt = self.define("ids = { type = 'tile' },")
        else:
            rt = self.define(
                f"ids = {{ type = '{idtype}', id_column = 'abc' }},")
        assert "foo" in rt.specs

    def test_special_characters_rejected(self):
        with pytest.raises(
                LuaRuntimeError,
                match=r"Special characters are not allowed in column names"):
            self.define("ids = { type = 'node', id_column = 'a\"b\"c' },")

    def test_cache_must_be_boolean(self):
        with pytest.raises(
                LuaRuntimeError,
                match=r"The ids field 'cache' must be a boolean field\."):
            self.define(
                "ids = { type = 'node', id_column = 'x', cache = 'yes' },")

    def test_cache_false_ok_anywhere(self):
        rt = self.define(
            "ids = { type = 'way', id_column = 'x', cache = false },")
        assert not rt.specs["foo"].cache

    def test_cache_true_only_for_nodes(self):
        rt = self.define(
            "ids = { type = 'node', id_column = 'x', cache = true },")
        assert rt.specs["foo"].cache
        with pytest.raises(
                LuaRuntimeError,
                match=r"ID cache only available for node ids\."):
            self.define(
                "ids = { type = 'way', id_column = 'x', cache = true },")

    def test_in_id_cache_needs_cache(self):
        rt = LuaFlexRuntime("""
            local t = osm2pgsql.define_table({
                name = 'foo',
                ids = { type = 'node', id_column = 'node_id' },
                columns = {{ column = 'bar', type = 'text' }}
            })
            function osm2pgsql.process_way(object)
                t:in_id_cache({ 1, 2 })
            end
        """)
        with pytest.raises(LuaRuntimeError,
                           match=r"No ID cache on table 'foo'\."):
            rt.process("way", {"id": 1, "tags": {"x": "y"}, "refs": [1, 2]})

    def test_in_id_cache_dot_call(self):
        rt = LuaFlexRuntime("""
            local t = osm2pgsql.define_table({
                name = 'foo',
                ids = { type = 'node', id_column = 'node_id', cache = true },
                columns = {{ column = 'bar', type = 'text' }}
            })
            function osm2pgsql.process_way(object)
                t.in_id_cache("error", {})
            end
        """)
        with pytest.raises(
                LuaRuntimeError,
                match=r"First parameter must be of type osm2pgsql\.Table\."):
            rt.process("way", {"id": 1, "tags": {"x": "y"}, "refs": [1, 2]})
