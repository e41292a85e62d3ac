"""Distributed Lua state semantics (plans/lua_flex.py): pure-increment
counters merge as summed per-partition deltas, after_* lifecycle
callbacks fire ONCE on the driver at phase boundaries (not once per
partition), their inserts are legal only into ids=nil log tables
(output-flex.cpp:766-826 "No context object"), and their state
mutations are visible to the next phase via the broadcast.

These pin the two divergences COVERAGE.md used to document as
inherent-to-distribution; both are now closed.
"""

import os
import tempfile

import pytest

from osm2pgsql_spark.lua.interp import LuaRuntimeError
from osm2pgsql_spark.plans.lua_config import (
    _needs_interpreter, load_lua_config)
from osm2pgsql_spark.plans.lua_flex import (
    LuaFlexAdapter, _counter_names, merge_state)
from osm2pgsql_spark.sources.opl import read_opl

FLEX = "/root/reference/flex-config"

OPL = "".join(
    [f"n{i} Tname=poi{i} x{9.0 + i / 100} y50.0\n" for i in range(1, 21)]
    + [f"n{100 + i} x{8.0 + i / 100} y49.0\n" for i in range(5)]  # untagged
    + ["w300 Thighway=primary Nn1,n2\n",
       "w301 Thighway=service Nn3,n4\n"]
)


@pytest.fixture(scope="module")
def osm(spark):
    with tempfile.NamedTemporaryFile("w", suffix=".opl", delete=False) as fh:
        fh.write(OPL)
        path = fh.name
    nodes, ways, rels = read_opl(spark, path)
    # many partitions so per-partition interpreters each see a slice
    return nodes.repartition(8).cache(), ways.repartition(4).cache(), rels


class TestCounterNames:
    def test_pure_increment_detected(self):
        src = ("local n = 0\n"
               "osm2pgsql.process_node = function(o)\n"
               "    n = n + 1\n"
               "end\n")
        assert _counter_names(src) == {"n"}

    def test_decrement_counts_as_self_additive(self):
        src = "local depth = 0\ndepth = depth + 1\ndepth = depth - 1\n"
        assert "depth" in _counter_names(src)

    def test_non_additive_assignment_excludes(self):
        # a reset (x = 0 outside the declaration) makes merging by
        # summed deltas wrong -> stays last-write
        src = ("local x = 0\n"
               "x = x + 1\n"
               "x = 0\n")
        assert _counter_names(src) == frozenset()

    def test_plain_flag_not_a_counter(self):
        src = ("local reading = true\n"
               "function osm2pgsql.after_relations()\n"
               "    reading = false\n"
               "end\n")
        assert _counter_names(src) == frozenset()


class TestMergeStateDeltas:
    def test_deltas_sum(self):
        a = {}
        merge_state(a, {"x": {"__nd__": 3}})
        merge_state(a, {"x": {"__nd__": 4}})
        assert a["x"] == {"__nd__": 7}

    def test_delta_onto_absolute_adds(self):
        a = {"x": 10}
        merge_state(a, {"x": {"__nd__": 4}})
        assert a["x"] == 14

    def test_scalar_still_last_write(self):
        a = {"flag": True}
        merge_state(a, {"flag": False})
        assert a["flag"] is False

    def test_dict_union_unaffected(self):
        a = {"w2r": {"1": ["a"]}}
        merge_state(a, {"w2r": {"2": ["b"]}})
        assert a["w2r"] == {"1": ["a"], "2": ["b"]}


COUNTER_LOG = """
local pois = osm2pgsql.define_node_table('pois', {
    { column = 'name', type = 'text' },
})
local stats = osm2pgsql.define_table{
    name = 'stats',
    ids = nil,
    columns = {
        { column = 'phase', type = 'text' },
        { column = 'n', type = 'int' },
    }
}
local n_nodes = 0
osm2pgsql.process_node = function(object)
    n_nodes = n_nodes + 1
    pois:insert{ name = object.tags.name }
end
function osm2pgsql.after_nodes()
    stats:insert{ phase = 'nodes', n = n_nodes }
end
"""


class TestAfterCallbacksOnDriver:
    def test_counter_merges_and_after_fires_once(self, spark, osm):
        nodes, ways, rels = osm
        adapter = LuaFlexAdapter(COUNTER_LOG)
        out = adapter.run(nodes=nodes, ways=ways, relations=rels)
        rows = out["stats"].collect()
        # ONE stats row however many partitions ran the node phase
        assert len(rows) == 1
        # counter == tagged node count (untagged are plan-filtered when
        # no process_untagged_node exists, output-flex.cpp:1135), with
        # per-partition increments summed exactly
        assert rows[0]["phase"] == "nodes"
        assert int(rows[0]["n"]) == 20
        assert out["pois"].count() == 20

    def test_after_state_visible_in_next_phase(self, spark, osm):
        nodes, ways, rels = osm
        src = """
local t = osm2pgsql.define_way_table('wt', {
    { column = 'kind', type = 'text' },
})
local nodes_done = false
osm2pgsql.process_node = function(object) end
function osm2pgsql.after_nodes()
    nodes_done = true
end
osm2pgsql.process_way = function(object)
    if nodes_done then
        t:insert{ kind = object.tags.highway }
    end
end
"""
        out = LuaFlexAdapter(src).run(nodes=nodes, ways=ways, relations=rels)
        # the flag mutated once on the driver rides the way-phase
        # broadcast: every way partition must see it
        assert out["wt"].count() == 2

    def test_after_insert_into_id_table_errors(self, spark, osm):
        nodes, ways, rels = osm
        src = """
local t = osm2pgsql.define_node_table('pois', {
    { column = 'name', type = 'text' },
})
osm2pgsql.process_node = function(object) end
function osm2pgsql.after_nodes()
    t:insert{ name = 'x' }
end
"""
        with pytest.raises(LuaRuntimeError, match="No context object"):
            LuaFlexAdapter(src).run(nodes=nodes, ways=ways, relations=rels)

    def test_last_state_exposes_merged_counter(self, spark, osm):
        nodes, ways, rels = osm
        adapter = LuaFlexAdapter(COUNTER_LOG)
        adapter.run(nodes=nodes, ways=ways, relations=rels)
        v = (adapter.last_state.get("vars") or {}).get("local:n_nodes")
        total = v["__nd__"] if isinstance(v, dict) else v
        assert total == 20


class TestInterpreterRouting:
    def test_track_changes_routes_to_interpreter(self):
        text = open(os.path.join(FLEX, "track-changes.lua")).read()
        assert _needs_interpreter(text)
        obj, _model = load_lua_config(text)
        assert isinstance(obj, LuaFlexAdapter)

    def test_generic_stays_declarative(self):
        text = open(os.path.join(FLEX, "generic.lua")).read()
        assert not _needs_interpreter(text)
        obj, _model = load_lua_config(text)
        assert not isinstance(obj, LuaFlexAdapter)

    def test_mode_reference_in_comment_ignored(self):
        text = ("-- osm2pgsql.mode is not used here\n"
                "local t = osm2pgsql.define_node_table('p', {\n"
                "    { column = 'name', type = 'text' },\n"
                "})\n"
                "osm2pgsql.process_node = function(o)\n"
                "    t:insert{ name = o.tags.name }\n"
                "end\n")
        assert not _needs_interpreter(text)


TWO_STAGE_LOG_LUA = """
local roads = osm2pgsql.define_table{
    name = 'roads',
    ids = { type = 'way', id_column = 'osm_id' },
    columns = {{ column = 'refs', type = 'text' }},
}
local waylog = osm2pgsql.define_table{
    name = 'waylog',
    columns = {{ column = 'note', type = 'text' }},
}
local w2r = {}

function osm2pgsql.select_relation_members(relation)
    if relation.tags.type == 'route' then
        return { ways = osm2pgsql.way_member_ids(relation) }
    end
end

function osm2pgsql.process_way(object)
    waylog:insert({ note = 'w' .. object.id })
    local refs = ''
    if osm2pgsql.stage == 2 then
        refs = table.concat(w2r[object.id] or {}, ',')
    end
    roads:insert({ refs = refs })
end

function osm2pgsql.process_relation(object)
    if object.tags.type == 'route' then
        for _, id in ipairs(osm2pgsql.way_member_ids(object)) do
            w2r[id] = w2r[id] or {}
            w2r[id][#w2r[id] + 1] = object.tags.ref
        end
    end
end
"""

TWO_STAGE_LOG_OPL = """n1 x9.0 y50.0
n2 x9.01 y50.0
n3 x9.02 y50.0
n4 x9.03 y50.0
w300 Thighway=primary Nn1,n2
w301 Thighway=service Nn3,n4
r500 Ttype=route,ref=R1 Mw300@
"""


class TestStage2LogTables:
    """ADVICE round-7: delete-then-reprocess may only anti-join marked
    ids out of ID-TRACKED tables; the reference cannot delete from
    ids=nil log tables, so their stage-1 rows survive next to the
    stage-2 rows (flex-table.cpp delete path requires an id)."""

    def test_log_rows_survive_marked_reprocess(self, spark):
        with tempfile.NamedTemporaryFile(
            "w", suffix=".opl", delete=False
        ) as fh:
            fh.write(TWO_STAGE_LOG_OPL)
            path = fh.name
        nodes, ways, rels = read_opl(spark, path)
        out = LuaFlexAdapter(TWO_STAGE_LOG_LUA).run(
            nodes=nodes.repartition(3), ways=ways.repartition(2),
            relations=rels)

        roads = {r["osm_id"]: r["refs"] for r in out["roads"].collect()}
        # marked way replaced by its stage-2 row; unmarked keeps stage 1
        assert roads == {300: "R1", 301: ""}

        notes = sorted(r["note"] for r in out["waylog"].collect())
        # w300 logs in BOTH stages (the id-less table is append-only);
        # w301 logs once — the old bug anti-joined w300's stage-1 row away
        assert notes == ["w300", "w300", "w301"]
