"""Distributed spill path for large id-keyed Lua state (the w2r/n2r
pattern of public-transport.lua / route-relations.lua): above a
threshold the per-partition state delta ships as per-key rows joined
back onto the stage-2 marked objects, instead of a driver-merged
pickled dict + broadcast.  Forced-threshold-0 equality against the
broadcast path on the real Liechtenstein extract."""

import os

import pytest
from pyspark.sql import functions as F

PBF = "/root/reference/tests/data/liechtenstein-2013-08-03.osm.pbf"
CONFIG = "/root/reference/flex-config/public-transport.lua"


@pytest.fixture(scope="module")
def li(spark):
    from osm2pgsql_spark.sources.pbf import read_pbf

    nodes, ways, rels = read_pbf(spark, PBF)
    return nodes.cache(), ways.cache(), rels.cache()


def _run_config(nodes, ways, rels, spill_threshold=None):
    from osm2pgsql_spark.plans.lua_flex import LuaFlexAdapter

    old = os.environ.get("SPARK_GRAFT_LUA_STATE_SPILL")
    try:
        if spill_threshold is not None:
            os.environ["SPARK_GRAFT_LUA_STATE_SPILL"] = str(spill_threshold)
        else:
            os.environ.pop("SPARK_GRAFT_LUA_STATE_SPILL", None)
        adapter = LuaFlexAdapter(open(CONFIG).read())
        out = adapter.run(nodes=nodes, ways=ways, relations=rels)
        return adapter, {k: v.localCheckpoint() for k, v in out.items()}
    finally:
        if old is None:
            os.environ.pop("SPARK_GRAFT_LUA_STATE_SPILL", None)
        else:
            os.environ["SPARK_GRAFT_LUA_STATE_SPILL"] = old


@pytest.mark.skipif(not os.path.exists(PBF), reason="fixture missing")
def test_spill_path_equals_broadcast_path(spark, li):
    nodes, ways, rels = li
    bc_adapter, bc = _run_config(nodes, ways, rels)  # default: broadcast
    sp_adapter, sp = _run_config(nodes, ways, rels, spill_threshold=0)

    # the paths actually diverged: broadcast keeps w2r/n2r in the
    # driver-merged state, the spill run never materializes them there
    bc_vars = (bc_adapter.last_state.get("vars") or {})
    sp_vars = (sp_adapter.last_state.get("vars") or {})
    keyed_slots = [s for s in bc_vars
                   if s.endswith((":w2r", ":n2r"))
                   and isinstance(bc_vars[s], dict) and bc_vars[s]]
    assert keyed_slots, "fixture has no keyed two-stage state"
    for s in keyed_slots:
        assert not (isinstance(sp_vars.get(s), dict) and sp_vars.get(s)), s

    # ...and the outputs are identical row-for-row
    assert set(bc) == set(sp)
    for name in bc:
        a, b = bc[name], sp[name]
        assert a.count() == b.count(), name
        assert a.count() > 0 or name not in ("lines",), name
        assert a.exceptAll(b).count() == 0, name
        assert b.exceptAll(a).count() == 0, name
