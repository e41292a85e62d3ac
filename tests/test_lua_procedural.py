"""Procedural flex-config execution (plans/lua_flex.py): real Lua
callbacks — interpreted by osm2pgsql_spark/lua — running distributed
through mapInPandas, checked against hand-written Python expectations
and, for places.lua / route-relations.lua, against twins on the real
Liechtenstein extract.

Reference behaviors pinned here: name-substructure building with
mid-iteration tag deletion (places.lua), two-stage w2r state flowing
from process_relation into stage-2 process_way (route-relations.lua,
output-flex.cpp:1506-1613), table id caches (turning-circles.lua,
in_id_cache returning 1-based indices), get_bbox BOX() formatting
(bbox.lua), relation -id in way-id tables (flex-table.cpp:107-130),
elseif branch routing (indexes.lua), and untagged dispatch
(output-flex.cpp:1135)."""

import json
import os
import tempfile

import pytest
from pyspark.sql import functions as F

from osm2pgsql_spark.plans.lua_config import load_lua_config
from osm2pgsql_spark.plans.lua_flex import LuaFlexAdapter
from osm2pgsql_spark.sources.opl import read_opl

FLEX = "/root/reference/flex-config"

OPL = """n1 Tplace=city,name=Bigtown,name:en=Bigtown,name:de=Grossstadt,population=100000 x9.0 y50.0
n2 Tplace=village,name=Smallville x9.1 y50.1
n3 Tamenity=pub,name=Ye%20%Olde x9.2 y50.2
n4 Tamenity=post_box,operator=Postal x9.3 y50.3
n5 Thighway=turning_circle x9.0 y50.0
n6 x9.01 y50.005
n7 Thighway=turning_circle x9.02 y50.0
n8 x9.03 y50.02
w100 Thighway=primary,name=Main%20%St Nn5,n6
w101 Thighway=secondary Nn6,n7
w102 Thighway=tertiary Nn7,n8
w103 Tbuilding=yes,name=Barn Nn5,n6,n8,n5
r200 Ttype=route,route=road,ref=A1 Mw100@,w101@
r201 Ttype=route,route=road,ref=B7 Mw100@
r202 Ttype=route,route=bicycle,ref=X9 Mw102@
r203 Ttype=multipolygon,landuse=forest Mw103@outer
r204 Ttype=boundary,boundary=administrative Mw100@,w101@
"""


@pytest.fixture(scope="module")
def osm(spark):
    with tempfile.NamedTemporaryFile("w", suffix=".opl", delete=False) as fh:
        fh.write(OPL)
        path = fh.name
    nodes, ways, rels = read_opl(spark, path)
    return nodes.cache(), ways.cache(), rels.cache()


def run_config(name, osm):
    nodes, ways, rels = osm
    adapter = LuaFlexAdapter(open(os.path.join(FLEX, name)).read())
    return adapter.run(nodes=nodes, ways=ways, relations=rels)


class TestPlaces:
    def test_places_names_substructure(self, spark, osm):
        t = run_config("places.lua", osm)
        rows = {r["osm_id"]: json.loads(r["tags"]) for r in t["places"].collect()}
        assert set(rows) == {1, 2}
        # names moved into the substructure, keyed by language
        assert rows[1]["names"] == {
            "": "Bigtown", "en": "Bigtown", "de": "Grossstadt"}
        assert "name" not in rows[1]
        assert "name:en" not in rows[1]
        # population converted to a JSON number
        assert rows[1]["population"] == 100000
        assert rows[2]["names"] == {"": "Smallville"}
        # geometry present and projected to 3857 (the default)
        assert all(r["geom"] is not None for r in t["places"].collect())


class TestRouteRelations:
    def test_two_stage_w2r(self, spark, osm):
        t = run_config("route-relations.lua", osm)
        hw = {r["osm_id"]: r for r in t["highways"].collect()}
        assert set(hw) == {100, 101, 102}
        # w100 in r200 (A1) and r201 (B7): refs sorted, ids sorted
        assert hw[100]["rel_refs"] == "A1,B7"
        assert hw[100]["rel_ids"] == "{200,201}"
        assert hw[101]["rel_refs"] == "A1"
        assert hw[101]["rel_ids"] == "{200}"
        # w102 only in the bicycle route -> not marked, no rel data
        assert hw[102]["rel_refs"] is None
        assert hw[102]["rel_ids"] is None
        routes = sorted(r["osm_id"] for r in t["routes"].collect())
        assert routes == [200, 201]


class TestIdCache:
    def test_turning_circles(self, spark, osm):
        t = run_config("turning-circles.lua", osm)
        tc = sorted(r["osm_id"] for r in t["turning_circles"].collect())
        assert tc == [5, 7]
        ends = sorted(
            (r["osm_id"], r["node_id"]) for r in t["highway_ends"].collect())
        # w100 contains n5; w101 and w102 contain n7; w103 not a highway
        assert ends == [(100, 5), (101, 7), (102, 7)]
        for r in t["highway_ends"].collect():
            assert r["geom"] is not None


class TestBbox:
    def test_box2d_formatting_and_area_ids(self, spark, osm):
        t = run_config("bbox.lua", osm)
        pois = {r["osm_id"]: r["bbox"] for r in t["pois"].collect()}
        assert pois[1] == "BOX(9.0 50.0,9.0 50.0)"
        ways_b = {r["osm_id"]: r["bbox"] for r in t["ways"].collect()}
        assert ways_b[100] == "BOX(9.0 50.0,9.01 50.005)"
        polys = {r["osm_id"]: json.loads(r["tags"]) for r in t["polygons"].collect()}
        # closed building way positive; multipolygon relation negative
        assert 103 in polys and -203 in polys
        assert polys[-203] == {"landuse": "forest"}
        bounds = {r["osm_id"]: r["type"] for r in t["boundaries"].collect()}
        assert bounds == {204: "administrative"}


class TestIndexes:
    def test_elseif_routing_and_secondary_geometry(self, spark, osm):
        t = run_config("indexes.lua", osm)
        assert sorted(r["osm_id"] for r in t["pubs"].collect()) == [3]
        assert [r["name"] for r in t["pubs"].collect()] == ["Ye Olde"]
        assert sorted(r["osm_id"] for r in t["postboxes"].collect()) == [4]
        assert [r["operator"] for r in t["postboxes"].collect()] == ["Postal"]
        # polygons carries BOTH geometry columns: geom and its centroid
        polys = t["polygons"].collect()
        assert len(polys) == 1 and polys[0]["osm_id"] == 103
        assert polys[0]["geom"] is not None
        assert polys[0]["center"] is not None
        # center is a point inside the polygon's bbox
        from osm2pgsql_spark.functions import geometry as G

        cx, cy = G.from_wkb(bytes(polys[0]["center"]))[1]
        bx = G.get_bbox(G.from_wkb(bytes(polys[0]["geom"])))
        assert bx[0] <= cx <= bx[2] and bx[1] <= cy <= bx[3]


class TestCompatible:
    def test_c_transform_emulation(self, spark, osm):
        t = run_config("compatible.lua", osm)
        line = {r["osm_id"]: r for r in t["planet_osm_line"].collect()}
        # z_order lookup: primary=37+, secondary=36, tertiary=34
        assert line[100]["z_order"] == 37
        assert line[101]["z_order"] == 36
        assert line[102]["z_order"] == 34
        # boundary relation split into member lines with NEGATIVE id
        assert -204 in line
        roads = {r["osm_id"] for r in t["planet_osm_roads"].collect()}
        # primary+secondary are roads; boundary=administrative too
        assert {100, 101, -204} <= roads
        polys = {r["osm_id"]: r for r in t["planet_osm_polygon"].collect()}
        assert 103 in polys and -203 in polys
        assert polys[103]["way_area"] is not None
        assert polys[103]["way_area"] > 0
        assert polys[103]["building"] == "yes"


class TestUntagged:
    def test_untagged_dispatch(self, spark, osm):
        t = run_config("untagged.lua", osm)
        # untagged.lua stores tagged and untagged nodes/ways (its
        # process_untagged_node only keeps nodes, reference example)
        node_ids = sorted(r["osm_id"] for r in t["nodes"].collect())
        assert 6 in node_ids and 8 in node_ids  # untagged present


class TestAttributes:
    def test_timestamp_formatting(self, spark):
        # OPL with explicit attributes: version, timestamp, changeset
        opl = (
            "n1 v3 c77 t2013-03-28T14:01:55Z i42 uMapper Tamenity=pub x9.0 y50.0\n"
            "w10 v2 c78 t2014-01-01T00:00:00Z i42 uMapper Thighway=track Nn1,n1\n"
        )
        with tempfile.NamedTemporaryFile("w", suffix=".opl", delete=False) as fh:
            fh.write(opl)
            path = fh.name
        nodes, ways, rels = read_opl(spark, path)
        adapter = LuaFlexAdapter(open(os.path.join(FLEX, "attributes.lua")).read())
        t = adapter.run(nodes=nodes, ways=ways, relations=rels)
        row = t["nodes"].collect()[0]
        assert row["version"] == 3
        assert row["changeset"] == 77
        assert row["uid"] == 42
        assert row["user"] == "Mapper"
        # os.date('!%Y-%m-%dT%H:%M:%SZ', ts) -> timestamp column
        assert str(row["created"]) == "2013-03-28 14:01:55"


class TestLoadFallback:
    def test_all_toplevel_configs_load(self, spark):
        """Every reference flex config now loads: declarative subset
        through the Catalyst compiler, the rest through the Lua
        interpreter."""
        from osm2pgsql_spark.plans.flex import FlexConfig

        engines = {}
        for fn in sorted(os.listdir(FLEX)):
            if not fn.endswith(".lua"):
                continue
            cfg, model = load_lua_config(os.path.join(FLEX, fn))
            assert model.tables, fn
            engines[fn] = (
                "declarative" if isinstance(cfg, FlexConfig) else "interp")
        assert len(engines) == 20
        # the fast path still takes the declarative family
        assert engines["generic.lua"] == "declarative"
        assert engines["simple.lua"] == "declarative"
        # and the procedural family runs on the interpreter
        assert engines["places.lua"] == "interp"
        assert engines["compatible.lua"] == "interp"
        assert engines["route-relations.lua"] == "interp"


PBF = "/root/reference/tests/data/liechtenstein-2013-08-03.osm.pbf"


@pytest.fixture(scope="module")
def osm_li(spark):
    from osm2pgsql_spark.sources.pbf import read_pbf

    nodes, ways, rels = read_pbf(spark, PBF)
    return nodes.cache(), ways.cache(), rels.cache()


@pytest.mark.skipif(not os.path.exists(PBF), reason="fixture missing")
class TestLiechtenstein:
    """places.lua and route-relations.lua on the real country extract,
    checked against hand-written Python twins of the same logic."""

    def test_places_vs_python_twin(self, spark, osm_li):
        nodes, ways, rels = osm_li
        adapter = LuaFlexAdapter(open(os.path.join(FLEX, "places.lua")).read())
        lua = adapter.run(nodes=nodes)["places"]
        got = {r["osm_id"]: json.loads(r["tags"]) for r in lua.collect()}

        # twin: plain PySpark + python, no Lua
        import pandas as pd

        place_nodes = nodes.where(F.col("tags")["place"].isNotNull())
        expect = {}
        for r in place_nodes.select("id", "tags").collect():
            tags = dict(r["tags"])
            names = {}
            for k in list(tags):
                if k == "name":
                    names[""] = tags.pop(k)
                elif k.startswith("name:"):
                    names[k[5:]] = tags.pop(k)
            if names:
                tags["names"] = names
            if "population" in tags:
                try:
                    tags["population"] = int(tags["population"])
                except ValueError:
                    try:
                        tags["population"] = float(tags["population"])
                    except ValueError:
                        del tags["population"]
            expect[r["id"]] = tags
        assert len(got) == len(expect) >= 20
        assert got == expect

    def test_route_relations_vs_python_twin(self, spark, osm_li):
        nodes, ways, rels = osm_li
        adapter = LuaFlexAdapter(
            open(os.path.join(FLEX, "route-relations.lua")).read())
        out = adapter.run(nodes=nodes, ways=ways, relations=rels)
        hw = {r["osm_id"]: (r["rel_refs"], r["rel_ids"])
              for r in out["highways"].collect()}

        # twin: road-route relations joined onto member highways
        routes = rels.where(
            (F.col("tags")["type"] == "route")
            & (F.col("tags")["route"] == "road")
            & F.col("tags")["ref"].isNotNull()
        ).select(F.col("id").alias("rel_id"), F.col("tags")["ref"].alias("ref"),
                 F.explode("members").alias("m"))
        wmem = routes.where(F.col("m.type") == "w").select(
            "rel_id", "ref", F.col("m.ref").alias("way_id"))
        agg = wmem.groupBy("way_id").agg(
            F.concat_ws(",", F.array_sort(F.collect_set("ref"))).alias("rel_refs"),
            F.concat(
                F.lit("{"),
                F.concat_ws(",", F.array_sort(F.collect_set("rel_id"))),
                F.lit("}"),
            ).alias("rel_ids"),
        )
        hw_twin = (
            ways.where(F.col("tags")["highway"].isNotNull())
            .join(agg, ways["id"] == agg["way_id"], "left")
            .select("id", "rel_refs", "rel_ids")
        )
        expect = {r["id"]: (r["rel_refs"], r["rel_ids"])
                  for r in hw_twin.collect()}
        assert len(hw) == len(expect) > 1000
        assert hw == expect
        # and at least some ways actually carry relation data
        assert sum(1 for v in hw.values() if v[0] is not None) > 5


class TestPublicTransport:
    """public-transport.lua: two-stage with NODE marks — stops insert
    only at stage 2 (osm2pgsql.stage check in the callback), rel data
    flows from route relations into member stops and ways, stop areas
    get a centroid + bbox-diagonal radius."""

    def test_public_transport_two_stage(self, spark):
        opl = (
            "n1 Tpublic_transport=stop_position,name=Central x9.0 y50.0\n"
            "n2 Tpublic_transport=stop_position,name=Mall x9.01 y50.0\n"
            "n3 Tpublic_transport=stop_position,name=Nowhere x9.5 y50.5\n"
            "n4 x9.0 y50.001\n"
            "n5 x9.01 y50.001\n"
            "w10 Thighway=residential Nn4,n5\n"
            "w11 Trailway=tram Nn4,n5\n"
            "w12 Tbuilding=yes Nn4,n5\n"
            "r100 Ttype=route,route=bus,ref=42,from=A,to=B "
            "Mn1@stop,n2@stop,w10@\n"
            "r101 Ttype=route,route=tram,ref=7 Mn2@stop,w11@\n"
            "r102 Ttype=route,route=road,ref=X1 Mw10@\n"
            "r103 Ttype=public_transport,public_transport=stop_area "
            "Mn1@,n2@\n"
        )
        import tempfile

        with tempfile.NamedTemporaryFile("w", suffix=".opl", delete=False) as fh:
            fh.write(opl)
            path = fh.name
        nodes, ways, rels = read_opl(spark, path)
        adapter = LuaFlexAdapter(
            open(os.path.join(FLEX, "public-transport.lua")).read())
        t = adapter.run(nodes=nodes, ways=ways, relations=rels)

        # stops: ONLY marked stop nodes (stage-2 processing); n3 is
        # tagged but in no route -> absent
        stops = {r["osm_id"]: (r["rel_refs"], r["rel_ids"])
                 for r in t["stops"].collect()}
        assert set(stops) == {1, 2}
        assert stops[1] == ("42", "{100}")
        assert stops[2] == ("42·7", "{100,101}")  # middle-dot join

        # lines: all highway/railway ways; marked ones carry rel data
        lines = {r["osm_id"]: (r["rel_refs"], r["rel_ids"])
                 for r in t["lines"].collect()}
        assert set(lines) == {10, 11}
        assert lines[10] == ("42", "{100}")   # road route r102 not a PT route
        assert lines[11] == ("7", "{101}")

        routes = {r["osm_id"]: (r["type"], r["ref"], r["from"], r["to"])
                  for r in t["routes"].collect()}
        assert routes == {
            100: ("bus", "42", "A", "B"),
            101: ("tram", "7", None, None),
        }

        areas = t["stop_areas"].collect()
        assert len(areas) == 1
        assert areas[0]["osm_id"] == 103
        assert areas[0]["radius"] > 0
        assert areas[0]["geom"] is not None


class TestDataTypes:
    """data-types.lua: direction/bool column conversions, serial
    create_only, int8[] via table.concat, mph maxspeed parsing, the
    whitelist lookup table built in a chunk-level for loop."""

    def test_typed_columns(self, spark):
        import tempfile

        opl = (
            "n1 x9.0 y50.0\nn2 x9.01 y50.0\n"
            "w10 Thighway=residential,name=A,maxspeed=30,oneway=yes,"
            "lit=yes Nn1,n2\n"
            "w11 Thighway=motorway,maxspeed=55%20%mph,oneway=-1,lit=no "
            "Nn1,n2\n"
            "w12 Thighway=footway Nn1,n2\n"          # not in whitelist
            "w13 Tcreated_by=JOSM Nn1,n2\n"          # cleaned to empty
            "w14 Thighway=track,oneway=maybe Nn1,n2\n"
        )
        with tempfile.NamedTemporaryFile("w", suffix=".opl", delete=False) as fh:
            fh.write(opl)
            path = fh.name
        nodes, ways, rels = read_opl(spark, path)
        adapter = LuaFlexAdapter(
            open(os.path.join(FLEX, "data-types.lua")).read())
        t = adapter.run(nodes=nodes, ways=ways, relations=rels)
        rows = {r["osm_id"]: r for r in t["highways"].collect()}
        assert set(rows) == {10, 11, 14}
        r10 = rows[10]
        assert (r10["name"], r10["type"]) == ("A", "residential")
        assert r10["oneway"] == 1          # direction: yes -> 1
        assert r10["maxspeed"] == 30
        assert r10["lit"] is True
        assert r10["nodes"] == "{1,2}"     # int8[] text form
        r11 = rows[11]
        assert r11["oneway"] == -1
        assert r11["maxspeed"] == 88       # floor(55 * 1.60934)
        assert r11["lit"] is False
        # unknown direction STRINGS are NULL (flex-write.cpp:71-90
        # write_null — the config's own comment says 0, the code says
        # otherwise); absent oneway goes through `or 0` as a Lua
        # NUMBER -> sgn -> 0
        assert rows[14]["oneway"] is None
        # grab_tag removed highway+name from the jsonb tags
        assert "highway" not in json.loads(r10["tags"])


class TestAddresses:
    """addresses.lua: multiple-return helper (any, addr), addr:* key
    extraction, centroid geometries for closed ways and
    multipolygons."""

    def test_addresses(self, spark):
        import tempfile

        opl = (
            "n1 Taddr:housenumber=1,addr:street=Main,name=One x9.0 y50.0\n"
            "n2 Taddr:housenumber=2 x9.1 y50.1\n"     # count==1 -> skipped
            "n3 x9.0 y50.0\nn4 x9.02 y50.0\nn5 x9.02 y50.02\nn6 x9.0 y50.02\n"
            "w10 Taddr:housenumber=3,addr:city=Town,building=yes "
            "Nn3,n4,n5,n6,n3\n"
            "r100 Ttype=multipolygon,addr:housenumber=4,addr:postcode=999 "
            "Mw10@outer\n"
        )
        with tempfile.NamedTemporaryFile("w", suffix=".opl", delete=False) as fh:
            fh.write(opl)
            path = fh.name
        nodes, ways, rels = read_opl(spark, path)
        adapter = LuaFlexAdapter(
            open(os.path.join(FLEX, "addresses.lua")).read())
        t = adapter.run(nodes=nodes, ways=ways, relations=rels)
        rows = {(r["osm_type"], r["osm_id"]): r for r in t["addrs"].collect()}
        assert set(rows) == {("n", 1), ("w", 10), ("r", 100)}
        assert rows[("n", 1)]["housenumber"] == "1"
        assert rows[("n", 1)]["street"] == "Main"
        assert rows[("n", 1)]["name"] == "One"
        assert rows[("w", 10)]["city"] == "Town"
        assert rows[("r", 100)]["postcode"] == "999"
        # way/relation geometries are centroids of the square; the
        # geom column declares projection = 4326, so values stay lon/lat
        from osm2pgsql_spark.functions import geometry as G

        for key in (("w", 10), ("r", 100)):
            g = G.from_wkb(bytes(rows[key]["geom"]))
            assert abs(g[1][0] - 9.01) < 1e-6
            assert abs(g[1][1] - 50.01) < 1e-6


@pytest.mark.skipif(not os.path.exists(PBF), reason="fixture missing")
class TestCompatibleCrossEngine:
    """compatible.lua (the 766-line C-transform emulation, interpreted)
    vs plans/pgsql_compat (the Catalyst C-transform twin) on the real
    Liechtenstein extract: every way both engines render agrees on
    z_order exactly; row counts pinned as regression values.  Count
    differences between the engines are config policy (compatible.lua
    renders only its column list, adds relation rows, multi_geometry
    =false), not bugs — the shared-way z_order check is the
    cross-engine invariant."""

    def test_z_order_parity_and_counts(self, spark, osm_li):
        from osm2pgsql_spark.plans.pgsql_compat import planet_osm_tables

        nodes, ways, rels = osm_li
        adapter = LuaFlexAdapter(
            open(os.path.join(FLEX, "compatible.lua")).read())
        lua = adapter.run(nodes=nodes, ways=ways, relations=rels)
        cat = planet_osm_tables(nodes, ways)

        counts = {t: lua[t].count() for t in lua}
        assert counts == {
            "planet_osm_point": 1342,
            "planet_osm_line": 3297,
            "planet_osm_polygon": 4131,
            "planet_osm_roads": 374,
        }

        lz = lua["planet_osm_line"].where(F.col("osm_id") > 0).select(
            "osm_id", F.col("z_order").alias("lz"))
        cz = cat["planet_osm_line"].select(
            "osm_id", F.col("z_order").alias("cz"))
        shared = lz.join(cz, "osm_id")
        n_shared = shared.count()
        assert n_shared > 2900
        assert shared.where(F.col("lz") != F.col("cz")).count() == 0

        # roads is a subset of line in both engines
        roads_ids = {r["osm_id"] for r in
                     lua["planet_osm_roads"].select("osm_id").collect()}
        line_ids = {r["osm_id"] for r in
                    lua["planet_osm_line"].select("osm_id").collect()}
        assert roads_ids <= line_ids
