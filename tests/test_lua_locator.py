"""Locator Lua API on the interpreter path (reference
src/flex-lua-locator.cpp:73-80 + flex-config/locator/*): define_locator,
add_bbox, add_from_db (DuckDB region source standing in for live PG),
all_intersecting / first_intersecting with EXACT geometry tests, and
iceland.lua end-to-end against a Python-DSL twin."""

import os
import tempfile

import numpy as np
import pytest
from pyspark.sql import functions as F

from osm2pgsql_spark.functions import geometry as G
from osm2pgsql_spark.operators.locator import LocatorIndex
from osm2pgsql_spark.plans.lua_flex import LuaFlexAdapter
from osm2pgsql_spark.sources.opl import read_opl

FLEX = "/root/reference/flex-config"


class TestLocatorIndex:
    def test_bbox_exact_line_tests(self):
        ix = LocatorIndex()
        ix.add_bbox("IS", -25.0, 62.0, -12.0, 68.0)
        inside = G.make_linestring([(-20.0, 64.0), (-19.0, 64.5)])
        outside = G.make_linestring([(50.0, 50.0), (51.0, 51.0)])
        crossing = G.make_linestring([(-30.0, 60.0), (-10.0, 70.0)])
        # bbox of this line overlaps the box, the line itself does NOT:
        # the exact segment test must reject it
        near_miss = G.make_linestring([(-26.0, 61.9), (-24.9, 61.0)])
        assert ix.all_intersecting(inside) == ["IS"]
        assert ix.all_intersecting(outside) == []
        assert ix.all_intersecting(crossing) == ["IS"]
        assert ix.all_intersecting(near_miss) == []
        assert ix.first_intersecting(inside) == "IS"
        assert ix.first_intersecting(outside) is None

    def test_polygon_regions(self):
        ix = LocatorIndex()
        ring = np.array([(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)], float)
        ix.add_polygon("P", ("polygon", [ring]))
        assert ix.all_intersecting(G.make_point(5, 5)) == ["P"]
        assert ix.all_intersecting(G.make_point(15, 5)) == []
        assert ix.all_intersecting(
            G.make_linestring([(-5, 5), (15, 5)])) == ["P"]
        # region fully inside a big probe polygon
        big = ("polygon", [np.array(
            [(-5, -5), (15, -5), (15, 15), (-5, 15), (-5, -5)], float)])
        assert ix.all_intersecting(big) == ["P"]

    def test_overlapping_regions_order(self):
        ix = LocatorIndex()
        ix.add_bbox("A", 0, 0, 10, 10)
        ix.add_bbox("B", 5, 5, 15, 15)
        assert ix.all_intersecting(G.make_point(7, 7)) == ["A", "B"]
        assert ix.first_intersecting(G.make_point(7, 7)) == "A"


OPL = """n1 x-20.0 y64.0
n2 x-19.5 y64.2
n3 x9.0 y50.0
n4 x9.1 y50.1
w100 Thighway=primary,name=Route%20%One,ref=1 Nn1,n2
w101 Thighway=secondary Nn3,n4
w102 Tbuilding=yes Nn1,n2
"""


@pytest.fixture(scope="module")
def osm(spark):
    with tempfile.NamedTemporaryFile("w", suffix=".opl", delete=False) as fh:
        fh.write(OPL)
        path = fh.name
    nodes, ways, rels = read_opl(spark, path)
    return nodes.cache(), ways.cache(), rels.cache()


class TestIcelandE2E:
    def test_iceland_lua_vs_python_twin(self, spark, osm):
        nodes, ways, rels = osm
        adapter = LuaFlexAdapter(
            open(os.path.join(FLEX, "locator", "iceland.lua")).read())
        t = adapter.run(nodes=nodes, ways=ways, relations=rels)
        got = {r["osm_id"]: (r["hwtype"], r["name"], r["ref"])
               for r in t["highways"].collect()}
        # only the way inside the Iceland bbox survives
        assert got == {100: ("primary", "Route One", "1")}

        # twin: pure DataFrame filter on the same bbox
        hw = ways.where(F.col("tags")["highway"].isNotNull())
        pts = hw.select("id", F.explode("refs").alias("ref_id")).join(
            nodes.select(F.col("id").alias("ref_id"), "lon", "lat"), "ref_id")
        in_box = pts.where(
            (F.col("lon") >= -25.0) & (F.col("lon") <= -12.0)
            & (F.col("lat") >= 62.0) & (F.col("lat") <= 68.0)
        ).select("id").distinct()
        assert sorted(r["id"] for r in in_box.collect()) == sorted(got)

    def test_import_tool_style(self, spark, osm, tmp_path):
        """iceland.lua through the import_tool --style route."""
        import sys

        sys.path.insert(0, "/root/repo/tools")
        try:
            from import_tool import load_style
        finally:
            sys.path.pop(0)
        style_fn, id_spaces = load_style(
            os.path.join(FLEX, "locator", "iceland.lua"))
        nodes, ways, rels = osm
        tables = style_fn(spark, nodes, ways, rels)
        assert sorted(r["osm_id"] for r in tables["highways"].collect()) == [100]
        assert id_spaces == {"highways": "way"}


class TestAddFromDb:
    def test_motorway_colours_duckdb_regions(self, spark, osm, tmp_path):
        """add_from_db serves regions from a DuckDB database (the
        environment's stand-in for live PostgreSQL): motorway-colours
        assigns per-country colours via first_intersecting."""
        import duckdb

        db = str(tmp_path / "regions.duckdb")
        con = duckdb.connect(db)
        ring_de = np.array([(-25, 60), (0, 60), (0, 70), (-25, 70), (-25, 60)],
                           float)
        ring_fr = np.array([(5, 45), (15, 45), (15, 55), (5, 55), (5, 45)],
                           float)
        con.execute("CREATE TABLE countries (code TEXT, geom BLOB)")
        con.execute("INSERT INTO countries VALUES (?, ?), (?, ?)", [
            "DE", G.to_wkb(("polygon", [ring_de])),
            "FR", G.to_wkb(("polygon", [ring_fr])),
        ])
        con.close()

        src = open(os.path.join(
            FLEX, "locator", "motorway-colours.lua")).read()
        # the config's SQL uses PostGIS ST_Subdivide; the DuckDB twin
        # serves pre-split (code, wkb) rows with plain SQL
        src = src.replace(
            "'SELECT code, ST_Subdivide(geom, 200) FROM countries'",
            "'SELECT code, geom FROM countries'")
        adapter = LuaFlexAdapter(src, region_db=db)
        nodes, ways, rels = osm
        t = adapter.run(nodes=nodes, ways=ways, relations=rels)
        rows = {r["osm_id"]: (r["country"], r["colour"])
                for r in t["highways"].collect()}
        assert rows[100] == ("DE", "#174688")   # Iceland-bbox way -> DE ring
        assert rows[101] == ("FR", "#333b97")

    def test_add_from_db_without_region_db_raises(self, spark, osm):
        src = """
local loc = osm2pgsql.define_locator({ name = 'x' })
loc:add_from_db('SELECT 1')
local t = osm2pgsql.define_node_table('t', {{ column = 'a', type = 'text' }})
function osm2pgsql.process_node(object) end
"""
        from osm2pgsql_spark.lua.interp import LuaRuntimeError

        with pytest.raises(LuaRuntimeError, match="region database"):
            LuaFlexAdapter(src)


class TestImportCountries:
    def test_import_countries_splits_multipolygons(self, spark):
        """import-countries.lua: admin-2 boundaries with valid ISO
        codes, multipolygons split per part (the geometries() loop)."""
        opl = (
            "n1 x0.0 y0.0\nn2 x1.0 y0.0\nn3 x1.0 y1.0\nn4 x0.0 y1.0\n"
            "n5 x5.0 y5.0\nn6 x6.0 y5.0\nn7 x6.0 y6.0\nn8 x5.0 y6.0\n"
            "w10 Nn1,n2,n3,n4,n1\n"
            "w11 Nn5,n6,n7,n8,n5\n"
            "r100 Ttype=boundary,boundary=administrative,admin_level=2,"
            "ISO3166-1=AB Mw10@outer,w11@outer\n"
            "r101 Ttype=boundary,boundary=administrative,admin_level=2,"
            "ISO3166-1=bad Mw10@outer\n"
        )
        with tempfile.NamedTemporaryFile("w", suffix=".opl", delete=False) as fh:
            fh.write(opl)
            path = fh.name
        nodes, ways, rels = read_opl(spark, path)
        adapter = LuaFlexAdapter(
            open(os.path.join(FLEX, "locator", "import-countries.lua")).read())
        t = adapter.run(nodes=nodes, ways=ways, relations=rels)
        rows = t["countries"].collect()
        # two parts of the AB multipolygon, one row each; the invalid
        # ISO code ('bad' fails ^%u%u$) is skipped
        assert [r["code"] for r in rows] == ["AB", "AB"]
        assert all(r["geom"] is not None for r in rows)
