"""Style-driven legacy pgsql output, pinned against the reference's
own unit-test fixtures:

- int4 conversion (test-output-pgsql-int4.cpp): all 23 population
  values incl. sscanf("%18lld-%18lld") range means and overflow-NULLs;
- hstore --hstore-match-only (test-output-pgsql-hstore-match-only.cpp):
  table counts 6/7/12/3 and the all-nocolumn schema;
- way_area (test-output-pgsql.cpp "way area slim flatnode"): 0/0/0/1;
- route relation (test-output-pgsql.cpp "route relation slim
  flatnode"): 0/2/1/0 with the synthetic route tags;
plus direct escape-kernel cases from table.cpp:362-414."""

import math

import pytest
from pyspark.sql import functions as F

from osm2pgsql_spark.plans.pgsql_style import (
    StylePlan,
    int4_escape,
    planet_tables_styled,
    real_escape,
)
from osm2pgsql_spark.plans.style_file import parse_style, read_style_file
from osm2pgsql_spark.sources.osm_xml import read_osm_xml

DATA = "/root/reference/tests/data/"
DEFAULT_STYLE = "/root/reference/default.style"


def _tables(spark, osm, style_path, srid=3857, **opts):
    nodes, ways, rels = read_osm_xml(spark, DATA + osm)
    exlist, enable_way_area = read_style_file(style_path)
    plan = StylePlan(exlist, enable_way_area=enable_way_area, **opts)
    return planet_tables_styled(nodes, ways, rels, plan=plan, srid=srid)


def test_int4_conversion(spark):
    t = _tables(spark, "test_output_pgsql_int4.osm", DATA + "test_output_pgsql_int4.style")
    got = {
        r["osm_id"]: r["population"]
        for r in t["planet_osm_point"].select("osm_id", "population").collect()
    }
    want = {
        1: None, 2: None, 3: None,           # out of int4 range
        4: 2147483647, 5: 10000, 6: -10000, 7: -2147483648,
        8: None, 9: None, 10: None,          # out of range negative
        11: None, 12: None,                  # ranges out of range
        13: 2147483647, 14: 15000, 15: -15000, 16: -2147483648,
        17: None, 18: None,                  # negative ranges out of range
        19: None, 20: None, 21: None, 22: None,  # invalid
        23: 0,
    }
    assert got == want


def test_hstore_match_only(spark):
    t = _tables(
        spark,
        "hstore-match-only.osm",
        DATA + "hstore-match-only.style",
        hstore_mode="norm",
        hstore_match_only=True,
    )
    # every style entry is nocolumn; only z_order/way_area/tags remain
    assert t["planet_osm_point"].columns == ["osm_id", "z_order", "tags", "lon", "lat"]
    assert t["planet_osm_line"].columns == ["osm_id", "z_order", "way_area", "tags", "way"]
    # the reference fixture: 19 tagged ways + 7 tagged nodes, of which
    # 18 ways / 6 nodes carry an interesting tag, plus one relation
    assert t["planet_osm_point"].count() == 6
    assert t["planet_osm_polygon"].count() == 7
    assert t["planet_osm_line"].count() == 12
    assert t["planet_osm_roads"].count() == 3


@pytest.mark.slow
def test_way_area_fixture(spark):
    t = _tables(spark, "test_output_pgsql_way_area.osm", DEFAULT_STYLE)
    assert t["planet_osm_point"].count() == 0
    assert t["planet_osm_line"].count() == 0
    assert t["planet_osm_roads"].count() == 0
    rows = t["planet_osm_polygon"].select("osm_id", "way_area", "leisure").collect()
    assert len(rows) == 1
    assert rows[0]["osm_id"] == 1
    assert rows[0]["leisure"] == "playground"
    assert rows[0]["way_area"] > 0


@pytest.mark.slow
def test_route_relation(spark):
    t = _tables(spark, "test_output_pgsql_route_rel.osm", DEFAULT_STYLE)
    assert t["planet_osm_point"].count() == 0
    assert t["planet_osm_polygon"].count() == 0
    lines = t["planet_osm_line"].select("osm_id", "highway", "route").collect()
    assert sorted(r["osm_id"] for r in lines) == [-1, 1]
    by_id = {r["osm_id"]: r for r in lines}
    assert by_id[1]["highway"] == "primary"
    assert by_id[-1]["route"] == "road"
    roads = t["planet_osm_roads"].select("osm_id").collect()
    assert [r["osm_id"] for r in roads] == [1]


# ---- escape kernels straight off table.cpp:362-414 ----


def _run_escape(spark, fn, values):
    df = spark.createDataFrame([(v,) for v in values], "v string")
    return [r["o"] for r in df.select(fn(F.col("v")).alias("o")).collect()]


def test_int4_escape_cases(spark):
    cases = {
        "0": 0,
        " 42": 42,
        "+5": 5,
        "10 000": 10,          # parse stops at the space
        "10000-20000": 15000,
        "-10000--20000": -15000,
        "10- 20": 15,          # %lld skips whitespace after the dash
        "10 -20": 10,          # ...but the dash must follow immediately
        "2147483646-2147483648": 2147483647,
        "-2147483647--2147483649": -2147483648,
        "3000000000": None,
        "abc": None,
        "": None,
        "-": None,
        "--": None,
        "000000000000000000005": 0,  # 18-char field width: 18 zeros parse, '5' terminates
    }
    got = _run_escape(spark, int4_escape, list(cases))
    assert got == list(cases.values())


def test_real_escape_cases(spark):
    cases = {
        "5.5": 5.5,
        "5,5": 5.5,            # comma repaired to decimal point
        "10-20": 15.0,
        "6ft": 6 * 0.3048,
        "3-6ft": (3 * 0.3048 + 6 * 0.3048) / 2,
        "1e2": 100.0,
        ".5": 0.5,
        "-5.5": -5.5,
        "5.5m": 5.5,           # trailing junk that isn't 'ft'
        "abc": None,
        "": None,
        "ft": None,
    }
    got = _run_escape(spark, real_escape, list(cases))
    for g, w in zip(got, cases.values()):
        if w is None:
            assert g is None
        else:
            assert g == pytest.approx(w, rel=1e-6)


def test_match_only_cleared_without_hstore():
    exlist, _ = parse_style("node,way highway text linear\n")
    plan = StylePlan(exlist, hstore_match_only=True)
    # silently cleared, like command-line-parser.cpp:189-192
    assert not plan.hstore_match_only


# ---- phstore flag + way_area in hstore-all (table.cpp:285-345) ----

PHSTORE_STYLE = """\
way   z_order   int4  linear
way   way_area  real
node,way  highway   text  linear
node,way  landuse   text  phstore
"""

PHSTORE_OSM = """<?xml version='1.0'?>
<osm version="0.6">
 <node id="1" lat="50.0" lon="9.0"/>
 <node id="2" lat="50.0" lon="9.001"/>
 <node id="3" lat="50.001" lon="9.001"/>
 <node id="4" lat="50.001" lon="9.0"/>
 <way id="100"><nd ref="1"/><nd ref="2"/><nd ref="3"/><nd ref="4"/><nd ref="1"/>
   <tag k="landuse" v="forest"/></way>
 <way id="101"><nd ref="1"/><nd ref="2"/>
   <tag k="highway" v="residential"/></way>
</osm>
"""


def _tables_text(spark, osm_text, style_text, tmp_path, **opts):
    osm = tmp_path / "in.osm"
    osm.write_text(osm_text)
    nodes, ways, rels = read_osm_xml(spark, str(osm))
    exlist, enable_way_area = parse_style(style_text)
    plan = StylePlan(exlist, enable_way_area=enable_way_area, **opts)
    return planet_tables_styled(nodes, ways, rels, plan=plan, srid=3857)


def test_phstore_is_nocolumn_plus_polygon(spark, tmp_path):
    """FLAG_PHSTORE aliases nocolumn+polygon (taginfo-impl.hpp:30-31):
    the entry keeps the object, makes the closed way a polygon, gets
    no column of its own, and the tag lands in the hstore."""
    t = _tables_text(spark, PHSTORE_OSM, PHSTORE_STYLE, tmp_path,
                     hstore_mode="norm")
    # landuse must NOT be a column anywhere
    for tbl in t.values():
        assert "landuse" not in tbl.columns
    polys = t["planet_osm_polygon"].collect()
    assert [r["osm_id"] for r in polys] == [100]
    assert polys[0]["tags"] == {"landuse": "forest"}
    lines = t["planet_osm_line"].select("osm_id").collect()
    assert [r["osm_id"] for r in lines] == [101]


def test_phstore_without_hstore_keeps_object(spark, tmp_path):
    """Without hstore output the phstore tag has nowhere to land but
    still keeps the object and still forces the polygon route."""
    t = _tables_text(spark, PHSTORE_OSM, PHSTORE_STYLE, tmp_path)
    polys = t["planet_osm_polygon"].collect()
    assert [r["osm_id"] for r in polys] == [100]
    assert "tags" not in t["planet_osm_polygon"].columns


def test_way_area_in_hstore_all(spark, tmp_path):
    """hstore mode 'all': the engine-set synthetic way_area tag rides
    in the tags hstore with {:g} formatting (output-pgsql.cpp:100-104,
    table.cpp:305-320: the used[] exclusion only applies in norm
    mode); norm mode excludes it because the column consumed it."""
    t_all = _tables_text(spark, PHSTORE_OSM, PHSTORE_STYLE, tmp_path,
                         hstore_mode="all")
    row = t_all["planet_osm_polygon"].collect()[0]
    assert "way_area" in row["tags"]
    assert math.isclose(float(row["tags"]["way_area"]), row["way_area"],
                        rel_tol=1e-5)
    # %g formatting: 6 significant digits, no trailing zeros
    assert row["tags"]["way_area"] == "%g" % float(row["tags"]["way_area"])
    # z_order stays excluded even in 'all'
    assert "z_order" not in row["tags"]

    t_norm = _tables_text(spark, PHSTORE_OSM, PHSTORE_STYLE, tmp_path,
                          hstore_mode="norm")
    row_n = t_norm["planet_osm_polygon"].collect()[0]
    assert "way_area" not in row_n["tags"]
    # line rows never get the synthetic tag
    line_all = t_all["planet_osm_line"].collect()[0]
    assert "way_area" not in (line_all["tags"] or {})
