"""Legacy pgsql-output compat pipeline tests."""

import pytest
from pyspark.sql import functions as F

from osm2pgsql_spark.functions import geometry as G
from osm2pgsql_spark.model import NODE_SCHEMA, WAY_SCHEMA
from osm2pgsql_spark.plans.pgsql_compat import planet_osm_tables


@pytest.fixture()
def osm(spark):
    def n(i, dx, dy, tags=None):
        return (i, 50.0 + 0.1 * dy, 9.0 + 0.1 * dx, tags or {}, None, None, None, None, None, None)

    nodes = spark.createDataFrame(
        [
            n(1, 0, 0, {"amenity": "pub", "name": "P"}),
            n(2, 1, 0),
            n(3, 1, 1),
            n(4, 0, 1),
            n(5, 5, 5),
            n(6, 6, 5),
        ],
        NODE_SCHEMA,
    )
    w = lambda i, refs, tags: (i, refs, tags, None, None, None, None, None, None)
    ways = spark.createDataFrame(
        [
            w(10, [1, 2, 3, 4, 1], {"building": "yes", "name": "B"}),
            w(11, [5, 6], {"highway": "motorway", "name": "M"}),
            w(12, [5, 6], {"highway": "footway"}),
            w(13, [1, 2, 3, 4, 1], {"highway": "primary", "area": "no"}),
        ],
        ways.schema if False else WAY_SCHEMA,
    )
    return nodes, ways


def test_planet_osm_tables(spark, osm):
    nodes, ways = osm
    t = planet_osm_tables(nodes, ways)

    pts = t["planet_osm_point"].collect()
    assert len(pts) == 1 and pts[0]["name"] == "P"

    poly = {r["osm_id"]: r for r in t["planet_osm_polygon"].collect()}
    assert set(poly) == {10}  # building closed way; way 13 area=no stays line
    assert poly[10]["way_area"] == pytest.approx(0.01, rel=1e-9)
    assert G.from_wkb(poly[10]["way"])[0] == "polygon"

    lines = {r["osm_id"]: r for r in t["planet_osm_line"].collect()}
    assert set(lines) == {11, 12, 13}
    assert lines[11]["z_order"] == 39  # motorway
    assert lines[12]["z_order"] == 10  # footway

    roads = {r["osm_id"]: r for r in t["planet_osm_roads"].collect()}
    assert set(roads) == {11, 13}  # motorway + primary are roads; footway not


class TestReprojectArea:
    """--reproject-area (src/output-pgsql.cpp:45-55,
    src/command-line-parser.cpp:447-448): way_area computed in
    spherical mercator while the geometry column stays 4326."""

    def _tables(self, spark, reproject):
        from osm2pgsql_spark.plans.pgsql_compat import planet_osm_tables

        # 0.01-degree square at lat 50: mercator area is analytic
        nodes = spark.createDataFrame(
            [(1, 9.0, 50.0, {}), (2, 9.01, 50.0, {}),
             (3, 9.01, 50.01, {}), (4, 9.0, 50.01, {})],
            "id bigint, lon double, lat double, tags map<string,string>",
        )
        ways = spark.createDataFrame(
            [(100, {"building": "yes"}, [1, 2, 3, 4, 1])],
            "id bigint, tags map<string,string>, refs array<bigint>",
        )
        return planet_osm_tables(nodes, ways, reproject_area=reproject)

    def test_area_in_mercator_m2_geometry_stays_4326(self, spark):
        import math

        from osm2pgsql_spark.functions import geometry as G

        row = self._tables(spark, True)["planet_osm_polygon"].collect()[0]
        R = 6378137.0
        # mercator rectangle: width from lon span, height from y(lat)
        w = math.radians(0.01) * R
        y0 = R * math.log(math.tan(math.pi / 4 + math.radians(50.0) / 2))
        y1 = R * math.log(math.tan(math.pi / 4 + math.radians(50.01) / 2))
        assert row.way_area == pytest.approx(w * (y1 - y0), rel=1e-9)
        # geometry column still in degrees
        g = G.from_wkb(bytes(row.way))
        xs = g[1][0][:, 0]
        assert 8.9 < xs.min() < xs.max() < 9.1

    def test_default_area_stays_in_working_projection(self, spark):
        row = self._tables(spark, False)["planet_osm_polygon"].collect()[0]
        assert row.way_area == pytest.approx(0.01 * 0.01, rel=1e-9)

    def test_relation_rows_reproject(self, spark):
        import math

        from osm2pgsql_spark.plans.pgsql_compat import relation_rows

        nodes = spark.createDataFrame(
            [(1, 9.0, 50.0, {}), (2, 9.01, 50.0, {}),
             (3, 9.01, 50.01, {}), (4, 9.0, 50.01, {})],
            "id bigint, lon double, lat double, tags map<string,string>",
        )
        ways = spark.createDataFrame(
            [(100, {}, [1, 2, 3, 4, 1])],
            "id bigint, tags map<string,string>, refs array<bigint>",
        )
        rels = spark.createDataFrame(
            [(200, {"type": "multipolygon", "landuse": "forest"},
              [("w", 100, "outer")])],
            "id bigint, tags map<string,string>, "
            "members array<struct<type:string,ref:bigint,role:string>>",
        )
        out = relation_rows(rels, ways, nodes, reproject_area=True)
        row = out["polygon"].collect()[0]
        R = 6378137.0
        w = math.radians(0.01) * R
        y0 = R * math.log(math.tan(math.pi / 4 + math.radians(50.0) / 2))
        y1 = R * math.log(math.tan(math.pi / 4 + math.radians(50.01) / 2))
        # wkb_transform_3857 + area (vs the exact mercator rectangle)
        assert row.way_area == pytest.approx(w * (y1 - y0), rel=1e-9)
        assert row.osm_id == -200
