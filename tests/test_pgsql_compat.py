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
