"""Line-in-polygon length + width-from-areas (rivers seeding)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from osm2pgsql_spark.functions import geometry as G
from osm2pgsql_spark.operators.line_in_polygon import (
    line_in_polygon_length,
    width_from_areas,
)


def poly(x0, y0, x1, y1):
    return ("polygon", [np.asarray([(x0, y0), (x1, y0), (x1, y1), (x0, y1), (x0, y0)], dtype="f8")])


def test_line_fully_inside():
    line = np.asarray([(1, 5), (9, 5)], dtype="f8")
    assert line_in_polygon_length(line, poly(0, 0, 10, 10)) == pytest.approx(8.0)


def test_line_crossing():
    line = np.asarray([(-5, 5), (5, 5)], dtype="f8")
    assert line_in_polygon_length(line, poly(0, 0, 10, 10)) == pytest.approx(5.0)


def test_line_outside():
    line = np.asarray([(20, 20), (30, 20)], dtype="f8")
    assert line_in_polygon_length(line, poly(0, 0, 10, 10)) == pytest.approx(0.0)


def test_line_in_and_out():
    # crosses the 10-wide box twice: in 0..10, out 10..20, in 20..30
    line = np.asarray([(-5, 5), (35, 5)], dtype="f8")
    two = ("multipolygon", [poly(0, 0, 10, 10)[1], poly(20, 0, 30, 10)[1]])
    assert line_in_polygon_length(line, two) == pytest.approx(20.0)


def test_hole_excluded():
    outer = np.asarray([(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)], dtype="f8")
    hole = np.asarray([(4, 4), (6, 4), (6, 6), (4, 6), (4, 4)], dtype="f8")
    g = ("polygon", [outer, hole])
    line = np.asarray([(0, 5), (10, 5)], dtype="f8")
    assert line_in_polygon_length(line, g) == pytest.approx(8.0)  # 2 in the hole


def test_width_from_areas_spark(spark):
    # edge 1 runs through a width-5 area for half its length and a
    # width-9 area for the other half; edge 2 touches nothing
    l1 = G.to_wkb(("linestring", np.asarray([(0, 5), (20, 5)], dtype="f8")))
    l2 = G.to_wkb(("linestring", np.asarray([(50, 50), (60, 50)], dtype="f8")))
    lines = spark.createDataFrame(
        [(1, bytearray(l1)), (2, bytearray(l2))], "edge_id bigint, geom binary"
    )
    a1 = G.to_wkb(poly(0, 0, 10, 10))
    a2 = G.to_wkb(poly(10, 0, 20, 10))
    areas = spark.createDataFrame(
        [(bytearray(a1), 5.0), (bytearray(a2), 9.0)], "area_geom binary, width double"
    )
    out = {r["edge_id"]: r["width"] for r in width_from_areas(lines, areas).collect()}
    assert out == {1: pytest.approx(7.0)}  # (10*5 + 10*9) / 20
