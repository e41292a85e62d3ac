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


def test_width_from_areas_grid_equals_cross_strategy(spark):
    """The grid-cell equi-join pairing and the broadcast cross join
    must produce identical widths on random geometry (strategy
    equivalence — the grid may only prune non-intersecting pairs)."""
    import numpy as np

    from osm2pgsql_spark.functions import geometry as G
    from osm2pgsql_spark.operators.line_in_polygon import width_from_areas

    rng = np.random.default_rng(7)
    lines, areas = [], []
    for i in range(40):
        cx, cy = rng.uniform(-50, 50, 2)
        ang = rng.uniform(0, 2 * np.pi)
        ln = rng.uniform(2, 12)
        p = (cx - np.cos(ang) * ln / 2, cy - np.sin(ang) * ln / 2)
        q = (cx + np.cos(ang) * ln / 2, cy + np.sin(ang) * ln / 2)
        lines.append((i, bytearray(G.to_wkb(G.make_linestring([p, q])))))
    for j in range(25):
        cx, cy = rng.uniform(-50, 50, 2)
        h = rng.uniform(1, 8)
        ring = [
            (cx - h, cy - h), (cx + h, cy - h), (cx + h, cy + h),
            (cx - h, cy + h), (cx - h, cy - h),
        ]
        areas.append(
            (bytearray(G.to_wkb(G.make_polygon_from_way(ring))), float(rng.uniform(1, 9)))
        )
    ldf = spark.createDataFrame(lines, "edge_id long, geom binary")
    adf = spark.createDataFrame(areas, "area_geom binary, width double")

    cross = {
        r["edge_id"]: r["width"]
        for r in width_from_areas(ldf, adf, grid_cell=None).collect()
    }
    grid = {
        r["edge_id"]: r["width"]
        for r in width_from_areas(ldf, adf, grid_cell=10.0).collect()
    }
    assert set(cross) == set(grid)
    for k in cross:
        assert grid[k] == pytest.approx(cross[k], rel=1e-12), k
