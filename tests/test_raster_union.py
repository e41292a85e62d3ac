"""Raster-union generalization tests (gen builtup/raster-union shape)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from osm2pgsql_spark.functions import geometry as G
from osm2pgsql_spark.operators.raster_union import (
    binary_close,
    binary_open,
    mask_to_rings,
    rasterize_polygon,
    tile_raster_union,
    union_polygons_raster,
)
from osm2pgsql_spark.operators.vector_tiles import cut_to_tiles


def sq(x0, y0, x1, y1):
    return G.make_polygon_from_way([(x0, y0), (x1, y0), (x1, y1), (x0, y1), (x0, y0)])


def test_rasterize_and_vectorize_roundtrip_area():
    rect = (0.0, 0.0, 100.0, 100.0)
    u = union_polygons_raster([sq(10, 10, 50, 50)], rect, resolution=100)
    # pixel grid aligns exactly with the square here
    assert G.area(u) == pytest.approx(1600.0, rel=0.05)


def test_union_overlapping_squares():
    rect = (0.0, 0.0, 100.0, 100.0)
    u = union_polygons_raster([sq(10, 10, 50, 50), sq(30, 30, 70, 70)], rect, resolution=200)
    # union area = 1600 + 1600 - 400 overlap = 2800
    assert G.area(u) == pytest.approx(2800.0, rel=0.05)


def test_union_disjoint_squares_two_parts():
    rect = (0.0, 0.0, 100.0, 100.0)
    u = union_polygons_raster([sq(10, 10, 30, 30), sq(60, 60, 90, 90)], rect, resolution=100)
    assert G.area(u) == pytest.approx(400 + 900, rel=0.06)


def test_binary_close_fills_gap():
    m = np.zeros((20, 20), dtype=bool)
    m[5:15, 2:9] = True
    m[5:15, 11:18] = True  # 2-px gap
    closed = binary_close(m, 2)
    assert closed[10, 9] and closed[10, 10]  # gap bridged
    # close must not shrink the original area
    assert closed[m].all()


def test_binary_open_removes_speck():
    m = np.zeros((20, 20), dtype=bool)
    m[5:15, 5:15] = True
    m[1, 1] = True  # single-pixel speck
    opened = binary_open(m, 1)
    assert not opened[1, 1]
    assert opened[10, 10]


def test_mask_to_rings_exact_area():
    m = np.zeros((16, 16), dtype=bool)
    m[2:6, 3:9] = True
    m[8:12, 1:4] = True
    rings = mask_to_rings(m.copy())
    total = sum(abs(G.area(("polygon", [r]))) for r in rings)
    assert total == pytest.approx(4 * 6 + 4 * 3)


def test_tile_raster_union_spark(spark):
    # two overlapping squares near the origin -> cut to z12 tiles ->
    # per-tile union
    g1 = sq(-2000, -2000, 1000, 1000)
    g2 = sq(-500, -500, 2500, 2500)
    df = spark.createDataFrame(
        [(1, bytearray(G.to_wkb(g1))), (2, bytearray(G.to_wkb(g2)))],
        "fid bigint, geom binary",
    )
    tiled = cut_to_tiles(df, zoom=12, id_col="fid")
    out = tile_raster_union(tiled, zoom=12, resolution=128).collect()
    assert len(out) == 4  # 4 tiles around the origin
    total = sum(G.area(G.from_wkb(bytes(r["geom"]))) for r in out)
    # union area = 3000^2 + 3000^2 - 1500^2 overlap
    expect = 9e6 + 9e6 - 2.25e6
    assert total == pytest.approx(expect, rel=0.05)
