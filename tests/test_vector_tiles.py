"""Tile clipping tests: exact SH/LB clipping + area conservation
across a tile cut."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from osm2pgsql_spark.functions import geometry as G
from osm2pgsql_spark.operators.vector_tiles import (
    clip_geometry,
    clip_line,
    clip_ring,
    cut_to_tiles,
    tile_envelope,
)

RECT = (0.0, 0.0, 10.0, 10.0)


def test_clip_ring_fully_inside():
    ring = np.asarray([(1, 1), (2, 1), (2, 2), (1, 2), (1, 1)], dtype="f8")
    out = clip_ring(ring, RECT)
    assert G.area(("polygon", [out])) == pytest.approx(1.0)


def test_clip_ring_straddling():
    ring = np.asarray([(-5, 2), (5, 2), (5, 8), (-5, 8), (-5, 2)], dtype="f8")
    out = clip_ring(ring, RECT)
    # half the 10x6 box survives
    assert G.area(("polygon", [out])) == pytest.approx(30.0)


def test_clip_ring_outside():
    ring = np.asarray([(20, 20), (21, 20), (21, 21), (20, 21), (20, 20)], dtype="f8")
    assert clip_ring(ring, RECT) is None


def test_clip_line_crossing():
    pts = np.asarray([(-5, 5), (15, 5)], dtype="f8")
    parts = clip_line(pts, RECT)
    assert len(parts) == 1
    np.testing.assert_allclose(parts[0], [(0, 5), (10, 5)])


def test_clip_line_in_out_in():
    pts = np.asarray([(1, 1), (1, 20), (9, 20), (9, 1)], dtype="f8")
    parts = clip_line(pts, RECT)
    assert len(parts) == 2  # two visits into the window


def test_clip_point():
    assert clip_geometry(("point", (5.0, 5.0)), RECT) is not None
    assert clip_geometry(("point", (15.0, 5.0)), RECT) is None


def test_tile_envelope_adjacency():
    a = tile_envelope(12, 2048, 2047)
    b = tile_envelope(12, 2049, 2047)
    assert a[2] == pytest.approx(b[0])  # shared edge


def test_cut_to_tiles_area_conserved(spark):
    # square straddling 4 tiles around the origin at z12 (~9784m tiles)
    ring = [(-3000, -3000), (3000, -3000), (3000, 3000), (-3000, 3000), (-3000, -3000)]
    g = G.make_polygon_from_way(ring)
    df = spark.createDataFrame([(1, bytearray(G.to_wkb(g)))], "fid bigint, geom binary")
    cut = cut_to_tiles(df, zoom=12, margin=0.0, id_col="fid").collect()
    assert len(cut) == 4
    total = sum(G.area(G.from_wkb(bytes(r["geom"]))) for r in cut)
    assert total == pytest.approx(6000.0 * 6000.0, rel=1e-9)
    assert {(r["x"], r["y"]) for r in cut} == {
        (2047, 2047), (2048, 2047), (2047, 2048), (2048, 2048)
    }
