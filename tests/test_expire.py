"""Tile-expiry kernel tests — expected values ported from the
reference Catch2 suite /root/reference/tests/test-expire-from-geometry.cpp
(zoom 12, where one tile is ~10,000 mercator units)."""

import numpy as np

from osm2pgsql_spark.functions import geometry as G
from osm2pgsql_spark.operators.expire import ExpireConfig, tiles_for_geometry

Z12 = ExpireConfig(maxzoom=12)


def ls(*pts):
    return ("linestring", np.asarray(pts, dtype="f8"))


def poly(*pts):
    return ("polygon", [np.asarray(pts, dtype="f8")])


def test_null_geometry():
    assert tiles_for_geometry(None, Z12) == []


def test_point_at_tile_boundary():
    tiles = tiles_for_geometry(("point", (0.0, 0.0)), Z12)
    assert set(tiles) == {(2047, 2047), (2048, 2047), (2047, 2048), (2048, 2048)}


def test_point_away_from_boundary():
    tiles = tiles_for_geometry(("point", (5000.0, 5000.0)), Z12)
    assert tiles == [(2048, 2047)]


def test_linestring_within_tile():
    tiles = tiles_for_geometry(ls((5000.0, 4000.0), (5100.0, 4200.0)), Z12)
    assert tiles == [(2048, 2047)]


def test_linestring_crossing_boundary():
    tiles = tiles_for_geometry(ls((5000.0, 5000.0), (5000.0, 15000.0)), Z12)
    assert set(tiles) == {(2048, 2046), (2048, 2047)}


def test_small_polygon():
    tiles = tiles_for_geometry(
        poly((5000.0, 5000.0), (5100.0, 5000.0), (5100.0, 5100.0), (5000.0, 5100.0), (5000.0, 5000.0)),
        Z12,
    )
    assert tiles == [(2048, 2047)]


_BIG_POLY = poly(
    (5000.0, 5000.0), (25000.0, 5000.0), (25000.0, 25000.0), (5000.0, 25000.0), (5000.0, 5000.0)
)


def test_large_polygon_full_area():
    cfg = ExpireConfig(maxzoom=12, mode="hybrid", full_area_limit=40000)
    tiles = tiles_for_geometry(_BIG_POLY, cfg)
    assert set(tiles) == {
        (x, y) for x in (2048, 2049, 2050) for y in (2045, 2046, 2047)
    }


def test_large_polygon_boundary_only():
    cfg = ExpireConfig(maxzoom=12, mode="hybrid", full_area_limit=10000)
    tiles = tiles_for_geometry(_BIG_POLY, cfg)
    expect = {(x, y) for x in (2048, 2049, 2050) for y in (2045, 2046, 2047)}
    expect.discard((2049, 2046))  # interior tile not expired
    assert set(tiles) == expect


def test_multipoint():
    g = ("multipoint", [(0.0, 0.0), (15000.0, 15000.0)])
    tiles = tiles_for_geometry(g, Z12)
    assert set(tiles) == {
        (2047, 2047), (2048, 2047), (2047, 2048), (2048, 2048), (2049, 2046)
    }


def test_multilinestring():
    g = (
        "multilinestring",
        [
            np.asarray([(2000.0, 2000.0), (3000.0, 3000.0)], dtype="f8"),
            np.asarray([(15000.0, 15000.0), (25000.0, 15000.0)], dtype="f8"),
        ],
    )
    tiles = tiles_for_geometry(g, Z12)
    assert set(tiles) == {(2048, 2047), (2049, 2046), (2050, 2046)}


def test_wkb_roundtrip_path():
    g = G.from_wkb(G.to_wkb(("point", (5000.0, 5000.0))))
    assert tiles_for_geometry(g, Z12) == [(2048, 2047)]
