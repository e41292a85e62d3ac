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


def test_builtup_multilayer_buffer_merge_and_thresholds(spark):
    """Builtup strategy (gen-tile-builtup.cpp): per-layer open_close,
    OR-merge of layers, turdsize speck removal, min_area filter."""
    import numpy as np
    from osm2pgsql_spark.functions import geometry as G
    from osm2pgsql_spark.operators.raster_union import tile_builtup
    from osm2pgsql_spark.operators.vector_tiles import tile_envelope

    zoom = 10
    x = y = 512  # tile around the origin
    rect = tile_envelope(zoom, x, y)
    xmin, ymin, xmax, ymax = rect
    w = xmax - xmin
    res = 256

    def rectangle(fx0, fy0, fx1, fy1):
        ring = np.asarray(
            [
                (xmin + fx0 * w, ymin + fy0 * w),
                (xmin + fx1 * w, ymin + fy0 * w),
                (xmin + fx1 * w, ymin + fy1 * w),
                (xmin + fx0 * w, ymin + fy1 * w),
                (xmin + fx0 * w, ymin + fy0 * w),
            ],
            dtype="f8",
        )
        return G.to_wkb(("polygon", [ring]))

    rows = [
        # layer a: two rectangles with a 2px gap -> buffer 8 merges them
        ("a", x, y, rectangle(0.10, 0.10, 0.20, 0.30)),
        ("a", x, y, rectangle(0.21, 0.10, 0.30, 0.30)),
        # layer b: a separate block far away (no buffering)
        ("b", x, y, rectangle(0.60, 0.60, 0.70, 0.70)),
        # layer b: a ~2x2 px speck -> removed by turdsize 16
        ("b", x, y, rectangle(0.90, 0.90, 0.905, 0.905)),
    ]
    tiled = spark.createDataFrame(rows, "layer string, x bigint, y bigint, geom binary")
    out = tile_builtup(
        tiled, zoom, buffer_sizes={"a": 8, "b": 0}, resolution=res, turdsize=16
    ).collect()
    assert all(r.x == x and r.y == y for r in out)
    geoms = [G.from_wkb(bytes(r.geom)) for r in out]

    def covers(fx, fy):
        px = xmin + fx * w
        py = ymin + fy * w
        return any(
            G.distance(g, G.make_point(px, py)) == 0.0 for g in geoms
        )

    assert covers(0.15, 0.2)     # layer a left block
    assert covers(0.205, 0.2)    # the gap: closed by layer a's buffer
    assert covers(0.65, 0.65)    # layer b block survives
    assert not covers(0.902, 0.902)  # speck removed by turdsize
    assert not covers(0.45, 0.45)    # empty area stays empty

    # min_area drops the small block when set high enough
    out2 = tile_builtup(
        tiled, zoom, buffer_sizes={"a": 8, "b": 0}, resolution=res,
        min_area=(0.15 * w) ** 2,  # between 0.1^2 and 0.2^2 blocks
    ).collect()
    geoms = [G.from_wkb(bytes(r.geom)) for r in out2]
    assert covers(0.15, 0.2) or covers(0.205, 0.2)
    assert not covers(0.65, 0.65)  # 0.1x0.1 block < min_area threshold


def test_turdsize_drops_components_not_strips():
    """A large sloped region decomposes into many thin row-span
    rectangles; turdsize must drop whole small components only, never
    the strips of a large one (regression: per-rectangle filtering)."""
    import numpy as np

    from osm2pgsql_spark.operators.raster_union import (
        drop_small_components,
        mask_to_rings,
    )

    m = np.zeros((64, 64), dtype=bool)
    # sloped triangle: rows of width 1..40 (total >> turdsize, every
    # row-span rectangle is 1 px tall)
    for r in range(40):
        m[r, : r + 1] = True
    big_px = int(m.sum())
    # a 2x2 speckle far away
    m[60:62, 60:62] = True

    drop_small_components(m, 16)
    assert int(m.sum()) == big_px  # speckle gone, triangle intact
    rings = mask_to_rings(m.copy())
    assert sum(abs((r[1, 0] - r[0, 0]) * (r[2, 1] - r[1, 1])) for r in rings) == big_px


def test_trace_mask_shapes():
    """Boundary tracer (reference tracer.hpp potrace role, alphamax=0):
    collinear-merged polygon output, holes, 4-connectivity at diagonal
    touches, turdsize path dropping."""
    import numpy as np

    from osm2pgsql_spark.operators.raster_union import trace_mask

    def area(r):
        return abs(np.sum(r[:-1, 0] * r[1:, 1] - r[1:, 0] * r[:-1, 1])) / 2

    # rectangle -> single 5-point ring
    m = np.zeros((12, 12), dtype=bool)
    m[2:8, 3:10] = True
    p = trace_mask(m)
    assert len(p) == 1 and len(p[0]) == 1 and p[0][0].shape[0] == 5
    assert area(p[0][0]) == 42.0

    # donut -> outer + hole
    m = np.zeros((16, 16), dtype=bool)
    m[2:12, 2:12] = True
    m[5:8, 5:9] = False
    p = trace_mask(m)
    assert len(p) == 1 and len(p[0]) == 2
    assert area(p[0][0]) == 100.0 and area(p[0][1]) == 12.0
    # minimal rings for BOTH rings: rectangular hole = 5 points even
    # when the walk's first crack edge starts mid-run (ADVICE r4)
    assert p[0][0].shape[0] == 5 and p[0][1].shape[0] == 5

    # diagonal touch -> two separate polygons (4-connectivity)
    m = np.zeros((8, 8), dtype=bool)
    m[1:3, 1:3] = True
    m[3:5, 3:5] = True
    assert len(trace_mask(m)) == 2

    # turdsize drops the speckle path
    m = np.zeros((8, 8), dtype=bool)
    m[1:5, 1:5] = True
    m[6, 6] = True
    p = trace_mask(m, turdsize=2)
    assert len(p) == 1 and area(p[0][0]) == 16.0


def test_union_polygons_raster_traced_hole():
    """Traced union keeps holes that the rectangle decomposition
    could only approximate with multiple rings."""
    import numpy as np

    from osm2pgsql_spark.operators.raster_union import union_polygons_raster

    def ring(x0, y0, x1, y1):
        return np.asarray(
            [(x0, y0), (x1, y0), (x1, y1), (x0, y1), (x0, y0)], dtype="f8"
        )

    donut = ("polygon", [ring(10, 10, 90, 90), ring(40, 40, 60, 60)])
    u = union_polygons_raster([donut], (0.0, 0.0, 100.0, 100.0), resolution=100)
    assert u is not None and u[0] == "multipolygon"
    assert len(u[1]) == 1 and len(u[1][0]) == 2  # outer + hole survives


def test_optimal_polygon_cuts_staircase():
    """simplify_tol>0 runs the potrace polygon stage (the reference
    tracer's effective output mode, alphamax=0): a diagonal staircase
    band collapses to a few chords while preserving area to within
    half a pixel per boundary step."""
    import numpy as np

    from osm2pgsql_spark.operators.raster_union import trace_mask

    n = 40
    mask = np.zeros((n, n), dtype=bool)
    for i in range(n):
        for j in range(n):
            if i <= j <= i + 6:
                mask[i, j] = True

    exact = trace_mask(mask)
    simp = trace_mask(mask, simplify_tol=0.5)
    assert len(exact) == len(simp) == 1

    def ring_area(r):
        return 0.5 * abs(float(np.sum(r[:-1, 0] * r[1:, 1] - r[1:, 0] * r[:-1, 1])))

    a_exact = ring_area(exact[0][0])
    a_simp = ring_area(simp[0][0])
    n_exact = len(exact[0][0])
    n_simp = len(simp[0][0])
    assert n_simp < n_exact / 5  # staircase collapsed to chords
    # each boundary lattice step can move the outline at most tol=0.5
    perimeter_steps = n_exact
    assert abs(a_simp - a_exact) <= 0.5 * perimeter_steps


def test_optimal_polygon_keeps_holes_and_rects():
    import numpy as np

    from osm2pgsql_spark.operators.raster_union import trace_mask

    mask = np.ones((12, 12), dtype=bool)
    mask[4:8, 4:7] = False  # hole
    out = trace_mask(mask, simplify_tol=0.5)
    assert len(out) == 1 and len(out[0]) == 2  # outer + hole
    # a rectangle is already optimal: 5 points, unchanged
    assert len(out[0][0]) == 5 and len(out[0][1]) == 5
