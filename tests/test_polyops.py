"""Exact polygon overlay + buffer kernel (functions/polyops.py) and the
gen vector-union strategy built on it
(/root/reference/src/gen/gen-tile-vector.cpp:41-99)."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from osm2pgsql_spark.functions import geometry as G
from osm2pgsql_spark.functions import polyops as PO


def rect(x0, y0, x1, y1):
    return ("polygon", [np.array(
        [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], dtype="f8")])


def tri(p0, p1, p2):
    return ("polygon", [np.array([p0, p1, p2, p0], dtype="f8")])


class TestUnion:
    def test_overlapping_squares(self):
        u = PO.union_all([rect(0, 0, 2, 2), rect(1, 1, 3, 3)])
        assert G.area(u) == pytest.approx(7.0, abs=1e-9)
        assert len(u[1]) == 1

    def test_disjoint(self):
        u = PO.union_all([rect(0, 0, 2, 2), rect(5, 0, 7, 2)])
        assert G.area(u) == pytest.approx(8.0, abs=1e-9)
        assert len(u[1]) == 2

    def test_nested_is_absorbed(self):
        u = PO.union_all([rect(0, 0, 2, 2), rect(0.5, 0.5, 1.5, 1.5)])
        assert G.area(u) == pytest.approx(4.0, abs=1e-9)
        assert len(u[1]) == 1

    def test_edge_adjacent_merge(self):
        u = PO.union_all([rect(0, 0, 2, 2), rect(2, 0, 4, 2)])
        assert G.area(u) == pytest.approx(8.0, abs=1e-9)
        assert len(u[1]) == 1

    def test_identical_duplicates(self):
        u = PO.union_all([rect(0, 0, 2, 2)] * 3)
        assert G.area(u) == pytest.approx(4.0, abs=1e-9)
        assert len(u[1]) == 1

    def test_corner_touching(self):
        # touch at a single point -> both kept (pinch node)
        u = PO.union_all([rect(0, 0, 1, 1), rect(1, 1, 2, 2)])
        assert G.area(u) == pytest.approx(2.0, abs=1e-9)

    def test_frame_produces_hole(self):
        frame = [rect(-2, 1, 2, 2), rect(-2, -2, 2, -1),
                 rect(-2, -2, -1, 2), rect(1, -2, 2, 2)]
        u = PO.union_all(frame)
        assert G.area(u) == pytest.approx(12.0, abs=1e-9)
        assert len(u[1]) == 1
        assert len(u[1][0]) == 2  # shell + hole

    def test_triangles(self):
        u = PO.union_all([tri((0, 0), (4, 0), (2, 3)),
                          tri((2, 0), (6, 0), (4, 3))])
        # inclusion-exclusion: each 6.0, overlap is triangle (2,0)(4,0)(3,1.5)
        assert G.area(u) == pytest.approx(6 + 6 - 1.5, abs=1e-9)

    def test_far_from_origin_3857(self):
        # web-mercator magnitudes: precision must survive 2e7 offsets
        dx, dy = 1.8e7, -1.2e7
        u = PO.union_all([rect(dx, dy, dx + 2, dy + 2),
                          rect(dx + 1, dy + 1, dx + 3, dy + 3)])
        assert G.area(u) == pytest.approx(7.0, rel=1e-9)

    def test_many_random_squares_vs_rasterized(self):
        rng = np.random.RandomState(7)
        polys = []
        for _ in range(30):
            x, y = rng.uniform(0, 20, 2)
            s = rng.uniform(1, 4)
            polys.append(rect(x, y, x + s, y + s))
        u = PO.union_all(polys)
        # oracle: dense grid rasterization of the same union
        res = 600
        xs = np.linspace(0, 25, res)
        ys = np.linspace(0, 25, res)
        gx, gy = np.meshgrid(xs, ys)
        covered = np.zeros(gx.shape, bool)
        for (_, payload) in polys:
            r = payload[0]
            covered |= ((gx >= r[:, 0].min()) & (gx <= r[:, 0].max())
                        & (gy >= r[:, 1].min()) & (gy <= r[:, 1].max()))
        cell = (25 / (res - 1)) ** 2
        approx = covered.sum() * cell
        assert G.area(u) == pytest.approx(approx, rel=0.02)


class TestBooleanOps:
    def test_intersection(self):
        u = PO.overlay(rect(0, 0, 2, 2), rect(1, 1, 3, 3), "intersection")
        assert G.area(u) == pytest.approx(1.0, abs=1e-9)

    def test_difference(self):
        u = PO.overlay(rect(0, 0, 2, 2), rect(1, 1, 3, 3), "difference")
        assert G.area(u) == pytest.approx(3.0, abs=1e-9)

    def test_difference_hole(self):
        u = PO.overlay(rect(0, 0, 4, 4), rect(1, 1, 2, 2), "difference")
        assert G.area(u) == pytest.approx(15.0, abs=1e-9)
        assert len(u[1][0]) == 2

    def test_xor(self):
        u = PO.overlay(rect(0, 0, 2, 2), rect(1, 1, 3, 3), "xor")
        assert G.area(u) == pytest.approx(6.0, abs=1e-9)

    def test_empty_results(self):
        assert PO.overlay(rect(0, 0, 1, 1), rect(0, 0, 1, 1), "xor") is None
        assert PO.overlay(rect(0, 0, 1, 1), rect(5, 5, 6, 6), "intersection") is None
        assert PO.overlay(rect(0, 0, 1, 1), rect(0, 0, 2, 2), "difference") is None

    def test_multipolygon_operands(self):
        mp = ("multipolygon", [rect(0, 0, 1, 1)[1], rect(3, 0, 4, 1)[1]])
        u = PO.overlay(mp, rect(0.5, 0, 3.5, 1), "union")
        assert G.area(u) == pytest.approx(4.0, abs=1e-9)
        assert len(u[1]) == 1


class TestBuffer:
    def test_dilate_square_area(self):
        # square joints contribute a regular 4*quad_segs-gon of radius d
        d, qs = 0.5, 4
        b = PO.buffer_geom(rect(0, 0, 2, 2), d, quad_segs=qs)
        k = 4 * qs
        expect = 4 + 8 * d + 0.5 * k * d * d * math.sin(2 * math.pi / k)
        # snap grid (1e-6) moves vertices by up to ~7e-7 each
        assert G.area(b) == pytest.approx(expect, rel=1e-6)

    def test_erode_square_exact(self):
        e = PO.buffer_geom(rect(0, 0, 2, 2), -0.5)
        assert G.area(e) == pytest.approx(1.0, abs=1e-9)

    def test_erode_to_nothing(self):
        assert PO.buffer_geom(rect(0, 0, 1, 1), -0.6) is None

    def test_closing_merges_nearby(self):
        # reference pipeline (gen-tile-vector.cpp:46-62): +b / union /
        # -2b / +b closes gaps narrower than 2b
        a1 = rect(0, 0, 2, 2)
        a2 = rect(2.6, 0, 4.6, 2)
        b = 0.5
        d1 = PO.union_all([PO.buffer_geom(a1, b), PO.buffer_geom(a2, b)])
        d2 = PO.buffer_geom(PO.buffer_geom(d1, -2 * b), b)
        assert len(d2[1]) == 1  # gap 0.6 < 2b=1.0 -> merged
        assert G.area(d2) == pytest.approx(8.0, rel=0.15)

    def test_zero_buffer_identity(self):
        g = rect(0, 0, 2, 2)
        assert PO.buffer_geom(g, 0.0) is g


class TestVectorUnionOperator:
    def test_per_tile_dissolve(self, spark):
        from osm2pgsql_spark.operators.expire import EARTH_CIRCUMFERENCE
        from osm2pgsql_spark.operators.vector_union import tile_vector_union

        zoom = 10
        extent = EARTH_CIRCUMFERENCE / (1 << zoom)
        half = EARTH_CIRCUMFERENCE / 2.0
        # two overlapping squares inside tile (512, 512), one far away
        cx = -half + 512.5 * extent
        cy = half - 512.5 * extent
        s = extent / 10
        rows = [
            (1, G.to_wkb(rect(cx, cy, cx + 2 * s, cy + 2 * s))),
            (2, G.to_wkb(rect(cx + s, cy + s, cx + 3 * s, cy + 3 * s))),
            (3, G.to_wkb(rect(cx + 20 * extent, cy, cx + 20 * extent + s, cy + s))),
        ]
        df = spark.createDataFrame(rows, "id bigint, geom binary")
        out = tile_vector_union(df, zoom, buffer_size=0.0).collect()
        by_tile = {}
        for r in out:
            by_tile.setdefault((r.x, r.y), []).append(G.from_wkb(bytes(r.geom)))
        assert (512, 512) in by_tile and len(by_tile[(512, 512)]) == 1
        merged = by_tile[(512, 512)][0]
        assert G.area(merged) == pytest.approx(7 * s * s, rel=1e-9)
        assert (532, 512) in by_tile and len(by_tile[(532, 512)]) == 1

    def test_group_by_column(self, spark):
        from osm2pgsql_spark.operators.expire import EARTH_CIRCUMFERENCE
        from osm2pgsql_spark.operators.vector_union import tile_vector_union

        zoom = 10
        extent = EARTH_CIRCUMFERENCE / (1 << zoom)
        half = EARTH_CIRCUMFERENCE / 2.0
        cx = -half + 512.5 * extent
        cy = half - 512.5 * extent
        s = extent / 10
        rows = [
            ("a", G.to_wkb(rect(cx, cy, cx + 2 * s, cy + 2 * s))),
            ("a", G.to_wkb(rect(cx + s, cy + s, cx + 3 * s, cy + 3 * s))),
            ("b", G.to_wkb(rect(cx, cy, cx + 2 * s, cy + 2 * s))),
        ]
        df = spark.createDataFrame(rows, "layer string, geom binary")
        out = tile_vector_union(df, zoom, buffer_size=0.0, group_by="layer").collect()
        areas = {r.layer: G.area(G.from_wkb(bytes(r.geom))) for r in out}
        assert areas["a"] == pytest.approx(7 * s * s, rel=1e-9)
        assert areas["b"] == pytest.approx(4 * s * s, rel=1e-9)

    def test_dirty_tile_restriction(self, spark):
        from osm2pgsql_spark.operators.expire import EARTH_CIRCUMFERENCE
        from osm2pgsql_spark.operators.vector_union import tile_vector_union

        zoom = 10
        extent = EARTH_CIRCUMFERENCE / (1 << zoom)
        half = EARTH_CIRCUMFERENCE / 2.0
        cx = -half + 512.5 * extent
        cy = half - 512.5 * extent
        s = extent / 10
        rows = [
            (1, G.to_wkb(rect(cx, cy, cx + s, cy + s))),
            (2, G.to_wkb(rect(cx + 20 * extent, cy, cx + 20 * extent + s, cy + s))),
        ]
        df = spark.createDataFrame(rows, "id bigint, geom binary")
        tiles = spark.createDataFrame([(512, 512)], "x bigint, y bigint")
        out = tile_vector_union(df, zoom, buffer_size=0.0, tiles=tiles).collect()
        assert {(r.x, r.y) for r in out} == {(512, 512)}


class TestLocatorGrid:
    def test_grid_index_matches_dense_region_set(self, spark):
        """10^2 overlapping polygon regions: the grid-indexed kernel
        must agree with a brute-force reference on every point."""
        import numpy as np

        from osm2pgsql_spark.functions import geometry as G
        from osm2pgsql_spark.operators.locator import polygon_all_intersecting

        rng = np.random.RandomState(11)
        regions = []
        for i in range(100):
            x, y = rng.uniform(0, 10, 2)
            s = rng.uniform(0.3, 1.5)
            regions.append((f"r{i:03d}", G.to_wkb(rect(x, y, x + s, y + s))))
        pts = [(int(i), float(x), float(y))
               for i, (x, y) in enumerate(rng.uniform(0, 11, (500, 2)))]
        df = spark.createDataFrame(pts, "node_id bigint, lon double, lat double")
        got = {
            r.node_id: r.regions
            for r in polygon_all_intersecting(df, regions).collect()
        }
        parsed = [(n, G.from_wkb(w)) for n, w in regions]
        for pid, px, py in pts:
            want = [n for n, g in parsed if G.contains_point(g, px, py)]
            if want:
                assert got[pid] == ",".join(sorted(want))
            else:
                assert pid not in got
