"""Locator: which named regions contain/intersect each feature.

Reference: /root/reference/src/locator.hpp:36-151 — an R*-tree over
(name, geometry) regions probed per object;
Lua surface all_intersecting / first_intersecting
(/root/reference/src/flex-lua-locator.cpp:73-80).

Spark-first shape: regions are small (100s-1000s) -> broadcast join.
The general path broadcasts region bboxes as plain columns and does
an exact point-in-polygon / bbox check JVM-side (for box regions) or
in a pandas-UDF STRtree kernel (polygon regions, later phase).  The
big side streams; no shuffle of the feature table at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bbox_regions_join(
    points: DataFrame,
    regions: DataFrame,
    x: str = "lon",
    y: str = "lat",
    name: str = "name",
) -> DataFrame:
    """Inner join: every (point, region-bbox) containment hit.
    regions: (name, min_x, min_y, max_x, max_y) — broadcast."""
    r = F.broadcast(regions)
    cond = (
        (F.col(x) >= F.col("min_x"))
        & (F.col(x) <= F.col("max_x"))
        & (F.col(y) >= F.col("min_y"))
        & (F.col(y) <= F.col("max_y"))
    )
    return points.join(r, cond, "inner")


def all_intersecting(
    points: DataFrame,
    regions: DataFrame,
    point_id: str = "node_id",
    x: str = "lon",
    y: str = "lat",
    name: str = "name",
) -> DataFrame:
    """(point_id, regions STRING) — sorted comma-joined region names,
    mirroring locator.all_intersecting (array of names; joined to a
    string for stable cross-engine comparison)."""
    hits = bbox_regions_join(points, regions, x=x, y=y, name=name)
    return hits.groupBy(point_id).agg(
        F.array_join(F.sort_array(F.collect_list(name)), ",").alias("regions"),
        F.count(F.lit(1)).alias("n_regions"),
    )


def polygon_all_intersecting(
    points: DataFrame,
    regions_wkb: list[tuple[str, bytes]],
    point_id: str = "node_id",
    x: str = "lon",
    y: str = "lat",
) -> DataFrame:
    """(point_id, regions STRING) against *polygon* regions: the small
    region list (name, polygon WKB) rides into an Arrow-batched kernel
    as a closure (the pandas-UDF analog of the reference's broadcast
    R-tree probe).

    The probe is a uniform GRID index over region bboxes (the
    stand-in for the reference's R*-tree, locator.hpp:36-151): cell
    size tracks the median region bbox, a point probes one cell, and
    only that cell's regions get the bbox + exact point-in-polygon
    check — per-point cost stays O(local density) instead of
    O(n_regions), so 10^4-region workloads remain kernel-bound
    (PERF_NOTES: locator grid scaling)."""
    import math
    from collections import defaultdict

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from osm2pgsql_spark.functions import geometry as G

    parsed = []
    for name, wkb in sorted(regions_wkb):
        g = G.from_wkb(wkb)
        bb = G.get_bbox(g)
        if g is not None and bb is not None:
            parsed.append((name, g, bb))

    if parsed:
        x0s = [bb[0] for _, _, bb in parsed]
        y0s = [bb[1] for _, _, bb in parsed]
        wxs = sorted(bb[2] - bb[0] for _, _, bb in parsed)
        wys = sorted(bb[3] - bb[1] for _, _, bb in parsed)
        gx0, gy0 = min(x0s), min(y0s)
        cw = max(wxs[len(wxs) // 2], 1e-12)
        ch = max(wys[len(wys) // 2], 1e-12)
        grid: dict[tuple[int, int], list[int]] = defaultdict(list)
        for i, (_, _, (bx0, by0, bx1, by1)) in enumerate(parsed):
            for cx in range(int(math.floor((bx0 - gx0) / cw)),
                            int(math.floor((bx1 - gx0) / cw)) + 1):
                for cy in range(int(math.floor((by0 - gy0) / ch)),
                                int(math.floor((by1 - gy0) / ch)) + 1):
                    grid[(cx, cy)].append(i)
        grid = dict(grid)
    else:
        grid = {}

    # no type annotations: pandas_udf resolves hints via module globals,
    # and pd is imported locally here
    def kernel(xs, ys):
        out = []
        for px, py in zip(xs, ys):
            cell = (int(math.floor((px - gx0) / cw)),
                    int(math.floor((py - gy0) / ch))) if parsed else None
            hits = [
                parsed[i][0]
                for i in grid.get(cell, ())
                if parsed[i][2][0] <= px <= parsed[i][2][2]
                and parsed[i][2][1] <= py <= parsed[i][2][3]
                and G.contains_point(parsed[i][1], px, py)
            ]
            out.append(",".join(hits) if hits else None)
        return pd.Series(out, dtype=object)

    # asNondeterministic: the isNotNull filter on the kernel's own
    # output is otherwise pushed below the projection and the grid
    # probe (bbox + point-in-polygon per point) evaluates TWICE per
    # point (guide §4.4; plans/r14/locator_all_intersecting_before.txt
    # had two ArrowEvalPython nodes for this one kernel).
    udf = pandas_udf(kernel, "string").asNondeterministic()
    return (
        points.select(F.col(point_id), udf(F.col(x), F.col(y)).alias("regions"))
        .where(F.col("regions").isNotNull())
    )


def first_intersecting(
    points: DataFrame,
    regions: DataFrame,
    point_id: str = "node_id",
    x: str = "lon",
    y: str = "lat",
    name: str = "name",
) -> DataFrame:
    """(point_id, region STRING) — lexicographically-first hit.
    (The reference returns the first in R-tree probe order, which is
    unspecified; we canonicalize to sorted-first for determinism.)"""
    hits = bbox_regions_join(points, regions, x=x, y=y, name=name)
    return hits.groupBy(point_id).agg(F.min(name).alias("region"))


class LocatorIndex:
    """In-process locator twin for the Lua callback path: named regions
    (bboxes or polygons) with a uniform grid over their bboxes, probed
    with EXACT geometry-intersection tests per object (reference
    locator_t, /root/reference/src/locator.hpp:36-151; the R*-tree is
    replaced by the same grid the distributed kernel uses).

    Regions are config-scoped and small; each executor partition builds
    its own index when the Lua chunk re-runs — nothing is shipped."""

    def __init__(self):
        self.regions: list[tuple[str, str, object, tuple]] = []
        # (name, kind 'box'|'poly', payload, bbox)
        self._grid = None

    def add_bbox(self, name, min_x, min_y, max_x, max_y):
        bb = (float(min_x), float(min_y), float(max_x), float(max_y))
        self.regions.append((str(name), "box", bb, bb))
        self._grid = None

    def add_polygon(self, name, geom):
        """geom: tuple-geometry (polygon or multipolygon)."""
        from osm2pgsql_spark.functions import geometry as G

        bb = G.get_bbox(geom)
        if bb is not None:
            self.regions.append((str(name), "poly", geom, bb))
            self._grid = None

    # -- grid index over region bboxes (same scheme as the kernel above)

    def _ensure_grid(self):
        if self._grid is not None:
            return
        import math
        from collections import defaultdict

        if not self.regions:
            self._grid = ({}, 0.0, 0.0, 1.0, 1.0)
            return
        x0 = min(r[3][0] for r in self.regions)
        y0 = min(r[3][1] for r in self.regions)
        ws = sorted(r[3][2] - r[3][0] for r in self.regions)
        hs = sorted(r[3][3] - r[3][1] for r in self.regions)
        cw = max(ws[len(ws) // 2], 1e-12)
        ch = max(hs[len(hs) // 2], 1e-12)
        grid = defaultdict(list)
        for i, (_, _, _, (bx0, by0, bx1, by1)) in enumerate(self.regions):
            for cx in range(int(math.floor((bx0 - x0) / cw)),
                            int(math.floor((bx1 - x0) / cw)) + 1):
                for cy in range(int(math.floor((by0 - y0) / ch)),
                                int(math.floor((by1 - y0) / ch)) + 1):
                    grid[(cx, cy)].append(i)
        self._grid = (dict(grid), x0, y0, cw, ch)

    def _candidates(self, bb):
        import math

        self._ensure_grid()
        grid, x0, y0, cw, ch = self._grid
        out = set()
        for cx in range(int(math.floor((bb[0] - x0) / cw)),
                        int(math.floor((bb[2] - x0) / cw)) + 1):
            for cy in range(int(math.floor((bb[1] - y0) / ch)),
                            int(math.floor((bb[3] - y0) / ch)) + 1):
                out.update(grid.get((cx, cy), ()))
        return sorted(out)  # insertion order == definition order

    # -- exact intersection tests

    @staticmethod
    def _seg_x(p1, p2, p3, p4):
        """Do segments p1p2 and p3p4 intersect (incl. endpoints)?"""
        def orient(a, b, c):
            v = (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])
            return 0 if v == 0 else (1 if v > 0 else -1)

        def on_seg(a, b, c):
            return (min(a[0], b[0]) <= c[0] <= max(a[0], b[0])
                    and min(a[1], b[1]) <= c[1] <= max(a[1], b[1]))

        o1, o2 = orient(p1, p2, p3), orient(p1, p2, p4)
        o3, o4 = orient(p3, p4, p1), orient(p3, p4, p2)
        if o1 != o2 and o3 != o4:
            return True
        if o1 == 0 and on_seg(p1, p2, p3):
            return True
        if o2 == 0 and on_seg(p1, p2, p4):
            return True
        if o3 == 0 and on_seg(p3, p4, p1):
            return True
        return o4 == 0 and on_seg(p3, p4, p2)

    @classmethod
    def _pts_of(cls, geom):
        """All (rings/lines as point-sequences, is_ring) of a geometry."""
        t = geom[0]
        if t == "point":
            return [([geom[1]], False)]
        if t == "linestring":
            return [(list(geom[1]), False)]
        if t == "polygon":
            return [(list(r), True) for r in geom[1]]
        if t in ("multipoint",):
            return [([p], False) for p in geom[1]]
        if t in ("multilinestring",):
            return [(list(line), False) for line in geom[1]]
        if t == "multipolygon":
            return [(list(r), True) for poly in geom[1] for r in poly]
        if t == "geometrycollection":
            out = []
            for part in geom[1]:
                out.extend(cls._pts_of(part))
            return out
        return []

    def _intersects_box(self, geom, bb):
        from osm2pgsql_spark.functions import geometry as G

        gx0, gy0, gx1, gy1 = G.get_bbox(geom)
        if gx1 < bb[0] or gx0 > bb[2] or gy1 < bb[1] or gy0 > bb[3]:
            return False
        corners = [(bb[0], bb[1]), (bb[2], bb[1]), (bb[2], bb[3]), (bb[0], bb[3])]
        edges = list(zip(corners, corners[1:] + corners[:1]))
        seqs = self._pts_of(geom)
        for pts, is_ring in seqs:
            for px, py in pts:
                if bb[0] <= px <= bb[2] and bb[1] <= py <= bb[3]:
                    return True
            for a, b in zip(pts, pts[1:]):
                for e1, e2 in edges:
                    if self._seg_x(a, b, e1, e2):
                        return True
        # box fully inside a polygon ring?
        if geom[0] in ("polygon", "multipolygon"):
            return G.contains_point(geom, corners[0][0], corners[0][1])
        return False

    def _intersects_poly(self, geom, poly):
        from osm2pgsql_spark.functions import geometry as G

        seqs = self._pts_of(geom)
        for pts, _ in seqs:
            for px, py in pts:
                if G.contains_point(poly, px, py):
                    return True
        poly_seqs = self._pts_of(poly)
        for pts, _ in seqs:
            segs = list(zip(pts, pts[1:]))
            for ppts, _ in poly_seqs:
                for pa, pb in zip(ppts, ppts[1:]):
                    for a, b in segs:
                        if self._seg_x(a, b, pa, pb):
                            return True
        # region fully inside the probe polygon?
        if geom[0] in ("polygon", "multipolygon") and poly_seqs:
            p0 = poly_seqs[0][0][0]
            return G.contains_point(geom, p0[0], p0[1])
        return False

    def all_intersecting(self, geom) -> list[str]:
        from osm2pgsql_spark.functions import geometry as G

        if geom is None:
            return []
        bb = G.get_bbox(geom)
        if bb is None:
            return []
        out = []
        for i in self._candidates(bb):
            name, kind, payload, _ = self.regions[i]
            hit = (self._intersects_box(geom, payload) if kind == "box"
                   else self._intersects_poly(geom, payload))
            if hit:
                out.append(name)
        return out

    def first_intersecting(self, geom):
        hits = self.all_intersecting(geom)
        return hits[0] if hits else None
