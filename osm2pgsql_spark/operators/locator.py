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

    udf = pandas_udf(kernel, "string")
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
