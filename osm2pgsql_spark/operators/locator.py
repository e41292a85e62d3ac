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
    R-tree probe; bbox prefilter first, exact point-in-polygon then).

    For thousands of regions, swap the linear bbox scan for a grid
    index keyed by region bbox — the kernel shape stays the same."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from osm2pgsql_spark.functions import geometry as G

    parsed = []
    for name, wkb in sorted(regions_wkb):
        g = G.from_wkb(wkb)
        bb = G.get_bbox(g)
        if g is not None and bb is not None:
            parsed.append((name, g, bb))

    # no type annotations: pandas_udf resolves hints via module globals,
    # and pd is imported locally here
    def kernel(xs, ys):
        out = []
        for px, py in zip(xs, ys):
            hits = [
                name
                for name, g, (minx, miny, maxx, maxy) in parsed
                if minx <= px <= maxx and miny <= py <= maxy and G.contains_point(g, px, py)
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
