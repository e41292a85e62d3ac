"""Line-in-polygon intersection length and width-from-areas seeding.

Reference: the rivers generalizer derives a waterway segment's width
from the water areas covering it with spatial SQL —
ST_CoveredBy/ST_Intersects/ST_Intersection and a weighted-length
width (/root/reference/src/gen/gen-rivers.cpp:213-233).

Spark-first: a bbox pre-join pairs lines with candidate polygons
(broadcast when the area table is small, shuffle-on-gridkey when
not), then an exact kernel computes the length of each line inside
each polygon: every segment is split at its crossings with polygon
edges and each sub-segment is classified by its midpoint
(even-odd point-in-polygon) — exact up to float eps, no clipping
library needed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm2pgsql_spark.functions import geometry as G


def _segment_crossings(p: np.ndarray, q: np.ndarray, rings: list[np.ndarray]) -> list[float]:
    """Parameters t in (0,1) where segment p->q crosses any ring edge."""
    d = q - p
    ts: list[float] = []
    for ring in rings:
        a = ring[:-1]
        b = ring[1:]
        e = b - a
        denom = d[0] * e[:, 1] - d[1] * e[:, 0]
        with np.errstate(divide="ignore", invalid="ignore"):
            w = a - p
            t = (w[:, 0] * e[:, 1] - w[:, 1] * e[:, 0]) / denom
            u = (w[:, 0] * d[1] - w[:, 1] * d[0]) / denom
        ok = (np.abs(denom) > 0) & (t > 0) & (t < 1) & (u >= 0) & (u < 1)
        ts.extend(t[ok].tolist())
    return ts


def line_in_polygon_length(line: np.ndarray, polygon) -> float:
    """Exact length of the linestring inside the (multi)polygon."""
    if polygon is None or line is None or len(line) < 2:
        return 0.0
    kind, payload = polygon
    polys = [payload] if kind == "polygon" else payload if kind == "multipolygon" else []
    if not polys:
        return 0.0
    total = 0.0
    for i in range(len(line) - 1):
        p, q = line[i].astype("f8"), line[i + 1].astype("f8")
        seg_len = float(np.hypot(*(q - p)))
        if seg_len == 0.0:
            continue
        cuts = [0.0, 1.0]
        for rings in polys:
            cuts.extend(_segment_crossings(p, q, rings))
        cuts = sorted(set(cuts))
        for t0, t1 in zip(cuts[:-1], cuts[1:]):
            mid = p + (t0 + t1) / 2.0 * (q - p)
            if G.contains_point(polygon, float(mid[0]), float(mid[1])):
                total += (t1 - t0) * seg_len
    return total


def _grid_cells(bbox_col, cell: float):
    """Array of "cx:cy" grid keys covering a bbox struct (JVM-side)."""
    c = F.lit(float(cell))
    xs = F.sequence(
        F.floor(bbox_col["min_x"] / c), F.floor(bbox_col["max_x"] / c)
    )
    ys = F.sequence(
        F.floor(bbox_col["min_y"] / c), F.floor(bbox_col["max_y"] / c)
    )
    return F.flatten(
        F.transform(
            xs,
            lambda x: F.transform(
                ys, lambda y: F.concat_ws(":", x.cast("string"), y.cast("string"))
            ),
        )
    )


def width_from_areas(
    lines: DataFrame,
    areas: DataFrame,
    line_wkb: str = "geom",
    area_wkb: str = "area_geom",
    area_width: str = "width",
    line_id: str = "edge_id",
    broadcast_areas: bool = True,
    grid_cell: float | None = None,
) -> DataFrame:
    """(line_id, width) — weighted-length width from covering areas:
    sum(len_inside_i * width_i) / sum(len_inside_i)
    (gen-rivers.cpp:213-233 semantics).  Lines touched by NO area are
    absent from the output — left-join the result back onto the edge
    table and coalesce with a default to give every segment a width.

    lines: (line_id, geom WKB linestring); areas: (area_geom WKB
    polygon, width).

    Pairing strategy: with grid_cell set, both sides explode their
    bboxes onto a grid of that cell size and candidates come from a
    plain equi-join on the cell key — the scale path: shuffle on the
    grid key only, kernel evaluations bounded by true spatial
    proximity, no cross product anywhere in the plan.  Without it,
    a broadcast cross join (acceptable only for small area tables)."""
    from pyspark.sql.functions import pandas_udf

    a = areas.select(
        F.col(area_wkb).alias("__awkb"), F.col(area_width).alias("__awidth")
    )

    if grid_cell is not None:
        from osm2pgsql_spark.operators import geom_udfs

        # the bbox UDF must land in its own projection: Catalyst can't
        # nest a Python UDF inside higher-order-function lambdas
        lb = (
            lines.select(F.col(line_id), F.col(line_wkb).alias("__lwkb"))
            .withColumn("__bbox", geom_udfs.wkb_bbox(F.col("__lwkb")))
            .withColumn("__cell", F.explode(_grid_cells(F.col("__bbox"), grid_cell)))
            .drop("__bbox")
        )
        ab = (
            a.withColumn("__aid", F.monotonically_increasing_id())
            .withColumn("__bbox", geom_udfs.wkb_bbox(F.col("__awkb")))
            .withColumn("__cell", F.explode(_grid_cells(F.col("__bbox"), grid_cell)))
            .drop("__bbox")
        )
        if broadcast_areas:
            ab = F.broadcast(ab)
        # a line/area pair can share several cells: dedupe before the
        # (expensive) exact kernel
        paired = (
            lb.join(ab, "__cell")
            .dropDuplicates([line_id, "__aid"])
            .drop("__cell", "__aid")
        )
    else:
        if broadcast_areas:
            a = F.broadcast(a)
        paired = lines.select(
            F.col(line_id), F.col(line_wkb).alias("__lwkb")
        ).crossJoin(a)

    def kernel(lw, aw):
        out = []
        for l, p in zip(lw, aw):
            if l is None or p is None:
                out.append(0.0)
                continue
            lg = G.from_wkb(bytes(l))
            pg = G.from_wkb(bytes(p))
            if lg is None or lg[0] != "linestring":
                out.append(0.0)
                continue
            out.append(line_in_polygon_length(lg[1], pg))
        return pd.Series(out, dtype="float64")

    # asNondeterministic: the __inlen > 0 filter below is otherwise
    # pushed under the projection and the exact clipping kernel runs
    # TWICE per candidate pair (guide §4.4; seen in the
    # river_width_from_areas gate plan, r14 audit).  Pure kernel; the
    # flag only pins single evaluation.
    inlen_udf = pandas_udf(kernel, "double").asNondeterministic()
    scored = paired.withColumn("__inlen", inlen_udf(F.col("__lwkb"), F.col("__awkb")))
    agg = (
        scored.where(F.col("__inlen") > 0)
        .groupBy(line_id)
        .agg(
            (F.sum(F.col("__inlen") * F.col("__awidth")) / F.sum("__inlen")).alias("width")
        )
    )
    return agg
