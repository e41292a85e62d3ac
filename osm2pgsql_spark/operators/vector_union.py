"""gen `vector-union` strategy: per-tile exact polygon dissolve with
buffer smoothing.

Reference: /root/reference/src/gen/gen-tile-vector.cpp:41-99 — for each
(dirty) tile, select features whose geometry bbox intersects
ST_TileEnvelope(zoom, x, y, margin), then
    buffered   = ST_Buffer(geom, buffer_size)      per feature
    merged     = ST_Union(buffered)                [GROUP BY col]
    unbuffered = ST_Buffer(ST_Buffer(merged, -2*buffer_size), buffer_size)
    dump       = (ST_Dump(unbuffered)).geom        one row per polygon
with params margin (default 0.0) and buffer_size (default 10).

Spark-first shape: tile assignment is a bbox->tile-range explode in one
mapInPandas pass (the envelope intersect is an inequality on the bbox,
so the covering tile range is closed-form — no spatial join); the
dissolve itself is one applyInPandas group per (x, y[, group]) running
the exact overlay kernel (functions/polyops.py).  Dilation distributes
over union, so "buffer each then union" collapses into ONE overlay pass
(inputs + all boundary shapes), then erode(2b), then dilate(b) — three
overlay passes per tile instead of one per feature.

At 100 TB the (x, y) key is the unit of parallelism exactly like the
reference's tile worker pool; skewed tiles are bounded by tile content,
and margin keeps cross-tile seams consistent without any shuffle
between neighbors.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm2pgsql_spark.functions import geometry as G
from osm2pgsql_spark.functions import polyops as PO
from osm2pgsql_spark.operators.expire import EARTH_CIRCUMFERENCE


def assign_tiles(
    geoms: DataFrame,
    zoom: int,
    margin: float = 0.0,
    wkb_col: str = "geom",
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """One row per (feature, covering tile): the `geom &&
    ST_TileEnvelope(z, x, y, margin)` selection of the reference SQL
    turned inside-out into a closed-form tile-range explode (no
    clipping — the reference does not clip either)."""
    n = 1 << zoom
    half = EARTH_CIRCUMFERENCE / 2.0
    extent = EARTH_CIRCUMFERENCE / n

    cols = [*extra_cols, wkb_col]

    def kernel(it):
        for pdf in it:
            rows = []
            for _, row in pdf.iterrows():
                w = row[wkb_col]
                if w is None:
                    continue
                g = G.from_wkb(bytes(w))
                bb = G.get_bbox(g)
                if bb is None:
                    continue
                x0 = int(math.floor((bb[0] + half) / extent - margin))
                x1 = int(math.floor((bb[2] + half) / extent + margin))
                y0 = int(math.floor((half - bb[3]) / extent - margin))
                y1 = int(math.floor((half - bb[1]) / extent + margin))
                for x in range(max(0, x0), min(n - 1, x1) + 1):
                    for y in range(max(0, y0), min(n - 1, y1) + 1):
                        out = {"x": x, "y": y, "geom": bytes(w)}
                        for c in extra_cols:
                            out[c] = row[c]
                        rows.append(out)
            yield pd.DataFrame(rows, columns=[*extra_cols, "x", "y", "geom"])

    extra_schema = "".join(f"{c} string, " for c in extra_cols)
    return geoms.select(*cols).mapInPandas(
        kernel, extra_schema + "x bigint, y bigint, geom binary"
    )


def _dissolve_one(wkbs: list[bytes], buffer_size: float, quad_segs: int):
    """The reference's buffered/merged/unbuffered CTE chain for one
    tile group; returns the dumped polygon list."""
    polys: list[list[np.ndarray]] = []
    for w in wkbs:
        g = G.from_wkb(w)
        polys.extend(PO._as_polys(g))
    if not polys:
        return []
    b = float(buffer_size)
    if b > 0:
        # dilation distributes over union: one overlay over inputs +
        # every feature's boundary shapes == buffer-each-then-union
        shapes = PO._boundary_shapes(polys, b, quad_segs)
        merged = PO._overlay_groups(polys + shapes, [], PO._PREDICATES["union"])
        merged = PO.buffer_geom(merged, -2.0 * b, quad_segs)
        merged = PO.buffer_geom(merged, b, quad_segs)
    else:
        merged = PO._overlay_groups(polys, [], PO._PREDICATES["union"])
    return PO.dump_polygons(merged)


def tile_vector_union(
    geoms: DataFrame,
    zoom: int,
    buffer_size: float = 10.0,
    margin: float = 0.0,
    group_by: str | None = None,
    quad_segs: int = 4,
    wkb_col: str = "geom",
    tiles: DataFrame | None = None,
    assigned: bool = False,
) -> DataFrame:
    """Exact vector dissolve per tile (the vector-union generalizer).

    Output: (x, y[, group_by], geom) — one row per dumped polygon, the
    reference's INSERT shape (gen-tile-vector.cpp:59-60, 77-79).
    `tiles` restricts to a dirty list (append mode); `assigned=True`
    means `geoms` already has (x, y) columns."""
    extra = (group_by,) if group_by else ()
    df = geoms if assigned else assign_tiles(
        geoms, zoom, margin=margin, wkb_col=wkb_col, extra_cols=extra
    )
    if tiles is not None:
        df = df.join(tiles.select("x", "y").distinct(), ["x", "y"], "left_semi")

    keys = ["x", "y", *extra]
    schema = (
        "x bigint, y bigint, "
        + (f"{group_by} string, " if group_by else "")
        + "geom binary"
    )

    def dissolve(pdf: pd.DataFrame) -> pd.DataFrame:
        x = int(pdf["x"].iloc[0])
        y = int(pdf["y"].iloc[0])
        rows = []
        for poly in _dissolve_one(
            [bytes(w) for w in pdf["geom"] if w is not None], buffer_size, quad_segs
        ):
            out = {"x": x, "y": y, "geom": G.to_wkb(poly)}
            if group_by:
                out[group_by] = pdf[group_by].iloc[0]
            rows.append(out)
        return pd.DataFrame(rows, columns=["x", "y", *extra, "geom"])

    return df.groupBy(*keys).applyInPandas(dissolve, schema)
