"""Generalization driver: which tiles does a gen strategy process?

Reference: /root/reference/src/gen/osm2pgsql-gen.cpp:489-524
(process_tiles) — in append mode the tile list comes from the expire
table (rolled to the generalizer's zoom, optionally capped by
max_tiles_per_run); in full mode it is every tile in the source
data's extent at that zoom.  The per-tile work is then farmed to
worker threads.

Spark-first: the tile list is a DataFrame; gen strategies consume it
either as a broadcast membership filter inside the cut kernel (small
dirty sets — no wasted clipping) or as a post-cut semi-join (large
sets).  The per-tile parallelism the reference hand-builds with
threads is the (x, y) partition key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from osm2pgsql_spark.operators.vector_tiles import cut_to_tiles

# below this many dirty tiles the membership set is broadcast into the
# cut kernel so non-dirty tiles are never clipped at all
# each python worker unpickles its own copy of the broadcast set, so
# the cap is sized for (workers x set) memory, not one copy
BROADCAST_TILE_LIMIT = 200_000


def rollup_tiles(tiles: DataFrame, from_zoom: int, to_zoom: int) -> DataFrame:
    """(x, y) dirty tiles at from_zoom -> distinct tiles at to_zoom
    (reference: get_tiles_from_table rolls expire tiles to the
    generalizer zoom)."""
    if to_zoom > from_zoom:
        raise ValueError("to_zoom must be <= from_zoom")
    dz = from_zoom - to_zoom
    return tiles.select(
        F.shiftright(F.col("x"), dz).alias("x"),
        F.shiftright(F.col("y"), dz).alias("y"),
    ).distinct()


def tiles_to_process(
    zoom: int,
    dirty_tiles: DataFrame | None = None,
    dirty_zoom: int | None = None,
    features: DataFrame | None = None,
    wkb_col: str = "geom",
    max_tiles_per_run: int = 0,
) -> DataFrame:
    """The generalizer's tile list (x, y) at `zoom`.

    Append mode (dirty_tiles given): expire tiles rolled from
    dirty_zoom to zoom, deterministic (x, y) order, optionally capped
    at max_tiles_per_run (reference params: expire_list, order_by,
    max_tiles_per_run).  Full mode (features given): every tile in
    the 3857 features' bounding box at `zoom`.
    """
    if dirty_tiles is not None:
        t = dirty_tiles.select("x", "y")
        if dirty_zoom is not None and dirty_zoom != zoom:
            t = rollup_tiles(t, dirty_zoom, zoom)
        else:
            t = t.distinct()
        if max_tiles_per_run and max_tiles_per_run > 0:
            t = t.orderBy("x", "y").limit(max_tiles_per_run)
        return t
    if features is None:
        raise ValueError("need dirty_tiles or features")
    from osm2pgsql_spark.operators.expire import EARTH_CIRCUMFERENCE
    from osm2pgsql_spark.operators.geom_udfs import wkb_bbox

    b = wkb_bbox(F.col(wkb_col))
    ext = features.select(
        F.min(b["min_x"]).alias("x0"), F.min(b["min_y"]).alias("y0"),
        F.max(b["max_x"]).alias("x1"), F.max(b["max_y"]).alias("y1"),
    ).collect()[0]
    if ext["x0"] is None:
        return features.sparkSession.createDataFrame([], "x bigint, y bigint")
    n = 1 << zoom
    half = EARTH_CIRCUMFERENCE / 2.0
    ts = EARTH_CIRCUMFERENCE / n

    def tx(v: float) -> int:
        return min(n - 1, max(0, int((v + half) / ts)))

    def ty(v: float) -> int:
        return min(n - 1, max(0, int((half - v) / ts)))

    x0, x1 = tx(ext["x0"]), tx(ext["x1"])
    y0, y1 = ty(ext["y1"]), ty(ext["y0"])
    spark = features.sparkSession
    xs = spark.range(x0, x1 + 1).select(F.col("id").alias("x"))
    ys = spark.range(y0, y1 + 1).select(F.col("id").alias("y"))
    return xs.crossJoin(ys)


def cut_to_dirty_tiles(
    geoms: DataFrame,
    zoom: int,
    tiles: DataFrame,
    margin: float = 0.0,
    wkb_col: str = "geom",
    id_col: str | None = None,
) -> DataFrame:
    """cut_to_tiles restricted to the given tile list.

    Small tile lists are collected and broadcast into the clip kernel
    (non-dirty tiles cost nothing); larger ones fall back to a
    semi-join after cutting."""
    n = tiles.limit(BROADCAST_TILE_LIMIT + 1).count()
    if n <= BROADCAST_TILE_LIMIT:
        wanted = {
            (int(r["x"]), int(r["y"])) for r in tiles.select("x", "y").collect()
        }
        sc = geoms.sparkSession.sparkContext
        bwanted = sc.broadcast(wanted)
        # membership check runs INSIDE the cut kernel, before each
        # clip — non-dirty tiles cost only the tile enumeration, so
        # clip CPU is proportional to the dirty set, not the extent
        return cut_to_tiles(
            geoms,
            zoom,
            margin=margin,
            wkb_col=wkb_col,
            id_col=id_col,
            tile_filter=lambda x, y: (int(x), int(y)) in bwanted.value,
        )
    cut = cut_to_tiles(geoms, zoom, margin=margin, wkb_col=wkb_col, id_col=id_col)
    return cut.join(tiles.select("x", "y").distinct(), ["x", "y"], "left_semi")
