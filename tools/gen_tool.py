"""Standalone generalization tool — Spark port of osm2pgsql-gen.

Reference: /root/reference/src/gen/osm2pgsql-gen.cpp — runs a named
generalization strategy over imported tables, full-extent or (append
mode) restricted to an expire/dirty tile list, with per-strategy
params.  Strategies here read/write parquet instead of PostGIS
tables; the tile list comes from a z/x/y text file (the expire sink
format) or a parquet (x, y[, zoom]) table.

Usage:
  python tools/gen_tool.py raster-union --input polys.parquet \
      --output out.parquet --zoom 10 [--dirty expire.list] \
      [--resolution 2048] [--close-size 2] [--margin 0.05] \
      [--max-tiles N]
  python tools/gen_tool.py builtup --input layers.parquet \
      --output out.parquet --zoom 10 --buffer landuse=8 --buffer roads=4 \
      [--turdsize 16] [--min-area 0] ...
  python tools/gen_tool.py discrete-isolation --input points.parquet \
      --output out.parquet [--cell 3.0]
  python tools/gen_tool.py tile-sql --input feats.parquet --view feats \
      --sql "SELECT t.x, t.y, count(*) AS n FROM __tiles__ t JOIN feats f
             ON f.x = t.x AND f.y = t.y GROUP BY t.x, t.y" \
      --dirty expire.list --output out.parquet

Inputs: raster-union/builtup expect EPSG:3857 WKB in a `geom` column
(builtup also a `layer` column); discrete-isolation expects
(id, x, y, importance).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_dirty(spark, path: str, zoom: int):
    """Tile list from an expire z/x/y text file or a parquet table.
    Returns (tiles_df, dirty_zoom)."""
    from pyspark.sql import functions as F

    if path.endswith(".parquet"):
        t = spark.read.parquet(path)
        dz = zoom
        if "zoom" in t.columns:
            row = t.select(F.max("zoom").alias("z")).collect()[0]
            dz = int(row["z"])
            t = t.where(F.col("zoom") == dz)
        return t.select("x", "y"), dz
    lines = spark.read.text(path)
    parts = F.split(F.col("value"), "/")
    t = lines.select(
        parts.getItem(0).cast("int").alias("zoom"),
        parts.getItem(1).cast("bigint").alias("x"),
        parts.getItem(2).cast("bigint").alias("y"),
    )
    row = t.selectExpr("max(zoom) AS z").collect()[0]
    dz = int(row["z"])
    return t.where(F.col("zoom") == dz).select("x", "y"), dz


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "strategy",
        choices=["raster-union", "builtup", "discrete-isolation", "tile-sql"],
    )
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--zoom", type=int, default=10)
    ap.add_argument("--dirty", help="expire z/x/y list or parquet tile table")
    ap.add_argument("--max-tiles", type=int, default=0)
    ap.add_argument("--resolution", type=int, default=2048)
    ap.add_argument("--close-size", type=int, default=0)
    ap.add_argument("--margin", type=float, default=0.0)
    ap.add_argument("--buffer", action="append", default=[],
                    help="builtup per-layer buffer px, LAYER=N")
    ap.add_argument("--turdsize", type=int, default=0)
    ap.add_argument("--min-area", type=float, default=0.0)
    ap.add_argument("--cell", type=float, default=3.0)
    ap.add_argument("--view", help="tile-sql: view name for the input table")
    ap.add_argument("--sql", help="tile-sql: query over __tiles__ + views")
    args = ap.parse_args()

    from osm2pgsql_spark.operators import gen, isolation, raster_union, tile_sql
    from osm2pgsql_spark.session import get_spark

    spark = get_spark("osm2pgsql-gen")
    feats = spark.read.parquet(args.input)

    if args.strategy == "discrete-isolation":
        out = isolation.grid(feats, cell=args.cell)
        out.write.mode("overwrite").parquet(args.output)
        print(f"wrote {out.count()} isolation rows to {args.output}")
        return

    if args.dirty:
        dirty, dz = load_dirty(spark, args.dirty, args.zoom)
        tiles = gen.tiles_to_process(
            args.zoom, dirty_tiles=dirty, dirty_zoom=dz,
            max_tiles_per_run=args.max_tiles,
        )
    elif args.strategy != "tile-sql":
        tiles = gen.tiles_to_process(args.zoom, features=feats, wkb_col="geom")
    else:
        tiles = None

    if args.strategy == "tile-sql":
        if not (args.view and args.sql):
            raise SystemExit("tile-sql needs --view and --sql")
        feats.createOrReplaceTempView(args.view)
        if tiles is None:
            raise SystemExit("tile-sql needs --dirty (the tile list)")
        out = tile_sql.run_tile_sql_vectorized(spark, args.sql, tiles)
        out.write.mode("overwrite").parquet(args.output)
        print(f"wrote {out.count()} tile-sql rows to {args.output}")
        return

    if args.strategy == "raster-union":
        cut = gen.cut_to_dirty_tiles(
            feats, args.zoom, tiles, margin=args.margin, wkb_col="geom"
        )
        out = raster_union.tile_raster_union(
            cut, args.zoom, resolution=args.resolution,
            close_size=args.close_size, margin=args.margin,
        )
    else:  # builtup
        buffers = {}
        for spec in args.buffer:
            layer, _, n = spec.partition("=")
            buffers[layer] = int(n or 0)
        # the cut kernel drops extra columns, so cut per layer and
        # re-attach the layer literal
        from pyspark.sql import functions as F

        parts = []
        for layer in [r["layer"] for r in feats.select("layer").distinct().collect()]:
            c = gen.cut_to_dirty_tiles(
                feats.where(F.col("layer") == layer), args.zoom, tiles,
                margin=args.margin, wkb_col="geom",
            )
            parts.append(c.withColumn("layer", F.lit(layer)))
        cut = parts[0]
        for p in parts[1:]:
            cut = cut.unionByName(p)
        out = raster_union.tile_builtup(
            cut, args.zoom, buffer_sizes=buffers, resolution=args.resolution,
            turdsize=args.turdsize, min_area=args.min_area, margin=args.margin,
        )
    out.write.mode("overwrite").parquet(args.output)
    print(f"wrote {spark.read.parquet(args.output).count()} rows to {args.output}")


if __name__ == "__main__":
    main()
