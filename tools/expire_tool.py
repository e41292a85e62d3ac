"""Standalone expire tool — Spark port of osm2pgsql-expire.

Reference: /root/reference/src/osm2pgsql-expire.cpp:122-298 — read an
OSM file, compute the dirty-tile list for all tagged objects, write
tiles (z/x/y) or quadkey output.

Usage:
  python tools/expire_tool.py INPUT.{osm|opl} OUTPUT.list \
      [--maxzoom Z] [--minzoom Z] [--buffer F] [--mode M]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("input")
    ap.add_argument("output")
    ap.add_argument("--maxzoom", type=int, default=12)
    ap.add_argument("--minzoom", type=int, default=None)
    ap.add_argument("--buffer", type=float, default=0.1)
    ap.add_argument(
        "--mode", choices=["full_area", "boundary_only", "hybrid"], default="full_area"
    )
    ap.add_argument("--full-area-limit", type=float, default=0.0)
    args = ap.parse_args()

    from osm2pgsql_spark.functions import tiles as TI
    from osm2pgsql_spark.operators import assembly, geom_udfs
    from osm2pgsql_spark.operators.expire import ExpireConfig, dirty_tiles
    from osm2pgsql_spark.session import get_spark
    from osm2pgsql_spark.sinks.writers import write_expire_file
    from osm2pgsql_spark.sources.opl import read_opl
    from osm2pgsql_spark.sources.osm_xml import read_osm_xml

    spark = get_spark("osm2pgsql-expire")
    spark.sparkContext.setLogLevel("ERROR")

    if args.input.endswith(".opl"):
        nodes, ways, _rels = read_opl(spark, args.input)
    else:
        nodes, ways, _rels = read_osm_xml(spark, args.input)

    cfg = ExpireConfig(
        maxzoom=args.maxzoom,
        buffer=args.buffer,
        mode=args.mode,
        full_area_limit=args.full_area_limit,
    )

    # tagged nodes -> point tiles (pure expressions after mercator UDF)
    tagged_nodes = nodes.where(F.size("tags") > 0)
    pt_geoms = tagged_nodes.select(
        geom_udfs.point_wkb(F.col("lon"), F.col("lat"), 3857).alias("geom")
    )

    # tagged ways -> line/ring tiles through the expire kernel
    refs = ways.where(F.size("tags") > 0).select(
        F.col("id").alias("way_id"), F.posexplode("refs").alias("pos", "ref")
    )
    nloc = nodes.select(F.col("id").alias("node_id"), "lon", "lat")
    a = assembly.assemble_points(refs, nloc)
    line_geoms = a.select(
        geom_udfs.wkb_transform_3857(
            assembly.pts_to_linestring_wkb(F.col("pts"))
        ).alias("geom")
    ).where(F.col("geom").isNotNull())

    tiles = dirty_tiles(pt_geoms.unionByName(line_geoms), cfg)
    minzoom = args.minzoom if args.minzoom is not None else args.maxzoom
    rolled = TI.rollup_zoom(tiles, minzoom, args.maxzoom)
    write_expire_file(rolled, args.output)
    n = rolled.count()
    print(f"wrote {n} tiles (zoom {minzoom}..{args.maxzoom}) to {args.output}")


if __name__ == "__main__":
    main()
