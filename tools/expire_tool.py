"""Standalone expire tool — Spark port of osm2pgsql-expire.

Reference: /root/reference/src/osm2pgsql-expire.cpp:122-298 — read an
OSM file, compute the dirty-tile list for all tagged objects (points,
closed-way polygons with linestring fallback, relation multipolygon /
multilinestring / collection geometries), print tiles in quadkey
order as `z/x/y` lines or as an EPSG:3857 GeoJSON FeatureCollection
(tests/bdd/expire/expire.feature pins both against golden files).

Usage (reference-compatible):
  python tools/expire_tool.py -z18 -m full_area -f geojson INPUT.osm
  python tools/expire_tool.py -z18 -m full_area -f tiles -b 0.5 INPUT.osm

Legacy file-writing mode (rollup range + output path):
  python tools/expire_tool.py INPUT.{osm|opl} OUTPUT.list \
      [--maxzoom Z] [--minzoom Z] [--buffer F] [--mode M]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

# reference src/tile.hpp:76 — an exact constant, not 2*pi*R
EARTH_CIRCUMFERENCE = 40075016.68
HALF_EARTH_CIRCUMFERENCE = EARTH_CIRCUMFERENCE / 2


def _quadkey(x: int, y: int, zoom: int) -> int:
    """tile.cpp:89-93: x bits interleaved into even positions, y into
    odd ones; the sorted quadkey list IS the reference print order."""
    v = 0
    for i in range(zoom):
        v |= ((x >> i) & 1) << (2 * i)
        v |= ((y >> i) & 1) << (2 * i + 1)
    return v


def _tile_box(x: int, y: int, zoom: int) -> tuple[float, float, float, float]:
    """tile.hpp:118-144 box(0): same constant, same operation order, so
    the doubles match the reference byte-for-byte in GeoJSON output."""
    extent = EARTH_CIRCUMFERENCE / float(1 << zoom)
    xmin = -HALF_EARTH_CIRCUMFERENCE + x * extent
    xmax = -HALF_EARTH_CIRCUMFERENCE + (x + 1) * extent
    ymin = HALF_EARTH_CIRCUMFERENCE - (y + 1) * extent
    ymax = HALF_EARTH_CIRCUMFERENCE - y * extent
    return xmin, ymin, xmax, ymax


def _tile_to_json(x: int, y: int, zoom: int) -> str:
    """osm2pgsql-expire.cpp tile_to_json: nlohmann dumps objects with
    alphabetically sorted keys, no spaces, and Grisu2 doubles (our
    functions/dtoa twin — byte-identical to the golden files)."""
    from osm2pgsql_spark.functions.dtoa import dtoa

    xmin, ymin, xmax, ymax = _tile_box(x, y, zoom)
    ring = ",".join(
        f"[{dtoa(px)},{dtoa(py)}]"
        for px, py in ((xmin, ymin), (xmin, ymax), (xmax, ymax),
                       (xmax, ymin), (xmin, ymin)))
    return ('{"geometry":{"coordinates":[[' + ring
            + ']],"type":"Polygon"},"properties":{'
            + f'"label":"{zoom}/{x}/{y}","x":{x},"y":{y},"z":{zoom}'
            + '},"type":"Feature"}')


def _geojson_start() -> str:
    crs = json.dumps(
        {"type": "name",
         "properties": {"name": "urn:ogc:def:crs:EPSG::3857"}},
        sort_keys=True, separators=(",", ":"))
    return ('{"type": "FeatureCollection", "crs":' + crs
            + ', "features": [\n')


def _print_tiles(tiles: list[tuple[int, int]], zoom: int, fmt: str) -> None:
    tiles = sorted(tiles, key=lambda t: _quadkey(t[0], t[1], zoom))
    if fmt == "tiles":
        for x, y in tiles:
            print(f"{zoom}/{x}/{y}")
        return
    # fmt::print("{}\n", geojson_start()) -> header then a blank line
    print(_geojson_start())
    first = True
    for x, y in tiles:
        print(("" if first else ",") + _tile_to_json(x, y, zoom))
        first = False
    print("]}")


def _tagged_geoms_3857(spark, nodes, ways, rels):
    """One 3857-WKB geometry per tagged object, the way the reference
    tool builds them (osm2pgsql-expire.cpp:122-216): node point, closed
    way polygon (linestring fallback), relation multipolygon /
    multilinestring / collection by type tag."""
    from osm2pgsql_spark.operators import assembly, geom_udfs, relations as R

    parts = []

    tagged_nodes = nodes.where(F.size("tags") > 0)
    parts.append(tagged_nodes.select(
        geom_udfs.point_wkb(F.col("lon"), F.col("lat"), 3857).alias("geom")))

    tagged_ways = ways.where(F.size("tags") > 0)
    refs = tagged_ways.select(
        F.col("id").alias("way_id"), F.posexplode("refs").alias("pos", "ref"))
    nloc = nodes.select(F.col("id").alias("node_id"), "lon", "lat")
    a = assembly.assemble_points(refs, nloc)
    closed = F.col("pts")[0] == F.col("pts")[F.size("pts") - 1]
    way_geom = F.when(
        closed & (F.size("pts") >= 4),
        assembly.pts_to_polygon_wkb(F.col("pts")),
    )
    way_geom = F.coalesce(way_geom, assembly.pts_to_linestring_wkb(F.col("pts")))
    parts.append(a.select(
        geom_udfs.wkb_transform_3857(way_geom).alias("geom")))

    tagged_rels = rels.where(F.size("tags") > 0)
    rtype = F.col("tags")["type"]
    mp_rels = tagged_rels.where(rtype.isin("multipolygon", "boundary"))
    ml_rels = tagged_rels.where(rtype.isin("route", "multilinestring"))
    other_rels = tagged_rels.where(
        ~F.coalesce(rtype.isin("multipolygon", "boundary",
                               "route", "multilinestring"), F.lit(False)))
    for df in (
        R.relation_multipolygons(mp_rels, ways, nodes),
        R.relation_multilinestrings(ml_rels, ways, nodes),
        R.relation_collections(other_rels, ways, nodes),
    ):
        parts.append(df.select(
            geom_udfs.wkb_transform_3857(F.col("geom")).alias("geom")))

    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.where(F.col("geom").isNotNull())


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("input")
    ap.add_argument("output", nargs="?", default=None)
    ap.add_argument("-z", "--zoom", type=int, default=None,
                    help="single zoom level (reference-compatible mode)")
    ap.add_argument("--maxzoom", type=int, default=12)
    ap.add_argument("--minzoom", type=int, default=None)
    ap.add_argument("-b", "--buffer", type=float, default=0.1)
    ap.add_argument("-m", "--mode", default="full_area")
    ap.add_argument("-f", "--format", default="tiles")
    ap.add_argument("--full-area-limit", type=float, default=0.0)
    args = ap.parse_args()

    # reference wordings (osm2pgsql-expire.cpp:320-334)
    if args.format not in ("tiles", "geojson"):
        raise SystemExit("Value for --format must be 'tiles' or 'geojson'.")
    if args.mode not in ("boundary_only", "full_area", "hybrid"):
        raise SystemExit("Value for --mode must be 'boundary_only', "
                         "'full_area', or 'hybrid'.")

    from osm2pgsql_spark.functions import tiles as TI
    from osm2pgsql_spark.operators.expire import ExpireConfig, dirty_tiles
    from osm2pgsql_spark.session import get_spark
    from osm2pgsql_spark.sinks.writers import write_expire_file
    from osm2pgsql_spark.sources.opl import read_opl
    from osm2pgsql_spark.sources.osm_xml import read_osm_xml

    spark = get_spark("osm2pgsql-expire")
    spark.sparkContext.setLogLevel("ERROR")

    if args.input.endswith(".opl"):
        nodes, ways, rels = read_opl(spark, args.input)
    else:
        nodes, ways, rels = read_osm_xml(spark, args.input)

    zoom = args.zoom if args.zoom is not None else args.maxzoom
    cfg = ExpireConfig(
        maxzoom=zoom,
        buffer=args.buffer,
        mode=args.mode,
        full_area_limit=args.full_area_limit,
    )
    geoms = _tagged_geoms_3857(spark, nodes, ways, rels)
    tiles = dirty_tiles(geoms, cfg)

    if args.output is None:
        # reference-compatible stdout print, quadkey order
        rows = tiles.select("x", "y").distinct().collect()
        _print_tiles([(r["x"], r["y"]) for r in rows], zoom, args.format)
        return

    minzoom = args.minzoom if args.minzoom is not None else zoom
    rolled = TI.rollup_zoom(tiles, minzoom, zoom)
    write_expire_file(rolled, args.output)
    n = rolled.count()
    print(f"wrote {n} tiles (zoom {minzoom}..{zoom}) to {args.output}")


if __name__ == "__main__":
    main()
