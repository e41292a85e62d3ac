"""pgsql-compat: the legacy fixed pipeline as a canned flex config.

Reference: /root/reference/src/output-pgsql.cpp (538 LoC) targets four
tables planet_osm_{point,line,polygon,roads}
(/root/reference/src/output-pgsql.hpp:32-38): style-file tag filter ->
z_order (/root/reference/src/tagtransform-c.cpp:28-89) -> geometry ->
way_area (/root/reference/src/output-pgsql.cpp:45-55,89-123).  The
reference itself treats this as a special case of flex; so do we.

POLYGON_KEYS is the default style's polygon decision: a way whose
tags include one of these keys becomes a polygon if closed
(simplified from the default.style shipped with the reference).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from osm2pgsql_spark.functions import tags as TG
from osm2pgsql_spark.operators import assembly

# keys rendered as polygons when the way is closed (default.style)
POLYGON_KEYS = [
    "aeroway", "amenity", "building", "harbour", "historic", "landuse",
    "leisure", "man_made", "military", "natural", "office", "place",
    "power", "public_transport", "shop", "sport", "tourism", "water",
    "waterway", "wetland",
]

# tag columns materialized in the legacy tables (subset of default.style)
STYLE_COLUMNS = [
    "access", "addr:housename", "addr:housenumber", "aerialway", "aeroway",
    "amenity", "barrier", "bicycle", "boundary", "bridge", "building",
    "highway", "historic", "junction", "landuse", "layer", "leisure",
    "man_made", "military", "name", "natural", "oneway", "place", "power",
    "railway", "ref", "religion", "route", "service", "shop", "sport",
    "surface", "tourism", "tunnel", "water", "waterway",
]


def _style_cols(tags: Column) -> list[Column]:
    return [tags[k].alias(k.replace(":", "_")) for k in STYLE_COLUMNS]


def _z_and_roads(tags: Column) -> tuple[Column, Column]:
    z = TG.z_order(
        tags["highway"],
        layer=tags["layer"],
        bridge=tags["bridge"],
        tunnel=tags["tunnel"],
        railway=tags["railway"],
    )
    roads = TG.roads_flag(tags["highway"], railway=tags["railway"], boundary=tags["boundary"])
    return z, roads


def _is_polygon(tags: Column, refs: Column) -> Column:
    closed = (F.size(refs) >= 4) & (
        F.element_at(refs, 1) == F.element_at(refs, -1)
    )
    has_area_key = F.lit(False)
    for k in POLYGON_KEYS:
        has_area_key = has_area_key | tags[k].isNotNull()
    forced = TG.tag_bool(tags["area"])  # area=yes forces polygon
    # NULL-safe: a missing area tag must not block (isin yields NULL)
    blocked = F.coalesce(tags["area"].isin("no", "false", "0"), F.lit(False))
    return closed & ~blocked & (has_area_key | forced)


def planet_osm_tables(
    nodes: DataFrame, ways: DataFrame
) -> dict[str, DataFrame]:
    """Build planet_osm_{point,line,polygon,roads} DataFrames.

    Geometry is kept as assembled point arrays + WKB; way_area is the
    planar shoelace area like the reference's default (4326 unless
    --reproject-area)."""
    tags = F.col("tags")

    tagged_nodes = nodes.where(F.size("tags") > 0)
    point = tagged_nodes.select(
        F.col("id").alias("osm_id"),
        *_style_cols(tags),
        F.col("lon"),
        F.col("lat"),
    )

    refs = ways.select(F.col("id").alias("way_id"), F.posexplode("refs").alias("pos", "ref"))
    nloc = nodes.select(F.col("id").alias("node_id"), "lon", "lat")
    geoms = assembly.assemble_points(refs, nloc)
    w = ways.where(F.size("tags") > 0).join(
        geoms.withColumnRenamed("way_id", "__gid"), F.col("id") == F.col("__gid"), "left"
    )

    z, roads = _z_and_roads(tags)
    is_poly = _is_polygon(tags, F.col("refs"))

    line_base = w.where(~is_poly)
    line = line_base.select(
        F.col("id").alias("osm_id"),
        *_style_cols(tags),
        z,
        assembly.pts_to_linestring_wkb(F.col("pts")).alias("way"),
    ).where(F.col("way").isNotNull())

    roads_df = line_base.where(roads).select(
        F.col("id").alias("osm_id"),
        *_style_cols(tags),
        z,
        assembly.pts_to_linestring_wkb(F.col("pts")).alias("way"),
    ).where(F.col("way").isNotNull())

    polygon = (
        w.where(is_poly)
        .select(
            F.col("id").alias("osm_id"),
            *_style_cols(tags),
            z,
            assembly.shoelace_area(F.col("pts")).alias("way_area"),
            assembly.pts_to_polygon_wkb(F.col("pts")).alias("way"),
        )
        .where(F.col("way").isNotNull())
    )

    return {
        "planet_osm_point": point,
        "planet_osm_line": line,
        "planet_osm_polygon": polygon,
        "planet_osm_roads": roads_df,
    }
