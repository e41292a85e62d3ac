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


MERC_R = 6378137.0  # EPSG:3857 sphere radius (reference src/reprojection.cpp:36)


def mercator_nodes(nodes: DataFrame) -> DataFrame:
    """Project node lon/lat to EPSG:3857 meters IN PLACE (same column
    names), so every downstream assembly/area/length step is
    projection-agnostic.  This is the reference's default output
    projection (src/reprojection.cpp:17-102); projecting the node
    table once up front is the Spark-shaped equivalent of the
    reference projecting each geometry at output time — pure column
    expressions, no shuffle."""
    import math

    x = F.radians(F.col("lon")) * F.lit(MERC_R)
    y = F.lit(MERC_R) * F.log(
        F.tan(F.lit(math.pi / 4.0) + F.radians(F.col("lat")) / F.lit(2.0))
    )
    return nodes.withColumn("lon", x).withColumn("lat", y)


def project_nodes(nodes: DataFrame, srid: int) -> DataFrame:
    """Node lon/lat -> target-srid coordinates IN PLACE (same column
    names): 3857 via the JVM-side mercator expressions, 4326
    passthrough, any other EPSG via the public-formula registry
    (functions/projection.py) in one Arrow-batched numpy kernel — the
    reference's -E/--proj output projection
    (src/command-line-parser.cpp:427-440, reprojection_t)."""
    if srid == 3857:
        return mercator_nodes(nodes)
    if srid == 4326:
        return nodes

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from osm2pgsql_spark.functions import projection as PJ

    p = PJ.epsg_params(srid)  # raises for unknown codes, like PROJ

    # no annotations: postponed-evaluation strings (PEP 563, active in
    # this module) defeat pandas_udf's signature inference for the
    # struct-returning Series,Series->DataFrame shape
    def _proj_kernel(lon, lat):
        x, y = PJ.forward_xy(lon.to_numpy(), lat.to_numpy(), p)
        return pd.DataFrame({"x": x, "y": y})

    proj = pandas_udf(_proj_kernel, "struct<x: double, y: double>")

    return (
        nodes.withColumn("__prj", proj(F.col("lon"), F.col("lat")))
        .withColumn("lon", F.col("__prj.x"))
        .withColumn("lat", F.col("__prj.y"))
        .drop("__prj")
    )


def mercator_shoelace_area(pts) -> "F.Column":
    """way_area for --reproject-area (src/output-pgsql.cpp:45-55,
    src/command-line-parser.cpp:447-448): the geometry column stays in
    the working projection (4326) but the area is computed in
    spherical mercator.  Projects the point array, translates by the
    first vertex (mercator magnitudes are ~1e7 m — without the
    translation the shoelace loses ~6 digits to cancellation), then
    shoelaces.  Pure column expressions, JVM-side."""
    import math

    first = F.element_at(pts, 1)
    fx = F.radians(first["x"]) * F.lit(MERC_R)
    fy = F.lit(MERC_R) * F.log(
        F.tan(F.lit(math.pi / 4.0) + F.radians(first["y"]) / F.lit(2.0))
    )
    merc = F.transform(
        pts,
        lambda p: F.struct(
            (F.radians(p["x"]) * F.lit(MERC_R) - fx).alias("x"),
            (F.lit(MERC_R) * F.log(
                F.tan(F.lit(math.pi / 4.0) + F.radians(p["y"]) / F.lit(2.0))
            ) - fy).alias("y"),
        ),
    )
    return assembly.shoelace_area(merc)


def relation_rows(
    relations: DataFrame,
    ways: DataFrame,
    nodes: DataFrame,
    enable_multi: bool = False,
    reproject_area: bool = False,
) -> dict[str, DataFrame]:
    """polygon/line/roads rows from type=multipolygon/boundary/route
    relations — the reference's pgsql_process_relation
    (src/output-pgsql.cpp:239-321) + filter_rel_member_tags
    (src/tagtransform-c.cpp:223-343):

    - only type in (multipolygon, boundary, route) is processed;
    - out-tags = the relation's style-filtered tags (minus `type`);
      relations with no style tag left are skipped entirely — which is
      why a type-only relation contributes nothing while its tagged
      member ways still render independently;
    - type=multipolygon without a boundary tag -> polygon rows only;
      type=boundary (or multipolygon WITH a boundary tag) -> boundary:
      merged-line rows AND polygon rows; type=route -> line rows;
    - polygon geometry is the assembled multipolygon split into one
      row per polygon (`split_multi`, osm_id = -rel_id, per-part
      way_area) unless enable_multi (-G) keeps one multipolygon row;
    - relations whose rings don't assemble (broken member data) are
      dropped, matching the osmium area-assembler failure path.
    """
    from osm2pgsql_spark.operators import relations as R

    tags = F.col("tags")
    typ = tags["type"]
    style_keys = [*STYLE_COLUMNS, "area"]
    rels = (
        relations.where(typ.isin("multipolygon", "boundary", "route"))
        .withColumn("out_tags", F.map_filter(tags, lambda k, _: k.isin(style_keys)))
        .where(F.size("out_tags") > 0)
    )
    is_boundary = (typ == "boundary") | (
        (typ == "multipolygon") & tags["boundary"].isNotNull()
    )
    is_route = typ == "route"

    ot = F.col("out_tags")
    z, roads = _z_and_roads(ot)

    # polygon side: multipolygon + boundary
    poly_rels = rels.where(~is_route)
    parts = R.relation_polygon_parts(
        poly_rels.select(F.col("id"), F.col("members")),
        ways,
        nodes,
        enable_multi=enable_multi,
    )
    poly_tagged = poly_rels.select(
        F.col("id").alias("rel_id"), "out_tags"
    ).join(parts, "rel_id")
    if reproject_area:
        # --reproject-area for relation polygons: area over the
        # 3857-transformed geometry; the stored column stays as-is
        from osm2pgsql_spark.operators.geom_udfs import (
            wkb_area, wkb_transform_3857,
        )

        rel_area = wkb_area(wkb_transform_3857(F.col("wkb")))
    else:
        rel_area = F.col("area")
    polygon = poly_tagged.select(
        (-F.col("rel_id")).alias("osm_id"),
        *_style_cols(ot),
        z,
        rel_area.alias("way_area"),
        F.col("wkb").alias("way"),
    )

    # line side: routes + boundaries — merged member lines, then one
    # row per merged part (split_multi, output-pgsql.cpp:283-298)
    from osm2pgsql_spark.operators.geom_udfs import wkb_split_parts

    line_rels = rels.where(is_route | is_boundary)
    merged = R.relation_multilinestrings(
        line_rels.select(F.col("id"), F.col("members")), ways, nodes
    ).where(F.col("geom").isNotNull())
    line_tagged = line_rels.select(
        F.col("id").alias("rel_id"), "out_tags"
    ).join(merged, "rel_id")
    line = line_tagged.select(
        (-F.col("rel_id")).alias("osm_id"),
        *_style_cols(ot),
        z,
        F.explode(wkb_split_parts(F.col("geom"))).alias("way"),
        roads.alias("__roads"),
    )
    roads_df = line.where(F.col("__roads")).drop("__roads")
    line = line.drop("__roads")
    return {"polygon": polygon, "line": line, "roads": roads_df}


def planet_osm_tables(
    nodes: DataFrame,
    ways: DataFrame,
    relations: DataFrame | None = None,
    srid: int = 4326,
    enable_multi: bool = False,
    reproject_area: bool = False,
) -> dict[str, DataFrame]:
    """Build planet_osm_{point,line,polygon,roads} DataFrames.

    Geometry is kept as assembled point arrays + WKB; way_area is the
    planar shoelace area over the working projection: srid=4326 keeps
    degrees (the repo's historical default), srid=3857 projects node
    coordinates to web-mercator meters first — the reference's
    default, making way_area/ST_Area come out in m² like the BDD
    regression expectations.  Pass `relations` to add the relation
    rows (osm_id = -rel_id) the reference emits for
    multipolygon/boundary/route relations."""
    if srid == 3857:
        nodes = mercator_nodes(nodes)
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

    # --reproject-area: way_area in mercator m^2 while the geometry
    # column stays 4326 (output-pgsql.cpp:45-55); a no-op at srid 3857
    # where the working projection already IS mercator
    if reproject_area and srid != 3857:
        area_expr = mercator_shoelace_area(F.col("pts"))
    else:
        area_expr = assembly.shoelace_area(F.col("pts"))
    polygon = (
        w.where(is_poly)
        .select(
            F.col("id").alias("osm_id"),
            *_style_cols(tags),
            z,
            area_expr.alias("way_area"),
            assembly.pts_to_polygon_wkb(F.col("pts")).alias("way"),
        )
        .where(F.col("way").isNotNull())
    )

    if relations is not None:
        r = relation_rows(
            relations, ways, nodes, enable_multi=enable_multi,
            reproject_area=reproject_area and srid != 3857,
        )
        polygon = polygon.unionByName(r["polygon"])
        line = line.unionByName(r["line"])
        roads_df = roads_df.unionByName(r["roads"])

    return {
        "planet_osm_point": point,
        "planet_osm_line": line,
        "planet_osm_polygon": polygon,
        "planet_osm_roads": roads_df,
    }
