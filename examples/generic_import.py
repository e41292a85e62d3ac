"""Generic import config — the engine's equivalent of the reference's
canonical starting-point config (/root/reference/flex-config/
generic.lua, public domain): geometry-type-split tables with tags in
JSON columns, the standard delete-key cleanup, routes/boundaries as
merged multilinestrings.

Run standalone against any .osm/.opl/.pbf file:

  python examples/generic_import.py INPUT OUTPUT_DIR
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from osm2pgsql_spark.functions.tags import filter_tags
from osm2pgsql_spark.operators import assembly, relations
from osm2pgsql_spark.plans.flex import ColumnDef, FlexConfig

# generic.lua's delete_keys (the mapper/import junk-key cleanup)
DELETE_KEYS = [
    "attribution", "comment", "created_by", "fixme", "note", "note:*",
    "odbl", "odbl:note", "source", "source:*", "source_ref",
    "CLC:*", "geobase:*", "canvec:*", "osak:*", "kms:*", "ngbe:*",
    "it:fvg:*", "KSJ2:*", "yh:*", "LINZ2OSM:*", "linz2osm:*", "LINZ:*",
    "ref:linz:*", "WroclawGIS:*", "naptan:*", "tiger:*", "gnis:*",
    "NHD:*", "nhd:*", "mvdgis:*", "project:eurosha_2012", "ref:UrbIS",
    "accuracy:meters", "sub_sea:type", "waterway:type",
    "statscan:rbuid", "ref:ruian:addr", "ref:ruian", "building:ruian:type",
    "dibavod:id", "uir_adr:ADRESA_KOD", "gst:feat_id", "maaamet:ETAK",
    "ref:FR:FANTOIR", "3dshapes:ggmodelk", "AND_nosr_r",
    "OPPDATERIN", "addr:city:simc", "osmarender:*", "import", "import_uuid",
    "OBJTYPE", "SK53_bulk:load", "mml:class",
]


# id scheme per output table (flex-table.hpp:40-49) — lets the import
# CLI's incremental append map touched object ids to table rows
ID_SPACES = {
    "points": "node",
    "lines": "way",
    "polygons": "area",
    "routes": "relation",
    "boundaries": "relation",
}


# generic.lua's has_area_tags() key list: a closed way with any of
# these (or area=yes) becomes a polygon, otherwise it stays a line
AREA_KEYS = [
    "aeroway", "amenity", "building", "harbour", "historic", "landuse",
    "leisure", "man_made", "military", "natural", "office", "place",
    "power", "public_transport", "shop", "sport", "tourism", "water",
    "waterway", "wetland", "abandoned:aeroway", "abandoned:amenity",
    "abandoned:building", "abandoned:landuse", "abandoned:power",
    "area:highway", "building:part",
]


def generic_import(
    spark: SparkSession,
    nodes: DataFrame,
    ways: DataFrame,
    rels: DataFrame,
) -> dict[str, DataFrame]:
    """Build the five generic tables exactly like
    flex-config/generic.lua: points, lines, polygons (closed ways with
    area tags + relation multipolygons), routes, boundaries (merged
    multilinestrings) — tags cleaned and serialized to JSON, geometry
    in EPSG:3857 WKB."""
    clean = filter_tags(F.col("tags"), delete_patterns=DELETE_KEYS)

    cfg = FlexConfig()
    cfg.define_table(
        "points", ids="node",
        columns=[ColumnDef("tags", "jsonb"), ColumnDef("geom", "point", srid=3857, not_null=True)],
    )
    cfg.define_table(
        "lines", ids="way",
        columns=[ColumnDef("tags", "jsonb"), ColumnDef("geom", "linestring", srid=3857, not_null=True)],
    )
    cfg.define_table(
        "polygons", ids="area",
        columns=[ColumnDef("tags", "jsonb"), ColumnDef("geom", "geometry", srid=3857, not_null=True)],
    )
    cfg.define_table(
        "routes", ids="relation",
        columns=[ColumnDef("tags", "jsonb"), ColumnDef("geom", "multilinestring", srid=3857, not_null=True)],
    )
    cfg.define_table(
        "boundaries", ids="relation",
        columns=[ColumnDef("tags", "jsonb"), ColumnDef("geom", "multilinestring", srid=3857, not_null=True)],
    )

    has_tags = F.size(clean) > 0
    closed = (F.size("refs") >= 4) & (F.element_at("refs", 1) == F.element_at("refs", -1))
    # has_area_tags(): area=yes forces polygon, area=no forces line,
    # else any area-ish key present
    area_keys_pred = F.lit(False)
    for k in AREA_KEYS:
        area_keys_pred = area_keys_pred | clean[k].isNotNull()
    area_tags = (
        F.when(clean["area"] == "yes", F.lit(True))
        .when(clean["area"] == "no", F.lit(False))
        .otherwise(area_keys_pred)
    )
    is_area_way = F.coalesce(closed & area_tags, F.lit(False))

    cfg.insert("points", "node", when=has_tags, tags=clean)
    cfg.insert("polygons", "way", when=has_tags & is_area_way,
               way_geometry="polygon", tags=clean)
    cfg.insert("lines", "way", when=has_tags & ~is_area_way, tags=clean)

    # relations: grab_tag('type') removes the key from the stored tags
    rel_type = clean["type"]
    rel_tags = F.map_filter(clean, lambda k, _v: k != "type")
    has_rtags = F.size(rel_tags) > 0
    is_route = F.coalesce(rel_type == "route", F.lit(False))
    is_boundary = F.coalesce(
        (rel_type == "boundary")
        | ((rel_type == "multipolygon") & clean["boundary"].isNotNull()),
        F.lit(False),
    )
    cfg.insert("routes", "relation", when=has_rtags & is_route,
               relation_geometry="multilinestring", tags=rel_tags)
    cfg.insert("boundaries", "relation",
               when=has_rtags & ~is_route & is_boundary,
               relation_geometry="multilinestring", geom_transform="line_merge",
               tags=rel_tags)
    cfg.insert("polygons", "relation",
               when=has_rtags & ~is_route & ~is_boundary
               & F.coalesce(rel_type == "multipolygon", F.lit(False)),
               relation_geometry="multipolygon", tags=rel_tags)

    return cfg.run(nodes=nodes, ways=ways, relations=rels)


def waterway_generalization(
    spark: SparkSession, nodes: DataFrame, ways: DataFrame
) -> DataFrame:
    """Generalized river network from waterway ways — the reference's
    gen-rivers pipeline (/root/reference/src/gen/gen-rivers.cpp) as a
    post-import stage: split waterway ways into segments keyed by
    endpoint coordinates, contract degree-2 chains, and propagate max
    width downstream.  propagate_width self-selects its scale path:
    short chains relax directly, long chains (>24 hops unconverged)
    escalate to the chain-decomposition (propagate_width_chained)."""
    from osm2pgsql_spark.operators.rivers import (
        contract_chains,
        merge_chains,
        propagate_width,
    )

    ww = ways.where(F.col("tags")["waterway"].isNotNull())
    refs = ww.select(
        F.col("id").alias("way_id"),
        F.col("tags")["name"].alias("name"),
        F.coalesce(F.col("tags")["width"].cast("double"), F.lit(1.0)).alias("width"),
        F.posexplode("refs").alias("pos", "ref"),
    )
    pts = refs.join(
        nodes.select(F.col("id").alias("ref"), "lon", "lat"), "ref"
    )
    nxt = pts.alias("a").join(
        pts.alias("b"),
        (F.col("a.way_id") == F.col("b.way_id"))
        & (F.col("b.pos") == F.col("a.pos") + 1),
    )
    edges = nxt.select(
        (F.col("a.way_id") * 10000 + F.col("a.pos")).alias("edge_id"),
        F.col("a.lon").alias("x1"), F.col("a.lat").alias("y1"),
        F.col("b.lon").alias("x2"), F.col("b.lat").alias("y2"),
        F.col("a.width").alias("width"),
        F.sqrt(
            (F.col("b.lon") - F.col("a.lon")) * (F.col("b.lon") - F.col("a.lon"))
            + (F.col("b.lat") - F.col("a.lat")) * (F.col("b.lat") - F.col("a.lat"))
        ).alias("length"),
        F.col("a.name").alias("name"),
    )
    widened = propagate_width(edges)
    return merge_chains(contract_chains(widened)).select(
        "chain_id", "name", "length", "width",
        F.size("member_edges").alias("n_segments"),
    )


def main() -> None:
    from osm2pgsql_spark.session import get_spark
    from osm2pgsql_spark.sinks.writers import write_parquet
    from osm2pgsql_spark.sources.opl import read_opl
    from osm2pgsql_spark.sources.osm_xml import read_osm_xml
    from osm2pgsql_spark.sources.pbf import read_pbf

    inp, out_dir = sys.argv[1], sys.argv[2]
    spark = get_spark("generic-import")
    spark.sparkContext.setLogLevel("ERROR")
    if inp.endswith(".pbf"):
        nodes, ways, rels = read_pbf(spark, inp)
    elif inp.endswith(".opl"):
        nodes, ways, rels = read_opl(spark, inp)
    else:
        nodes, ways, rels = read_osm_xml(spark, inp)
    tables = generic_import(spark, nodes, ways, rels)
    tables["waterways_gen"] = waterway_generalization(spark, nodes, ways)
    for name, df in tables.items():
        write_parquet(df, os.path.join(out_dir, f"{name}.parquet"))
        print(f"{name}: {spark.read.parquet(os.path.join(out_dir, name + '.parquet')).count()} rows")


if __name__ == "__main__":
    main()
