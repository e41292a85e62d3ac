"""Python-callback flex config — the engine's equivalent of a Lua
config with real process_node/process_way logic (the GENERAL path;
reference callback resolution /root/reference/src/output-flex.cpp:
1469-1501).  Everything a Lua config can do imperatively — branch on
tags, emit several rows into several tables, pick a geometry —
happens here in plain Python, executed Arrow-batched and parallel.

Run standalone against any .osm/.opl/.pbf file:

  python examples/callback_config.py INPUT OUTPUT_DIR
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from osm2pgsql_spark.plans.flex import ColumnDef, FlexConfig

AMENITY_RANK = {"hospital": 3, "school": 2, "restaurant": 1}


def build_config() -> FlexConfig:
    cfg = FlexConfig()
    cfg.define_table(
        "pois",
        ids="node",
        columns=[
            ColumnDef("kind", "text"),
            ColumnDef("rank", "int4"),
            ColumnDef("name", "text"),
            ColumnDef("geom", "point", not_null=True),
        ],
    )
    cfg.define_table(
        "paths",
        ids="way",
        columns=[
            ColumnDef("highway", "text"),
            ColumnDef("is_bridge", "boolean"),
            ColumnDef("geom", "linestring", not_null=True),
        ],
    )
    cfg.define_table(
        "names",
        ids="any_object",
        columns=[ColumnDef("name", "text")],
    )

    def node(obj):
        tags = obj["tags"]
        amenity = tags.get("amenity")
        if amenity:
            yield "pois", {
                "kind": amenity,
                "rank": AMENITY_RANK.get(amenity, 0),
                "name": tags.get("name"),
                "geom": obj["geom_point"],
            }
        if "name" in tags:
            yield "names", {"name": tags["name"]}

    def way(obj):
        tags = obj["tags"]
        if tags.get("highway") and obj["geom_line"] is not None:
            yield "paths", {
                "highway": tags["highway"],
                "is_bridge": tags.get("bridge", "no"),
                "geom": obj["geom_line"],
            }
        if "name" in tags:
            yield "names", {"name": tags["name"]}

    cfg.process("node", node)
    cfg.process("way", way)
    return cfg


def main() -> int:
    inp, outdir = sys.argv[1], sys.argv[2]
    spark = SparkSession.builder.master("local[*]").getOrCreate()

    from osm2pgsql_spark.sources.opl import read_opl
    from osm2pgsql_spark.sources.osm_xml import read_osm_xml
    from osm2pgsql_spark.sources.pbf import read_pbf

    if inp.endswith(".pbf"):
        nodes, ways, rels = read_pbf(spark, inp)
    elif inp.endswith(".opl"):
        nodes, ways, rels = read_opl(spark, inp)
    else:
        nodes, ways, rels = read_osm_xml(spark, inp)
    tables = build_config().run(nodes=nodes, ways=ways, relations=rels)
    for name, df in tables.items():
        df.write.mode("overwrite").parquet(os.path.join(outdir, name))
        print(name, df.count())
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
