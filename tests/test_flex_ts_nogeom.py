"""timestamp.feature + nogeom.feature ports
(/root/reference/tests/bdd/flex/{timestamp,nogeom}.feature):
timestamp columns accept tag strings in extended AND compact ISO form
plus the object's own timestamp attribute; geometry-less tables
import and update cleanly."""

from pyspark.sql import functions as F

from osm2pgsql_spark.plans.flex import ColumnDef, FlexConfig
from osm2pgsql_spark.sources.opl import read_opl
from osm2pgsql_spark.streaming.append import apply_diff


def test_timestamp_column_forms(spark):
    nodes, ways, rels = read_opl(
        spark,
        [
            "n10 v1 dV t2020-12-12T11:22:33Z Tts=20260102T123456Z x10.0 y10.0",
            "n11 v1 dV t2020-12-12T11:22:33Z Tts=2026-02-03T01:23:45Z x10.0 y10.0",
        ],
    )
    cfg = FlexConfig()
    cfg.define_table(
        "ts_t", ids="node",
        columns=[ColumnDef("ts", "timestamp"), ColumnDef("ts_tz", "timestamptz")],
    )

    def node_cb(obj):
        yield "ts_t", {"ts": obj["tags"]["ts"], "ts_tz": obj["tags"]["ts"]}
        yield "ts_t", {"ts": obj["timestamp"], "ts_tz": obj["timestamp"]}

    cfg.process("node", node_cb)
    t = cfg.run(nodes=nodes, ways=ways, relations=rels)["ts_t"]
    rows = {
        (r["osm_id"], str(r["ts"])) for r in t.collect()
    }
    assert rows == {
        (10, "2026-01-02 12:34:56"),
        (11, "2026-02-03 01:23:45"),
        (10, "2020-12-12 11:22:33"),
        (11, "2020-12-12 11:22:33"),
    }


def test_nogeom_table_update(spark):
    base = [
        "n10 v1 dV Tamenity=restaurant x10.0 y10.0",
        "n11 v1 dV Tamenity=post_box x10.0 y10.2",
    ]
    nodes, ways, rels = read_opl(spark, base)

    def build(n):
        cfg = FlexConfig()
        cfg.define_table(
            "pois", ids="node", columns=[ColumnDef("tags", "hstore")]
        )
        cfg.insert("pois", "node", tags=F.col("tags"))
        return cfg.run(nodes=n)["pois"]

    t = build(nodes)
    got = {r["osm_id"]: r["tags"] for r in t.collect()}
    assert got[10].get("amenity") == "restaurant" and "name" not in got[10]
    assert got[11].get("amenity") == "post_box"

    dn, _, _ = read_opl(
        spark, ["n10 v2 dV Tamenity=restaurant,name=Schwanen x10.0 y10.0"]
    )
    nodes2 = apply_diff(nodes, dn.withColumn("op", F.lit("modify")))
    got2 = {r["osm_id"]: r["tags"] for r in build(nodes2).collect()}
    assert got2[10].get("name") == "Schwanen"
    assert got2[11].get("amenity") == "post_box" and "name" not in got2[11]
