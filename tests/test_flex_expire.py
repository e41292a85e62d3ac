"""Flex per-column expire wiring (define_expire_output parity)."""

import pytest
from pyspark.sql import functions as F

from osm2pgsql_spark.model import NODE_SCHEMA
from osm2pgsql_spark.plans.flex import ColumnDef, FlexConfig


def test_flex_expire_outputs(spark):
    # node at mercator origin-ish: lon/lat (0.03, 0.03) -> z12 tile near (2048, 2047)
    nodes = spark.createDataFrame(
        [
            (1, 0.03, 0.03, {"amenity": "x"}, None, None, None, None, None, None),
            (2, 0.03, -0.03, {"amenity": "y"}, None, None, None, None, None, None),
        ],
        NODE_SCHEMA,
    )
    cfg = FlexConfig()
    cfg.define_expire_output("tiles", maxzoom=12, minzoom=11)
    cfg.define_table(
        "points",
        ids="node",
        columns=[
            ColumnDef("name", "text"),
            ColumnDef("geom", "point", srid=3857, not_null=True, expire="tiles"),
        ],
    )
    cfg.insert("points", "node", name=F.col("tags")["amenity"])

    tables = cfg.run(nodes=nodes)
    expire = cfg.compute_expire(tables)
    assert set(expire) == {"tiles"}
    tiles = {(r["zoom"], r["x"], r["y"]) for r in expire["tiles"].collect()}
    # node 1 (lon .03) -> z12 (2048, 2047); node 2 (lon -.03) ->
    # (2047, 2047); rolled up to z11 parents
    assert tiles == {
        (12, 2047, 2047),
        (12, 2048, 2047),
        (11, 1023, 1023),
        (11, 1024, 1023),
    }
