"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship pipeline on sf0.001: way assembly (THE core
                 join), JVM-side length, WKB linestring kernel, tile
                 assignment. Exercises source → join → aggregation →
                 geometry kernel → tile math end-to-end.
queries()      — one entry per implemented operator (SURVEY.md §2 +
                 training-data extensions); see osm2pgsql_spark/queries.py.
oracle_sql()   — DuckDB twins for the driver's correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from osm2pgsql_spark.functions import tiles as TI
    from osm2pgsql_spark.functions.rounding import round4
    from osm2pgsql_spark.operators import assembly
    from osm2pgsql_spark.sources import osm_synth

    sf_dir = "/root/testdata/sf0.001"
    refs = osm_synth.way_refs(spark, sf_dir)
    nodes = osm_synth.nodes(spark, sf_dir)
    ways = assembly.way_lines(refs, nodes, with_wkb=True)
    first_pt = F.element_at(F.col("pts"), 1)
    return ways.select(
        "way_id",
        "n_resolved",
        round4(F.col("length")).alias("length"),
        F.col("geom"),
        TI.tile_x(first_pt["x"], 12).alias("tile_x"),
        TI.tile_y(first_pt["y"], 12).alias("tile_y"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from osm2pgsql_spark import queries as Q

    return Q.queries()


def oracle_sql() -> dict[str, str]:
    from osm2pgsql_spark import queries as Q

    return Q.oracle_sql()
