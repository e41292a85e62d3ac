"""tile-sql generalization: user-supplied SQL per dirty tile.

Reference: /root/reference/src/gen/gen-tile-sql.cpp:30-40 — runs a SQL
template with {ZOOM}/{X}/{Y} substituted once per tile, each tile
round-tripping to the PostGIS server.

Spark-first: the per-tile loop disappears.  The template's tile
parameters become columns of a `__tiles__` view and the user SQL runs
ONCE over the tile-joined data — Catalyst parallelizes across tiles,
which is exactly what the reference's worker threads hand-build
(/root/reference/src/gen/osm2pgsql-gen.cpp:243-283).

Two modes:
- run_tile_sql_vectorized: template references __tiles__ (preferred)
- run_tile_sql_loop: verbatim {ZOOM}/{X}/{Y} substitution per tile,
  unioned — kept for templates that can't be rewritten; driver-side
  loop, only sensible for small tile lists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def run_tile_sql_vectorized(
    spark: SparkSession, sql: str, tiles: DataFrame
) -> DataFrame:
    """Run `sql` once; it may reference the view __tiles__(zoom, x, y).

    Feature views must already be registered by the caller."""
    tiles.createOrReplaceTempView("__tiles__")
    return spark.sql(sql)


def run_tile_sql_loop(
    spark: SparkSession, template: str, tiles: list[tuple[int, int, int]]
) -> DataFrame:
    """Reference-faithful mode: substitute {ZOOM}/{X}/{Y} per tile and
    union the results.  O(len(tiles)) plans — use the vectorized mode
    for real tile sets."""
    out: DataFrame | None = None
    for zoom, x, y in tiles:
        sql = (
            template.replace("{ZOOM}", str(zoom)).replace("{X}", str(x)).replace("{Y}", str(y))
        )
        df = spark.sql(sql)
        out = df if out is None else out.unionByName(df)
    if out is None:
        raise ValueError("empty tile list")
    return out
