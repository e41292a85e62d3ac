"""Deterministic synthetic OSM view over the TPC-H-ish corpus.

The driver's correctness gate compares Spark results against DuckDB
oracles over the same parquet tables, so the OSM-shaped inputs
(nodes with coordinates, ways with ordered node refs, changesets)
are *derived* from those tables with pure-arithmetic formulas that
both engines evaluate identically (same IEEE doubles, same ints).

Derivation:
- nodes    <- part:      id = p_partkey, lon/lat on a 0.1-degree
              grid (reference fixtures use exactly such a grid, see
              /root/reference/tests/bdd/flex/area.feature:3-7),
              tags from p_type/p_brand.
- ways     <- lineitem:  way id = l_orderkey, node refs = l_partkey
              ordered by l_linenumber (a way is an ordered node
              list: /root/reference/src/osmtypes.hpp + SURVEY 1.1).
- changes  <- a filtered subset of nodes, for reverse-dependency
              tests (/root/reference/src/osmdata.cpp:75-147).

Every formula exists ONCE, as a SQL expression string; the Spark side
evaluates it with F.expr and the oracle splices the same text into
DuckDB SQL.  They cannot drift apart.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from osm2pgsql_spark.sources.testdata import load_table

# -- formula single-source-of-truth (valid in both Spark SQL & DuckDB) --
# NB: float literals use the 1e0 exponent form: Spark and DuckDB both
# parse bare `10.0` as DECIMAL (different scales/semantics), but both
# parse `10.0e0` as DOUBLE — required for bit-identical results.
LON_EXPR = "((p_partkey * 37) % 3600) / 10.0e0 - 180.0e0"
LAT_EXPR = "((p_partkey * 53) % 1700) / 10.0e0 - 85.0e0"

# SQL CTE bodies for oracles.  Keep in lock-step with the DataFrame
# builders below (they use the identical expression strings).
NODES_SQL = (
    "SELECT p_partkey AS node_id, "
    f"{LON_EXPR} AS lon, "
    f"{LAT_EXPR} AS lat, "
    "p_type AS highway, p_brand AS brand, p_size AS layer "
    "FROM part"
)

WAY_REFS_SQL = (
    "SELECT l_orderkey AS way_id, l_linenumber AS pos, l_partkey AS ref "
    "FROM lineitem"
)


def nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic node table: one node per part row."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        F.col("p_partkey").alias("node_id"),
        F.expr(LON_EXPR).alias("lon"),
        F.expr(LAT_EXPR).alias("lat"),
        F.col("p_type").alias("highway"),
        F.col("p_brand").alias("brand"),
        F.col("p_size").alias("layer"),
    )


def way_refs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic way->node reference list, exploded form.

    (way_id, pos, ref) — the exploded shape the core join consumes.
    The reference's equivalent is the ways.nodes int8[] column
    (/root/reference/src/middle-pgsql.cpp:1040-1044)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        F.col("l_orderkey").alias("way_id"),
        F.col("l_linenumber").alias("pos"),
        F.col("l_partkey").alias("ref"),
    )


def ways(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assembled way table: (way_id, refs ARRAY<BIGINT> ordered by pos)."""
    wr = way_refs(spark, sf_dir)
    return (
        wr.groupBy("way_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "ref"))),
                lambda s: s["ref"],
            ).alias("refs")
        )
    )
