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


# ---------------------------------------------------------------------
# square relations: synthetic multipolygon fixtures with EXACT floats.
#
# One relation per part row (p_partkey % 4 == 1): an axis-aligned
# square of half-size s centered at (cx, cy), built as FOUR open member
# ways (one side each) so ring assembly must stitch endpoints; every
# third relation adds an inner square (hole) of half-size s/2 as four
# more ways.  All coordinates are on the 1/8 grid and |coord| < 64, so
# every shoelace product and sum is exact in binary floating point —
# the analytic oracle (area = 4s^2, hole 3s^2; perimeter 8s / 12s)
# matches bit-for-bit with no rounding discipline needed.
# ---------------------------------------------------------------------

SQUARE_S_SQL = "((p_partkey % 8) + 1) / 4.0e0"
SQUARE_FILTER_SQL = "p_partkey % 4 = 1"
SQUARE_HOLE_SQL = "p_partkey % 3 = 0"
SQUARE_CX_SQL = "((p_partkey * 7) % 320) / 4.0e0 - 40.0e0"
SQUARE_CY_SQL = "((p_partkey * 11) % 320) / 4.0e0 - 40.0e0"

# (corner_index, dx_factor, dy_factor); 1-4 outer ring, 5-8 inner ring
_SQ_CORNERS = [
    (1, -1.0, -1.0), (2, 1.0, -1.0), (3, 1.0, 1.0), (4, -1.0, 1.0),
    (5, -0.5, -0.5), (6, 0.5, -0.5), (7, 0.5, 0.5), (8, -0.5, 0.5),
]
# (way_index, from_corner, to_corner)
_SQ_SIDES = [
    (1, 1, 2), (2, 2, 3), (3, 3, 4), (4, 4, 1),
    (5, 5, 6), (6, 6, 7), (7, 7, 8), (8, 8, 5),
]


def square_relations(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(nodes, ways, relations) in model-schema shape (id/lon/lat,
    id/refs, id/members) for the square-multipolygon fixtures."""
    p = load_table(spark, sf_dir, "part").where(F.expr(SQUARE_FILTER_SQL))
    base = p.select(
        F.col("p_partkey").alias("r"),
        F.expr(SQUARE_CX_SQL).alias("cx"),
        F.expr(SQUARE_CY_SQL).alias("cy"),
        F.expr(SQUARE_S_SQL).alias("s"),
        F.expr(SQUARE_HOLE_SQL).alias("hole"),
    )

    corner = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(ci).alias("ci"), F.lit(dx).alias("dx"), F.lit(dy).alias("dy")
                )
                for ci, dx, dy in _SQ_CORNERS
            ]
        )
    )
    nodes = (
        base.select("r", "cx", "cy", "s", "hole", corner.alias("c"))
        .where((F.col("c.ci") <= 4) | F.col("hole"))
        .select(
            (F.col("r") * 100 + F.col("c.ci")).alias("id"),
            (F.col("cx") + F.col("s") * F.col("c.dx")).alias("lon"),
            (F.col("cy") + F.col("s") * F.col("c.dy")).alias("lat"),
        )
    )

    side = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(wi).alias("wi"), F.lit(a).alias("a"), F.lit(b).alias("b")
                )
                for wi, a, b in _SQ_SIDES
            ]
        )
    )
    sq_ways = (
        base.select("r", "hole", side.alias("sd"))
        .where((F.col("sd.wi") <= 4) | F.col("hole"))
        .select(
            (F.col("r") * 10 + F.col("sd.wi")).alias("id"),
            F.array(
                F.col("r") * 100 + F.col("sd.a"), F.col("r") * 100 + F.col("sd.b")
            ).alias("refs"),
        )
    )

    def member(j: int):
        return F.struct(
            F.lit("w").alias("type"),
            (F.col("r") * 10 + j).cast("bigint").alias("ref"),
            F.lit("outer" if j <= 4 else "inner").alias("role"),
        )

    rels = base.select(
        F.col("r").alias("id"),
        F.when(F.col("hole"), F.array(*[member(j) for j in range(1, 9)]))
        .otherwise(F.array(*[member(j) for j in range(1, 5)]))
        .alias("members"),
    )
    return nodes, sq_ways, rels


def square_member_relations(
    spark: SparkSession, sf_dir: str, node_members: bool, way_members: bool
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Square fixtures with configurable member kinds: corner nodes as
    'n' members and/or side ways as 'w' members (for multipoint /
    geometrycollection assembly gates)."""
    nodes, sq_ways, _ = square_relations(spark, sf_dir)
    p = load_table(spark, sf_dir, "part").where(F.expr(SQUARE_FILTER_SQL))
    base = p.select(
        F.col("p_partkey").alias("r"), F.expr(SQUARE_HOLE_SQL).alias("hole")
    )

    def nmember(ci: int):
        return F.struct(
            F.lit("n").alias("type"),
            (F.col("r") * 100 + ci).cast("bigint").alias("ref"),
            F.lit("").alias("role"),
        )

    def wmember(j: int):
        return F.struct(
            F.lit("w").alias("type"),
            (F.col("r") * 10 + j).cast("bigint").alias("ref"),
            F.lit("").alias("role"),
        )

    def members(rng) -> list:
        out = []
        if node_members:
            out += [nmember(i) for i in rng]
        if way_members:
            out += [wmember(i) for i in rng]
        return out

    rels = base.select(
        F.col("r").alias("id"),
        F.when(F.col("hole"), F.array(*members(range(1, 9))))
        .otherwise(F.array(*members(range(1, 5))))
        .alias("members"),
    )
    return nodes, sq_ways, rels


# ---------------------------------------------------------------------
# tagged ways: the lineitem-derived ways with deterministic OSM-style
# tags for the flex / pgsql-compat pipelines.  The tag formulas live
# here once; oracles rebuild them with the *_SQL twins.
# ---------------------------------------------------------------------

WAY_HIGHWAY_SQL = (
    "CASE way_id % 4 WHEN 0 THEN 'motorway' WHEN 1 THEN 'primary' "
    "WHEN 2 THEN 'residential' ELSE 'footway' END"
)
WAY_LAYER_SQL = "cast(way_id % 3 AS string)"
WAY_BRIDGE_SQL = "way_id % 7 = 0"
WAY_RAILWAY_SQL = "way_id % 11 = 0"
WAY_BUILDING_SQL = "way_id % 2 = 0"  # closed-polygon candidates


def tagged_ways(spark: SparkSession, sf_dir: str, close_buildings: bool = False) -> DataFrame:
    """Model-schema ways (id, refs, tags) with deterministic tags.

    close_buildings: for ways tagged building (way_id % 2 = 0) with
    >= 3 refs, append the first ref so the way closes into a ring
    (polygon candidates for the pgsql-compat path)."""
    w = ways(spark, sf_dir).withColumnRenamed("way_id", "id")
    tags = F.map_filter(
        F.map_from_arrays(
            F.array(
                F.lit("highway"), F.lit("layer"), F.lit("bridge"),
                F.lit("railway"), F.lit("building"),
            ),
            F.array(
                F.expr(WAY_HIGHWAY_SQL.replace("way_id", "id")),
                F.expr(WAY_LAYER_SQL.replace("way_id", "id")),
                F.when(F.expr(WAY_BRIDGE_SQL.replace("way_id", "id")), F.lit("yes")),
                F.when(F.expr(WAY_RAILWAY_SQL.replace("way_id", "id")), F.lit("rail")),
                F.when(F.expr(WAY_BUILDING_SQL.replace("way_id", "id")), F.lit("yes")),
            ),
        ),
        lambda _k, v: v.isNotNull(),
    )
    w = w.select("id", "refs", tags.alias("tags"))
    if close_buildings:
        closed = F.when(
            F.expr(WAY_BUILDING_SQL.replace("way_id", "id")) & (F.size("refs") >= 3),
            F.concat(F.col("refs"), F.array(F.element_at(F.col("refs"), 1))),
        ).otherwise(F.col("refs"))
        w = w.select("id", closed.alias("refs"), "tags")
    return w
