"""Discrete isolation: distance to the nearest more-important point.

Reference: /root/reference/src/gen/gen-discrete-isolation.cpp:33-124 —
sort by importance desc, then for each point scan all
higher-importance points for the min distance (O(n^2) single-node).

Spark-first: two implementations.
- exact(): the O(n^2) semantics as a probe/candidate self-join with a
  strict importance ordering (ties broken by id).  Test-scale and
  oracle-matched path.
- grid(): the 100 TB path — points bucketed into grid cells, each
  point joins only its 3x3 cell neighborhood; any point whose
  neighborhood gives no trustworthy answer (nearest-higher farther
  than one cell) falls back to an exact pass probing the FULL point
  set.  Identical results to exact() (tested), bounded join fan-out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from osm2pgsql_spark.functions.rounding import round4

# built lazily: F.sqrt() invokes the JVM, so module-level expression
# constants would require an active SparkContext at import time
def _higher():
    return (F.col("bimp") > F.col("aimp")) | (
        (F.col("bimp") == F.col("aimp")) & (F.col("bid") < F.col("id"))
    )


def _dist():
    return F.sqrt(
        (F.col("bx") - F.col("ax")) * (F.col("bx") - F.col("ax"))
        + (F.col("by") - F.col("ay")) * (F.col("by") - F.col("ay"))
    )


def _probe_side(points: DataFrame, id_col: str, x: str, y: str, importance: str) -> DataFrame:
    return points.select(
        F.col(id_col).alias("id"),
        F.col(x).alias("ax"),
        F.col(y).alias("ay"),
        F.col(importance).alias("aimp"),
    )


def _cand_side(points: DataFrame, id_col: str, x: str, y: str, importance: str) -> DataFrame:
    return points.select(
        F.col(id_col).alias("bid"),
        F.col(x).alias("bx"),
        F.col(y).alias("by"),
        F.col(importance).alias("bimp"),
    )


def _min_dist_to_higher(probe: DataFrame, candidates: DataFrame) -> DataFrame:
    """(id, aimp, iso): min distance from each probe point to any
    strictly-more-important candidate (NULL if none)."""
    return (
        probe.join(candidates, _higher(), "left")
        .groupBy("id", "aimp")
        .agg(F.min(_dist()).alias("iso"))
    )


def _ranked(iso: DataFrame) -> DataFrame:
    w = Window.orderBy(F.desc("aimp"), F.asc("id"))
    return iso.select(
        "id", F.row_number().over(w).alias("irank"), round4(F.col("iso")).alias("iso")
    )


def exact(
    points: DataFrame,
    id_col: str = "id",
    x: str = "x",
    y: str = "y",
    importance: str = "importance",
) -> DataFrame:
    """(id, irank, iso) — rank by importance desc and distance to the
    nearest strictly-more-important point (ties broken by lower id,
    making the order total like the reference's stable sort).  The
    top point gets NULL iso."""
    probe = _probe_side(points, id_col, x, y, importance)
    cand = _cand_side(points, id_col, x, y, importance)
    return _ranked(_min_dist_to_higher(probe, cand))


def grid(
    points: DataFrame,
    cell: float,
    id_col: str = "id",
    x: str = "x",
    y: str = "y",
    importance: str = "importance",
) -> DataFrame:
    """Grid-bucketed candidate join; results identical to exact().

    A 3x3-neighborhood distance is only trusted when it cannot cross a
    cell boundary (iso <= cell); untrusted points fall back to an
    exact probe against the FULL candidate set (not just the residue —
    their nearest-higher point is usually already resolved)."""
    probe = _probe_side(points, id_col, x, y, importance).select(
        "*",
        F.floor(F.col("ax") / cell).alias("cx"),
        F.floor(F.col("ay") / cell).alias("cy"),
    )
    # the candidate side broadcasts, so probe parallelism alone bounds
    # the join: a small input (one parquet file -> one partition) would
    # serialize the whole neighborhood join onto one core.  Round-robin
    # spread; at real scale the scan already has many partitions and
    # this is a cheap narrow-input safeguard.
    par = points.sparkSession.sparkContext.defaultParallelism
    if probe.rdd.getNumPartitions() < par:
        probe = probe.repartition(par)
    offs = F.explode(
        F.array(
            *[
                F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
                for dx in (-1, 0, 1)
                for dy in (-1, 0, 1)
            ]
        )
    ).alias("o")
    cand_full = _cand_side(points, id_col, x, y, importance)
    cand = (
        cand_full.select(
            "*",
            F.floor(F.col("bx") / cell).alias("bcx"),
            F.floor(F.col("by") / cell).alias("bcy"),
            offs,
        )
        .select(
            "bid", "bx", "by", "bimp",
            (F.col("bcx") + F.col("o.dx")).alias("cx"),
            (F.col("bcy") + F.col("o.dy")).alias("cy"),
        )
    )
    # LEFT join keeps every probe point in one pass: a point with no
    # trustworthy neighborhood answer (no higher point in the 3x3, or
    # nearest-higher beyond one cell) surfaces with iso NULL / > cell
    # instead of needing a separate anti-join stage.  near_all feeds
    # two branches (trusted rows and the residue re-probe), hence the
    # persist.
    on = (
        (probe["cx"] == cand["cx"])
        & (probe["cy"] == cand["cy"])
        & _higher()
    )
    # eager localCheckpoint, not persist(): it materializes once for
    # the two consuming branches AND its storage is released by the
    # ContextCleaner when unreferenced — a plain persist() stays
    # pinned in the CacheManager forever (leak per grid() call)
    near_all = (
        probe.join(cand, on, "left")
        .groupBy("id", "ax", "ay", "aimp")
        .agg(F.min(_dist()).alias("iso"))
        .localCheckpoint()
    )
    trusted = near_all.where(F.col("iso") <= cell).select("id", "aimp", "iso")
    residue_probe = near_all.where(
        F.col("iso").isNull() | (F.col("iso") > cell)
    ).select("id", "ax", "ay", "aimp")
    residue_iso = _min_dist_to_higher(residue_probe, cand_full)
    return _ranked(trusted.unionByName(residue_iso))
