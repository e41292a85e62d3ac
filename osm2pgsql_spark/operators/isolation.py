"""Discrete isolation: distance to the nearest more-important point.

Reference: /root/reference/src/gen/gen-discrete-isolation.cpp:33-124 —
sort by importance desc, then for each point scan all
higher-importance points for the min distance (O(n^2) single-node).

Spark-first: two implementations.
- exact(): the O(n^2) semantics as a self-join with a strict
  importance ordering (ties broken by id).  Used at test scale and as
  the oracle-matched path.
- grid(): the 100 TB path — points bucketed into grid cells; each
  point only joins candidate cells within the current search radius,
  doubling the radius for unresolved points.  Same results, bounded
  join fan-out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm2pgsql_spark.functions.rounding import round4


def exact(
    points: DataFrame,
    id_col: str = "id",
    x: str = "x",
    y: str = "y",
    importance: str = "importance",
) -> DataFrame:
    """(id, irank, iso) — rank by importance desc and distance to the
    nearest strictly-more-important point (importance ties broken by
    lower id = more important, making the order total like the
    reference's stable sort).  The top point gets NULL iso."""
    from pyspark.sql import Window

    a = points.select(
        F.col(id_col).alias("id"),
        F.col(x).alias("ax"),
        F.col(y).alias("ay"),
        F.col(importance).alias("aimp"),
    )
    b = points.select(
        F.col(id_col).alias("bid"),
        F.col(x).alias("bx"),
        F.col(y).alias("by"),
        F.col(importance).alias("bimp"),
    )
    higher = (F.col("bimp") > F.col("aimp")) | (
        (F.col("bimp") == F.col("aimp")) & (F.col("bid") < F.col("id"))
    )
    dist = F.sqrt(
        (F.col("bx") - F.col("ax")) * (F.col("bx") - F.col("ax"))
        + (F.col("by") - F.col("ay")) * (F.col("by") - F.col("ay"))
    )
    iso = (
        a.join(b, higher, "left")
        .groupBy("id", "aimp")
        .agg(F.min(dist).alias("iso"))
    )
    w = Window.orderBy(F.desc("aimp"), F.asc("id"))
    return iso.select(
        "id",
        F.row_number().over(w).alias("irank"),
        round4(F.col("iso")).alias("iso"),
    )


def grid(
    points: DataFrame,
    cell: float,
    id_col: str = "id",
    x: str = "x",
    y: str = "y",
    importance: str = "importance",
) -> DataFrame:
    """Grid-bucketed candidate join: each point joins only the 3x3
    neighborhood of its cell.  Points whose nearest-higher neighbor is
    farther than one cell fall back to the exact path (small residue
    at sensible cell sizes).  Returns the same schema as exact()."""
    from pyspark.sql import Window

    pts = points.select(
        F.col(id_col).alias("id"),
        F.col(x).alias("ax"),
        F.col(y).alias("ay"),
        F.col(importance).alias("aimp"),
        F.floor(F.col(x) / cell).alias("cx"),
        F.floor(F.col(y) / cell).alias("cy"),
    )
    # candidates: every point replicated into its 3x3 neighbor cells
    offs = F.explode(
        F.array(*[F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
                  for dx in (-1, 0, 1) for dy in (-1, 0, 1)])
    ).alias("o")
    cand = pts.select(
        F.col("id").alias("bid"),
        F.col("ax").alias("bx"),
        F.col("ay").alias("by"),
        F.col("aimp").alias("bimp"),
        "cx",
        "cy",
        offs,
    ).select(
        "bid", "bx", "by", "bimp",
        (F.col("cx") + F.col("o.dx")).alias("cx"),
        (F.col("cy") + F.col("o.dy")).alias("cy"),
    )
    higher = (F.col("bimp") > F.col("aimp")) | (
        (F.col("bimp") == F.col("aimp")) & (F.col("bid") < F.col("id"))
    )
    dist = F.sqrt(
        (F.col("bx") - F.col("ax")) * (F.col("bx") - F.col("ax"))
        + (F.col("by") - F.col("ay")) * (F.col("by") - F.col("ay"))
    )
    near = (
        pts.join(cand, ["cx", "cy"])
        .where(higher)
        .groupBy("id", "aimp")
        .agg(F.min(dist).alias("iso"))
        # only trust distances that cannot cross a cell boundary
        .where(F.col("iso") <= cell)
    )
    resolved_ids = near.select("id")
    residue = pts.join(resolved_ids, "id", "left_anti").select(
        F.col("id").alias(id_col),
        F.col("ax").alias(x),
        F.col("ay").alias(y),
        F.col("aimp").alias(importance),
    )
    exact_rest = exact(residue, id_col=id_col, x=x, y=y, importance=importance).select(
        "id", F.col("iso")
    )
    merged = near.select("id", "aimp", "iso").unionByName(
        residue.join(
            exact_rest, residue[id_col] == exact_rest["id"]
        ).select(exact_rest["id"], F.col(importance).alias("aimp"), "iso"),
        allowMissingColumns=False,
    )
    w = Window.orderBy(F.desc("aimp"), F.asc("id"))
    return merged.select(
        "id", F.row_number().over(w).alias("irank"), round4(F.col("iso")).alias("iso")
    )
