"""Discrete isolation: distance to the nearest more-important point.

Reference: /root/reference/src/gen/gen-discrete-isolation.cpp:33-124 —
sort by importance desc, then for each point scan all
higher-importance points for the min distance (O(n^2) single-node).

Spark-first: two implementations.
- exact(): the O(n^2) semantics as a probe/candidate self-join with a
  strict importance ordering (ties broken by id).  Test-scale and
  oracle-matched path.
- grid(): the 100 TB path — points bucketed into grid cells, each
  point joins only its 3x3 cell neighborhood; points whose
  neighborhood gives no trustworthy answer (nearest-higher farther
  than one cell) are re-probed at escalating cell sizes (x4 per
  round), every round a bounded equi-join, until the residue drains.
  Identical results to exact() (tested), no non-equi join anywhere.
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


def _neighborhood_min(probe: DataFrame, cand_full: DataFrame, cell: float) -> DataFrame:
    """One 3x3-neighborhood round at a given cell size: LEFT equi-join
    on (cx, cy) with the 9-way candidate explode, min distance to any
    strictly-more-important neighbor.  Returns
    (id, ax, ay, aimp, iso) with iso NULL when the neighborhood holds
    no higher point.  Bounded fan-out: the only join key is the cell.
    A distance d <= cell cannot cross out of the 3x3 block, so rows
    with iso <= cell are exact."""
    p = probe.select(
        "*",
        F.floor(F.col("ax") / cell).alias("cx"),
        F.floor(F.col("ay") / cell).alias("cy"),
    )
    offs = F.explode(
        F.array(
            *[
                F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
                for dx in (-1, 0, 1)
                for dy in (-1, 0, 1)
            ]
        )
    ).alias("o")
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
    on = (p["cx"] == cand["cx"]) & (p["cy"] == cand["cy"]) & _higher()
    return (
        p.join(cand, on, "left")
        .groupBy("id", "ax", "ay", "aimp")
        .agg(F.min(_dist()).alias("iso"))
    )


def grid(
    points: DataFrame,
    cell: float,
    id_col: str = "id",
    x: str = "x",
    y: str = "y",
    importance: str = "importance",
    max_rounds: int = 40,
) -> DataFrame:
    """Grid-bucketed candidate join; results identical to exact().

    A 3x3-neighborhood distance is only trusted when it cannot cross a
    cell boundary (iso <= cell); untrusted points are re-probed at
    escalating cell sizes (x4 per round) — every round stays a bounded
    equi-join, so no BroadcastNestedLoopJoin ever appears (the former
    full-set theta-join fallback would broadcast the entire point set
    at planet scale).  Termination is certain: once the cell size
    reaches the data span every point's 3x3 neighborhood covers the
    whole corpus, and the single point with no higher point at all
    (the global importance argmax, which would otherwise never drain)
    is patched in directly with iso NULL.

    Job economy (the cold-time lever at small scale): exactly one
    checkpoint job (round 1), one 1-row stats aggregate ON that
    checkpoint (argmax + span, so the upstream pipeline never re-runs),
    and one final job — the escalation rounds are a single lazy plan
    whose radii are precomputed from the span, with the checkpointed
    round-1 output reused as the candidate corpus, so empty late
    rounds cost empty partitions instead of driver round-trips."""
    probe = _probe_side(points, id_col, x, y, importance)
    # probe parallelism alone bounds the join: a small input (one
    # parquet file -> one partition) would serialize the whole
    # neighborhood join onto one core.  Round-robin spread; at real
    # scale the scan already has many partitions and this is a cheap
    # narrow-input safeguard.
    par = points.sparkSession.sparkContext.defaultParallelism
    if probe.rdd.getNumPartitions() < par:
        probe = probe.repartition(par)
    cand_full = _cand_side(points, id_col, x, y, importance)

    # eager localCheckpoint, not persist(): it materializes once for
    # every consuming branch (stats, trusted rows, residue chain,
    # later-round candidates) AND its storage is released by the
    # ContextCleaner when unreferenced — a plain persist() stays
    # pinned in the CacheManager forever (leak per grid() call).
    # The LEFT join keeps one row per point, so this checkpoint IS the
    # corpus (id, ax, ay, aimp, iso).
    near = _neighborhood_min(probe, cand_full, cell).localCheckpoint()

    # bounded (1-row) aggregate on the checkpoint: argmax + data span
    stats = near.agg(
        F.max(F.struct(F.col("aimp").alias("i"), (-F.col("id")).alias("nid"))).alias("m"),
        (F.max("ax") - F.min("ax")).alias("sx"),
        (F.max("ay") - F.min("ay")).alias("sy"),
    ).head()
    if stats is None or stats["m"] is None:
        return _ranked(near.select("id", "aimp", "iso").limit(0))
    top_imp, top_id = stats["m"]["i"], -stats["m"]["nid"]
    span = max(stats["sx"] or 0.0, stats["sy"] or 0.0)

    radii = []
    r = cell * 4.0
    while r < span:
        radii.append(r)
        r *= 4.0
    radii.append(r)  # final round: 3x3 at cell >= span covers everything
    if len(radii) > max_rounds:
        raise RuntimeError(
            f"isolation.grid needs {len(radii)} escalation rounds "
            f"(cell={cell} vs span={span}); choose a larger cell"
        )

    cand_ckpt = _cand_side(near, "id", "ax", "ay", "aimp")
    is_top = (F.col("aimp") == F.lit(top_imp)) & (F.col("id") == F.lit(top_id))
    done = [
        near.where(is_top).select("id", "aimp", F.lit(None).cast("double").alias("iso")),
        near.where(~is_top & (F.col("iso") <= cell)).select("id", "aimp", "iso"),
    ]
    residue = near.where(
        ~is_top & (F.col("iso").isNull() | (F.col("iso") > cell))
    ).select("id", "ax", "ay", "aimp")
    for i, r in enumerate(radii):
        nr = _neighborhood_min(residue, cand_ckpt, r)
        if i == len(radii) - 1:
            done.append(nr.select("id", "aimp", "iso"))
        else:
            done.append(nr.where(F.col("iso") <= r).select("id", "aimp", "iso"))
            residue = nr.where(F.col("iso").isNull() | (F.col("iso") > r)).select(
                "id", "ax", "ay", "aimp"
            )
    out = done[0]
    for d in done[1:]:
        out = out.unionByName(d)
    return _ranked(out)
