"""Two-stage processing: relation-driven way reprocessing.

Reference: during the relation pass a config may call
select_relation_members() to mark member ways
(/root/reference/src/output-flex.cpp:337-377,944-973); marked ways
are reprocessed after the first pass with osm2pgsql.stage == 2
(/root/reference/src/output-flex.cpp:1506-1613, driver
/root/reference/src/osmdata.cpp:388-406).  Typical use: route
relations push their refs onto member ways.

Spark-first: the mutable "marked ids" set becomes a DataFrame and the
stage-2 replay becomes a second declarative pass:

    marked = select_members(relations)          # stage 1c
    stage2 = ways ⋈ marked (left_semi)          # barrier = job boundary
    out    = stage1_rows ∪ transform(stage2, stage=2)

The reference's subtle ordering requirement (all marks collected
before any way reprocess — a mutex'd set in C++) is a free batch
barrier here: the semi-join cannot start producing rows before its
build side is complete.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def select_relation_members(
    relations: DataFrame,
    when: Column | None = None,
    member_type: str = "w",
    role: str | None = None,
) -> DataFrame:
    """Stage 1c: distinct member ids marked by matching relations
    (the select_relation_members() analog).  Returns (id).

    role: only members with this exact role mark their way — the
    common Lua pattern (e.g. role == 'mark' in
    tests/data/test_output_flex_way.lua way_member_ids)."""
    r = relations
    if when is not None:
        r = r.where(when)
    m = r.select(F.explode("members").alias("m")).where(F.col("m.type") == member_type)
    if role is not None:
        m = m.where(F.col("m.role") == role)
    return m.select(F.col("m.ref").alias("id")).distinct()


def relation_attrs_for_members(
    relations: DataFrame,
    when: Column | None = None,
    member_type: str = "w",
    role: str | None = None,
    **attrs: Column,
) -> DataFrame:
    """Marked member ids + aggregated relation attributes — e.g. route
    refs concatenated per member way (the common stage-2 pattern:
    `lcn_ref` accumulation, tagtransform-c.cpp:223-343).

    attrs maps output name -> expression over the relation row; values
    are collected per member id as a sorted comma-joined string."""
    r = relations
    if when is not None:
        r = r.where(when)
    exploded = r.select(
        *[v.alias(k) for k, v in attrs.items()], F.explode("members").alias("m")
    ).where(F.col("m.type") == member_type)
    if role is not None:
        exploded = exploded.where(F.col("m.role") == role)
    aggs = [
        F.array_join(F.sort_array(F.collect_set(F.col(k))), ",").alias(k) for k in attrs
    ]
    return exploded.groupBy(F.col("m.ref").alias("id")).agg(*aggs)


def two_stage_ways(
    ways: DataFrame,
    marked: DataFrame,
    stage1: Callable[[DataFrame], DataFrame],
    stage2: Callable[[DataFrame], DataFrame],
) -> DataFrame:
    """Run stage1 over unmarked ways and stage2 over marked ways,
    union the results.  Both callables receive the way DataFrame with
    a literal `stage` column (1 or 2) like the Lua osm2pgsql.stage."""
    marked_ids = marked.select(F.col(marked.columns[0]).alias("id")).distinct()
    w2 = ways.join(marked_ids, "id", "left_semi").withColumn("stage", F.lit(2))
    w1 = ways.join(marked_ids, "id", "left_anti").withColumn("stage", F.lit(1))
    return stage1(w1).unionByName(stage2(w2))
