"""Reverse-dependency propagation for incremental updates.

Reference: changed node ids -> parent way ids; changed node/way ids
-> parent relation ids (/root/reference/src/middle-pgsql.cpp:575-699,
the bucketed-GIN array-intersect trick; orchestration
/root/reference/src/osmdata.cpp:75-147).  Version-1 objects are
skipped (can't have parents yet — src/osmdata.cpp:60-69).

Spark-first: the hand-tuned inverted index disappears — explode the
refs/members arrays and semi-join against the changed-id set.  At
planet scale the exploded ways table is the big side and stays
shuffle-partitioned on ref; the changed set is usually small ->
broadcast semi join, zero shuffle of the big side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def parent_ways_of_nodes(
    way_refs: DataFrame,
    changed_nodes: DataFrame,
    way_id: str = "way_id",
    ref: str = "ref",
    node_id: str = "node_id",
    broadcast_changed: bool = True,
) -> DataFrame:
    """Distinct way ids referencing any changed node.

    way_refs: exploded (way_id, ref); changed_nodes: (node_id)."""
    ch = changed_nodes.select(F.col(node_id).alias(ref)).distinct()
    if broadcast_changed:
        ch = F.broadcast(ch)
    return (
        way_refs.select(way_id, ref)
        .join(ch, ref, "left_semi")
        .select(way_id)
        .distinct()
    )


def parent_relations_of_members(
    relation_members: DataFrame,
    changed: DataFrame,
    member_type: str,
    rel_id: str = "rel_id",
    broadcast_changed: bool = True,
) -> DataFrame:
    """Distinct relation ids with a changed member of the given type.

    relation_members: exploded (rel_id, m_type, m_ref);
    changed: (id) of the changed objects of that type."""
    ch = changed.select(F.col(changed.columns[0]).alias("m_ref")).distinct()
    if broadcast_changed:
        ch = F.broadcast(ch)
    return (
        relation_members.where(F.col("m_type") == member_type)
        .join(ch, "m_ref", "left_semi")
        .select(rel_id)
        .distinct()
    )


def pending_minus_done(pending: DataFrame, done: DataFrame) -> DataFrame:
    """idlist remove_ids_if_in (/root/reference/src/idlist.cpp:49):
    anti-join — ids still to process."""
    col = pending.columns[0]
    return pending.join(
        done.select(F.col(done.columns[0]).alias(col)), col, "left_anti"
    ).distinct()
