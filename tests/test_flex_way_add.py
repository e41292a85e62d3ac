"""way-add.feature port (/root/reference/tests/bdd/flex/way-add.feature
with tests/data/test_output_flex_way.lua semantics): three tables keyed
off a way's own tags AND its stage-2 'mark' membership —

- t1: ways tagged t1 (stage 1, marks irrelevant);
- t2: ways tagged t2 ONLY when some relation holds them with role
  'mark'; rel_ids = sorted {rel,...} of the marking relations;
- tboth: ways tagged tboth always, rel_ids NULL when unmarked.

Appends add way 10 with different tags / marks; each variant must land
in exactly the tables the feature pins."""

import pytest
from pyspark.sql import functions as F

from osm2pgsql_spark.plans.two_stage import relation_attrs_for_members
from osm2pgsql_spark.sources.opl import grid_nodes, read_opl
from osm2pgsql_spark.streaming.append import apply_diff

GRID = grid_nodes("""
    11 13 15 17 19
    10 12 14 16 18
""")

BASE = [
    "w11 v1 dV Tt1=yes Nn12,n13",
    "w12 v1 dV Tt2=yes Nn14,n15",
    "w13 v1 dV Ttboth=yes Nn16,n17",
    "w14 v1 dV Ttboth=yes Nn18,n19",
    "r30 v1 dV Tt=ag Mw11@,w12@mark,w13@,w14@mark",
]


def _op():
    return (
        F.when(~F.coalesce(F.col("visible"), F.lit(True)), F.lit("delete"))
        .when(F.col("version") == 1, F.lit("create"))
        .otherwise(F.lit("modify"))
    )


def _tables(trio):
    """The Lua config as relational algebra: w2r = mark-role members
    (select_relation_members), rel_ids = get_ids()."""
    nodes, ways, rels = trio
    marked = relation_attrs_for_members(
        rels, role="mark", rel_ids=F.col("id").cast("string")
    ).withColumnRenamed("rel_ids", "__ids")
    w = ways.join(marked, "id", "left").withColumn(
        "rel_ids",
        F.when(
            F.col("__ids").isNotNull(), F.concat(F.lit("{"), F.col("__ids"), F.lit("}"))
        ),
    )
    tags = F.col("tags")
    t1 = w.where(tags["t1"].isNotNull()).select("id", "tags")
    t2 = w.where(tags["t2"].isNotNull() & F.col("rel_ids").isNotNull()).select(
        "id", "rel_ids"
    )
    tboth = w.where(tags["tboth"].isNotNull()).select("id", "tags", "rel_ids")
    return t1, t2, tboth


def _apply(spark, trio, diff_lines):
    dn, dw, dr = read_opl(spark, diff_lines)
    return tuple(
        apply_diff(base, diff.withColumn("op", _op()))
        for base, diff in zip(trio, (dn, dw, dr))
    )


def _ids(df):
    return {r["id"] for r in df.collect()}


@pytest.fixture()
def base(spark):
    return read_opl(spark, GRID + BASE)


def test_way_add_background(spark, base):
    t1, t2, tboth = _tables(base)
    assert _ids(t1) == {11}
    assert _ids(t2) == {12}
    assert _ids(tboth) == {13, 14}


def test_way_add_not_relevant(spark, base):
    after = _apply(spark, base, [
        "w10 v1 dV Tt=ag Nn10,n11",
        "r30 v2 dV Tt=ag Mw10@,w11@,w12@mark,w13@,w14@mark",
    ])
    t1, t2, tboth = _tables(after)
    assert _ids(t1) == {11} and _ids(t2) == {12} and _ids(tboth) == {13, 14}


def test_way_add_to_t1(spark, base):
    after = _apply(spark, base, [
        "w10 v1 dV Tt1=yes Nn10,n11",
        "r30 v2 dV Tt=ag Mw10@,w11@,w12@mark,w13@,w14@mark",
    ])
    t1, t2, tboth = _tables(after)
    assert _ids(t1) == {10, 11} and _ids(t2) == {12} and _ids(tboth) == {13, 14}


def test_way_add_to_t2_marked(spark, base):
    after = _apply(spark, base, [
        "w10 v1 dV Tt2=yes Nn10,n11",
        "r30 v2 dV Tt=ag Mw10@mark,w11@,w12@mark,w13@,w14@mark",
    ])
    t1, t2, tboth = _tables(after)
    assert _ids(t1) == {11} and _ids(t2) == {10, 12} and _ids(tboth) == {13, 14}
    got = {r["id"]: r["rel_ids"] for r in t2.collect()}
    assert got[10] == "{30}" and got[12] == "{30}"


def test_way_add_to_t2_unmarked_stays_out(spark, base):
    after = _apply(spark, base, [
        "w10 v1 dV Tt2=yes Nn10,n11",
        "r30 v2 dV Tt=ag Mw10@,w11@,w12@mark,w13@,w14@mark",
    ])
    _, t2, _ = _tables(after)
    assert _ids(t2) == {12}  # t2 requires the mark


def test_way_add_to_tboth(spark, base):
    after = _apply(spark, base, [
        "w10 v1 dV Ttboth=yes Nn10,n11",
        "r30 v2 dV Tt=ag Mw10@mark,w11@,w12@mark,w13@,w14@mark",
    ])
    t1, t2, tboth = _tables(after)
    assert _ids(tboth) == {10, 13, 14}
    got = {r["id"]: r["rel_ids"] for r in tboth.collect()}
    assert got[10] == "{30}" and got[14] == "{30}" and got[13] is None
