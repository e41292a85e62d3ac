"""Update-heavy reference BDD scenarios replayed through apply_diff +
flex (grid + OPL fixtures).

Ported from /root/reference/tests/bdd/flex/way-change.feature (with
tests/data/test_output_flex_way.lua as the config twin) and
/root/reference/tests/bdd/flex/relation-changes.feature.  Each
scenario: full import -> assert tables -> fold the diff with
streaming.append.apply_diff -> re-run flex -> assert tables.  This is
where incremental-update bugs hide (old-geom expiry, member re-add
ordering — src/output-flex.cpp:1175-1282); apply-then-recompute must
equal a fresh import of the post-diff state (the invariant pinned by
tests/test_append.py), so asserting on the recomputed tables checks
the same final states the reference's --append runs assert.

Grid convention: the reference BDD grid's origin is the SOUTHWEST
corner (pinned by 'Changing nodes in a valid relation': moving n12 to
x10.1 y10.0 must collapse the triangle onto the bottom row).
"""

import pytest
from pyspark.sql import functions as F

from osm2pgsql_spark.model import NODE_SCHEMA, RELATION_SCHEMA, WAY_SCHEMA
from osm2pgsql_spark.plans.flex import ColumnDef, FlexConfig
from osm2pgsql_spark.sources.opl import grid_nodes, read_opl
from osm2pgsql_spark.streaming.append import apply_diff


def _grid(rows, origin=(10.0, 10.1), cell=0.1):
    """Reference grid (southwest origin, blank cells allowed) ->
    OPL node lines via grid_nodes (northwest origin)."""
    txt = "\n".join(" ".join(tok if tok else "." for tok in r) for r in rows)
    nrows = len(rows)
    top = (origin[0], origin[1] + (nrows - 1) * cell)
    return grid_nodes(txt, origin=top, cell=cell)


def _world(spark, grid_rows, data, origin=(10.0, 10.1)):
    return read_opl(spark, _grid(grid_rows, origin) + data.strip().splitlines())


def _op():
    return (
        F.when(~F.coalesce(F.col("visible"), F.lit(True)), F.lit("delete"))
        .when(F.col("version") == 1, F.lit("create"))
        .otherwise(F.lit("modify"))
    )


def _apply(spark, trio, diff_text):
    dn, dw, dr = read_opl(spark, diff_text.strip().splitlines())
    out = []
    for base, diff in zip(trio, (dn, dw, dr)):
        out.append(apply_diff(base, diff.withColumn("op", _op())))
    return tuple(out)


# --------------------------------------------------------------- way-change

WAY_GRID = [["10", "12", "14", "16", "18"], ["11", "13", "15", "17", "19"]]

WAY_BASE_TAIL = """
w11 v1 dV Tt1=yes Nn12,n13
w12 v1 dV Tt2=yes Nn14,n15
w13 v1 dV Ttboth=yes Nn16,n17
w14 v1 dV Ttboth=yes Nn18,n19
r30 v1 dV Tt=ag Mw10@mark,w11@,w12@mark,w13@,w14@mark
"""


def _way_cfg():
    """Python twin of tests/data/test_output_flex_way.lua: t1 takes
    every t1-tagged way, t2 only marked (role='mark', stage 2)
    t2-tagged ways with their relation ids, tboth takes tboth-tagged
    ways with optional rel ids."""
    cfg = FlexConfig()
    for t in ("t1", "t2", "tboth"):
        cols = [ColumnDef("geom", "linestring", not_null=True)]
        if t != "t1":
            cols.insert(0, ColumnDef("rel_ids", "text"))
        cfg.define_table(t, ids="way", columns=cols)
    cfg.select_relation_members(role="mark", rel_ids=F.col("id").cast("string"))
    tags = F.col("tags")
    cfg.insert("t1", "way", when=tags["t1"].isNotNull())
    cfg.insert(
        "t2", "way",
        when=tags["t2"].isNotNull() & (F.col("stage") == 2),
        rel_ids=F.col("rel_ids"),
    )
    cfg.insert(
        "tboth", "way", when=tags["tboth"].isNotNull(), rel_ids=F.col("rel_ids")
    )
    return cfg


def _run_way(spark, trio):
    n, w, r = trio
    out = _way_cfg().run(nodes=n, ways=w, relations=r)
    return {t: sorted(x["osm_id"] for x in out[t].select("osm_id").collect())
            for t in ("t1", "t2", "tboth")}, out


@pytest.mark.parametrize(
    "diff,expect_t1",
    [
        ("w10 v2 dV Tt2=yes Nn10,n11", [11]),
        ("w10 v2 dV Tt1=yes,t2=yes Nn10,n11", [10, 11]),
    ],
)
def test_way_change_from_t1(spark, diff, expect_t1):
    trio = _world(spark, WAY_GRID, "w10 v1 dV Tt1=yes Nn10,n11" + WAY_BASE_TAIL)
    ids, _ = _run_way(spark, trio)
    assert ids == {"t1": [10, 11], "t2": [12], "tboth": [13, 14]}
    ids, _ = _run_way(spark, _apply(spark, trio, diff))
    assert ids == {"t1": expect_t1, "t2": [10, 12], "tboth": [13, 14]}


@pytest.mark.parametrize(
    "diff,expect_t2",
    [
        ("w10 v2 dV Tt1=yes Nn10,n11", [12]),
        ("w10 v2 dV Tt1=yes,t2=yes Nn10,n11", [10, 12]),
    ],
)
def test_way_change_from_t2(spark, diff, expect_t2):
    trio = _world(spark, WAY_GRID, "w10 v1 dV Tt2=yes Nn10,n11" + WAY_BASE_TAIL)
    ids, _ = _run_way(spark, trio)
    assert ids == {"t1": [11], "t2": [10, 12], "tboth": [13, 14]}
    ids, _ = _run_way(spark, _apply(spark, trio, diff))
    assert ids == {"t1": [10, 11], "t2": expect_t2, "tboth": [13, 14]}


@pytest.mark.parametrize(
    "diff,expect_t1,expect_t2",
    [
        ("w10 v2 dV Tt1=yes Nn10,n11", [10, 11], [12]),
        ("w10 v2 dV Tt2=yes Nn10,n11", [11], [10, 12]),
    ],
)
def test_way_change_from_both(spark, diff, expect_t1, expect_t2):
    trio = _world(
        spark, WAY_GRID, "w10 v1 dV Tt1=yes,t2=yes Nn10,n11" + WAY_BASE_TAIL
    )
    ids, _ = _run_way(spark, trio)
    assert ids == {"t1": [10, 11], "t2": [10, 12], "tboth": [13, 14]}
    ids, _ = _run_way(spark, _apply(spark, trio, diff))
    assert ids == {"t1": expect_t1, "t2": expect_t2, "tboth": [13, 14]}


@pytest.mark.parametrize(
    "diff",
    [
        # way shrinks to one node -> invalid linestring
        "w10 v2 dV Tt1=yes,t2=yes,tboth=yes Nn10",
        # n11 moves onto n10 -> consecutive-duplicate removal leaves 1 pt
        "n11 v2 dV x10.0 y10.2",
    ],
)
def test_way_change_valid_to_invalid(spark, diff):
    trio = _world(
        spark, WAY_GRID,
        "w10 v1 dV Tt1=yes,t2=yes,tboth=yes Nn10,n11" + WAY_BASE_TAIL,
    )
    ids, out = _run_way(spark, trio)
    assert ids == {"t1": [10, 11], "t2": [10, 12], "tboth": [10, 13, 14]}
    rels = {r["osm_id"]: r["rel_ids"] for r in out["tboth"].collect()}
    assert rels == {10: "30", 13: None, 14: "30"}
    ids, _ = _run_way(spark, _apply(spark, trio, diff))
    assert ids == {"t1": [11], "t2": [12], "tboth": [13, 14]}


def test_way_change_invalid_to_valid(spark):
    trio = _world(
        spark, WAY_GRID,
        "w10 v1 dV Tt1=yes,t2=yes,tboth=yes Nn10" + WAY_BASE_TAIL,
    )
    ids, _ = _run_way(spark, trio)
    assert ids == {"t1": [11], "t2": [12], "tboth": [13, 14]}
    ids, out = _run_way(
        spark, _apply(spark, trio, "w10 v2 dV Tt1=yes,t2=yes,tboth=yes Nn10,n11")
    )
    assert ids == {"t1": [10, 11], "t2": [10, 12], "tboth": [10, 13, 14]}
    rels = {r["osm_id"]: r["rel_ids"] for r in out["t2"].collect()}
    assert rels == {10: "30", 12: "30"}


# --------------------------------------------------------- relation-changes

REL_GRID = [["13", "12"], ["10", "11"]]
REL_WAYS = """
w20 v1 dV Nn10,n11,n12
w21 v1 dV Nn12,n13,n10
"""


def _rel_cfg():
    cfg = FlexConfig()
    cfg.define_table(
        "rels",
        ids="area",
        columns=[
            ColumnDef("natural", "text"),
            ColumnDef("landuse", "text"),
            ColumnDef("geom", "multipolygon", not_null=True),
        ],
    )
    cfg.insert(
        "rels", "relation",
        when=F.col("tags")["type"] == "multipolygon",
        natural=F.col("tags")["natural"],
        landuse=F.col("tags")["landuse"],
    )
    return cfg


def _run_rel(spark, trio):
    n, w, r = trio
    return _rel_cfg().run(nodes=n, ways=w, relations=r)["rels"]


def test_rel_changing_type_adds_relation(spark):
    trio = _world(spark, REL_GRID, REL_WAYS + "r30 v1 dV Mw20@,w21@")
    assert _run_rel(spark, trio).count() == 0
    after = _apply(spark, trio, "r30 v2 dV Ttype=multipolygon Mw20@,w21@")
    assert _run_rel(spark, after).count() == 1


def test_rel_changing_way_adds_relation(spark):
    trio = _world(
        spark, REL_GRID,
        "w20 v1 dV Nn10,n11,n12\nw21 v1 dV Nn12,n13\n"
        "r30 v1 dV Ttype=multipolygon Mw20@,w21@",
    )
    assert _run_rel(spark, trio).count() == 0  # ring not closed
    after = _apply(spark, trio, "w21 v2 dV Nn12,n13,n10")
    assert _run_rel(spark, after).count() == 1


def test_rel_changing_node_adds_relation(spark):
    # one-row grid: n10,n11,n12 collinear -> degenerate ring
    trio = _world(
        spark, [["10", "11", "12"]],
        "w20 v1 dV Nn10,n11,n12\nw21 v1 dV Nn12,n10\n"
        "r30 v1 dV Ttype=multipolygon Mw20@,w21@",
        origin=(10.0, 10.0),
    )
    assert _run_rel(spark, trio).count() == 0
    after = _apply(spark, trio, "n12 v2 dV x10.1 y10.1")
    assert _run_rel(spark, after).count() == 1


def test_rel_changing_memberlist_adds_relation(spark):
    trio = _world(spark, REL_GRID, REL_WAYS + "r30 v1 dV Ttype=multipolygon Mw20@")
    assert _run_rel(spark, trio).count() == 0
    after = _apply(spark, trio, "r30 v2 dV Ttype=multipolygon Mw20@,w21@")
    assert _run_rel(spark, after).count() == 1


def test_rel_changing_type_deletes_relation(spark):
    trio = _world(spark, REL_GRID, REL_WAYS + "r30 v1 dV Ttype=multipolygon Mw20@,w21@")
    assert _run_rel(spark, trio).count() == 1
    after = _apply(spark, trio, "r30 v2 dV Mw20@,w21@")
    assert _run_rel(spark, after).count() == 0


@pytest.mark.parametrize(
    "diff,expected",
    [
        ("w21 v2 dV Nn12,n13", 0),  # breaks the ring
        ("w21 v2 dV Nn10,n13,n12", 1),  # reversed but still closes
    ],
)
def test_rel_changing_ways_in_valid_relation(spark, diff, expected):
    trio = _world(spark, REL_GRID, REL_WAYS + "r30 v1 dV Ttype=multipolygon Mw20@,w21@")
    assert _run_rel(spark, trio).count() == 1
    assert _run_rel(spark, _apply(spark, trio, diff)).count() == expected


@pytest.mark.parametrize(
    "diff,expected",
    [
        ("n12 v2 dV x10.1 y10.0", 0),  # collapses onto n11
        ("n12 v2 dV x10.05 y10.1", 1),  # still a triangle
    ],
)
def test_rel_changing_nodes_in_valid_relation(spark, diff, expected):
    trio = _world(
        spark, [["", "12"], ["10", "11"]],
        "w20 v1 dV Nn10,n11,n12\nw21 v1 dV Nn12,n10\n"
        "r30 v1 dV Ttype=multipolygon Mw20@,w21@",
        origin=(10.0, 10.0),
    )
    assert _run_rel(spark, trio).count() == 1
    assert _run_rel(spark, _apply(spark, trio, diff)).count() == expected


@pytest.mark.parametrize(
    "diff,expected",
    [
        ("r30 v2 dV Ttype=multipolygon Mw20@", 0),
        ("r30 v2 dV Ttype=multipolygon Mw21@,w20@", 1),  # reordered members
    ],
)
def test_rel_changing_memberlist_in_valid_relation(spark, diff, expected):
    trio = _world(spark, REL_GRID, REL_WAYS + "r30 v1 dV Ttype=multipolygon Mw20@,w21@")
    assert _run_rel(spark, trio).count() == 1
    assert _run_rel(spark, _apply(spark, trio, diff)).count() == expected


def test_rel_changing_tags_keeps_relation(spark):
    trio = _world(
        spark, REL_GRID,
        REL_WAYS + "r30 v1 dV Ttype=multipolygon,natural=wood Mw20@,w21@",
    )
    rows = _run_rel(spark, trio).collect()
    assert [(r["osm_id"], r["natural"], r["landuse"]) for r in rows] == [
        (-30, "wood", None)
    ]
    after = _apply(
        spark, trio, "r30 v2 dV Ttype=multipolygon,landuse=forest Mw20@,w21@"
    )
    rows = _run_rel(spark, after).collect()
    assert [(r["osm_id"], r["natural"], r["landuse"]) for r in rows] == [
        (-30, None, "forest")
    ]


# ------------------------------------------------- broken-data tolerance

def test_rel_missing_member_way_tolerated(spark):
    """A member way absent from the data must not break assembly of
    the remaining (closed) ring — libosmium-style tolerance."""
    trio = _world(
        spark, REL_GRID,
        "w20 v1 dV Nn10,n11,n12\nw21 v1 dV Nn12,n13,n10\n"
        "r30 v1 dV Ttype=multipolygon Mw20@,w21@,w99@",
    )
    assert _run_rel(spark, trio).count() == 1


def test_rel_duplicate_member_tolerated(spark):
    trio = _world(
        spark, REL_GRID,
        REL_WAYS + "r30 v1 dV Ttype=multipolygon Mw20@,w20@,w21@",
    )
    assert _run_rel(spark, trio).count() == 1


# ----------------------------------------------- way-del / *-add features

@pytest.mark.parametrize(
    "w10_tags,member,expect",
    [
        # way-del.feature: delete w10 in every initial placement
        ("Tt=ag", False, {"t1": [11], "t2": [12], "tboth": [13, 14]}),
        ("Tt1=yes", False, {"t1": [10, 11], "t2": [12], "tboth": [13, 14]}),
        ("Tt2=yes", True, {"t1": [11], "t2": [10, 12], "tboth": [13, 14]}),
        ("Tt1=yes,t2=yes", True, {"t1": [10, 11], "t2": [10, 12], "tboth": [13, 14]}),
        ("Ttboth=yes", True, {"t1": [11], "t2": [12], "tboth": [10, 13, 14]}),
    ],
)
def test_way_del(spark, w10_tags, member, expect):
    """way-del.feature: deleting w10 removes it from every table it
    was in; everything else is untouched."""
    mark = ",w10@mark" if member else ""
    base = (
        f"w10 v1 dV {w10_tags} Nn10,n11" + WAY_BASE_TAIL.rstrip("\n").replace(
            "r30 v1 dV Tt=ag Mw10@mark,w11@,w12@mark,w13@,w14@mark",
            f"r30 v1 dV Tt=ag Mw11@,w12@mark,w13@,w14@mark{mark}",
        )
    )
    trio = _world(spark, WAY_GRID, base)
    ids, _ = _run_way(spark, trio)
    assert ids == expect
    after = _apply(spark, trio, "w10 v2 dD")
    ids, _ = _run_way(spark, after)
    gone = {t: [i for i in v if i != 10] for t, v in expect.items()}
    assert ids == gone


def test_way_relation_add_marks_member(spark):
    """way-relation-add.feature core: a NEW relation marking w10
    pushes it into t2 and refreshes the tboth rel_ids."""
    base = "w10 v1 dV Tt2=yes,tboth=yes Nn10,n11" + WAY_BASE_TAIL.replace(
        "Mw10@mark,", "Mw10@,"
    )
    trio = _world(spark, WAY_GRID, base)
    ids, out = _run_way(spark, trio)
    assert ids["t2"] == [12]  # w10 not marked by r30
    after = _apply(
        spark, trio, "r31 v1 dV Tt=ag Mw10@mark,w11@,w12@,w13@,w14@"
    )
    ids, out = _run_way(spark, after)
    assert ids["t2"] == [10, 12]
    rels = {r["osm_id"]: r["rel_ids"] for r in out["t2"].collect()}
    assert rels[10] == "31" and rels[12] == "30"
    tb = {r["osm_id"]: r["rel_ids"] for r in out["tboth"].collect()}
    assert tb[10] == "31"


def test_way_relation_del_unmarks_member(spark):
    """way-relation-del.feature core: deleting the marking relation
    pulls w10 out of t2 and nulls its tboth rel_ids."""
    base = (
        "w10 v1 dV Tt2=yes,tboth=yes Nn10,n11"
        + WAY_BASE_TAIL.replace("Mw10@mark,", "Mw10@,")
        + "r31 v1 dV Tt=ag Mw10@mark,w11@,w12@,w13@,w14@\n"
    )
    trio = _world(spark, WAY_GRID, base)
    ids, out = _run_way(spark, trio)
    assert ids["t2"] == [10, 12]
    after = _apply(spark, trio, "r31 v2 dD")
    ids, out = _run_way(spark, after)
    assert ids["t2"] == [12]
    tb = {r["osm_id"]: r["rel_ids"] for r in out["tboth"].collect()}
    assert tb[10] is None and tb[14] == "30"


def test_node_add_completes_way(spark):
    """node-add.feature core: a way referencing a missing node is
    invalid until the node arrives in a diff."""
    base = "w10 v1 dV Tt1=yes Nn10,n99" + WAY_BASE_TAIL
    trio = _world(spark, WAY_GRID, base)
    ids, _ = _run_way(spark, trio)
    assert ids["t1"] == [11]  # w10 geometry unresolvable
    after = _apply(spark, trio, "n99 v1 dV x10.4 y10.2")
    ids, _ = _run_way(spark, after)
    assert ids["t1"] == [10, 11]
