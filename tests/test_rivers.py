"""Rivers generalization tests — FIXTURES.md F8: Y-shaped network with
a cycle (reference gen-rivers semantics)."""

import pytest
from pyspark.sql import functions as F

from osm2pgsql_spark.operators.rivers import (
    contract_chains,
    endpoint_degrees,
    merge_chains,
    propagate_width,
)

EDGE_SCHEMA = "edge_id bigint, x1 double, y1 double, x2 double, y2 double, width double, length double, name string"


@pytest.fixture()
def y_network(spark):
    # A -> B -> C (chain), D -> C, C -> E: C is a degree-3+ junction
    #  A(0,0) B(1,0) C(2,0) D(2,1) E(3,0)
    rows = [
        (1, 0.0, 0.0, 1.0, 0.0, 2.0, 1.0, "main"),   # A->B
        (2, 1.0, 0.0, 2.0, 0.0, 2.0, 1.0, "main"),   # B->C
        (3, 2.0, 1.0, 2.0, 0.0, 5.0, 1.0, "trib"),   # D->C (wider tributary)
        (4, 2.0, 0.0, 3.0, 0.0, 1.0, 1.0, "main"),   # C->E
    ]
    return spark.createDataFrame(rows, EDGE_SCHEMA)


def test_endpoint_degrees(spark, y_network):
    deg = {(r["px"], r["py"]): r["degree"] for r in endpoint_degrees(y_network).collect()}
    assert deg[(2.0, 0.0)] == 3  # junction C
    assert deg[(1.0, 0.0)] == 2  # pass-through B
    assert deg[(0.0, 0.0)] == 1  # source A


def test_contract_chains(spark, y_network):
    c = contract_chains(y_network)
    chains = {r["edge_id"]: r["chain_id"] for r in c.collect()}
    assert chains[1] == chains[2]  # A->B->C merged through degree-2 B
    assert chains[3] != chains[1]
    assert chains[4] != chains[1]
    merged = merge_chains(c)
    rows = {r["edge_id"]: r for r in merged.collect()}
    assert rows[1]["length"] == pytest.approx(2.0)  # two unit segments


def test_propagate_width_downstream(spark, y_network):
    out = {r["edge_id"]: r["width"] for r in propagate_width(y_network).collect()}
    # C->E inherits the max upstream width (tributary 5.0)
    assert out[4] == 5.0
    # upstream edges keep their widths
    assert out[1] == 2.0 and out[3] == 5.0
    # B->C stays 2.0 (A->B upstream is 2.0)
    assert out[2] == 2.0


def test_propagate_width_cycle_terminates(spark):
    # cycle: P->Q->R->P plus outflow R->S
    rows = [
        (1, 0.0, 0.0, 1.0, 0.0, 3.0, 1.0, None),
        (2, 1.0, 0.0, 1.0, 1.0, 1.0, 1.0, None),
        (3, 1.0, 1.0, 0.0, 0.0, 1.0, 1.0, None),
        (4, 1.0, 1.0, 2.0, 2.0, 1.0, 1.0, None),
    ]
    edges = spark.createDataFrame(rows, EDGE_SCHEMA)
    out = {r["edge_id"]: r["width"] for r in propagate_width(edges).collect()}
    assert out == {1: 3.0, 2: 3.0, 3: 3.0, 4: 3.0}  # max flows around the loop


def test_propagate_width_chained_equals_direct(spark):
    """The chain-decomposition scale path must equal the direct
    relaxation on a branching network with confluences, junction
    fan-out and an isolated cycle."""
    from pyspark.sql import functions as F

    from osm2pgsql_spark.operators.rivers import (
        propagate_width,
        propagate_width_chained,
    )

    rows = []
    eid = 0

    def seg(x1, y1, x2, y2, w):
        nonlocal eid
        eid += 1
        rows.append((eid, float(x1), float(y1), float(x2), float(y2), float(w)))

    # chain A: (0,0)->(4,0) with widths 1,5,2,3
    for i, w in enumerate([1, 5, 2, 3]):
        seg(i, 0, i + 1, 0, w)
    # chain B joins the confluence at (4,0): (4,-3)->(4,0), widths 7,1,2
    seg(4, -3, 4, -2, 7); seg(4, -2, 4, -1, 1); seg(4, -1, 4, 0, 2)
    # downstream of the confluence: (4,0)->(7,0), widths 1,1,9
    for i, w in enumerate([1, 1, 9]):
        seg(4 + i, 0, 5 + i, 0, w)
    # junction fan-out: two distributaries from (7,0)
    seg(7, 0, 8, 1, 1)
    seg(7, 0, 8, -1, 2)
    # isolated interior cycle
    seg(20, 20, 21, 20, 4); seg(21, 20, 21, 21, 6); seg(21, 21, 20, 21, 1)
    seg(20, 21, 20, 20, 2)

    edges = spark.createDataFrame(
        rows, "edge_id long, x1 double, y1 double, x2 double, y2 double, width double"
    )
    direct = {r["edge_id"]: r["width"] for r in propagate_width(edges).collect()}
    chained = {
        r["edge_id"]: r["width"] for r in propagate_width_chained(edges).collect()
    }
    assert direct == chained
    # spot-check semantics: last main-stem edge sees both branches
    assert direct[10] == 9.0 and chained[10] == 9.0
    assert direct[11] == 9.0 and direct[12] == 9.0  # distributaries inherit
    assert direct[5] == 7.0  # chain B prefix


def test_propagate_width_escalation_equals_direct(spark, monkeypatch):
    """Escalating from a partially relaxed state to the chained path
    mid-fixpoint is exact: max-propagation's fixpoint from any state
    between input and fixpoint is the same fixpoint.  A long chain
    (24 edges, rising widths upstream) forces real escalation work;
    _SMALL_GRAPH_EDGES is forced to 0 so the DISTRIBUTED relaxation
    rounds and the escalation branch actually run."""
    import osm2pgsql_spark.operators.rivers as R
    from osm2pgsql_spark.operators.rivers import propagate_width

    rows = [
        (i + 1, float(i), 0.0, float(i + 1), 0.0, float(24 - i))
        for i in range(24)
    ]
    # a tributary at the far end so the junction graph is non-trivial
    rows.append((25, 12.0, -1.0, 12.0, 0.0, 99.0))
    edges = spark.createDataFrame(
        rows, "edge_id long, x1 double, y1 double, x2 double, y2 double, width double"
    )
    monkeypatch.setattr(R, "_SMALL_GRAPH_EDGES", 0)
    direct = {
        r["edge_id"]: r["width"]
        for r in propagate_width(edges, escalate_after_hops=None).collect()
    }
    escalated = {
        r["edge_id"]: r["width"]
        for r in propagate_width(edges, escalate_after_hops=4).collect()
    }
    assert direct == escalated
    assert escalated[24] == 99.0  # tributary reaches the mouth
    assert escalated[1] == 24.0


def test_distributed_paths_equal_local_kernels(spark, monkeypatch):
    """The window-form distributed relaxation and the distributed
    hash-min contraction must produce exactly the local kernels'
    results on a branching network with a junction-anchored loop."""
    import osm2pgsql_spark.operators.rivers as R

    rows = [
        (1, 0.0, 0.0, 1.0, 0.0, 2.0, 1.0, None),   # chain a
        (2, 1.0, 0.0, 2.0, 0.0, 1.0, 1.0, None),   # chain a (deg-2 link)
        (3, 2.0, 1.0, 2.0, 0.0, 5.0, 1.0, None),   # tributary into junction
        (4, 2.0, 0.0, 3.0, 0.0, 1.0, 1.0, None),   # outlet
        (5, 3.0, 0.0, 4.0, 1.0, 1.0, 1.0, None),   # loop out of (3,0)
        (6, 4.0, 1.0, 3.0, 0.0, 7.0, 1.0, None),   # loop back into (3,0)
    ]
    edges = spark.createDataFrame(rows, EDGE_SCHEMA)

    local_w = {r["edge_id"]: r["width"] for r in R.propagate_width(edges).collect()}
    local_c = {r["edge_id"]: r["chain_id"] for r in R.contract_chains(edges).collect()}
    monkeypatch.setattr(R, "_SMALL_GRAPH_EDGES", 0)
    dist_w = {r["edge_id"]: r["width"] for r in R.propagate_width(edges).collect()}
    dist_c = {r["edge_id"]: r["chain_id"] for r in R.contract_chains(edges).collect()}
    assert local_w == dist_w
    assert local_c == dist_c
    # the tributary reaches the outlet; the loop's return edge feeds
    # the loop's own outbound edge through the shared junction (3,0)
    assert local_w[4] == 5.0 and local_w[5] == 7.0 and local_w[6] == 7.0


def test_width_kernel_hop_bound_hands_off_exactly(spark, monkeypatch):
    """When the local kernel's hop bound trips it must emit done=false
    and the caller must still converge to the exact fixpoint via the
    chained escalation (resume-from-partial-state exactness)."""
    import osm2pgsql_spark.operators.rivers as R

    n = 12
    rows = [
        (i + 1, float(i), 0.0, float(i + 1), 0.0, float(n - i)) for i in range(n)
    ]
    edges = spark.createDataFrame(
        rows, "edge_id long, x1 double, y1 double, x2 double, y2 double, width double"
    )
    expected = {r["edge_id"]: r["width"] for r in R.propagate_width(edges).collect()}
    monkeypatch.setattr(R, "_LOCAL_MAX_HOPS", 3)  # force the bound to trip
    bounded = {r["edge_id"]: r["width"] for r in R.propagate_width(edges).collect()}
    assert bounded == expected
    assert expected[n] == float(n)  # descending widths: running max is the source


def test_propagate_width_chained_junction_anchored_loop(spark):
    """A loop that leaves and re-enters the SAME junction is not a
    closed interior cycle: junction inflow must reach it (ADVICE r4).

    feeder(w=9) -> J, loop J->a->b->J, outlet J -> K."""
    from osm2pgsql_spark.operators.rivers import (
        propagate_width,
        propagate_width_chained,
    )

    rows = [
        (1, -1.0, 0.0, 0.0, 0.0, 9.0),  # feeder -> J(0,0)
        (2, 0.0, 0.0, 1.0, 0.0, 1.0),   # J -> a
        (3, 1.0, 0.0, 1.0, 1.0, 1.0),   # a -> b
        (4, 1.0, 1.0, 0.0, 0.0, 1.0),   # b -> J
        (5, 0.0, 0.0, 0.0, -1.0, 1.0),  # J -> K outlet
    ]
    edges = spark.createDataFrame(
        rows, "edge_id long, x1 double, y1 double, x2 double, y2 double, width double"
    )
    direct = {r["edge_id"]: r["width"] for r in propagate_width(edges).collect()}
    chained = {
        r["edge_id"]: r["width"] for r in propagate_width_chained(edges).collect()
    }
    assert direct == chained
    # the feeder's width flows through the loop and out the outlet
    assert chained == {1: 9.0, 2: 9.0, 3: 9.0, 4: 9.0, 5: 9.0}
