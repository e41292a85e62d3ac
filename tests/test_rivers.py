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
