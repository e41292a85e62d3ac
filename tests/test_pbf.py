"""PBF source tests against the reference's own regression extract
(/root/reference/tests/data/liechtenstein-2013-08-03.osm.pbf — used
as INPUT DATA only, same as the reference's BDD regression suite)."""

import os

import pytest
from pyspark.sql import functions as F

from osm2pgsql_spark.sources.pbf import (
    decode_primitive_block,
    _read_blob,
    read_pbf,
    scan_blob_index,
)

PBF = "/root/reference/tests/data/liechtenstein-2013-08-03.osm.pbf"

pytestmark = pytest.mark.skipif(not os.path.exists(PBF), reason="fixture missing")


def test_blob_index():
    refs = scan_blob_index(PBF)
    assert refs[0].type == "OSMHeader"
    assert all(r.type == "OSMData" for r in refs[1:])
    assert len(refs) == 12


def test_decode_counts():
    tot = [0, 0, 0]
    for r in scan_blob_index(PBF):
        if r.type != "OSMData":
            continue
        n, w, rel = decode_primitive_block(_read_blob(PBF, r))
        tot[0] += len(n)
        tot[1] += len(w)
        tot[2] += len(rel)
    assert tot == [65733, 7121, 113]


def test_read_pbf_spark_and_assemble(spark):
    nodes, ways, rels = read_pbf(spark, PBF)
    assert nodes.count() == 65733
    assert ways.count() == 7121
    assert rels.count() == 113

    # all coords in the wider region (extract contains border-crossing
    # route members reaching into Switzerland/Austria)
    bad = nodes.where(
        (F.col("lat") < 46.5) | (F.col("lat") > 47.8) | (F.col("lon") < 9.0) | (F.col("lon") > 10.0)
    ).count()
    assert bad == 0

    # the core join resolves essentially every way ref (extract is
    # self-contained up to boundary clipping)
    refs = ways.select(F.col("id").alias("way_id"), F.posexplode("refs").alias("pos", "ref"))
    nloc = nodes.select(F.col("id").alias("node_id"), "lon", "lat")
    resolved = refs.join(nloc, refs["ref"] == nloc["node_id"]).count()
    total = refs.count()
    assert resolved / total > 0.99

    # relations reference real members
    m = rels.select(F.explode("members").alias("m"))
    assert m.where(F.col("m.type") == "w").count() > 0
