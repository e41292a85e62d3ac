"""gen-on-dirty-tiles wiring (osm2pgsql-gen.cpp:489-524) and the
tile-sql strategy."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from osm2pgsql_spark.functions import geometry as G
from osm2pgsql_spark.operators.gen import (
    cut_to_dirty_tiles,
    rollup_tiles,
    tiles_to_process,
)
from osm2pgsql_spark.operators.tile_sql import (
    run_tile_sql_loop,
    run_tile_sql_vectorized,
)
from osm2pgsql_spark.operators.vector_tiles import cut_to_tiles


@pytest.fixture()
def lines_3857(spark):
    # a few lines around the 3857 origin, ~100km scale
    def wkb(*pts):
        return G.to_wkb(G.make_linestring(pts))

    rows = [
        (1, wkb((0.0, 0.0), (200000.0, 150000.0))),
        (2, wkb((-300000.0, -100000.0), (-250000.0, -120000.0))),
        (3, wkb((500000.0, 500000.0), (600000.0, 480000.0))),
    ]
    return spark.createDataFrame(rows, "id bigint, geom binary")


def test_gen_append_mode_processes_only_dirty_tiles(spark, lines_3857):
    zoom = 8
    full = cut_to_tiles(lines_3857, zoom, wkb_col="geom", id_col="id")
    all_tiles = {(r.x, r.y) for r in full.select("x", "y").distinct().collect()}
    assert len(all_tiles) > 2

    # dirty = only the tiles covering feature 1
    dirty = (
        cut_to_tiles(lines_3857.where(F.col("id") == 1), zoom, wkb_col="geom")
        .select("x", "y")
        .distinct()
    )
    tiles = tiles_to_process(zoom, dirty_tiles=dirty, dirty_zoom=zoom)
    out = cut_to_dirty_tiles(lines_3857, zoom, tiles, wkb_col="geom", id_col="id")
    got_tiles = {(r.x, r.y) for r in out.select("x", "y").distinct().collect()}
    want_tiles = {(r.x, r.y) for r in dirty.collect()}
    assert got_tiles <= want_tiles
    # and within those tiles the output equals the full run's subset
    full_subset = {
        (r.id, r.x, r.y)
        for r in full.collect()
        if (r.x, r.y) in want_tiles
    }
    got = {(r.id, r.x, r.y) for r in out.collect()}
    assert got == full_subset


def test_gen_rollup_and_cap(spark):
    dirty = spark.createDataFrame(
        [(12, 100, 200), (12, 101, 201), (12, 400, 404)], "zoom int, x bigint, y bigint"
    )
    rolled = rollup_tiles(dirty.select("x", "y"), 12, 10)
    assert {(r.x, r.y) for r in rolled.collect()} == {(25, 50), (100, 101)}
    capped = tiles_to_process(
        10, dirty_tiles=dirty, dirty_zoom=12, max_tiles_per_run=1
    )
    assert capped.count() == 1
    assert [(r.x, r.y) for r in capped.collect()] == [(25, 50)]


def test_gen_full_mode_extent(spark, lines_3857):
    tiles = tiles_to_process(6, features=lines_3857, wkb_col="geom")
    got = {(r.x, r.y) for r in tiles.collect()}
    # extent covers all features' tiles at z6
    covering = {
        (r.x, r.y)
        for r in cut_to_tiles(lines_3857, 6, wkb_col="geom").select("x", "y").collect()
    }
    assert covering <= got


def test_tile_sql_vectorized_equals_loop(spark):
    feats = spark.createDataFrame(
        [(1, 10, 20, 5.0), (2, 10, 20, 7.0), (3, 11, 20, 1.0)],
        "id bigint, x bigint, y bigint, v double",
    )
    feats.createOrReplaceTempView("feats")
    tiles = spark.createDataFrame([(12, 10, 20), (12, 11, 20)], "zoom int, x bigint, y bigint")
    vec = run_tile_sql_vectorized(
        spark,
        """SELECT t.x, t.y, sum(f.v) AS total
           FROM __tiles__ t JOIN feats f ON f.x = t.x AND f.y = t.y
           GROUP BY t.x, t.y""",
        tiles,
    )
    loop = run_tile_sql_loop(
        spark,
        "SELECT {X} AS x, {Y} AS y, sum(v) AS total FROM feats WHERE x = {X} AND y = {Y}",
        [(12, 10, 20), (12, 11, 20)],
    )
    assert sorted(map(tuple, vec.collect())) == sorted(map(tuple, loop.collect()))
    assert {tuple(r) for r in vec.collect()} == {(10, 20, 12.0), (11, 20, 1.0)}


# ------------------------------------------------- gen_tool CLI parity
# create_generalizer exposes 6 strategies
# (/root/reference/src/gen/gen-create.cpp:22-52); each must be drivable
# end-to-end from the CLI twin.

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_gen(args):
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "gen_tool.py"), *args],
        capture_output=True, text=True, cwd=REPO, timeout=600,
        env={**os.environ, "SPARK_GRAFT_CPUS": "4"},
    )


def test_gen_tool_vector_union_cli(tmp_path, spark):
    from osm2pgsql_spark.operators.expire import EARTH_CIRCUMFERENCE

    zoom = 10
    extent = EARTH_CIRCUMFERENCE / (1 << zoom)
    half = EARTH_CIRCUMFERENCE / 2.0
    cx = -half + 512.5 * extent
    cy = half - 512.5 * extent
    s = extent / 10

    def wkb(x0, y0, x1, y1):
        return G.to_wkb(("polygon", [np.array(
            [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], dtype="f8")]))

    rows = [
        (1, wkb(cx, cy, cx + 2 * s, cy + 2 * s)),
        (2, wkb(cx + s, cy + s, cx + 3 * s, cy + 3 * s)),
    ]
    inp = str(tmp_path / "polys.parquet")
    out = str(tmp_path / "union.parquet")
    spark.createDataFrame(rows, "id bigint, geom binary").write.parquet(inp)
    r = _run_gen(["vector-union", "--input", inp, "--output", out,
                  "--zoom", str(zoom), "--buffer-size", "0"])
    assert r.returncode == 0, r.stderr[-2000:]
    got = spark.read.parquet(out).collect()
    assert len(got) == 1
    merged = G.from_wkb(bytes(got[0].geom))
    assert abs(G.area(merged) - 7 * s * s) / (7 * s * s) < 1e-9


def test_gen_tool_rivers_cli(tmp_path, spark):
    # Y-shaped network: two wide headwaters joining into a narrow
    # outlet -- downstream propagation must widen the outlet chain
    def line(*pts):
        return G.to_wkb(G.make_linestring(pts))

    rows = [
        (line((0.0, 0.0), (10.0, 0.0), (20.0, 0.0)), 9.0, "left"),
        (line((0.0, 20.0), (10.0, 10.0), (20.0, 0.0)), 5.0, "right"),
        (line((20.0, 0.0), (30.0, 0.0), (40.0, 0.0)), 1.0, "out"),
    ]
    inp = str(tmp_path / "rivers.parquet")
    out = str(tmp_path / "chains.parquet")
    spark.createDataFrame(rows, "geom binary, width double, name string").write.parquet(inp)
    r = _run_gen(["rivers", "--input", inp, "--output", out])
    assert r.returncode == 0, r.stderr[-2000:]
    got = spark.read.parquet(out).collect()
    widths = {row.name: row.width for row in got}
    assert widths["out"] == 9.0  # max of upstream widths propagated
    assert widths["left"] == 9.0
    assert widths["right"] == 5.0


@pytest.mark.slow
def test_gen_tool_style_forests_lua(tmp_path, spark):
    """forests.lua drives the gen step (reference osm2pgsql-gen -S,
    src/gen/osm2pgsql-gen.cpp:289-360): its process_gen() records
    three raster-union runs (zoom 7/8/10) over the forests table; the
    zoom-10 output must equal the flag-driven invocation byte-for-byte
    on the tile keys."""
    from osm2pgsql_spark.operators.expire import EARTH_CIRCUMFERENCE

    zoom = 10
    extent = EARTH_CIRCUMFERENCE / (1 << zoom)
    half = EARTH_CIRCUMFERENCE / 2.0
    cx = -half + 512.5 * extent
    cy = half - 512.5 * extent
    s = extent / 4

    def wkb(x0, y0, x1, y1):
        return G.to_wkb(("polygon", [np.array(
            [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], dtype="f8")]))

    rows = [
        (1, wkb(cx, cy, cx + 2 * s, cy + 2 * s)),
        (2, wkb(cx + s, cy + s, cx + 3 * s, cy + 3 * s)),
    ]
    tdir = tmp_path / "tables"
    tdir.mkdir()
    spark.createDataFrame(rows, "id bigint, geom binary").write.parquet(
        str(tdir / "forests"))

    r = _run_gen(["style", "--style",
                  "/root/reference/flex-config/gen/forests.lua",
                  "--tables-dir", str(tdir), "--resolution", "256"])
    assert r.returncode == 0, r.stderr[-3000:]
    for level in ("forests_s", "forests_m", "forests_l"):
        assert (tdir / level).exists(), level

    # flag-driven twin at the same zoom/margin/resolution
    out = str(tmp_path / "flag.parquet")
    r2 = _run_gen(["raster-union", "--input", str(tdir / "forests"),
                   "--output", out, "--zoom", "10", "--margin", "0.1",
                   "--resolution", "256"])
    assert r2.returncode == 0, r2.stderr[-3000:]
    style_rows = {(r.x, r.y, bytes(r.geom)) for r in
                  spark.read.parquet(str(tdir / "forests_l")).collect()}
    flag_rows = {(r.x, r.y, bytes(r.geom)) for r in
                 spark.read.parquet(out).collect()}
    assert style_rows and style_rows == flag_rows
