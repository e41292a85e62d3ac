"""Discrete-isolation: the grid scale path must equal the exact
O(n^2) semantics (reference gen-discrete-isolation.cpp)."""

import pytest
from pyspark.sql import functions as F

from osm2pgsql_spark.operators import isolation


@pytest.fixture()
def points(spark):
    # deterministic pseudo-random points (FIXTURES.md F9 style)
    return spark.range(0, 200).select(
        F.col("id"),
        ((F.col("id") * 131) % 1000 / 10.0).alias("x"),
        ((F.col("id") * 197) % 1000 / 10.0).alias("y"),
        ((F.col("id") * 73) % 577).cast("double").alias("importance"),
    )


def test_grid_matches_exact(spark, points):
    exact = {
        (r["id"]): (r["irank"], r["iso"]) for r in isolation.exact(points).collect()
    }
    grid = {
        (r["id"]): (r["irank"], r["iso"]) for r in isolation.grid(points, cell=20.0).collect()
    }
    assert exact == grid


def test_top_point_has_null_iso(spark, points):
    rows = {r["irank"]: r for r in isolation.exact(points).collect()}
    assert rows[1]["iso"] is None
    assert all(rows[k]["iso"] is not None for k in rows if k != 1)


def test_grid_all_null_importance(spark):
    """ADVICE r3: all-NULL importance rows must not be silently dropped
    — every point has no strictly-higher neighbor, so grid() must
    return every point with iso NULL, exactly like exact()."""
    pts = spark.range(0, 20).select(
        F.col("id"),
        (F.col("id") % 5 * 10.0).alias("x"),
        (F.col("id") % 4 * 10.0).alias("y"),
        F.lit(None).cast("double").alias("importance"),
    )
    got = isolation.grid(pts, cell=15.0).collect()
    assert len(got) == 20
    assert all(r["iso"] is None for r in got)
    exact = {r["id"]: (r["irank"], r["iso"]) for r in isolation.exact(pts).collect()}
    grid = {r["id"]: (r["irank"], r["iso"]) for r in got}
    assert exact == grid


def test_grid_string_ids(spark):
    """ADVICE r3: grid() must not assume numeric ids (the old argmax
    negated the id column); string ids order lexically in both paths."""
    pts = spark.range(0, 50).select(
        F.format_string("p%03d", F.col("id")).alias("id"),
        ((F.col("id") * 131) % 100 / 2.0).alias("x"),
        ((F.col("id") * 197) % 100 / 2.0).alias("y"),
        ((F.col("id") * 73) % 17).cast("double").alias("importance"),
    )
    exact = {r["id"]: (r["irank"], r["iso"]) for r in isolation.exact(pts).collect()}
    grid = {r["id"]: (r["irank"], r["iso"]) for r in isolation.grid(pts, cell=10.0).collect()}
    assert exact == grid


def test_grid_ladder_path_matches_exact(spark, points, monkeypatch):
    """Force the geometric escalation ladder (the corpus-scale path)
    by zeroing the one-shot join budget; results must still equal
    exact()."""
    from osm2pgsql_spark.operators import isolation as iso_mod

    monkeypatch.setattr(iso_mod, "_ONESHOT_JOIN_BUDGET", 0)
    exact = {
        r["id"]: (r["irank"], r["iso"]) for r in isolation.exact(points).collect()
    }
    grid = {
        r["id"]: (r["irank"], r["iso"])
        for r in iso_mod.grid(points, cell=20.0).collect()
    }
    assert exact == grid
