"""The reference's multipolygon regression feature, replayed end-to-end
(/root/reference/tests/bdd/regression/multipolygon.feature): import
`test_multipolygon.osm` through the pgsql-compat pipeline with relation
processing in EPSG:3857, assert the feature's pinned per-object areas /
presence / absence, then fold `test_multipolygon_diff.osc` and assert
the post-update state.  This is the broken-multipolygon tolerance
corpus: unclosed rings, deleted members, type-only relations whose
tagged member ways must still render independently.

Area parity notes:
- ST_Area expectations are in mercator m**2; they reproduce exactly
  because the XML reader quantizes locations to libosmium's 1e-7
  fixed point and way geometry is projected with the same spherical
  mercator the reference uses (src/reprojection.cpp:17-102).
- way_area expectations differ from ST_Area by float4: the reference
  serializes way_area with "{:g}" (6 significant digits,
  src/util.hpp:28-44) into a REAL column; `_way_area_pg` emulates
  that pipeline so -39's famous 10377-vs-10378 pair is reproduced
  rather than fudged with a tolerance.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from osm2pgsql_spark.functions import geometry as G
from osm2pgsql_spark.plans.pgsql_compat import planet_osm_tables
from osm2pgsql_spark.sources.osm_xml import read_osm_xml, read_osc_xml
from osm2pgsql_spark.streaming.append import apply_diff

OSM = "/root/reference/tests/data/test_multipolygon.osm"
OSC = "/root/reference/tests/data/test_multipolygon_diff.osc"


def _pg_int(x: float) -> int:
    """Postgres float8 -> int cast (rint, half-to-even)."""
    return int(np.rint(x))


def _way_area_pg(areas: list[float]) -> int:
    """sum(way_area)::int as Postgres sees it: each value through
    '{:g}' text then a float4 column, summed as float4."""
    acc = np.float32(0.0)
    for a in areas:
        acc = np.float32(acc + np.float32(float(f"{a:g}")))
    return _pg_int(float(acc))


def _polys(t):
    rows = t["planet_osm_polygon"].select(
        "osm_id", "landuse", "natural", "name", "way_area", "way"
    ).collect()
    d: dict[int, list] = {}
    for r in rows:
        d.setdefault(r["osm_id"], []).append(r)
    return d


def _st_area_sum(rows) -> int:
    return _pg_int(sum(r["way_area"] for r in rows))


@pytest.fixture(scope="module")
def imported(spark):
    nodes, ways, rels = read_osm_xml(spark, OSM)
    return nodes, ways, rels


def _check_import_state(d):
    # Then table planet_osm_polygon contains (landuse rows)
    expect = {
        -1: ("residential", "Name_rel", 12895),
        -8: ("residential", "Name_rel2", 12894),
        -14: ("residential", "Name_way5", 12894),
        -11: ("residential", "Name_rel6", 11529),
        4: ("farmland", "Name_way3", 3144),
        5: ("farmland", "Name_way4", 3144),
        83: ("farmland", None, 24859),
    }
    for oid, (lu, name, a) in expect.items():
        rows = [r for r in d[oid] if r["landuse"] == lu and r["name"] == name]
        assert any(_pg_int(r["way_area"]) == a for r in rows), (oid, rows)
    # contains: one of rel 3's parts is the 9286 polygon with 2 holes
    r3 = d[-3]
    assert any(
        r["landuse"] == "residential"
        and r["name"] == "Name_rel11"
        and _pg_int(r["way_area"]) == 9286
        for r in r3
    )
    nine = next(r for r in r3 if _pg_int(r["way_area"]) == 9286)
    kind, rings = G.from_wkb(bytes(nine["way"]))
    assert kind == "polygon" and len(rings) - 1 == 2  # ST_NumInteriorRing = 2
    # natural water rows
    assert any(
        r["natural"] == "water" and _pg_int(r["way_area"]) == 18501 for r in d[-24]
    )
    assert any(
        r["natural"] == "water" and _pg_int(r["way_area"]) == 12994 for r in d[102]
    )
    # absent polygons: untagged member ways + type-only relations
    for oid in (109, 104, -33):
        assert oid not in d
    # single-geometry objects
    for oid in (113, 118, 114, 107, 102, 138, 140):
        assert len(d[oid]) == 1, oid


def test_multipolygon_import(spark, imported):
    nodes, ways, rels = imported
    t = planet_osm_tables(nodes, ways, relations=rels, srid=3857)
    d = _polys(t)
    _check_import_state(d)
    # grouped_polygons: split rows sum to the relation's total area
    assert len(d[-13]) == 2 and _st_area_sum(d[-13]) == 17581
    assert len(d[-7]) == 2 and _st_area_sum(d[-7]) == 16169
    assert len(d[-29]) == 2 and _st_area_sum(d[-29]) == 68494
    assert _st_area_sum(d[-39]) == 10377
    assert _way_area_pg([r["way_area"] for r in d[-39]]) == 10378
    assert _st_area_sum(d[-40]) == 12397
    assert len(d[-25]) == 1
    # line table: closed residential way renders as a line, length 228
    lines = {
        r["osm_id"]: r
        for r in t["planet_osm_line"]
        .select("osm_id", "highway", "name", "way")
        .collect()
    }
    l6 = lines[6]
    assert l6["highway"] == "residential" and l6["name"] == "Name_way6"
    pts = G.from_wkb(bytes(l6["way"]))[1]
    seg = np.diff(pts, axis=0)
    assert _pg_int(float(np.hypot(seg[:, 0], seg[:, 1]).sum())) == 228


def test_multipolygon_import_multi_geometry(spark, imported):
    """-G / --enable-multi: one multipolygon row per relation; -13 and
    -7 keep ST_NumGeometries = 2."""
    nodes, ways, rels = imported
    t = planet_osm_tables(nodes, ways, relations=rels, srid=3857, enable_multi=True)
    d = _polys(t)
    for oid in (-13, -7):
        assert len(d[oid]) == 1
        kind, payload = G.from_wkb(bytes(d[oid][0]["way"]))
        assert kind == "multipolygon" and len(payload) == 2
    # totals unchanged by the -G representation
    assert _st_area_sum(d[-13]) == 17581
    assert _st_area_sum(d[-7]) == 16169
    _check_import_state(d)


def test_multipolygon_update(spark, imported):
    """Fold test_multipolygon_diff.osc, rebuild, assert the feature's
    post-update state: moved node grows -1, deleted member shrinks
    -29 to one ring, deleted relation -25 vanishes, stitched
    open-way pairs keep -14 intact."""
    nodes, ways, rels = imported
    dn, dw, dr = read_osc_xml(spark, OSC)
    nodes2 = apply_diff(nodes, dn)
    ways2 = apply_diff(ways, dw)
    rels2 = apply_diff(rels, dr)
    t = planet_osm_tables(nodes2, ways2, relations=rels2, srid=3857)
    d = _polys(t)
    # node 7 moved: -1 grows 12895 -> 13949
    assert any(
        r["landuse"] == "residential"
        and r["name"] == "Name_rel"
        and _pg_int(r["way_area"]) == 13949
        for r in d[-1]
    )
    # unchanged survivors
    for oid, a in ((-8, 12894), (-14, 12894), (-11, 11529), (83, 24859)):
        assert any(_pg_int(r["way_area"]) == a for r in d[oid]), oid
    assert any(
        r["natural"] == "water" and _pg_int(r["way_area"]) == 18501 for r in d[-24]
    )
    # way 104 deleted + rel 29 modified to one ring: 68494 -> 29155
    assert len(d[-29]) == 1 and _st_area_sum(d[-29]) == 29155
    # grouped sums stable across the update
    assert _st_area_sum(d[-13]) == 17581
    assert _st_area_sum(d[-7]) == 16169
    assert _st_area_sum(d[-39]) == 10377
    assert _st_area_sum(d[-40]) == 12397
    # deleted relation + deleted/untagged member ways
    for oid in (-25, 109, 104, -33):
        assert oid not in d
    for oid in (113, 118, 114, 107, 102, 138, 140):
        assert len(d[oid]) == 1, oid
    # line survives
    lines = {r["osm_id"] for r in t["planet_osm_line"].select("osm_id").collect()}
    assert 6 in lines
