"""Property-based tests (hypothesis) for the geometry/tile kernels —
invariants rather than examples."""

import math

import numpy as np
from hypothesis import example, given, settings
from hypothesis import strategies as st

from osm2pgsql_spark.functions import geometry as G
from osm2pgsql_spark.operators.expire import ExpireConfig, tiles_for_geometry

coord = st.floats(
    min_value=-1e7, max_value=1e7, allow_nan=False, allow_infinity=False, width=64
)
pt = st.tuples(coord, coord)


@given(st.lists(pt, min_size=2, max_size=40))
@settings(max_examples=200, deadline=None)
def test_wkb_roundtrip_linestring(pts):
    g = G.make_linestring(pts)
    if g is None:
        return
    back = G.from_wkb(G.to_wkb(g))
    assert back[0] == "linestring"
    np.testing.assert_array_equal(back[1], g[1])


@given(st.lists(pt, min_size=2, max_size=40))
@settings(max_examples=200, deadline=None)
def test_length_nonnegative_and_reverse_invariant(pts):
    g = G.make_linestring(pts)
    if g is None:
        return
    l1 = G.length(g)
    assert l1 >= 0
    # summation order differs on the reversed array: last-ulp IEEE
    # effects only, so compare with a tight relative tolerance
    assert math.isclose(G.length(G.reverse(g)), l1, rel_tol=1e-12, abs_tol=1e-12)


@given(st.lists(pt, min_size=2, max_size=30), st.floats(min_value=1e-6, max_value=1e6))
@settings(max_examples=200, deadline=None)
def test_simplify_subset_and_shorter(pts, tol):
    g = G.make_linestring(pts)
    if g is None:
        return
    s = G.simplify(g, tol)
    if s is None:
        return
    # simplified points are a subset of the original points
    orig = {(p[0], p[1]) for p in g[1]}
    assert all((p[0], p[1]) in orig for p in s[1])
    # endpoints preserved
    np.testing.assert_array_equal(s[1][0], g[1][0])
    np.testing.assert_array_equal(s[1][-1], g[1][-1])
    # DP never lengthens (tolerance relative: dropping a point changes
    # the summation order, which moves the total by a few ulps)
    assert G.length(s) <= G.length(g) * (1 + 1e-12) + 1e-9


small_pt = st.tuples(
    st.floats(min_value=-1e4, max_value=1e4, allow_nan=False, width=64),
    st.floats(min_value=-1e4, max_value=1e4, allow_nan=False, width=64),
)


@given(st.lists(small_pt, min_size=2, max_size=10), st.floats(min_value=5.0, max_value=1e5))
@settings(max_examples=60, deadline=None)
def test_segmentize_preserves_length(pts, maxlen):
    # bounded coords/maxlen: segmentize output size is length/maxlen,
    # so unbounded inputs make the test arbitrarily large, not wrong
    g = G.make_linestring(pts)
    if g is None:
        return
    s = G.segmentize(g, maxlen)
    assert math.isclose(G.length(s), G.length(g), rel_tol=1e-9, abs_tol=1e-6)


@given(st.lists(pt, min_size=3, max_size=15))
@settings(max_examples=100, deadline=None)
@example(
    pts=[
        (-4933392.3625424085, 651500.0),
        (0.0, 0.0),
        (0.0, 1.1754943508222875e-38),
        (0.0, -6.103515625e-05),
    ],
).via("discovered failure")
def test_polygon_area_translation_invariant(pts):
    ring = list(pts) + [pts[0]]
    g = G.make_polygon_from_way(ring)
    if g is None:
        return
    a1 = G.area(g)
    shifted = [(x + 1000.0, y - 500.0) for x, y in ring]
    g2 = G.make_polygon_from_way(shifted)
    if g2 is None:
        # the self-intersection classification is exact-math
        # translation-invariant, but near-degenerate rings (collinear
        # triples) can flip it under float translation — only the
        # area property is under test here
        return
    assert math.isclose(G.area(g2), a1, rel_tol=1e-6, abs_tol=1e-6)


@given(
    st.lists(pt, min_size=2, max_size=5),
    st.integers(min_value=4, max_value=10),
)
@settings(max_examples=40, deadline=None)
def test_tiles_cover_endpoints(pts, zoom):
    """Every segment endpoint's own tile is in the expire set.

    Coordinates bounded to +-2e6 m and zoom <=10: the line walk is
    O(tiles crossed), so near-global segments at high zoom are
    legitimately expensive — not what this property is about."""
    mpts = [(max(min(x, 2e6), -2e6), max(min(y, 2e6), -2e6)) for x, y in pts]
    g = G.make_linestring(mpts)
    if g is None:
        return
    cfg = ExpireConfig(maxzoom=zoom, buffer=0.0)
    tiles = set(tiles_for_geometry(g, cfg))
    n = 1 << zoom
    for x, y in mpts:
        tx = int(n * (0.5 + x / 40075016.68))
        ty = int(n * (0.5 - y / 40075016.68))
        if 0 <= ty < n and 0 <= tx < n:
            assert (tx, ty) in tiles


@given(st.integers(min_value=0, max_value=(1 << 14) - 1), st.integers(min_value=0, max_value=(1 << 14) - 1))
@settings(max_examples=200, deadline=None)
def test_rollup_parent_relation(x, y):
    """A z14 tile's z13 parent is exactly (x>>1, y>>1) via the
    floor/pow formulation used in the rollup."""
    import math as m

    assert int(m.floor(x / 2.0)) == x >> 1
    assert int(m.floor(y / 2.0)) == y >> 1
