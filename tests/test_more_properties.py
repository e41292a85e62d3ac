"""Hypothesis property tests beyond test_geometry_properties: dtoa
shortest-round-trip, projection forward/inverse consistency, polygon
overlay boolean identities, and line_merge invariants.

Each property is a contract the reference implies but never states as
a test — e.g. nlohmann's Grisu2 guarantees shortest round-trip
(json-writer output), proj inverses must invert their forwards, and
the coverage-counting overlay must satisfy inclusion-exclusion."""

from __future__ import annotations

import math

import numpy as np
import pytest
from hypothesis import example, given, settings
from hypothesis import strategies as st

from osm2pgsql_spark.functions import geometry as G
from osm2pgsql_spark.functions import polyops
from osm2pgsql_spark.functions import projection as P
from osm2pgsql_spark.functions.dtoa import dtoa

finite_doubles = st.floats(allow_nan=False, allow_infinity=False)


@given(finite_doubles)
@example(0.1)
@example(-0.0)
@example(5e-324)  # smallest subnormal
@example(1.7976931348623157e308)
@settings(max_examples=500, deadline=None)
def test_dtoa_round_trips(x):
    """Grisu2 shortest-digits guarantee: parsing the formatted string
    recovers the exact double (incl. -0.0 sign)."""
    s = dtoa(x)
    back = float(s)
    assert back == x
    assert math.copysign(1.0, back) == math.copysign(1.0, x)


@given(
    st.floats(min_value=-179.9, max_value=179.9),
    st.floats(min_value=-84.9, max_value=84.9),
)
@settings(max_examples=200, deadline=None)
def test_3857_round_trip(lon, lat):
    g = ("point", (lon, lat))
    back = G.transform_3857_to_4326(G.transform_4326_to_3857(g))
    got_lon, got_lat = back[1]
    assert abs(got_lon - lon) < 1e-9
    assert abs(got_lat - lat) < 1e-9


@given(
    st.floats(min_value=9.01, max_value=20.9),  # UTM33N domain and a bit
    st.floats(min_value=-79.9, max_value=83.9),
)
@settings(max_examples=200, deadline=None)
def test_tmerc_round_trip_utm33(lon, lat):
    p = P.epsg_params(32633)
    e, n = P.tmerc_forward(np.array([lon]), np.array([lat]), p)
    lon2, lat2 = P.tmerc_inverse(e, n, p)
    assert abs(lon2[0] - lon) < 1e-9
    assert abs(lat2[0] - lat) < 1e-9


@given(
    st.floats(min_value=-120.0, max_value=-75.0),
    st.floats(min_value=20.0, max_value=60.0),
)
@settings(max_examples=200, deadline=None)
def test_albers_round_trip_conus(lon, lat):
    p = P.epsg_params(5070)
    e, n = P.albers_forward(np.array([lon]), np.array([lat]), p)
    lon2, lat2 = P.albers_inverse(e, n, p)
    assert abs(lon2[0] - lon) < 1e-8
    assert abs(lat2[0] - lat) < 1e-8


@given(
    st.floats(min_value=-10.0, max_value=15.0),
    st.floats(min_value=35.0, max_value=60.0),
)
@settings(max_examples=200, deadline=None)
def test_lcc_round_trip_france(lon, lat):
    p = P.epsg_params(2154)
    e, n = P.lcc_forward(np.array([lon]), np.array([lat]), p)
    lon2, lat2 = P.lcc_inverse(e, n, p)
    assert abs(lon2[0] - lon) < 1e-8
    assert abs(lat2[0] - lat) < 1e-8


@given(
    st.floats(min_value=2.0, max_value=8.0),
    st.floats(min_value=49.0, max_value=54.5),
)
@settings(max_examples=200, deadline=None)
def test_sterea_round_trip_nl(lon, lat):
    p = P.epsg_params(28992)
    e, n = P.sterea_forward(np.array([lon]), np.array([lat]), p)
    lon2, lat2 = P.sterea_inverse(e, n, p)
    assert abs(lon2[0] - lon) < 1e-8
    assert abs(lat2[0] - lat) < 1e-8


# --------------------------------------------------------- polyops

def _rect(x0, y0, w, h):
    ring = np.array(
        [[x0, y0], [x0 + w, y0], [x0 + w, y0 + h], [x0, y0 + h], [x0, y0]],
        dtype="f8",
    )
    return ("polygon", [ring])


rect_params = st.tuples(
    st.integers(min_value=0, max_value=80),
    st.integers(min_value=0, max_value=80),
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=1, max_value=40),
)


def _area(geom) -> float:
    return 0.0 if geom is None else G.area(geom)


@given(rect_params, rect_params)
@settings(max_examples=150, deadline=None)
def test_overlay_inclusion_exclusion_on_int_rects(ra, rb):
    """On integer axis-aligned rectangles every overlay area is
    analytic: |A∩B| from interval overlap, |A∪B| = |A|+|B|-|A∩B|,
    |A xor B| = |A∪B|-|A∩B|, |A\\B| = |A|-|A∩B|."""
    ax, ay, aw, ah = ra
    bx, by, bw, bh = rb
    A, B = _rect(ax, ay, aw, ah), _rect(bx, by, bw, bh)
    ix = max(0, min(ax + aw, bx + bw) - max(ax, bx))
    iy = max(0, min(ay + ah, by + bh) - max(ay, by))
    want_i = float(ix * iy)
    want_u = float(aw * ah + bw * bh) - want_i

    got_i = _area(polyops.overlay(A, B, "intersection"))
    got_u = _area(polyops.overlay(A, B, "union"))
    got_x = _area(polyops.overlay(A, B, "xor"))
    got_d = _area(polyops.overlay(A, B, "difference"))
    assert got_i == pytest.approx(want_i, abs=1e-6)
    assert got_u == pytest.approx(want_u, abs=1e-6)
    assert got_x == pytest.approx(want_u - want_i, abs=1e-6)
    assert got_d == pytest.approx(aw * ah - want_i, abs=1e-6)


@given(st.lists(rect_params, min_size=1, max_size=5))
@settings(max_examples=100, deadline=None)
def test_union_all_bounds_and_idempotence(rects):
    geoms = [_rect(*r) for r in rects]
    u = polyops.union_all(geoms)
    area_u = _area(u)
    # bounded by sum and by the largest input
    assert area_u <= sum(w * h for _, _, w, h in rects) + 1e-6
    assert area_u >= max(w * h for _, _, w, h in rects) - 1e-6
    # dissolving the dissolved result changes nothing
    assert _area(polyops.union_all([u])) == pytest.approx(area_u, abs=1e-6)


# --------------------------------------------------------- line_merge

@st.composite
def chains(draw):
    """A simple open chain with strictly increasing x (no repeated
    vertices, no accidental endpoint collisions)."""
    n = draw(st.integers(min_value=3, max_value=12))
    xs = sorted(draw(st.lists(
        st.integers(min_value=0, max_value=10_000),
        min_size=n, max_size=n, unique=True,
    )))
    ys = draw(st.lists(
        st.integers(min_value=-1000, max_value=1000), min_size=n, max_size=n,
    ))
    return np.array(list(zip(xs, ys)), dtype="f8")


@given(chains(), st.randoms(use_true_random=False))
@settings(max_examples=150, deadline=None)
def test_line_merge_rebuilds_shuffled_chain(pts, rnd):
    """Splitting a chain into its segments, shuffling, and merging
    yields ONE part with the original length and endpoint set —
    regardless of segment order (the reference walks from degree-1
    endpoints, geom-functions.cpp:594-767)."""
    segs = [pts[i : i + 2].copy() for i in range(len(pts) - 1)]
    rnd.shuffle(segs)
    merged = G.line_merge(("multilinestring", segs))
    assert merged is not None
    kind, parts = merged
    assert len(parts) == 1
    chain = parts[0]
    want_len = float(np.sum(np.hypot(*(pts[1:] - pts[:-1]).T)))
    got_len = float(np.sum(np.hypot(*(chain[1:] - chain[:-1]).T)))
    assert got_len == pytest.approx(want_len, abs=1e-9)
    ends = {tuple(chain[0]), tuple(chain[-1])}
    assert ends == {tuple(pts[0]), tuple(pts[-1])}


@given(chains())
@settings(max_examples=100, deadline=None)
def test_split_multi_preserves_parts_and_points(pts):
    segs = [pts[i : i + 2].copy() for i in range(len(pts) - 1)]
    parts = G.split_multi(("multilinestring", segs))
    assert len(parts) == len(segs)
    total = sum(p[1].shape[0] if isinstance(p, tuple) else 0 for p in parts)
    assert total == 2 * len(segs)


@given(
    st.floats(min_value=5.5, max_value=11.0),
    st.floats(min_value=45.0, max_value=48.5),
)
@settings(max_examples=200, deadline=None)
def test_hom_round_trip_swiss(lon, lat):
    p = P.epsg_params(2056)
    e, n = P.hom_forward(np.array([lon]), np.array([lat]), p)
    lon2, lat2 = P.hom_inverse(e, n, p)
    assert abs(lon2[0] - lon) < 1e-9
    assert abs(lat2[0] - lat) < 1e-9


@given(
    st.floats(min_value=108.0, max_value=120.0),
    st.floats(min_value=0.5, max_value=8.0),
)
@settings(max_examples=200, deadline=None)
def test_hom_round_trip_skew_rso(lon, lat):
    p = P.epsg_params(29873)
    e, n = P.hom_forward(np.array([lon]), np.array([lat]), p)
    lon2, lat2 = P.hom_inverse(e, n, p)
    assert abs(lon2[0] - lon) < 1e-9
    assert abs(lat2[0] - lat) < 1e-9


@given(
    st.floats(min_value=-179.9, max_value=179.9),
    st.floats(min_value=-89.9, max_value=-55.0),
)
@settings(max_examples=200, deadline=None)
def test_polar_round_trip_antarctic(lon, lat):
    p = P.epsg_params(3031)
    e, n = P.polar_forward(np.array([lon]), np.array([lat]), p)
    lon2, lat2 = P.polar_inverse(e, n, p)
    dl = abs((lon2[0] - lon + 180.0) % 360.0 - 180.0)
    assert dl < 1e-9 and abs(lat2[0] - lat) < 1e-9


@given(
    st.floats(min_value=-179.9, max_value=179.9),
    st.floats(min_value=-84.0, max_value=84.0),
)
@settings(max_examples=200, deadline=None)
def test_mercator_round_trip_world(lon, lat):
    p = P.epsg_params(3395)
    e, n = P.merc_forward(np.array([lon]), np.array([lat]), p)
    lon2, lat2 = P.merc_inverse(e, n, p)
    assert abs(lon2[0] - lon) < 1e-9
    assert abs(lat2[0] - lat) < 1e-9


@given(
    st.floats(min_value=-78.9, max_value=-75.5),
    st.floats(min_value=17.2, max_value=19.0),
)
@settings(max_examples=200, deadline=None)
def test_lcc1sp_round_trip_jamaica(lon, lat):
    p = P.epsg_params(24200)
    e, n = P.lcc_forward(np.array([lon]), np.array([lat]), p)
    lon2, lat2 = P.lcc_inverse(e, n, p)
    assert abs(lon2[0] - lon) < 1e-8
    assert abs(lat2[0] - lat) < 1e-8
