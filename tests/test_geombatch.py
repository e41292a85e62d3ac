"""Bit-exactness pins for the batch WKB measure/transform fast paths.

Every batch kernel in functions/geombatch.py must return EXACTLY what
the scalar per-row path (functions/geometry.py composed as the old
operators/geom_udfs.py loops did) returns — same bytes, same float
bits, same nulls — across an edge zoo that exercises the fast classes,
the fallback classes, and the seams between them inside one batch.
"""

import math
import struct

import numpy as np
import pandas as pd
import pytest

from osm2pgsql_spark.functions import geombatch as GB
from osm2pgsql_spark.functions import geometry as G


def _bswap_wkb_point(x: float, y: float) -> bytes:
    """A big-endian point WKB (forces the fallback path)."""
    return b"\x00" + struct.pack(">I", 1) + struct.pack(">dd", x, y)


def _ewkb_point(x: float, y: float, srid: int = 4326) -> bytes:
    """EWKB with the SRID flag set (forces the fallback path)."""
    return (
        b"\x01"
        + struct.pack("<I", 1 | 0x20000000)
        + struct.pack("<I", srid)
        + struct.pack("<dd", x, y)
    )


def _zoo() -> list:
    """WKB rows covering every class the scan distinguishes."""
    rng = np.random.RandomState(42)
    rows: list = [None, b""]
    # points, incl. NaN coords and trailing garbage
    rows.append(G.to_wkb(("point", (1.5, -2.25))))
    rows.append(G.to_wkb(("point", (float("nan"), 3.0))))
    rows.append(G.to_wkb(("point", (-0.0, 0.0))) + b"\xde\xad")
    # linestrings: straight, random, dup points, 2-pt, long, signed zeros
    rows.append(G.to_wkb(("linestring", np.array([[0.0, 0.0], [3.0, 4.0]]))))
    for n in (2, 3, 5, 17, 200):
        rows.append(G.to_wkb(("linestring", rng.uniform(-180, 85, (n, 2)))))
    rows.append(
        G.to_wkb(("linestring", np.array([[1.0, 1.0], [1.0, 1.0], [2.0, 2.0]])))
    )
    rows.append(
        G.to_wkb(("linestring", np.array([[-0.0, 0.0], [0.0, -0.0], [1.0, 1.0]])))
    )
    rows.append(
        G.to_wkb(("linestring", np.array([[np.nan, 0.0], [1.0, np.nan], [2.0, 2.0]])))
    )
    # degenerate linestrings from_wkb will happily parse
    rows.append(G.to_wkb(("linestring", np.empty((0, 2)))))
    rows.append(G.to_wkb(("linestring", np.array([[7.0, 8.0]]))))
    # polygons: single ring, ring + hole
    sq = np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0], [0.0, 0.0]])
    hole = np.array([[1.0, 1.0], [2.0, 1.0], [2.0, 2.0], [1.0, 2.0], [1.0, 1.0]])
    rows.append(G.to_wkb(("polygon", [sq])))
    rows.append(G.to_wkb(("polygon", [sq, hole])))
    rows.append(G.to_wkb(("polygon", [])))
    # multipoint / multilinestring (incl. empty + 1-part)
    rows.append(G.to_wkb(("multipoint", [(0.5, 0.5), (2.0, -1.0), (2.0, -1.0)])))
    rows.append(G.to_wkb(("multipoint", [])))
    seg = G.segmentize(("linestring", sq), 0.7)
    rows.append(G.to_wkb(seg))
    rows.append(G.to_wkb(("multilinestring", [sq[:3]])))
    rows.append(G.to_wkb(("multilinestring", [])))
    # multipolygon + collection (always fallback)
    rows.append(G.to_wkb(("multipolygon", [[sq], [hole]])))
    rows.append(
        G.to_wkb(("collection", [("point", (1.0, 2.0)), ("linestring", sq[:3])]))
    )
    # exotic encodings -> fallback
    rows.append(_bswap_wkb_point(3.5, -7.25))
    rows.append(_ewkb_point(12.0, 55.0))
    return rows


ZOO = _zoo()


def _assert_float_series_equal(got: pd.Series, want: list) -> None:
    assert len(got) == len(want)
    for i, w in enumerate(want):
        g = got.iloc[i]
        if w is None or (isinstance(w, float) and math.isnan(w)):
            assert g is None or (isinstance(g, float) and math.isnan(g)), i
        else:
            assert struct.pack("<d", g) == struct.pack("<d", w), (i, g, w)


def test_batch_length_bit_exact():
    want = [G.length(G.from_wkb(w)) if w is not None else None for w in ZOO]
    _assert_float_series_equal(GB.batch_length(ZOO), want)


def test_batch_spherical_length_bit_exact():
    want = [G.spherical_length(G.from_wkb(w)) if w is not None else None for w in ZOO]
    _assert_float_series_equal(GB.batch_spherical_length(ZOO), want)


def test_batch_npoints_bit_exact():
    want = [G.n_points(G.from_wkb(w)) if w is not None else 0 for w in ZOO]
    got = GB.batch_npoints(ZOO)
    assert got.tolist() == want


def test_batch_ngeoms_bit_exact():
    want = [G.num_geometries(G.from_wkb(w)) if w is not None else 0 for w in ZOO]
    got = GB.batch_ngeoms(ZOO)
    assert got.tolist() == want


def test_batch_geom_type_bit_exact():
    want = [G.geometry_type(G.from_wkb(w)) if w is not None else "NULL" for w in ZOO]
    got = GB.batch_geom_type(ZOO)
    assert got.tolist() == want


def test_batch_bbox_bit_exact():
    got = GB.batch_bbox(ZOO)
    for i, w in enumerate(ZOO):
        b = G.get_bbox(G.from_wkb(w)) if w is not None else None
        row = got.iloc[i]
        if b is None:
            assert row.isna().all(), i
        else:
            for col, v in zip(("min_x", "min_y", "max_x", "max_y"), b):
                if math.isnan(v):
                    assert math.isnan(row[col]), (i, col)
                else:
                    assert struct.pack("<d", row[col]) == struct.pack("<d", v), (i, col)


def _rows_where_scalar_ok(fn) -> list:
    """Zoo rows whose scalar path does not raise; rows where it DOES
    raise are asserted to raise identically on the batch path by
    test_scalar_raising_rows_raise_in_batch."""
    ok = []
    for w in ZOO:
        try:
            fn(G.from_wkb(w)) if w is not None else None
        except Exception:
            continue
        ok.append(w)
    return ok


def test_batch_centroid_xy_bit_exact():
    zoo = _rows_where_scalar_ok(G.centroid)
    got = GB.batch_centroid_xy(zoo)
    for i, w in enumerate(zoo):
        c = G.centroid(G.from_wkb(w)) if w is not None else None
        row = got.iloc[i]
        if c is None:
            assert row.isna().all(), i
        else:
            for col, v in zip(("x", "y"), c[1]):
                if isinstance(v, float) and math.isnan(v):
                    assert math.isnan(row[col]), (i, col)
                else:
                    assert struct.pack("<d", row[col]) == struct.pack("<d", v), (i, col)


def test_batch_reverse_bit_exact():
    want = [
        G.to_wkb(G.reverse(G.from_wkb(w))) if w is not None else None for w in ZOO
    ]
    got = GB.batch_reverse(ZOO)
    assert got.tolist() == want


@pytest.mark.parametrize("fwd", [True, False])
def test_batch_transform_bit_exact(fwd):
    fn = G.transform_4326_to_3857 if fwd else G.transform_3857_to_4326
    zoo = _rows_where_scalar_ok(fn)
    want = [G.to_wkb(fn(G.from_wkb(w))) if w is not None else None for w in zoo]
    got = GB._transform_batch(zoo, fwd=fwd)
    assert got.tolist() == want


def test_scalar_raising_rows_raise_in_batch():
    """Rows whose SCALAR kernel raises (0-point-line centroid, empty
    polygon centroid, empty multipoint transform) must raise on the
    batch path too — errors stay owned by the scalar semantics."""
    cases = [
        (GB.batch_centroid_xy, G.centroid),
        (lambda v: GB._transform_batch(v, fwd=True), G.transform_4326_to_3857),
    ]
    n_raising = 0
    for batch_fn, scalar_fn in cases:
        for w in ZOO:
            if w is None:
                continue
            try:
                scalar_fn(G.from_wkb(w))
                continue
            except Exception as e:
                want_type = type(e)
            n_raising += 1
            with pytest.raises(want_type):
                batch_fn([w])
    assert n_raising >= 3  # the zoo must keep exercising this seam


def test_batch_point_wkb_bit_exact():
    lon = pd.Series([1.5, None, float("nan"), -0.0, 179.9], dtype="float64")
    lat = pd.Series([-2.25, 3.0, 4.0, 0.0, -85.0], dtype="float64")
    for srid in (4326, 3857):
        srid_s = pd.Series([srid] * len(lon))
        want = []
        for x, y in zip(lon, lat):
            if pd.isna(x) or pd.isna(y):
                want.append(None)
                continue
            g = G.make_point(float(x), float(y))
            if srid == 3857:
                g = G.transform_4326_to_3857(g)
            want.append(G.to_wkb(g))
        got = GB.batch_point_wkb(lon, lat, srid_s)
        assert got.tolist() == want


def test_truncated_buffers_raise_like_scalar():
    """A linestring whose header count overruns the buffer must raise
    (the scalar frombuffer raises ValueError); the batch path routes
    it through the scalar fallback, preserving the error."""
    bad = b"\x01" + struct.pack("<I", 2) + struct.pack("<I", 99) + b"\x00" * 32
    with pytest.raises(ValueError):
        GB.batch_length([bad])
    with pytest.raises(ValueError):
        GB.batch_npoints([bad])


def test_mixed_batch_order_preserved():
    """Fast and fallback rows interleaved keep positional alignment."""
    rows = [
        G.to_wkb(("point", (1.0, 2.0))),
        _bswap_wkb_point(3.0, 4.0),
        G.to_wkb(("linestring", np.array([[0.0, 0.0], [3.0, 4.0]]))),
        None,
        G.to_wkb(("multipolygon", [[np.array(
            [[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0], [0.0, 0.0]]
        )]])),
    ]
    got = GB.batch_npoints(rows)
    assert got.tolist() == [1, 1, 2, 0, 5]
    gt = GB.batch_geom_type(rows)
    assert gt.tolist() == ["POINT", "POINT", "LINESTRING", "NULL", "MULTIPOLYGON"]


def test_reduction_identities():
    """Pins the three numpy reduction facts the batch design relies on
    (see functions/geombatch.py module docstring): contiguous-gather
    axis reductions are bit-identical to per-slice np.sum / .min(),
    for sums via the same pairwise algorithm, for min/max because the
    reduction is order-robust.  Runs on adversarial values (huge,
    tiny, denormal, signed zeros)."""
    rng = np.random.RandomState(3)
    pool = np.concatenate([
        rng.uniform(-1e300, 1e300, 1000), rng.uniform(-1, 1, 1000),
        np.full(50, 5e-324), np.full(50, -0.0), np.full(50, 0.0),
    ])
    rng.shuffle(pool)
    for c in (1, 2, 3, 5, 7, 8, 9, 16, 64, 127, 128, 129, 500):
        M = rng.choice(pool, (20, c)).astype("f8")
        s = M.sum(axis=1)
        for r in range(20):
            assert s[r].tobytes() == np.sum(M[r]).tobytes(), (c, r)
        M3 = rng.choice(pool, (20, c, 2)).astype("f8")
        s3 = M3.sum(axis=1)
        mn = M3.min(axis=1)
        for r in range(20):
            assert s3[r].tobytes() == M3[r].sum(axis=0).tobytes(), (c, r)
            assert mn[r, 0].tobytes() == M3[r][:, 0].min().tobytes(), (c, r)


def test_small_dot_identity():
    """Pins that numpy's tiny matvec/dot products carry no FMA: the
    2-element products batch_simplify vectorizes are bit-identical to
    the scalar _dp_mask's `rel @ seg` / `(diff * diff).sum(axis=1)`."""
    rng = np.random.RandomState(11)
    for _ in range(2000):
        a = rng.uniform(-1e6, 1e6, 2)
        b = rng.uniform(-1e6, 1e6, 2)
        manual = np.float64(a[0] * b[0] + a[1] * b[1])
        assert (a @ b).tobytes() == manual.tobytes()
        rel = a.reshape(1, 2)
        assert (rel @ b)[0].tobytes() == manual.tobytes()
        d = rel - np.outer(0.25, b)
        s_np = (d * d).sum(axis=1)[0]
        s_man = np.float64(d[0, 0] * d[0, 0] + d[0, 1] * d[0, 1])
        assert s_np.tobytes() == s_man.tobytes()


def _simp_zoo():
    rng = np.random.RandomState(5)
    rows = [None, b""]
    rows.append(G.to_wkb(("point", (1.0, 2.0))))
    rows.append(G.to_wkb(("linestring", np.array([[0.0, 0.0], [5.0, 0.0]]))))
    rows.append(G.to_wkb(("linestring", np.array([[7.0, 8.0]]))))       # 1-pt
    rows.append(G.to_wkb(("linestring", np.empty((0, 2)))))             # 0-pt
    # 3-pt: collinear (drop), big bend (keep), zero-length seg,
    # exactly-at-tolerance bend, NaN coords
    rows.append(G.to_wkb(("linestring", np.array([[0.0, 0.0], [2.0, 0.0], [4.0, 0.0]]))))
    rows.append(G.to_wkb(("linestring", np.array([[0.0, 0.0], [2.0, 3.0], [4.0, 0.0]]))))
    rows.append(G.to_wkb(("linestring", np.array([[1.0, 1.0], [2.0, 5.0], [1.0, 1.0]]))))
    rows.append(G.to_wkb(("linestring", np.array([[0.0, 0.0], [2.0, 0.1], [4.0, 0.0]]))))
    rows.append(G.to_wkb(("linestring", np.array([[0.0, 0.0], [np.nan, 1.0], [4.0, 0.0]]))))
    # longer lines -> scalar fallback inside the kernel
    rows.append(G.to_wkb(("linestring", rng.uniform(-10, 10, (9, 2)))))
    rows.append(G.to_wkb(("polygon", [np.array(
        [[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0], [0.0, 0.0]])])))
    rows.append(G.to_wkb(G.segmentize(("linestring",
        np.array([[0.0, 0.0], [3.0, 0.0]])), 0.7)))                     # multiline
    rows.append(_bswap_wkb_point(1.0, 2.0))
    return rows


@pytest.mark.parametrize("tol", [0.1, 0.0, 2.9, float("nan")])
def test_batch_simplify_bit_exact(tol):
    zoo = _simp_zoo()
    want = [
        G.to_wkb(G.simplify(G.from_wkb(w), tol)) if w is not None else None
        for w in zoo
    ]
    got = GB.batch_simplify(zoo, pd.Series([tol] * len(zoo), dtype="float64"))
    assert got.tolist() == want


@pytest.mark.parametrize("maxlen", [0.375, 0.7, 1.0, 100.0])
def test_batch_segmentize_bit_exact(maxlen):
    rng = np.random.RandomState(6)
    zoo = [None, b"", G.to_wkb(("point", (1.0, 2.0)))]
    # straight edges of assorted lengths/directions, incl. exactly
    # divisible (frac 1.0 -> final-piece skip), equal endpoints,
    # sub-maxlen edges, NaN coords
    for a, b in [((0.0, 0.0), (3.0, 0.0)), ((0.0, 0.0), (0.75, 0.0)),
                 ((1.0, 1.0), (1.0, 1.0)), ((0.0, 0.0), (0.2, 0.1)),
                 ((-5.0, 2.0), (7.0, -3.0)), ((0.0, 0.0), (float("nan"), 1.0))]:
        zoo.append(G.to_wkb(("linestring", np.array([a, b]))))
    for _ in range(20):
        zoo.append(G.to_wkb(("linestring", rng.uniform(-4, 4, (2, 2)))))
    # multi-point lines and multilinestrings -> scalar fallback
    zoo.append(G.to_wkb(("linestring", rng.uniform(-4, 4, (5, 2)))))
    zoo.append(G.to_wkb(G.segmentize(("linestring",
        np.array([[0.0, 0.0], [3.0, 0.0]])), 0.7)))
    zoo.append(G.to_wkb(("polygon", [np.array(
        [[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0], [0.0, 0.0]])])))
    want = [
        G.to_wkb(G.segmentize(G.from_wkb(w), maxlen)) if w is not None else None
        for w in zoo
    ]
    got = GB.batch_segmentize(zoo, pd.Series([maxlen] * len(zoo), dtype="float64"))
    assert got.tolist() == want


@pytest.mark.parametrize("frac", [0.25, 0.0, 1.0, -0.5, 2.0, float("nan")])
def test_batch_interpolate_bit_exact(frac):
    rng = np.random.RandomState(8)
    zoo = [None, b"", G.to_wkb(("point", (1.0, 2.0)))]
    for a, b in [((0.0, 0.0), (4.0, 4.0)), ((1.0, 1.0), (1.0, 1.0)),
                 ((-3.0, 2.0), (5.0, -1.0)), ((0.0, 0.0), (float("nan"), 1.0))]:
        zoo.append(G.to_wkb(("linestring", np.array([a, b]))))
    for _ in range(10):
        zoo.append(G.to_wkb(("linestring", rng.uniform(-9, 9, (2, 2)))))
    zoo.append(G.to_wkb(("linestring", rng.uniform(-9, 9, (6, 2)))))  # fallback
    zoo.append(G.to_wkb(("polygon", [np.array(
        [[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0], [0.0, 0.0]])])))
    got = GB.batch_interpolate_xy(zoo, pd.Series([frac] * len(zoo), dtype="float64"))
    for i, w in enumerate(zoo):
        p = G.interpolate(G.from_wkb(w), frac) if w is not None else None
        row = got.iloc[i]
        if p is None:
            assert row.isna().all(), i
        else:
            for col, v in zip(("x", "y"), p[1]):
                if isinstance(v, float) and math.isnan(v):
                    assert math.isnan(row[col]), (i, col)
                else:
                    assert struct.pack("<d", row[col]) == struct.pack("<d", v), (i, col, row[col], v)


def test_batch_distance_bit_exact():
    rng = np.random.RandomState(13)
    pt = lambda: G.to_wkb(("point", tuple(rng.uniform(-9, 9, 2))))
    line = G.to_wkb(("linestring", rng.uniform(-9, 9, (3, 2))))
    poly = G.to_wkb(("polygon", [np.array(
        [[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0], [0.0, 0.0]])]))
    pairs = [(pt(), pt()) for _ in range(20)]
    pairs += [(pt(), line), (line, poly), (poly, pt()), (None, pt()),
              (pt(), None), (b"", pt()),
              (G.to_wkb(("point", (float("nan"), 1.0))), pt()),
              (G.to_wkb(("point", (2.0, 2.0))), poly)]
    va = [a for a, _ in pairs]
    vb = [b for _, b in pairs]
    got = GB.batch_distance(va, vb)
    for i, (a, b) in enumerate(pairs):
        if a is None or b is None:
            assert math.isnan(got.iloc[i]), i
            continue
        want = G.distance(G.from_wkb(a), G.from_wkb(b))
        g = got.iloc[i]
        if math.isnan(want):
            assert math.isnan(g), i
        elif math.isinf(want):
            assert math.isinf(g), i
        else:
            assert struct.pack("<d", g) == struct.pack("<d", want), (i, g, want)


def test_batch_split_multi_bit_exact():
    want = [
        [G.to_wkb(g) for g in G.split_multi(G.from_wkb(w))]
        if w is not None
        else []
    for w in ZOO]
    got = GB.batch_split_multi(ZOO)
    assert got.tolist() == want


def test_batch_spherical_area_sphere_bit_exact():
    fn = lambda g: G.spherical_area(g, ellipsoid=False)
    zoo = _rows_where_scalar_ok(fn)
    want = [fn(G.from_wkb(w)) if w is not None else None for w in zoo]
    _assert_float_series_equal(GB.batch_spherical_area_sphere(zoo), want)
    # antimeridian-crossing ring exercises the dl wrap branch
    ring = np.array([[179.5, 10.0], [-179.5, 10.0], [-179.5, 11.0],
                     [179.5, 11.0], [179.5, 10.0]])
    w = G.to_wkb(("polygon", [ring]))
    got = GB.batch_spherical_area_sphere([w])
    assert struct.pack("<d", got.iloc[0]) == struct.pack("<d", fn(G.from_wkb(w)))
    # polygon with a hole
    sq = np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0], [0.0, 0.0]])
    hole = np.array([[1.0, 1.0], [2.0, 1.0], [2.0, 2.0], [1.0, 2.0], [1.0, 1.0]])
    w = G.to_wkb(("polygon", [sq, hole]))
    got = GB.batch_spherical_area_sphere([w])
    assert struct.pack("<d", got.iloc[0]) == struct.pack("<d", fn(G.from_wkb(w)))


def test_batch_multi_part_stats_matches_split_chain():
    """The fused (n_parts, part_points) kernel must equal the old
    Spark chain it replaces: split_multi -> explode -> npoints per
    part -> groupBy count(1)/max(np), with (None, None) exactly where
    the explode dropped the row (empty part array)."""
    got = GB.batch_multi_part_stats(ZOO)
    parts_col = GB.batch_split_multi(ZOO)
    for i in range(len(ZOO)):
        parts = parts_col.iloc[i]
        g_np = got["n_parts"].iloc[i]
        g_mx = got["part_points"].iloc[i]
        if not parts:  # explode drops the row
            assert pd.isna(g_np) and pd.isna(g_mx), i
            continue
        nps = GB.batch_npoints(parts).tolist()
        assert g_np == len(parts), (i, g_np, len(parts))
        assert g_mx == max(nps), (i, g_mx, nps)
