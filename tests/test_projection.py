"""Arbitrary-EPSG reprojection tests (functions/projection.py).

Reference parity target: the PROJ-backed generic projection
(/root/reference/src/reprojection-generic-proj6.cpp).  Vectors are
published worked examples: the Ordnance Survey's OSGB36 transverse-
Mercator example and the EPSG Guidance Note 7-2 LAEA example.
"""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from osm2pgsql_spark.functions.projection import (
    LaeaParams,
    TmercParams,
    epsg_params,
    laea_forward,
    laea_forward_sql,
    tmerc_forward,
    tmerc_forward_sql,
    tmerc_inverse,
    transform_epsg,
)


def test_osgb_worked_example():
    # OS "A guide to coordinate systems in Great Britain" worked
    # example: 52d39'27.2531"N 1d43'4.5177"E -> 651409.903, 313177.270
    lat = 52 + 39 / 60 + 27.2531 / 3600
    lon = 1 + 43 / 60 + 4.5177 / 3600
    e, n = tmerc_forward(np.array([lon]), np.array([lat]), epsg_params(27700))
    assert abs(e[0] - 651409.903) < 2e-3
    assert abs(n[0] - 313177.270) < 2e-3


def test_epsg_laea_example():
    # EPSG Guidance Note 7-2, method 9820 example (ETRS89-LAEA):
    # 50N 5E -> E 3962799.45, N 2999718.85
    e, n = laea_forward(np.array([5.0]), np.array([50.0]), epsg_params(3035))
    assert abs(e[0] - 3962799.45) < 5e-3
    assert abs(n[0] - 2999718.85) < 5e-3


def test_utm_central_meridian_and_scale():
    p = epsg_params(32632)
    assert isinstance(p, TmercParams) and p.lon0 == 9.0
    e, n = tmerc_forward(np.array([9.0]), np.array([45.0]), p)
    assert e[0] == pytest.approx(500000.0, abs=1e-6)
    # scale on the central meridian is k0: northing difference over a
    # small meridian arc == k0 * ellipsoidal arc length
    lat0, dlat = 45.0, 1e-4
    _, n2 = tmerc_forward(np.array([9.0]), np.array([lat0 + dlat]), p)
    a, inv_f = 6378137.0, 298.257223563
    f = 1 / inv_f
    e2 = f * (2 - f)
    s = math.sin(math.radians(lat0))
    m = a * (1 - e2) / (1 - e2 * s * s) ** 1.5  # meridional radius
    arc = m * math.radians(dlat)
    assert (n2[0] - n[0]) / arc == pytest.approx(0.9996, rel=1e-6)


def test_utm_south_and_registry_ranges():
    pn = epsg_params(32633)
    ps = epsg_params(32733)
    assert pn.lon0 == ps.lon0 == 15.0
    assert ps.fn == 10000000.0 and pn.fn == 0.0
    assert epsg_params(25832).lon0 == 9.0
    with pytest.raises(KeyError):
        epsg_params(99999)


def test_tmerc_roundtrip():
    p = epsg_params(25832)
    rng = np.random.RandomState(7)
    lons = 9.0 + rng.uniform(-6, 6, 200)
    lats = rng.uniform(-83, 83, 200)
    e, n = tmerc_forward(lons, lats, p)
    lo, la = tmerc_inverse(e, n, p)
    assert np.abs(lo - lons).max() < 1e-9
    assert np.abs(la - lats).max() < 1e-9


def test_tmerc_lat0_offset():
    # at the natural origin the projection must give exactly (FE, FN)
    p = epsg_params(27700)
    e, n = tmerc_forward(np.array([p.lon0]), np.array([p.lat0]), p)
    assert e[0] == pytest.approx(400000.0, abs=1e-6)
    assert n[0] == pytest.approx(-100000.0, abs=1e-6)


def test_sql_twin_matches_kernel():
    import duckdb

    rng = np.random.RandomState(11)
    lons = list(-2.0 + rng.uniform(-6, 6, 50))
    lats = list(rng.uniform(49, 61, 50))
    p = epsg_params(27700)
    e_np, n_np = tmerc_forward(np.array(lons), np.array(lats), p)
    esql, nsql = tmerc_forward_sql("lon", "lat", p)
    con = duckdb.connect()
    con.execute("CREATE TABLE pts(lon DOUBLE, lat DOUBLE)")
    con.executemany("INSERT INTO pts VALUES (?, ?)", list(zip(lons, lats)))
    rows = con.execute(f"SELECT {esql}, {nsql} FROM pts").fetchall()
    e_sql = np.array([r[0] for r in rows])
    n_sql = np.array([r[1] for r in rows])
    assert np.abs(e_sql - e_np).max() < 1e-6
    assert np.abs(n_sql - n_np).max() < 1e-6

    p3 = epsg_params(3035)
    e_np, n_np = laea_forward(np.array(lons), np.array(lats), p3)
    esql, nsql = laea_forward_sql("lon", "lat", p3)
    rows = con.execute(f"SELECT {esql}, {nsql} FROM pts").fetchall()
    assert np.abs(np.array([r[0] for r in rows]) - e_np).max() < 1e-6
    assert np.abs(np.array([r[1] for r in rows]) - n_np).max() < 1e-6


def test_transform_epsg_geometry_kinds():
    ls = ("linestring", np.array([[9.0, 45.0], [9.1, 45.1]]))
    out = transform_epsg(ls, 25832)
    assert out[0] == "linestring"
    assert out[1][0][0] == pytest.approx(500000.0, abs=1e-6)
    pt = transform_epsg(("point", (10.0, 50.0)), 3035)
    assert pt[0] == "point"
    e, n = laea_forward(np.array([10.0]), np.array([50.0]), epsg_params(3035))
    assert pt[1] == (pytest.approx(e[0]), pytest.approx(n[0]))


def test_wkb_transform_epsg_udf(spark):
    from osm2pgsql_spark.operators import geom_udfs

    df = spark.createDataFrame(
        [(1, 9.0, 45.0), (2, 12.5, 52.25)], "id long, lon double, lat double"
    )
    g = df.select(
        "id",
        geom_udfs.wkb_transform_epsg(
            geom_udfs.point_wkb(F.col("lon"), F.col("lat")), 25832
        ).alias("geom"),
    )
    b = geom_udfs.wkb_bbox(F.col("geom"))
    rows = {r["id"]: (r["e"], r["n"]) for r in g.select(
        "id", b["min_x"].alias("e"), b["min_y"].alias("n")).collect()}
    p = epsg_params(25832)
    e, n = tmerc_forward(np.array([9.0, 12.5]), np.array([45.0, 52.25]), p)
    assert rows[1][0] == pytest.approx(e[0]) and rows[1][1] == pytest.approx(n[0])
    assert rows[2][0] == pytest.approx(e[1]) and rows[2][1] == pytest.approx(n[1])


def test_lcc_properties_and_roundtrip():
    """LCC 2SP (EPSG 9802, Lambert-93): conformal-projection
    properties pin correctness without a memorized vector — scale
    factor is exactly 1 on both standard parallels, the projection is
    locally isotropic (conformal), the false origin maps to (FE, FN),
    and forward/inverse round-trips at machine precision."""
    from osm2pgsql_spark.functions.projection import lcc_forward, lcc_inverse

    p = epsg_params(2154)
    # false origin -> (FE, FN)
    e, n = lcc_forward(np.array([3.0]), np.array([46.5]), p)
    assert e[0] == pytest.approx(700000.0, abs=1e-6)
    assert n[0] == pytest.approx(6600000.0, abs=1e-6)

    # scale along each standard parallel == 1 (numeric derivative)
    a, inv_f = 6378137.0, 298.257222101
    f = 1 / inv_f
    e2 = f * (2 - f)
    for lat in (49.0, 44.0, 46.0):
        dlon = 1e-6
        x1, y1 = lcc_forward(np.array([3.0]), np.array([lat]), p)
        x2, y2 = lcc_forward(np.array([3.0 + dlon]), np.array([lat]), p)
        dist = math.hypot(x2[0] - x1[0], y2[0] - y1[0])
        s = math.sin(math.radians(lat))
        nu = a / math.sqrt(1 - e2 * s * s)
        arc = nu * math.cos(math.radians(lat)) * math.radians(dlon)
        k = dist / arc
        if lat in (49.0, 44.0):
            assert k == pytest.approx(1.0, abs=1e-9)
        else:
            assert k < 1.0  # between the parallels the cone undershoots

    # conformality: meridian scale == parallel scale away from origin
    lat, lon = 47.3, 5.7
    d = 1e-6
    x0, y0 = lcc_forward(np.array([lon]), np.array([lat]), p)
    xe, ye = lcc_forward(np.array([lon + d]), np.array([lat]), p)
    xn, yn = lcc_forward(np.array([lon]), np.array([lat + d]), p)
    s = math.sin(math.radians(lat))
    nu = a / math.sqrt(1 - e2 * s * s)
    rho = a * (1 - e2) / (1 - e2 * s * s) ** 1.5
    k_par = math.hypot(xe[0] - x0[0], ye[0] - y0[0]) / (
        nu * math.cos(math.radians(lat)) * math.radians(d)
    )
    k_mer = math.hypot(xn[0] - x0[0], yn[0] - y0[0]) / (rho * math.radians(d))
    assert k_par == pytest.approx(k_mer, rel=1e-6)

    # round-trip
    rng = np.random.RandomState(5)
    lons = 3.0 + rng.uniform(-8, 8, 100)
    lats = rng.uniform(41, 51.5, 100)
    E, N = lcc_forward(lons, lats, p)
    lo, la = lcc_inverse(E, N, p)
    assert np.abs(lo - lons).max() < 1e-9
    assert np.abs(la - lats).max() < 1e-9


def test_lcc_sql_twin_matches_kernel():
    import duckdb

    from osm2pgsql_spark.functions.projection import lcc_forward, lcc_forward_sql

    p = epsg_params(2154)
    rng = np.random.RandomState(13)
    lons = list(3.0 + rng.uniform(-6, 6, 40))
    lats = list(rng.uniform(42, 50, 40))
    e_np, n_np = lcc_forward(np.array(lons), np.array(lats), p)
    esql, nsql = lcc_forward_sql("lon", "lat", p)
    con = duckdb.connect()
    con.execute("CREATE TABLE pts(lon DOUBLE, lat DOUBLE)")
    con.executemany("INSERT INTO pts VALUES (?, ?)", list(zip(lons, lats)))
    rows = con.execute(f"SELECT {esql}, {nsql} FROM pts").fetchall()
    assert np.abs(np.array([r[0] for r in rows]) - e_np).max() < 1e-6
    assert np.abs(np.array([r[1] for r in rows]) - n_np).max() < 1e-6


def test_sterea_epsg_worked_example():
    """EPSG Guidance Note 7-2, Amersfoort / RD New: 53N 6E ->
    E 196105.283, N 557057.739 (to the mm)."""
    import numpy as np

    from osm2pgsql_spark.functions import projection as PJ

    p = PJ.epsg_params(28992)
    E, N = PJ.sterea_forward(np.array([6.0]), np.array([53.0]), p)
    assert abs(E[0] - 196105.283) < 2e-3
    assert abs(N[0] - 557057.739) < 2e-3
    # natural origin maps exactly to (FE, FN)
    E0, N0 = PJ.sterea_forward(np.array([p.lon0]), np.array([p.lat0]), p)
    assert abs(E0[0] - 155000.0) < 1e-6 and abs(N0[0] - 463000.0) < 1e-6


def test_sterea_conformal_and_roundtrip():
    """Stereographic is conformal: local scale isotropic (dE/dlon,
    dN/dlon) ⟂ (dE/dlat, dN/dlat) with equal norms per unit arc."""
    import numpy as np

    from osm2pgsql_spark.functions import projection as PJ

    p = PJ.epsg_params(28992)
    rng = np.random.default_rng(2)
    lon = rng.uniform(3.5, 7.0, 100)
    lat = rng.uniform(50.5, 53.5, 100)
    h = 1e-7
    E, N = PJ.sterea_forward(lon, lat, p)
    Ex, Nx = PJ.sterea_forward(lon + h, lat, p)
    Ey, Ny = PJ.sterea_forward(lon, lat + h, p)
    # per-degree derivative vectors
    ux, uy = (Ex - E) / h, (Nx - N) / h
    vx, vy = (Ey - E) / h, (Ny - N) / h
    # orthogonality
    dot = np.abs(ux * vx + uy * vy) / (np.hypot(ux, uy) * np.hypot(vx, vy))
    assert dot.max() < 1e-4
    # isotropy: scale along meridian == scale along parallel, once the
    # ellipsoidal arc lengths (M dphi vs nu cos(phi) dlam) divide out
    e2 = p.e**2
    s = np.sin(np.radians(lat))
    M = p.a * (1 - e2) / (1 - e2 * s * s) ** 1.5
    nu = p.a / np.sqrt(1 - e2 * s * s)
    k_par = np.hypot(ux, uy) / (nu * np.cos(np.radians(lat)))
    k_mer = np.hypot(vx, vy) / M
    assert np.abs(k_par / k_mer - 1).max() < 1e-4

    lo, la = PJ.sterea_inverse(E, N, p)
    assert np.abs(lo - lon).max() < 1e-9
    assert np.abs(la - lat).max() < 1e-9


def test_albers_equal_area_property_and_roundtrip():
    """Albers is equal-area: the forward Jacobian must equal the
    ellipsoidal area element everywhere (5070 north, 3577 south)."""
    import numpy as np

    from osm2pgsql_spark.functions import projection as PJ

    for code, lon_rng, lat_rng in (
        (5070, (-120, -75), (25, 48)),
        (3577, (115, 150), (-40, -12)),
        (3310, (-124, -114), (32, 42)),
    ):
        p = PJ.epsg_params(code)
        rng = np.random.default_rng(code)
        lon = rng.uniform(*lon_rng, 60)
        lat = rng.uniform(*lat_rng, 60)
        h = 1e-6
        E, N = PJ.albers_forward(lon, lat, p)
        Ex, Nx = PJ.albers_forward(lon + h, lat, p)
        Ey, Ny = PJ.albers_forward(lon, lat + h, p)
        J = ((Ex - E) * (Ny - N) - (Ey - E) * (Nx - N)) / np.radians(h) ** 2
        e2 = p.e**2
        s = np.sin(np.radians(lat))
        area_el = p.a**2 * (1 - e2) * np.cos(np.radians(lat)) / (1 - e2 * s * s) ** 2
        assert np.abs(J / area_el - 1).max() < 1e-6
        lo, la = PJ.albers_inverse(E, N, p)
        assert np.abs(lo - lon).max() < 1e-9
        assert np.abs(la - lat).max() < 1e-9


def test_albers_sterea_sql_twins_match_kernel():
    import duckdb
    import numpy as np

    from osm2pgsql_spark.functions import projection as PJ

    con = duckdb.connect()
    for code, fwd, sql_fn, lon0, lat0 in (
        (5070, PJ.albers_forward, PJ.albers_forward_sql, -96.0, 38.0),
        (3577, PJ.albers_forward, PJ.albers_forward_sql, 132.0, -25.0),
        (28992, PJ.sterea_forward, PJ.sterea_forward_sql, 5.5, 52.0),
    ):
        p = PJ.epsg_params(code)
        lon = np.linspace(lon0 - 2.0, lon0 + 2.0, 21)
        lat = np.full_like(lon, lat0) + np.linspace(-1.5, 1.5, 21)
        E, N = fwd(lon, lat, p)
        e_sql, n_sql = sql_fn("lon", "lat", p)
        con.execute("CREATE OR REPLACE TABLE pts (lon DOUBLE, lat DOUBLE)")
        con.executemany("INSERT INTO pts VALUES (?, ?)", list(zip(lon, lat)))
        got = con.execute(f"SELECT {e_sql}, {n_sql} FROM pts").fetchnumpy()
        ge = np.array(got[list(got)[0]])
        gn = np.array(got[list(got)[1]])
        assert np.abs(ge - E).max() < 1e-4, code
        assert np.abs(gn - N).max() < 1e-4, code


def test_hom_borneo_worked_example():
    """EPSG Guidance Note 7-2 §3.2.6 worked example (Hotine Oblique
    Mercator variant B): Timbalai 1948 / RSO Borneo (m), 29873.
    5°23'14.1129"N 115°48'19.8196"E -> E 679245.73, N 596562.78."""
    from osm2pgsql_spark.functions import projection as PJ

    p = PJ.epsg_params(29873)
    lat = 5 + 23 / 60 + 14.1129 / 3600
    lon = 115 + 48 / 60 + 19.8196 / 3600
    E, N = PJ.hom_forward(np.array([lon]), np.array([lat]), p)
    assert abs(E[0] - 679245.73) < 5e-3
    assert abs(N[0] - 596562.78) < 5e-3


def test_hom_swiss_grids():
    """CH1903 / LV03 (21781) and CH1903+ / LV95 (2056) as HOM B with
    alpha = gamma = 90: the projection centre maps exactly to
    (FE, FN), and swisstopo's published Rigi check point
    (47°03'28.95602"N 8°29'11.11127"E -> 679520.05 / 212273.44)
    reproduces to < 2 cm (the documented divergence of the EPSG HOM
    approximation from the exact Swiss double projection away from
    the centre line — easting is sub-mm)."""
    from osm2pgsql_spark.functions import projection as PJ

    p03 = PJ.epsg_params(21781)
    E0, N0 = PJ.hom_forward(np.array([p03.lonc]), np.array([p03.latc]), p03)
    assert abs(E0[0] - 600000.0) < 1e-6 and abs(N0[0] - 200000.0) < 1e-6

    lat = 47 + 3 / 60 + 28.95602 / 3600
    lon = 8 + 29 / 60 + 11.11127 / 3600
    E, N = PJ.hom_forward(np.array([lon]), np.array([lat]), p03)
    assert abs(E[0] - 679520.05) < 2e-3
    assert abs(N[0] - 212273.44) < 2e-2

    # LV95 = LV03 + (2000000, 1000000) exactly (same projection)
    p95 = PJ.epsg_params(2056)
    E9, N9 = PJ.hom_forward(np.array([lon]), np.array([lat]), p95)
    assert E9[0] - E[0] == pytest.approx(2000000.0, abs=1e-9)
    assert N9[0] - N[0] == pytest.approx(1000000.0, abs=1e-9)


def test_hom_conformal_and_roundtrip():
    """HOM is conformal: local isotropy + orthogonality; and
    forward/inverse round-trips at machine precision over both the
    skew (29873) and the alpha=90 (21781) variants."""
    from osm2pgsql_spark.functions import projection as PJ

    for code, lon_rng, lat_rng in (
        (29873, (109.5, 119.5), (0.8, 7.5)),
        (21781, (6.0, 10.5), (45.8, 47.8)),
    ):
        p = PJ.epsg_params(code)
        rng = np.random.default_rng(code)
        lon = rng.uniform(*lon_rng, 120)
        lat = rng.uniform(*lat_rng, 120)
        h = 1e-7
        E, N = PJ.hom_forward(lon, lat, p)
        Ex, Nx = PJ.hom_forward(lon + h, lat, p)
        Ey, Ny = PJ.hom_forward(lon, lat + h, p)
        ux, uy = (Ex - E) / h, (Nx - N) / h
        vx, vy = (Ey - E) / h, (Ny - N) / h
        dot = np.abs(ux * vx + uy * vy) / (np.hypot(ux, uy) * np.hypot(vx, vy))
        assert dot.max() < 1e-4, code
        e2 = p.e ** 2
        s = np.sin(np.radians(lat))
        M = p.a * (1 - e2) / (1 - e2 * s * s) ** 1.5
        nu = p.a / np.sqrt(1 - e2 * s * s)
        k_par = np.hypot(ux, uy) / (nu * np.cos(np.radians(lat)))
        k_mer = np.hypot(vx, vy) / M
        assert np.abs(k_par / k_mer - 1).max() < 1e-4, code
        lo, la = PJ.hom_inverse(E, N, p)
        assert np.abs(lo - lon).max() < 1e-9
        assert np.abs(la - lat).max() < 1e-9


def test_hom_sql_twin_matches_kernel():
    import duckdb

    from osm2pgsql_spark.functions import projection as PJ

    con = duckdb.connect()
    for code, lon0, lat0 in ((29873, 115.0, 4.0), (2056, 8.2, 46.8)):
        p = PJ.epsg_params(code)
        lon = np.linspace(lon0 - 2.0, lon0 + 2.0, 21)
        lat = np.full_like(lon, lat0) + np.linspace(-1.0, 1.0, 21)
        E, N = PJ.hom_forward(lon, lat, p)
        e_sql, n_sql = PJ.hom_forward_sql("lon", "lat", p)
        con.execute("CREATE OR REPLACE TABLE pts (lon DOUBLE, lat DOUBLE)")
        con.executemany("INSERT INTO pts VALUES (?, ?)", list(zip(lon, lat)))
        got = con.execute(f"SELECT {e_sql}, {n_sql} FROM pts").fetchnumpy()
        cols = list(got)
        assert np.abs(np.array(got[cols[0]]) - E).max() < 1e-4, code
        assert np.abs(np.array(got[cols[1]]) - N).max() < 1e-4, code


def test_registry_tail_round10():
    """Round-10 registry rows resolve and behave: Belgian Lambert 72
    (31370, false origin at the pole), Irish TM/grids, NZTM, Maryland,
    BC Albers, GK zone ranges — each pinned by a family-level
    invariant (exactness at the natural/false origin or on the
    central meridian; GK zone numbering)."""
    from osm2pgsql_spark.functions import projection as PJ

    # 31370: central meridian maps to E = FE; pole (false origin) to FN
    p = PJ.epsg_params(31370)
    E, N = PJ.lcc_forward(np.array([p.lon0, p.lon0]),
                          np.array([50.5, 90.0]), p)
    assert E[0] == pytest.approx(150000.013, abs=1e-6)
    assert E[1] == pytest.approx(150000.013, abs=1e-6)
    assert N[1] == pytest.approx(5400088.438, abs=1e-6)
    # scale == 1 on both standard parallels (parameter self-consistency)
    a, e2 = p.a, p.e ** 2
    for lat in (51 + 10 / 60 + 0.00204 / 3600, 49 + 50 / 60 + 0.00204 / 3600):
        d = 1e-6
        x1, y1 = PJ.lcc_forward(np.array([4.0]), np.array([lat]), p)
        x2, y2 = PJ.lcc_forward(np.array([4.0 + d]), np.array([lat]), p)
        s = math.sin(math.radians(lat))
        nu = a / math.sqrt(1 - e2 * s * s)
        arc = nu * math.cos(math.radians(lat)) * math.radians(d)
        assert math.hypot(x2[0] - x1[0], y2[0] - y1[0]) / arc == \
            pytest.approx(1.0, abs=1e-9)

    # Irish ITM / Irish Grid / NZTM: natural-origin exactness
    for code, fe, fn in ((2157, 600000.0, 750000.0),
                         (29902, 200000.0, 250000.0),
                         (2193, 1600000.0, 10000000.0)):
        q = PJ.epsg_params(code)
        E, N = PJ.tmerc_forward(np.array([q.lon0]), np.array([q.lat0]), q)
        assert E[0] == pytest.approx(fe, abs=1e-6), code
        assert N[0] == pytest.approx(fn, abs=1e-6), code

    # Maryland LCC + BC Albers resolve to the right families
    assert PJ.epsg_params(26985).lon0 == -77.0
    assert PJ.epsg_params(3005).fe == 1000000.0

    # GK ranges: DHDN zone 4 (31468) lon0 12 FE 4.5e6; Pulkovo zone 10
    g = PJ.epsg_params(31468)
    assert g.lon0 == 12.0 and g.fe == 4500000.0 and g.k0 == 1.0
    g = PJ.epsg_params(28410)
    assert g.lon0 == 57.0 and g.fe == 10500000.0

    # the unsupported error now enumerates the registry
    with pytest.raises(KeyError, match="31370"):
        PJ.epsg_params(99999)


def test_transform_epsg_hom_dispatch():
    from osm2pgsql_spark.functions import projection as PJ

    out = PJ.transform_epsg(("point", (8.5, 47.0)), 2056)
    assert out[0] == "point"
    E, N = PJ.hom_forward(np.array([8.5]), np.array([47.0]),
                          PJ.epsg_params(2056))
    assert out[1] == (pytest.approx(E[0]), pytest.approx(N[0]))


def test_lcc1sp_jamaica_worked_example():
    """EPSG GN7-2 §3.1.1 (Lambert Conic Conformal 1SP): Jamaica 1969 /
    Jamaica National Grid (24200).  17°55'55.8"N 76°56'37.26"W ->
    E 255966.58, N 142493.51."""
    from osm2pgsql_spark.functions import projection as PJ

    p = PJ.epsg_params(24200)
    lat = 17 + 55 / 60 + 55.80 / 3600
    lon = -(76 + 56 / 60 + 37.26 / 3600)
    E, N = PJ.lcc_forward(np.array([lon]), np.array([lat]), p)
    assert abs(E[0] - 255966.58) < 5e-3
    assert abs(N[0] - 142493.51) < 5e-3
    lo, la = PJ.lcc_inverse(E, N, p)
    assert abs(lo[0] - lon) < 1e-9 and abs(la[0] - lat) < 1e-9


def test_polar_stereographic_ups_worked_example():
    """EPSG GN7-2 §3.1.6 variant A: WGS84 / UPS North (32661).
    73N 44E -> E 3320416.75, N 632668.43."""
    from osm2pgsql_spark.functions import projection as PJ

    p = PJ.epsg_params(32661)
    E, N = PJ.polar_forward(np.array([44.0]), np.array([73.0]), p)
    assert abs(E[0] - 3320416.75) < 5e-3
    assert abs(N[0] - 632668.43) < 5e-3
    # pole maps exactly to (FE, FN); UPS South mirrors
    E0, N0 = PJ.polar_forward(np.array([0.0]), np.array([90.0]), p)
    assert abs(E0[0] - 2000000.0) < 1e-6 and abs(N0[0] - 2000000.0) < 1e-6
    ps = PJ.epsg_params(32761)
    E1, N1 = PJ.polar_forward(np.array([44.0]), np.array([-73.0]), ps)
    assert abs(E1[0] - E[0]) < 1e-6  # symmetric easting
    assert abs((N1[0] - 2000000.0) + (N[0] - 2000000.0)) < 1e-6


def test_polar_stereographic_variant_b_standard_parallel():
    """Variant B (9829): scale == 1 exactly on the standard parallel
    (3031 at 71S, 3413 at 70N) and < 1 poleward of it — the defining
    property, pinned without a memorized vector."""
    from osm2pgsql_spark.functions import projection as PJ

    h = 1e-7
    for code, lat_ts, probe in ((3031, -71.0, -80.0), (3413, 70.0, 80.0)):
        p = PJ.epsg_params(code)
        for lat0, want_one in ((lat_ts, True), (probe, False)):
            E1, N1 = PJ.polar_forward(np.array([30.0]), np.array([lat0]), p)
            E2, N2 = PJ.polar_forward(np.array([30.0 + h]), np.array([lat0]), p)
            e2 = p.e ** 2
            s = math.sin(math.radians(lat0))
            nu = p.a / math.sqrt(1 - e2 * s * s)
            arc = nu * math.cos(math.radians(lat0)) * math.radians(h)
            k = math.hypot(E2[0] - E1[0], N2[0] - N1[0]) / arc
            if want_one:
                # 1e-6: numeric-derivative cancellation at h=1e-7 deg;
                # a wrong lat_ts would move k by ~1e-3
                assert k == pytest.approx(1.0, abs=1e-6), code
            else:
                assert k < 1.0, code
        # round-trip incl. the pole-adjacent belt
        rng = np.random.default_rng(code)
        lon = rng.uniform(-179, 179, 150)
        lat = rng.uniform(*((-89.9, -60) if code == 3031 else (60, 89.9)), 150)
        E, N = PJ.polar_forward(lon, lat, p)
        lo, la = PJ.polar_inverse(E, N, p)
        dl = np.abs((lo - lon + 180) % 360 - 180)
        assert dl.max() < 1e-9 and np.abs(la - lat).max() < 1e-9


def test_mercator_worked_example_and_invariants():
    """EPSG GN7-2 §3.1.3 variant A: Makassar / NEIEZ (3002).
    3S 120E -> E 5009726.58, N 569150.82.  World Mercator (3395):
    scale k0 exactly on the equator, round-trip to 84N."""
    from osm2pgsql_spark.functions import projection as PJ

    p = PJ.epsg_params(3002)
    E, N = PJ.merc_forward(np.array([120.0]), np.array([-3.0]), p)
    assert abs(E[0] - 5009726.58) < 5e-3
    assert abs(N[0] - 569150.82) < 5e-3

    w = PJ.epsg_params(3395)
    # equator scale: dE/dlon per unit arc == 1 (k0 = 1)
    h = 1e-7
    E1, _ = PJ.merc_forward(np.array([10.0]), np.array([0.0]), w)
    E2, _ = PJ.merc_forward(np.array([10.0 + h]), np.array([0.0]), w)
    assert (E2[0] - E1[0]) / (w.a * math.radians(h)) == \
        pytest.approx(1.0, abs=1e-7)
    rng = np.random.default_rng(5)
    lon = rng.uniform(-179, 179, 200)
    lat = rng.uniform(-84, 84, 200)
    E, N = PJ.merc_forward(lon, lat, w)
    lo, la = PJ.merc_inverse(E, N, w)
    assert np.abs(lo - lon).max() < 1e-9
    assert np.abs(la - lat).max() < 1e-9


def test_polar_merc_lcc1_sql_twins_match_kernel():
    import duckdb

    from osm2pgsql_spark.functions import projection as PJ

    con = duckdb.connect()
    cases = [
        (24200, PJ.lcc_forward, PJ.lcc_forward_sql, (-78.5, -76.2), (17.7, 18.5)),
        (3031, PJ.polar_forward, PJ.polar_forward_sql, (-170, 170), (-88, -61)),
        (32661, PJ.polar_forward, PJ.polar_forward_sql, (-170, 170), (61, 88)),
        (3395, PJ.merc_forward, PJ.merc_forward_sql, (-179, 179), (-80, 80)),
    ]
    for code, fwd, sql_fn, lon_rng, lat_rng in cases:
        p = PJ.epsg_params(code)
        rng = np.random.default_rng(code)
        lon = rng.uniform(*lon_rng, 40)
        lat = rng.uniform(*lat_rng, 40)
        E, N = fwd(lon, lat, p)
        e_sql, n_sql = sql_fn("lon", "lat", p)
        con.execute("CREATE OR REPLACE TABLE pts (lon DOUBLE, lat DOUBLE)")
        con.executemany("INSERT INTO pts VALUES (?, ?)",
                        list(zip(lon, lat)))
        got = con.execute(f"SELECT {e_sql}, {n_sql} FROM pts").fetchnumpy()
        cols = list(got)
        assert np.abs(np.array(got[cols[0]]) - E).max() < 1e-4, code
        assert np.abs(np.array(got[cols[1]]) - N).max() < 1e-4, code


from osm2pgsql_spark.functions import projection as PJ  # noqa: E402


def test_tmso_south_african_lo_grids():
    """TM South Orientated (EPSG 9808, Hartebeesthoek94 Lo15-Lo33
    2046-2055): westing/southing axes — W = FE - E0, S = FN - N0 on
    the zero-false-origin 9807 twin (GN7-2 §3.2.2; Lo grids publish
    FE = FN = 0).  The 9807 kernel itself is worked-example-pinned,
    so the family check is the definitional relation + geometry."""
    import numpy as np

    p = PJ.epsg_params(2048)  # Lo19
    assert isinstance(p, PJ.TmSoParams)
    assert p.lon0 == 19.0 and p.fe == 0.0 and p.fn == 0.0 and p.k0 == 1.0
    # zone ends: Lo15 and Lo33
    assert PJ.epsg_params(2046).lon0 == 15.0
    assert PJ.epsg_params(2055).lon0 == 33.0

    lon = np.array([18.4239, 19.0, 20.5])
    lat = np.array([-33.9253, -30.0, -28.75])
    W, S = PJ.forward_xy(lon, lat, p)
    e0, n0 = PJ.tmerc_forward(lon, lat, p.tm0)
    assert np.array_equal(W, -e0) and np.array_equal(S, -n0)
    # axis geometry: west of the CM -> positive westing; the southern
    # hemisphere -> positive southing; on the CM -> W = 0
    assert W[0] > 0 and S[0] > 0
    assert W[1] == 0.0
    assert W[2] < 0  # east of CM
    # exact-ish round trip
    lo, la = PJ.tmso_inverse(W, S, p)
    assert np.allclose(lo, lon, atol=1e-9)
    assert np.allclose(la, lat, atol=1e-9)


def test_tmso_sql_twin_matches_kernel():
    import duckdb
    import numpy as np

    p = PJ.epsg_params(2051)  # Lo25
    lon, lat = 24.1, -29.3
    e_sql, n_sql = PJ.tmso_forward_sql(str(lon), str(lat), p)
    got = duckdb.connect().execute(
        f"SELECT {e_sql}, {n_sql}").fetchone()
    W, S = PJ.forward_xy(np.array([lon]), np.array([lat]), p)
    assert abs(got[0] - W[0]) < 1e-6
    assert abs(got[1] - S[0]) < 1e-6


def test_krovak_gn72_worked_example():
    """Krovak (EPSG 9819) pinned to the GN7-2 worked example:
    phi 50d12'32.4416"N, lambda 16d50'59.1790"E of Greenwich ->
    southing 1050538.643, westing 568990.997 (S-JTSK, Bessel; the
    reference reaches 5514/2065 via PROJ,
    src/reprojection-generic-proj6.cpp)."""
    lat = np.array([50 + 12 / 60 + 32.4416 / 3600])
    lon = np.array([16 + 50 / 60 + 59.1790 / 3600])
    p = PJ.epsg_params(2065)
    assert isinstance(p, PJ.KrovakParams)
    W, S = PJ.forward_xy(lon, lat, p)
    assert W[0] == pytest.approx(568990.997, abs=5e-3)
    assert S[0] == pytest.approx(1050538.643, abs=5e-3)
    # 5514 (East North): negated axes, same magnitudes
    x, y = PJ.forward_xy(lon, lat, PJ.epsg_params(5514))
    assert x[0] == pytest.approx(-W[0], abs=1e-9)
    assert y[0] == pytest.approx(-S[0], abs=1e-9)


def test_krovak_roundtrip_and_conformality():
    """Round-trip over the Czech/Slovak belt < 1e-9 deg; local scale
    isotropy (conformal projection) to 1e-7."""
    rng = np.random.default_rng(11)
    lon = rng.uniform(12.0, 22.5, 60)
    lat = rng.uniform(47.7, 51.0, 60)
    for code in (5514, 2065):
        p = PJ.epsg_params(code)
        x, y = PJ.krovak_forward(lon, lat, p)
        lo, la = PJ.krovak_inverse(x, y, p)
        assert np.abs(lo - lon).max() < 1e-9
        assert np.abs(la - lat).max() < 1e-9
    # conformal: scale east-west == scale north-south at a point
    # (central differences at d=1e-5 deg: one-sided 1e-7 steps sit in
    # float cancellation noise on ~1e6-magnitude coordinates)
    p = PJ.epsg_params(5514)
    d = 1e-5
    for lon0, lat0 in ((14.42, 50.09), (17.11, 48.15), (21.25, 48.72)):
        xe1, ye1 = PJ.krovak_forward(np.array([lon0 - d]), np.array([lat0]), p)
        xe2, ye2 = PJ.krovak_forward(np.array([lon0 + d]), np.array([lat0]), p)
        xn1, yn1 = PJ.krovak_forward(np.array([lon0]), np.array([lat0 - d]), p)
        xn2, yn2 = PJ.krovak_forward(np.array([lon0]), np.array([lat0 + d]), p)
        a, e2 = p.a, p.e ** 2
        s = math.sin(math.radians(lat0))
        nu = a / math.sqrt(1 - e2 * s * s)
        rho = a * (1 - e2) / (1 - e2 * s * s) ** 1.5
        k_ew = math.hypot(xe2[0] - xe1[0], ye2[0] - ye1[0]) / (
            nu * math.cos(math.radians(lat0)) * math.radians(2 * d))
        k_ns = math.hypot(xn2[0] - xn1[0], yn2[0] - yn1[0]) / (
            rho * math.radians(2 * d))
        assert k_ew == pytest.approx(k_ns, rel=1e-7)


def test_cassini_gn72_worked_example():
    """Cassini-Soldner (EPSG 9806) pinned to the GN7-2 worked example
    (Trinidad 1903 / Trinidad Grid, Clarke 1858, Clarke's links):
    phi 10N, lambda 62W -> E 66644.94, N 82536.22 links."""
    p = PJ.epsg_params(30200)
    assert isinstance(p, PJ.CassiniParams)
    E, N = PJ.forward_xy(np.array([-62.0]), np.array([10.0]), p)
    assert E[0] == pytest.approx(66644.94, abs=5e-3)
    assert N[0] == pytest.approx(82536.22, abs=5e-3)
    lo, la = PJ.cassini_inverse(E, N, p)
    assert lo[0] == pytest.approx(-62.0, abs=1e-9)
    assert la[0] == pytest.approx(10.0, abs=1e-9)


def test_cassini_palestine_grid_properties():
    """Palestine 1923 / Palestine Grid (28191): natural origin maps to
    the false origin exactly; round-trip < 1e-9 deg over the belt;
    scale along the central meridian == 1 (Cassini's defining
    property: true scale along the CM)."""
    p = PJ.epsg_params(28191)
    E, N = PJ.cassini_forward(np.array([p.lon0]), np.array([p.lat0]), p)
    assert E[0] == pytest.approx(p.fe, abs=1e-9)
    assert N[0] == pytest.approx(p.fn, abs=1e-9)
    rng = np.random.default_rng(12)
    lon = rng.uniform(34.2, 35.9, 60)
    lat = rng.uniform(29.5, 33.3, 60)
    E, N = PJ.cassini_forward(lon, lat, p)
    lo, la = PJ.cassini_inverse(E, N, p)
    assert np.abs(lo - lon).max() < 1e-9
    assert np.abs(la - lat).max() < 1e-9
    # true scale along the central meridian (central difference — a
    # small one-sided step sits in float cancellation noise)
    d = 1e-4
    x1, y1 = PJ.cassini_forward(np.array([p.lon0]), np.array([31.0 - d]), p)
    x2, y2 = PJ.cassini_forward(np.array([p.lon0]), np.array([31.0 + d]), p)
    a, e2 = p.a, p.e ** 2
    s = math.sin(math.radians(31.0))
    rho = a * (1 - e2) / (1 - e2 * s * s) ** 1.5
    assert math.hypot(x2[0] - x1[0], y2[0] - y1[0]) / (
        rho * math.radians(2 * d)) == pytest.approx(1.0, abs=1e-8)


def test_krovak_cassini_sql_twins_match_kernel():
    import duckdb

    con = duckdb.connect()
    rng = np.random.default_rng(13)
    cases = [
        (5514, PJ.krovak_forward, PJ.krovak_forward_sql, (12.0, 19.0), (48.5, 51.0)),
        (2065, PJ.krovak_forward, PJ.krovak_forward_sql, (12.0, 19.0), (48.5, 51.0)),
        (28191, PJ.cassini_forward, PJ.cassini_forward_sql, (34.0, 36.0), (29.5, 33.3)),
        (30200, PJ.cassini_forward, PJ.cassini_forward_sql, (-62.0, -60.9), (10.0, 11.0)),
    ]
    for code, fwd, sql_fn, lon_rng, lat_rng in cases:
        p = PJ.epsg_params(code)
        lon = rng.uniform(*lon_rng, 40)
        lat = rng.uniform(*lat_rng, 40)
        E, N = fwd(lon, lat, p)
        e_sql, n_sql = sql_fn("lon", "lat", p)
        con.execute("CREATE OR REPLACE TABLE pts (lon DOUBLE, lat DOUBLE)")
        con.executemany("INSERT INTO pts VALUES (?, ?)",
                        list(zip(lon, lat)))
        got = con.execute(f"SELECT {e_sql}, {n_sql} FROM pts").fetchnumpy()
        cols = list(got)
        assert np.abs(np.array(got[cols[0]]) - E).max() < 1e-4, code
        assert np.abs(np.array(got[cols[1]]) - N).max() < 1e-4, code


def test_nzmg_physical_invariants():
    """New Zealand Map Grid (EPSG 9811, 27200 — the published LINZ
    series constants).  No GN7-2 worked example is available in this
    container, so the pin is the projection's defining physical
    properties: exactness at the (173E, 41S) origin, scale inside
    NZMG's designed +-0.02% band across New Zealand, conformality
    (complex-analytic by construction — checked numerically), and
    round-trip < 1e-9 deg."""
    p = PJ.epsg_params(27200)
    assert isinstance(p, PJ.NzmgParams)
    E, N = PJ.forward_xy(np.array([173.0]), np.array([-41.0]), p)
    assert E[0] == pytest.approx(2510000.0, abs=1e-6)
    assert N[0] == pytest.approx(6023150.0, abs=1e-6)

    a, e2 = p.a, p.e ** 2
    d = 1e-5
    for lon0, lat0 in ((174.77, -36.85), (174.78, -41.29),
                       (172.64, -43.53), (168.66, -45.03),
                       (178.0, -37.7)):
        xe1, ye1 = PJ.nzmg_forward(np.array([lon0 - d]), np.array([lat0]), p)
        xe2, ye2 = PJ.nzmg_forward(np.array([lon0 + d]), np.array([lat0]), p)
        xn1, yn1 = PJ.nzmg_forward(np.array([lon0]), np.array([lat0 - d]), p)
        xn2, yn2 = PJ.nzmg_forward(np.array([lon0]), np.array([lat0 + d]), p)
        s = math.sin(math.radians(lat0))
        nu = a / math.sqrt(1 - e2 * s * s)
        rho = a * (1 - e2) / (1 - e2 * s * s) ** 1.5
        k_ew = math.hypot(xe2[0] - xe1[0], ye2[0] - ye1[0]) / (
            nu * math.cos(math.radians(lat0)) * math.radians(2 * d))
        k_ns = math.hypot(xn2[0] - xn1[0], yn2[0] - yn1[0]) / (
            rho * math.radians(2 * d))
        assert k_ew == pytest.approx(k_ns, rel=1e-7), (lon0, lat0)
        assert 0.9997 < k_ew < 1.0003, (lon0, lat0, k_ew)

    rng = np.random.default_rng(14)
    lon = rng.uniform(166.5, 178.5, 80)
    lat = rng.uniform(-47.0, -34.5, 80)
    E, N = PJ.nzmg_forward(lon, lat, p)
    lo, la = PJ.nzmg_inverse(E, N, p)
    assert np.abs(lo - lon).max() < 1e-9
    assert np.abs(la - lat).max() < 1e-9


def test_nzmg_sql_twin_matches_kernel():
    import duckdb

    p = PJ.epsg_params(27200)
    rng = np.random.default_rng(15)
    lon = rng.uniform(167.0, 178.0, 40)
    lat = rng.uniform(-46.5, -35.0, 40)
    E, N = PJ.nzmg_forward(lon, lat, p)
    e_sql, n_sql = PJ.nzmg_forward_sql("lon", "lat", p)
    con = duckdb.connect()
    con.execute("CREATE TABLE pts (lon DOUBLE, lat DOUBLE)")
    con.executemany("INSERT INTO pts VALUES (?, ?)", list(zip(lon, lat)))
    got = con.execute(f"SELECT {e_sql}, {n_sql} FROM pts").fetchnumpy()
    cols = list(got)
    assert np.abs(np.array(got[cols[0]]) - E).max() < 1e-4
    assert np.abs(np.array(got[cols[1]]) - N).max() < 1e-4


def test_registry_tail_round11_variants():
    """Round-11 parameter-only registry rows: 5513 (Greenwich-datum
    Krovak, southing/westing) equals 2065's projected numbers; 28192
    (Palestine Belt, the TM twin of the Cassini grid) shares the
    origin with FN + 1e6."""
    lon = np.array([14.42, 17.5])
    lat = np.array([50.09, 48.8])
    a = PJ.forward_xy(lon, lat, PJ.epsg_params(5513))
    b = PJ.forward_xy(lon, lat, PJ.epsg_params(2065))
    assert np.array_equal(a[0], b[0]) and np.array_equal(a[1], b[1])

    p_belt = PJ.epsg_params(28192)
    p_cas = PJ.epsg_params(28191)
    assert isinstance(p_belt, PJ.TmercParams)
    E, N = PJ.forward_xy(np.array([p_belt.lon0]), np.array([p_belt.lat0]),
                         p_belt)
    assert E[0] == pytest.approx(170251.555, abs=1e-6)
    assert N[0] == pytest.approx(1126867.909, abs=1e-6)
    # TM and Cassini agree ON the central meridian (both true scale
    # there), modulo the 1e6 northing offset — to the agreement of
    # their meridian-arc series (Krueger n^6 vs Snyder e^6, ~1e-5 m)
    Ec, Nc = PJ.forward_xy(np.array([p_cas.lon0]), np.array([32.5]), p_cas)
    Eb, Nb = PJ.forward_xy(np.array([p_belt.lon0]), np.array([32.5]), p_belt)
    assert Eb[0] == pytest.approx(Ec[0], abs=1e-6)
    assert Nb[0] - 1e6 == pytest.approx(Nc[0], abs=1e-4)


def test_laborde_gn72_worked_example():
    """EPSG GN7-2 Laborde worked example (Tananarive (Paris) /
    Laborde Grid, EPSG:29701): 16d11'23.280\"S, 44d27'27.260\"E of
    Greenwich -> E 188333.848, N 1098841.091 — pinned to the mm."""
    p = PJ.epsg_params(29701)
    lat = -(16.0 + 11.0 / 60.0 + 23.280 / 3600.0)
    lon = 44.0 + 27.0 / 60.0 + 27.260 / 3600.0
    E, N = PJ.laborde_forward(np.array([lon]), np.array([lat]), p)
    assert E[0] == pytest.approx(188333.848, abs=1e-3)
    assert N[0] == pytest.approx(1098841.091, abs=1e-3)
    # origin maps exactly to (FE, FN)
    E0, N0 = PJ.laborde_forward(np.array([p.lonc]), np.array([p.latc]), p)
    assert E0[0] == pytest.approx(400000.0, abs=1e-6)
    assert N0[0] == pytest.approx(800000.0, abs=1e-6)


def test_laborde_conformal_roundtrip_and_hotine_proximity():
    p = PJ.epsg_params(29701)
    # conformality: numeric Cauchy-Riemann across Madagascar
    d = 1e-6
    for lon0, lat0 in [(44.0, -13.0), (47.0, -19.5), (50.0, -25.0)]:
        E0, N0 = PJ.laborde_forward(np.array([lon0]), np.array([lat0]), p)
        Ee, Ne = PJ.laborde_forward(np.array([lon0 + d]),
                                    np.array([lat0]), p)
        En, Nn = PJ.laborde_forward(np.array([lon0]),
                                    np.array([lat0 + d]), p)
        import math
        e2 = p.e ** 2
        phi = math.radians(lat0)
        s = math.sin(phi)
        nu = p.a / math.sqrt(1 - e2 * s * s)
        rho = p.a * (1 - e2) / (1 - e2 * s * s) ** 1.5
        k_ew = math.hypot(Ee[0] - E0[0], Ne[0] - N0[0]) / (
            nu * math.cos(phi) * math.radians(d))
        k_ns = math.hypot(En[0] - E0[0], Nn[0] - N0[0]) / (
            rho * math.radians(d))
        assert k_ew == pytest.approx(k_ns, rel=1e-6), (lon0, lat0)
    # round-trip
    rng = np.random.default_rng(16)
    lon = rng.uniform(43.0, 51.0, 80)
    lat = rng.uniform(-26.0, -12.0, 80)
    E, N = PJ.laborde_forward(lon, lat, p)
    lo, la = PJ.laborde_inverse(E, N, p)
    assert np.abs(lo - lon).max() < 1e-9
    assert np.abs(la - lat).max() < 1e-9
    # EPSG:29702 is the registry's Hotine-B APPROXIMATION of the same
    # grid: identical at the centre, sub-metre divergence onshore
    ph = PJ.epsg_params(29702)
    Eh, Nh = PJ.hom_forward(lon, lat, ph)
    diff = np.hypot(E - Eh, N - Nh)
    assert diff.max() < 2.0
    Ec, Nc = PJ.laborde_forward(np.array([p.lonc]), np.array([p.latc]), p)
    Ech, Nch = PJ.hom_forward(np.array([p.lonc]), np.array([p.latc]), ph)
    assert abs(Ec[0] - Ech[0]) < 1e-6 and abs(Nc[0] - Nch[0]) < 1e-6


def test_hom_variant_a_michigan():
    """Hotine Oblique Mercator variant A (EPSG 9812, Michigan 3078):
    differs from variant B with the same parameters by the EXACT
    constant vector (uc*sin(gamma_c), uc*cos(gamma_c)) — variant B is
    mm-pinned to the GN7-2 worked example, so the identity anchors
    variant A; plus round-trip and the natural-origin invariant."""
    import math

    pa = PJ.epsg_params(3078)
    assert isinstance(pa, PJ.HomAParams)
    assert PJ.epsg_params(3079) is pa  # HARN twin, same parameters
    rng = np.random.default_rng(17)
    lon = rng.uniform(-90.0, -82.5, 60)
    lat = rng.uniform(41.5, 47.5, 60)
    Ea, Na = PJ.hom_forward(lon, lat, pa)
    pb = PJ.HomParams(pa.a, pa.inv_f, pa.lonc, pa.latc, pa.alpha,
                      pa.gamma, pa.k0, pa.fe, pa.fn)
    Eb, Nb = PJ.hom_forward(lon, lat, pb)
    _, _, _, _, _, uc = pb._derived
    gc = math.radians(pb.gamma)
    de, dn = Ea - Eb, Na - Nb
    assert np.abs(de - uc * math.sin(gc)).max() < 1e-6
    assert np.abs(dn - uc * math.cos(gc)).max() < 1e-6
    # round-trip through the variant-A inverse
    lo, la = PJ.hom_inverse(Ea, Na, pa)
    assert np.abs(lo - lon).max() < 1e-9
    assert np.abs(la - lat).max() < 1e-9


def test_bonne_invariants():
    """Bonne (EPSG 9827) construction invariants: exact natural
    origin, equal-area (numeric Jacobian == ellipsoid area element),
    true scale along every parallel, round-trip; lat0 = 0 rejected."""
    import math

    p = PJ.epsg_params("bonne_example")
    E0, N0 = PJ.bonne_forward(np.array([p.lon0]), np.array([p.lat0]), p)
    assert abs(E0[0] - p.fe) < 1e-6 and abs(N0[0] - p.fn) < 1e-6
    d = 1e-6
    e2 = p.e ** 2
    for lon0, lat0 in [(-9.5, 37.2), (-8.0, 39.668), (-6.3, 41.9)]:
        E, N = PJ.bonne_forward(np.array([lon0]), np.array([lat0]), p)
        Ee, Ne = PJ.bonne_forward(np.array([lon0 + d]),
                                  np.array([lat0]), p)
        En, Nn = PJ.bonne_forward(np.array([lon0]),
                                  np.array([lat0 + d]), p)
        jac = abs((Ee[0] - E[0]) * (Nn[0] - N[0])
                  - (En[0] - E[0]) * (Ne[0] - N[0])) / math.radians(d) ** 2
        phi = math.radians(lat0)
        s = math.sin(phi)
        elem = p.a ** 2 * (1 - e2) * math.cos(phi) / (1 - e2 * s * s) ** 2
        assert jac == pytest.approx(elem, rel=1e-6), (lon0, lat0)
        # true scale along the parallel: h_parallel = 1
        nu = p.a / math.sqrt(1 - e2 * s * s)
        k_par = math.hypot(Ee[0] - E[0], Ne[0] - N[0]) / (
            nu * math.cos(phi) * math.radians(d))
        assert k_par == pytest.approx(1.0, rel=1e-6), (lon0, lat0)
    # true scale along the central meridian
    rho_m = p.a * (1 - e2) / (
        1 - e2 * math.sin(math.radians(40.0)) ** 2) ** 1.5
    Ec, Nc = PJ.bonne_forward(np.array([p.lon0]), np.array([40.0]), p)
    Ec2, Nc2 = PJ.bonne_forward(np.array([p.lon0]), np.array([40.0 + d]), p)
    k_mer = math.hypot(Ec2[0] - Ec[0], Nc2[0] - Nc[0]) / (
        rho_m * math.radians(d))
    assert k_mer == pytest.approx(1.0, rel=1e-6)
    rng = np.random.default_rng(18)
    lon = rng.uniform(-10.0, -6.0, 60)
    lat = rng.uniform(36.5, 42.5, 60)
    E, N = PJ.bonne_forward(lon, lat, p)
    lo, la = PJ.bonne_inverse(E, N, p)
    assert np.abs(lo - lon).max() < 1e-8
    assert np.abs(la - lat).max() < 1e-8
    with pytest.raises(ValueError, match="Sinusoidal"):
        PJ.BonneParams(*PJ.ELLIPSOIDS["intl"], -8.0, 0.0, 0.0, 0.0)


def test_round12_sql_twins_match_kernel():
    import duckdb

    cases = [
        (29701, PJ.laborde_forward, PJ.laborde_forward_sql,
         (43.5, 50.5), (-25.5, -12.5)),
        ("bonne_example", PJ.bonne_forward, PJ.bonne_forward_sql,
         (-10.0, -6.0), (36.5, 42.5)),
        (3078, PJ.hom_forward, PJ.hom_forward_sql,
         (-89.5, -83.0), (41.5, 47.5)),
    ]
    con = duckdb.connect()
    rng = np.random.default_rng(19)
    for code, fwd, fwd_sql, lon_rng, lat_rng in cases:
        p = PJ.epsg_params(code)
        lon = rng.uniform(*lon_rng, 40)
        lat = rng.uniform(*lat_rng, 40)
        E, N = fwd(lon, lat, p)
        e_sql, n_sql = fwd_sql("lon", "lat", p)
        con.execute("CREATE OR REPLACE TABLE pts (lon DOUBLE, lat DOUBLE)")
        con.executemany("INSERT INTO pts VALUES (?, ?)",
                        list(zip(lon, lat)))
        got = con.execute(f"SELECT {e_sql}, {n_sql} FROM pts").fetchnumpy()
        cols = list(got)
        assert np.abs(np.array(got[cols[0]]) - E).max() < 1e-4, code
        assert np.abs(np.array(got[cols[1]]) - N).max() < 1e-4, code


def test_register_epsg_escape_hatch():
    """register_epsg(): the any-code contract's runtime escape hatch —
    a deployment supplies a published parameter row once and the code
    resolves everywhere epsg_params does."""
    code = 904827  # private-range test code
    try:
        with pytest.raises(KeyError):
            PJ.epsg_params(code)
        p = PJ.BonneParams(*PJ.ELLIPSOIDS["bessel"], 2.33722917, 45.0,
                           0.0, 0.0)
        PJ.register_epsg(code, p)
        assert PJ.epsg_params(code) is p
        E, N = PJ.forward_xy(np.array([2.33722917]), np.array([45.0]),
                             PJ.epsg_params(code))
        assert abs(E[0]) < 1e-6 and abs(N[0]) < 1e-6
        with pytest.raises(TypeError):
            PJ.register_epsg("not-a-code", p)
    finally:
        PJ._NAMED.pop(code, None)


def test_bonne_south_orientated():
    """Bonne South Orientated (EPSG 9828): exact axes-flip of the
    9827 surface (W = FE - E27, S = FN - N27 with FE = FN = 0 on the
    27-side), round-trip, and the dispatch/SQL-twin wiring."""
    import duckdb

    pso = PJ.epsg_params("bonne_so_example")
    assert isinstance(pso, PJ.BonneSoParams)
    p27 = PJ.BonneParams(pso.a, pso.inv_f, pso.lon0, pso.lat0, 0.0, 0.0)
    rng = np.random.default_rng(20)
    lon = rng.uniform(-10.0, -6.0, 50)
    lat = rng.uniform(36.5, 42.5, 50)
    W, S = PJ.forward_xy(lon, lat, pso)
    E, N = PJ.bonne_forward(lon, lat, p27)
    assert np.array_equal(W, -E) and np.array_equal(S, -N)
    lo, la = PJ.bonne_so_inverse(W, S, pso)
    assert np.abs(lo - lon).max() < 1e-8
    assert np.abs(la - lat).max() < 1e-8
    e_sql, n_sql = PJ.bonne_so_forward_sql("lon", "lat", pso)
    con = duckdb.connect()
    con.execute("CREATE TABLE pts (lon DOUBLE, lat DOUBLE)")
    con.executemany("INSERT INTO pts VALUES (?, ?)", list(zip(lon, lat)))
    got = con.execute(f"SELECT {e_sql}, {n_sql} FROM pts").fetchnumpy()
    cols = list(got)
    assert np.abs(np.array(got[cols[0]]) - W).max() < 1e-4
    assert np.abs(np.array(got[cols[1]]) - S).max() < 1e-4


def test_unsupported_epsg_keyerror_wording():
    """The unsupported-code KeyError names the supported ranges and
    registered codes (the reference's PROJ-failure message names the
    SRID, src/reprojection.cpp:83-85) — the wording the SURVEY §2.9
    closure decision promises."""
    with pytest.raises(KeyError) as ei:
        PJ.epsg_params(999999)
    msg = str(ei.value)
    assert "EPSG:999999 not supported" in msg
    assert "32601-32660" in msg and "named codes:" in msg
    assert "29701" in msg and "3078" in msg  # round-12 rows listed


def test_round13_twin_guards_extreme_inputs():
    """r12 ADVICE: the laborde/bonne SQL twins carry the same
    d=0 / rho=0 guards as the numpy kernels, so engine and oracle
    stay finite AND identical over a global grid far outside each
    CRS's use area (rotated poles, apex latitude included in the
    sweep's neighbourhood)."""
    import duckdb

    con = duckdb.connect()
    cases = [
        (29701, PJ.laborde_forward, PJ.laborde_forward_sql),
        ("bonne_example", PJ.bonne_forward, PJ.bonne_forward_sql),
    ]
    lon = np.repeat(np.arange(-180.0, 181.0, 30.0), 13)
    lat = np.tile(np.arange(-89.9, 90.0, 14.98), 13)[: len(lon)]
    for code, fwd, fwd_sql in cases:
        p = PJ.epsg_params(code)
        E, N = fwd(lon, lat, p)
        assert np.isfinite(E).all() and np.isfinite(N).all(), code
        e_sql, n_sql = fwd_sql("lon", "lat", p)
        con.execute("CREATE OR REPLACE TABLE pts (lon DOUBLE, lat DOUBLE)")
        con.executemany("INSERT INTO pts VALUES (?, ?)",
                        list(zip(lon, lat)))
        got = con.execute(f"SELECT {e_sql}, {n_sql} FROM pts").fetchnumpy()
        cols = list(got)
        ge = np.array(got[cols[0]], dtype="f8")
        gn = np.array(got[cols[1]], dtype="f8")
        assert np.isfinite(ge).all() and np.isfinite(gn).all(), code
        # identical to the kernel relative to magnitude (planetary
        # coordinates far outside the use area grow to ~1e7 m)
        scale = np.maximum(1.0, np.abs(E))
        assert (np.abs(ge - E) / scale).max() < 1e-9, code
        scale = np.maximum(1.0, np.abs(N))
        assert (np.abs(gn - N) / scale).max() < 1e-9, code


def test_register_epsg_rejects_unknown_params_type():
    """r12 ADVICE: an unrecognized params object must fail loudly at
    registration (and forward_xy must reject it too), never fall
    through to the LAEA branch as garbage coordinates."""
    class NotParams:
        pass

    with pytest.raises(TypeError, match="params must be one of"):
        PJ.register_epsg(904999, NotParams())
    with pytest.raises(TypeError, match="unsupported projection"):
        PJ.forward_xy(np.array([0.0]), np.array([0.0]), NotParams())
    # LAEA itself still dispatches (the old implicit fallback is now
    # an explicit isinstance branch)
    p = PJ.epsg_params(3035)
    assert isinstance(p, PJ.LaeaParams)
    E, N = PJ.forward_xy(np.array([10.0]), np.array([52.0]), p)
    assert np.isfinite(E[0]) and np.isfinite(N[0])


def test_round14_laborde_lp_guard_u_plus_d_zero():
    """r13 ADVICE: laborde_forward_sql's lp branch covered d=0 but not
    the u+d=0 singular line (v=0, u<0), where DuckDB's atan(0.0/0.0)
    is NULL while the kernel's arctan2(v, u+d) is finite.  The CASE
    now emulates arctan2 exactly; verified (a) as a formula against
    numpy on exact singular inputs, (b) present in the generated SQL,
    (c) functionally along the antipodal meridian bl=pi."""
    import math

    import duckdb

    p = PJ.epsg_params(29701)
    e_sql, n_sql = PJ.laborde_forward_sql("lon", "lat", p)
    for s in (e_sql, n_sql):  # atan2 emulation present in the SQL
        assert ") <> 0.0" in s and "THEN pi()" in s and "THEN -pi()" in s

    # (a) branch formula == 2*arctan2(v, u+d) on the singular line
    # itself: (u=-1, v=+-0 or subnormal-squared v) give d exactly 1.0
    # and u+d exactly 0.0 — the inputs the old twin mapped to NULL
    con = duckdb.connect()
    lp_case = (
        "(CASE WHEN d > 0.0 AND (u + d) <> 0.0"
        " THEN 2.0*atan(v/(u + d))"
        " WHEN d > 0.0 AND v > 0.0 THEN pi()"
        " WHEN d > 0.0 AND v < 0.0 THEN -pi()"
        " ELSE 0.0 END)"
    )
    uv = [(-1.0, 0.0), (-1.0, -0.0), (0.0, 0.0), (1.0, 0.0),
          (-1.0, 1e-300), (-1.0, -1e-300), (0.5, -0.5), (-0.7, 0.2)]
    rows = [(u, v, math.hypot(u, v)) for u, v in uv]
    assert any(u + d == 0.0 and d > 0.0 for u, v, d in rows)
    con.execute("CREATE TABLE g (u DOUBLE, v DOUBLE, d DOUBLE)")
    con.executemany("INSERT INTO g VALUES (?,?,?)", rows)
    got = [r[0] for r in con.execute(f"SELECT {lp_case} FROM g").fetchall()]
    want = [2.0 * np.arctan2(v, u + d) if d > 0.0 else 0.0
            for u, v, d in rows]
    for g, w in zip(got, want):
        assert g is not None and math.isfinite(g)
        assert abs(g - w) < 1e-15

    # (c) the meridian containing the rotated antipole: engine NULL-free
    # and identical to the kernel through the near-singular column
    big_b = p._derived[0]
    lon_star = p.lonc + math.degrees(math.pi) / big_b
    lat = np.arange(-89.9, 90.0, 1.7)
    lon = np.full_like(lat, lon_star)
    E, N = PJ.laborde_forward(lon, lat, p)
    assert np.isfinite(E).all() and np.isfinite(N).all()
    con.execute("CREATE TABLE pts (lon DOUBLE, lat DOUBLE)")
    con.executemany("INSERT INTO pts VALUES (?, ?)", list(zip(lon, lat)))
    got2 = con.execute(f"SELECT {e_sql}, {n_sql} FROM pts").fetchnumpy()
    cols = list(got2)
    ge = np.array(got2[cols[0]], dtype="f8")
    gn = np.array(got2[cols[1]], dtype="f8")
    assert np.isfinite(ge).all() and np.isfinite(gn).all()
    scale = np.maximum(1.0, np.abs(E))
    assert (np.abs(ge - E) / scale).max() < 1e-9
    scale = np.maximum(1.0, np.abs(N))
    assert (np.abs(gn - N) / scale).max() < 1e-9
