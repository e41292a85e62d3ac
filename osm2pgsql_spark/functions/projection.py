"""Arbitrary-EPSG reprojection, numpy-native.

The reference supports any EPSG via PROJ
(/root/reference/src/reprojection-generic-proj6.cpp, selected at
/root/reference/src/reprojection.cpp:17-102); this container has no
pyproj, so the SIXTEEN projection method families that cover the
national grids real deployments use are implemented from the public
formulas (EPSG Guidance Note 7-2, Snyder, Karney, LINZ), each pinned
to a published worked example or to construction invariants; codes
whose parameter rows this offline registry cannot state with
certainty are reachable through register_epsg().  The families:

- Transverse Mercator (EPSG method 9807) — every UTM zone
  (326xx/327xx WGS84, 258xx ETRS89), OSGB 27700, Poland 2180, ... —
  via the Krueger series in n to order 6 (Karney 2011, "Transverse
  Mercator with an accuracy of a few nanometers"; same series PROJ
  uses for its default tmerc).  Forward + inverse (Newton on the
  conformal tangent), round-trip < 1e-9 deg.
- Lambert Azimuthal Equal Area (EPSG method 9820) — EPSG 3035
  (ETRS89-LAEA Europe, the EU statistical grid) — Snyder pp. 187-190
  ellipsoidal form.
- Lambert Conformal Conic 2SP (EPSG method 9802) — Lambert-93 (2154),
  ETRS89-LCC (3034), and the LCC state/national grids — with inverse
  via the conformal-latitude fixed point.
- Albers Equal Area Conic (EPSG method 9822) — Conus Albers (5070),
  Australian Albers (3577), California Albers (3310) — Snyder
  pp. 98-103 ellipsoidal form, inverse via the authalic-latitude
  Newton step (Snyder 3-16).
- Oblique Stereographic (EPSG method 9809) — Amersfoort / RD New
  (28992) — the EPSG Guidance Note 7-2 conformal-sphere formulation,
  inverse via fixed-point on the conformal latitude.
- Hotine Oblique Mercator variant B (EPSG method 9815) — the Swiss
  grids CH1903/LV03 (21781) and CH1903+/LV95 (2056, alpha=gamma=90),
  and the skew RSO grids (Timbalai 29873, pinned to the GN7-2 §3.2.6
  worked example to the mm) — forward + inverse per GN7-2.
- Lambert Conformal Conic 1SP (method 9801) — Jamaica National Grid
  (24200, pinned to the GN7-2 §3.1.1 worked example); reuses the 2SP
  kernels through a derived-constant surface.
- Polar Stereographic variants A/B (9810/9829) — UPS 32661/32761
  (GN7-2 §3.1.6 worked example), Antarctic 3031, NSIDC 3413/3976 —
  standard-parallel scale invariant pinned.
- Mercator variants A/B (9804/9805) — World Mercator 3395, Makassar /
  NEIEZ 3002 (GN7-2 §3.1.3 worked example).
- Krovak (9819), Cassini-Soldner (9806), New Zealand Map Grid (9811)
  — see their params classes (round 11).
- Hotine Oblique Mercator variant A (9812) — Michigan Oblique
  Mercator 3078/3079; anchored to variant B's mm-pinned worked
  example through the exact constant-offset identity.
- Laborde Oblique Mercator (9813) — Madagascar 29701, the true cubic
  (GN7-2 worked example pinned to the mm); 29702 is the registry's
  published Hotine-B approximation of the same grid.
- Bonne (9827) + Bonne South Orientated (9828) — kernels + invariant
  pins (equal-area, true-scale parallels, exact axes-flip identity);
  no offline-certain EPSG row, so deployments register theirs via
  register_epsg() (see METHOD_EXAMPLES).

All kernels are vectorized numpy over coordinate arrays (Arrow-batch
friendly: the pandas-UDF path hands them (N,2) float64 arrays), no
per-row Python.  `tmerc_forward_sql`/`laea_forward_sql` emit the SAME
formula as DuckDB SQL (constants interpolated from the same params
object) so driver oracles can check the kernel against an
independently evaluated twin.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

# ---------------------------------------------------------------- ellipsoids

#: name -> (semi-major axis a [m], inverse flattening 1/f)
ELLIPSOIDS = {
    "WGS84": (6378137.0, 298.257223563),
    "GRS80": (6378137.0, 298.257222101),
    # Airy 1830 (OSGB36): defined via a and b
    "airy": (6377563.396, 299.3249646),
    # Airy Modified 1849 (Irish grids TM65/TM75)
    "airy_mod": (6377340.189, 299.3249646),
    # Krassowsky 1940 (many eastern-european legacy grids)
    "krass": (6378245.0, 298.3),
    # Bessel 1841 (DHDN / Gauss-Krueger legacy, Swiss CH1903/CH1903+)
    "bessel": (6377397.155, 299.1528128),
    # International 1924 / Hayford (ED50, Belge 1972)
    "intl": (6378388.0, 297.0),
    # Everest 1830 (1967 definition) (Timbalai 1948 — RSO Borneo)
    "evrst67": (6377298.556, 300.8017),
    # Clarke 1866 (NAD27, Jamaica 1969)
    "clrk66": (6378206.4, 294.978698214),
    # Clarke 1880 (Benoit) (Palestine 1923)
    "clrk80b": (6378300.789, 293.46630765563),
    # Clarke 1858 in Clarke's links (Trinidad 1903 — the EPSG GN7-2
    # Cassini-Soldner worked example publishes a directly in links;
    # the formulas scale by a, so E/N come out in links)
    "clrk58_links": (31706587.88, 294.2606764),
}


@dataclass(frozen=True)
class TmercParams:
    """Transverse Mercator parameters (EPSG method 9807)."""

    a: float
    inv_f: float
    lon0: float  # central meridian, degrees
    lat0: float  # latitude of natural origin, degrees
    k0: float  # scale on the central meridian
    fe: float  # false easting, m
    fn: float  # false northing, m

    @property
    def f(self) -> float:
        return 1.0 / self.inv_f

    @property
    def e(self) -> float:
        return math.sqrt(self.f * (2.0 - self.f))

    @property
    def n(self) -> float:
        return self.f / (2.0 - self.f)

    @property
    def big_a(self) -> float:
        """Rectifying radius A = a/(1+n) (1 + n^2/4 + n^4/64 + n^6/256)."""
        n = self.n
        return (self.a / (1.0 + n)) * (
            1.0 + n * n / 4.0 + n**4 / 64.0 + n**6 / 256.0
        )

    @property
    def alpha(self) -> tuple[float, ...]:
        """Krueger forward series coefficients alpha_1..alpha_6."""
        n = self.n
        n2, n3, n4, n5, n6 = n * n, n**3, n**4, n**5, n**6
        return (
            n / 2.0 - 2.0 * n2 / 3.0 + 5.0 * n3 / 16.0 + 41.0 * n4 / 180.0
            - 127.0 * n5 / 288.0 + 7891.0 * n6 / 37800.0,
            13.0 * n2 / 48.0 - 3.0 * n3 / 5.0 + 557.0 * n4 / 1440.0
            + 281.0 * n5 / 630.0 - 1983433.0 * n6 / 1935360.0,
            61.0 * n3 / 240.0 - 103.0 * n4 / 140.0 + 15061.0 * n5 / 26880.0
            + 167603.0 * n6 / 181440.0,
            49561.0 * n4 / 161280.0 - 179.0 * n5 / 168.0
            + 6601661.0 * n6 / 7257600.0,
            34729.0 * n5 / 80640.0 - 3418889.0 * n6 / 1995840.0,
            212378941.0 * n6 / 319334400.0,
        )

    @property
    def beta(self) -> tuple[float, ...]:
        """Krueger inverse series coefficients beta_1..beta_6."""
        n = self.n
        n2, n3, n4, n5, n6 = n * n, n**3, n**4, n**5, n**6
        return (
            n / 2.0 - 2.0 * n2 / 3.0 + 37.0 * n3 / 96.0 - n4 / 360.0
            - 81.0 * n5 / 512.0 + 96199.0 * n6 / 604800.0,
            n2 / 48.0 + n3 / 15.0 - 437.0 * n4 / 1440.0 + 46.0 * n5 / 105.0
            - 1118711.0 * n6 / 3870720.0,
            17.0 * n3 / 480.0 - 37.0 * n4 / 840.0 - 209.0 * n5 / 4480.0
            + 5569.0 * n6 / 90720.0,
            4397.0 * n4 / 161280.0 - 11.0 * n5 / 504.0
            - 830251.0 * n6 / 7257600.0,
            4583.0 * n5 / 161280.0 - 108847.0 * n6 / 3991680.0,
            20648693.0 * n6 / 638668800.0,
        )

    @property
    def xi0(self) -> float:
        """Rectifying latitude of the natural origin (meridian-arc
        offset): N = fn + k0 A (xi - xi0)."""
        if self.lat0 == 0.0:
            return 0.0
        e = self.e
        sphi = math.sin(math.radians(self.lat0))
        psi = math.atanh(sphi) - e * math.atanh(e * sphi)
        t = math.sinh(psi)
        xip = math.atan(t)  # lambda = 0
        xi = xip
        for j, a_j in enumerate(self.alpha, 1):
            xi += a_j * math.sin(2.0 * j * xip)  # cosh(0) = 1
        return xi


@dataclass(frozen=True)
class LaeaParams:
    """Lambert Azimuthal Equal Area parameters (EPSG method 9820)."""

    a: float
    inv_f: float
    lon0: float
    lat0: float
    fe: float
    fn: float

    @property
    def f(self) -> float:
        return 1.0 / self.inv_f

    @property
    def e(self) -> float:
        return math.sqrt(self.f * (2.0 - self.f))


@dataclass(frozen=True)
class LccParams:
    """Lambert Conformal Conic 2SP parameters (EPSG method 9802)."""

    a: float
    inv_f: float
    lon0: float  # longitude of false origin
    lat0: float  # latitude of false origin
    lat1: float  # first standard parallel
    lat2: float  # second standard parallel
    fe: float
    fn: float

    @property
    def f(self) -> float:
        return 1.0 / self.inv_f

    @property
    def e(self) -> float:
        return math.sqrt(self.f * (2.0 - self.f))

    def _m(self, phi: float) -> float:
        s = math.sin(phi)
        return math.cos(phi) / math.sqrt(1.0 - (self.e * s) ** 2)

    def _t(self, phi: float) -> float:
        e = self.e
        s = math.sin(phi)
        return math.tan(math.pi / 4.0 - phi / 2.0) / (
            (1.0 - e * s) / (1.0 + e * s)
        ) ** (e / 2.0)

    @property
    def n(self) -> float:
        p1, p2 = math.radians(self.lat1), math.radians(self.lat2)
        return (math.log(self._m(p1)) - math.log(self._m(p2))) / (
            math.log(self._t(p1)) - math.log(self._t(p2))
        )

    @property
    def big_f(self) -> float:
        p1 = math.radians(self.lat1)
        return self._m(p1) / (self.n * self._t(p1) ** self.n)

    @property
    def r0(self) -> float:
        return self.a * self.big_f * self._t(math.radians(self.lat0)) ** self.n


@dataclass(frozen=True)
class AlbersParams:
    """Albers Equal Area Conic parameters (EPSG method 9822)."""

    a: float
    inv_f: float
    lon0: float  # longitude of false origin
    lat0: float  # latitude of false origin
    lat1: float  # first standard parallel
    lat2: float  # second standard parallel
    fe: float
    fn: float

    @property
    def f(self) -> float:
        return 1.0 / self.inv_f

    @property
    def e(self) -> float:
        return math.sqrt(self.f * (2.0 - self.f))

    def _m(self, phi: float) -> float:
        s = math.sin(phi)
        return math.cos(phi) / math.sqrt(1.0 - (self.e * s) ** 2)

    @property
    def n(self) -> float:
        p1, p2 = math.radians(self.lat1), math.radians(self.lat2)
        m1, m2 = self._m(p1), self._m(p2)
        q1 = _q_auth(self.e, math.sin(p1))
        q2 = _q_auth(self.e, math.sin(p2))
        return (m1 * m1 - m2 * m2) / (q2 - q1)

    @property
    def big_c(self) -> float:
        p1 = math.radians(self.lat1)
        return self._m(p1) ** 2 + self.n * _q_auth(self.e, math.sin(p1))

    @property
    def rho0(self) -> float:
        q0 = _q_auth(self.e, math.sin(math.radians(self.lat0)))
        return self.a * math.sqrt(self.big_c - self.n * q0) / self.n


@dataclass(frozen=True)
class StereaParams:
    """Oblique Stereographic parameters (EPSG method 9809) — the
    conformal-sphere formulation of EPSG Guidance Note 7 part 2."""

    a: float
    inv_f: float
    lon0: float
    lat0: float
    k0: float
    fe: float
    fn: float

    @property
    def f(self) -> float:
        return 1.0 / self.inv_f

    @property
    def e(self) -> float:
        return math.sqrt(self.f * (2.0 - self.f))

    @property
    def _derived(self) -> tuple[float, float, float, float]:
        """(R, n, c, chi0): conformal-sphere radius, exaggeration,
        absorption constant, conformal origin latitude."""
        e, e2 = self.e, self.e**2
        phi0 = math.radians(self.lat0)
        s0 = math.sin(phi0)
        rho0 = self.a * (1.0 - e2) / (1.0 - e2 * s0 * s0) ** 1.5
        nu0 = self.a / math.sqrt(1.0 - e2 * s0 * s0)
        big_r = math.sqrt(rho0 * nu0)
        n = math.sqrt(1.0 + e2 * math.cos(phi0) ** 4 / (1.0 - e2))
        s1 = (1.0 + s0) / (1.0 - s0)
        s2 = (1.0 - e * s0) / (1.0 + e * s0)
        w1 = (s1 * s2**e) ** n
        sin_chi00 = (w1 - 1.0) / (w1 + 1.0)
        c = (n + s0) * (1.0 - sin_chi00) / ((n - s0) * (1.0 + sin_chi00))
        w2 = c * w1
        chi0 = math.asin((w2 - 1.0) / (w2 + 1.0))
        return big_r, n, c, chi0


@dataclass(frozen=True)
class Lcc1Params:
    """Lambert Conformal Conic 1SP parameters (EPSG method 9801) —
    Jamaica National Grid class.  Derives the same (n, big_f, r0)
    surface as LccParams, so the 9802 kernels (lcc_forward /
    lcc_inverse / lcc_forward_sql) run unchanged: n = sin(lat0),
    F = k0 * m0 / (n * t0^n), r0 = a F t0^n (GN7-2 §3.1.1)."""

    a: float
    inv_f: float
    lon0: float
    lat0: float
    k0: float
    fe: float
    fn: float

    @property
    def f(self) -> float:
        return 1.0 / self.inv_f

    @property
    def e(self) -> float:
        return math.sqrt(self.f * (2.0 - self.f))

    def _m(self, phi: float) -> float:
        s = math.sin(phi)
        return math.cos(phi) / math.sqrt(1.0 - (self.e * s) ** 2)

    def _t(self, phi: float) -> float:
        e, s = self.e, math.sin(phi)
        return math.tan(math.pi / 4.0 - phi / 2.0) / (
            (1.0 - e * s) / (1.0 + e * s)
        ) ** (e / 2.0)

    @property
    def n(self) -> float:
        return math.sin(math.radians(self.lat0))

    @property
    def big_f(self) -> float:
        phi0 = math.radians(self.lat0)
        return self.k0 * self._m(phi0) / (self.n * self._t(phi0) ** self.n)

    @property
    def r0(self) -> float:
        return self.a * self.big_f * self._t(
            math.radians(self.lat0)) ** self.n


@dataclass(frozen=True)
class PolarParams:
    """Polar Stereographic parameters — EPSG method 9810 (variant A:
    k0 at the pole; UPS) and 9829 (variant B: standard parallel
    lat_ts; Antarctic Polar Stereographic).  `south` selects the
    aspect.  GN7-2 §3.1.6 formulas."""

    a: float
    inv_f: float
    lon0: float
    k0: float      # scale at the pole (variant A); derived for B
    fe: float
    fn: float
    south: bool = False
    lat_ts: float | None = None  # variant B standard parallel

    @property
    def f(self) -> float:
        return 1.0 / self.inv_f

    @property
    def e(self) -> float:
        return math.sqrt(self.f * (2.0 - self.f))

    @property
    def _ce(self) -> float:
        e = self.e
        return math.sqrt((1.0 + e) ** (1.0 + e) * (1.0 - e) ** (1.0 - e))

    def _t(self, phi):
        """Isometric-colatitude t for the aspect (numpy-safe)."""
        e = self.e
        if self.south:
            s = np.sin(-phi)
            return np.tan(np.pi / 4.0 - (-phi) / 2.0) / (
                (1.0 - e * s) / (1.0 + e * s)
            ) ** (e / 2.0)
        s = np.sin(phi)
        return np.tan(np.pi / 4.0 - phi / 2.0) / (
            (1.0 - e * s) / (1.0 + e * s)
        ) ** (e / 2.0)

    @property
    def k0_eff(self) -> float:
        """Variant B: k0 from the standard parallel (GN7-2: k0 =
        mF * sqrt((1+e)^(1+e)(1-e)^(1-e)) / (2 tF))."""
        if self.lat_ts is None:
            return self.k0
        phi = math.radians(self.lat_ts)
        s = math.sin(phi)
        m = math.cos(phi) / math.sqrt(1.0 - (self.e * s) ** 2)
        t = float(self._t(np.asarray(phi)))
        return m * self._ce / (2.0 * t)


@dataclass(frozen=True)
class MercParams:
    """Mercator parameters — EPSG 9804 (variant A: k0) / 9805
    (variant B: standard parallel).  GN7-2 §3.1.3."""

    a: float
    inv_f: float
    lon0: float
    k0: float
    fe: float
    fn: float
    lat_ts: float | None = None

    @property
    def f(self) -> float:
        return 1.0 / self.inv_f

    @property
    def e(self) -> float:
        return math.sqrt(self.f * (2.0 - self.f))

    @property
    def k0_eff(self) -> float:
        if self.lat_ts is None:
            return self.k0
        phi = math.radians(self.lat_ts)
        s = math.sin(phi)
        return math.cos(phi) / math.sqrt(1.0 - (self.e * s) ** 2)


@dataclass(frozen=True)
class HomParams:
    """Hotine Oblique Mercator variant B parameters (EPSG method 9815
    — azimuth given at the projection centre, false coordinates AT
    the centre).  alpha = gamma = 90, k0 = 1 on Bessel is the Swiss
    Oblique Mercator shape (EPSG 21781 / 2056); the classic RSO
    grids (Borneo 29873, Malaysia) use a skew azimuth.  Formulas:
    EPSG Guidance Note 7 part 2, §3.2.6."""

    a: float
    inv_f: float
    lonc: float   # longitude of projection centre, degrees
    latc: float   # latitude of projection centre, degrees
    alpha: float  # azimuth of initial line at the centre, degrees
    gamma: float  # angle from rectified to skew grid, degrees
    k0: float     # scale on the initial line
    fe: float     # easting at the projection centre
    fn: float     # northing at the projection centre

    @property
    def f(self) -> float:
        return 1.0 / self.inv_f

    @property
    def e(self) -> float:
        return math.sqrt(self.f * (2.0 - self.f))

    @property
    def _derived(self) -> tuple[float, float, float, float, float, float]:
        """(B, A, H, gamma0, lon0, uc) — the GN7-2 §3.2.6 constants."""
        e = self.e
        e2 = e * e
        phic = math.radians(self.latc)
        alphac = math.radians(self.alpha)
        s = math.sin(phic)
        big_b = math.sqrt(1.0 + e2 * math.cos(phic) ** 4 / (1.0 - e2))
        big_a = self.a * big_b * self.k0 * math.sqrt(1.0 - e2) / (
            1.0 - e2 * s * s
        )
        t0 = math.tan(math.pi / 4.0 - phic / 2.0) / (
            (1.0 - e * s) / (1.0 + e * s)
        ) ** (e / 2.0)
        big_d = big_b * math.sqrt(1.0 - e2) / (
            math.cos(phic) * math.sqrt(1.0 - e2 * s * s)
        )
        d2 = max(big_d * big_d, 1.0)
        sign = 1.0 if self.latc >= 0.0 else -1.0
        big_f = big_d + math.sqrt(d2 - 1.0) * sign
        big_h = big_f * t0**big_b
        big_g = (big_f - 1.0 / big_f) / 2.0
        gamma0 = math.asin(math.sin(alphac) / big_d)
        lon0 = self.lonc - math.degrees(
            math.asin(big_g * math.tan(gamma0))
        ) / big_b
        if abs(self.alpha - 90.0) < 1e-12:
            uc = big_a * math.radians(self.lonc - lon0)
        else:
            uc = (big_a / big_b) * math.atan2(
                math.sqrt(d2 - 1.0), math.cos(alphac)
            ) * sign
        return big_b, big_a, big_h, gamma0, lon0, uc


@dataclass(frozen=True)
class TmSoParams(TmercParams):
    """Transverse Mercator South Orientated (EPSG method 9808) —
    the South African Lo grids (Hartebeesthoek94, EPSG 2046-2055).
    Same Krueger surface as 9807; the published axes are westing /
    southing: W = FE - E0, S = FN - N0, where (E0, N0) is the 9807
    forward with ZERO false easting/northing (EPSG GN7-2 §3.2.2; the
    Lo grids publish FE = FN = 0, so W = -E0, S = -N0).  Reference
    parity: PROJ's tmerc +axis=wsu path
    (src/reprojection-generic-proj6.cpp resolves these through PROJ)."""

    @property
    def tm0(self) -> TmercParams:
        return TmercParams(
            self.a, self.inv_f, self.lon0, self.lat0, self.k0, 0.0, 0.0
        )


@dataclass(frozen=True)
class KrovakParams:
    """Krovak oblique conformal conic parameters (EPSG method 9819) —
    the S-JTSK grids covering the Czech and Slovak Republics
    (EPSG:5514 East North, EPSG:2065 Ferro southing/westing).
    Formulas: EPSG Guidance Note 7 part 2, Krovak section (the
    reference reaches these CRSs through PROJ,
    src/reprojection-generic-proj6.cpp).

    `lon0` is the longitude of origin in degrees EAST OF GREENWICH
    (EPSG publishes 24d50' for the Greenwich-based 5514 and the same
    physical meridian as 42d30' east of Ferro for 2065 — identical
    once both the origin and the input longitudes use one prime
    meridian, since only λO − λ enters the formulas).

    `east_north` selects the axis convention of the returned (x, y):
    True (5514) gives x = −westing, y = −southing (both negative over
    Czechia — the PROJ/GIS normalization); False (2065) gives
    x = westing + FE, y = southing + FN (both positive)."""

    a: float
    inv_f: float
    lon0: float    # longitude of origin, degrees east of Greenwich
    latc: float    # latitude of projection centre
    alphac: float  # co-latitude of the cone axis (azimuth), degrees
    latp: float    # latitude of the pseudo standard parallel
    kp: float      # scale on the pseudo standard parallel
    fe: float
    fn: float
    east_north: bool = False

    @property
    def f(self) -> float:
        return 1.0 / self.inv_f

    @property
    def e(self) -> float:
        return math.sqrt(self.f * (2.0 - self.f))

    @property
    def _derived(self) -> tuple[float, float, float, float, float, float]:
        """(A, B, gamma0, t0, n, r0) — the GN7-2 Krovak constants."""
        e = self.e
        e2 = e * e
        phic = math.radians(self.latc)
        s = math.sin(phic)
        big_a = self.a * math.sqrt(1.0 - e2) / (1.0 - e2 * s * s)
        big_b = math.sqrt(1.0 + e2 * math.cos(phic) ** 4 / (1.0 - e2))
        gamma0 = math.asin(s / big_b)
        t0 = (
            math.tan(math.pi / 4.0 + gamma0 / 2.0)
            * ((1.0 + e * s) / (1.0 - e * s)) ** (e * big_b / 2.0)
            / math.tan(math.pi / 4.0 + phic / 2.0) ** big_b
        )
        n = math.sin(math.radians(self.latp))
        r0 = self.kp * big_a / math.tan(math.radians(self.latp))
        return big_a, big_b, gamma0, t0, n, r0


@dataclass(frozen=True)
class CassiniParams:
    """Cassini-Soldner parameters (EPSG method 9806) — the historic
    Caribbean / Middle-East / Asian national grids (Trinidad 1903
    EPSG:30200 — the GN7-2 worked example, in Clarke's links;
    Palestine 1923 EPSG:28191).  Snyder's ellipsoidal series via the
    meridian-arc expansion (GN7-2 §3.2.4)."""

    a: float
    inv_f: float
    lon0: float
    lat0: float
    fe: float
    fn: float

    @property
    def f(self) -> float:
        return 1.0 / self.inv_f

    @property
    def e(self) -> float:
        return math.sqrt(self.f * (2.0 - self.f))

    @property
    def m0(self) -> float:
        return float(_merid_arc(self.a, self.e ** 2,
                                np.asarray(math.radians(self.lat0))))


@dataclass(frozen=True)
class NzmgParams:
    """New Zealand Map Grid parameters (EPSG method 9811) — the
    historic NZGD49 / NZMG (EPSG:27200).  A sixth-order complex
    polynomial of (isometric-latitude-difference, longitude-difference)
    — conformal BY CONSTRUCTION (any complex-analytic map is) — with
    the published LINZ series constants (LINZG25700; the same
    tpsi/tphi/B tables PROJ's nzmg ships).  Validation in
    test_projection: exactness at the (173E, 41S) origin, scale
    within NZMG's designed +-0.02% band across New Zealand,
    conformality to 1e-10, round-trip < 1e-9 deg.  The reference
    reaches 27200 through PROJ (src/reprojection-generic-proj6.cpp)."""

    a: float
    inv_f: float
    lon0: float
    lat0: float
    fe: float
    fn: float

    @property
    def f(self) -> float:
        return 1.0 / self.inv_f

    @property
    def e(self) -> float:
        return math.sqrt(self.f * (2.0 - self.f))


@dataclass(frozen=True)
class HomAParams(HomParams):
    """Hotine Oblique Mercator variant A (EPSG method 9812) — same
    aposphere construction as variant B (§3.2.6), but coordinates are
    referenced to the NATURAL origin of the initial line (no u_c
    offset) and FE/FN apply there: the published method for the
    Michigan Oblique Mercator zone (NAD83 EPSG:3078).  Because the
    two variants share every derived constant, variant A output
    differs from variant B (with the same parameters) by an exact
    constant vector (u_c sin(gamma_c), u_c cos(gamma_c)) plus the
    FE/FN difference — pinned in test_projection against the
    mm-verified GN7-2 §3.2.6 variant-B worked example."""


@dataclass(frozen=True)
class LabordeParams:
    """Laborde Oblique Mercator parameters (EPSG method 9813) — the
    Madagascar national grid (Tananarive (Paris) / Laborde Grid,
    EPSG:29701).  Laborde's original 1928 triple projection: Gauss
    conformal sphere, oblique rotation to the skew aspect, Mercator,
    then a CUBIC COMPLEX polynomial correction H + G*H^3 (analytic,
    hence still conformal) — the step the Hotine approximation
    (EPSG:29702 via 9815) omits.  Formulas: EPSG Guidance Note 7
    part 2, Laborde section.  The reference reaches 29701 through
    PROJ's labrd (src/reprojection-generic-proj6.cpp)."""

    a: float
    inv_f: float
    lonc: float   # longitude of projection centre, degrees (Greenwich)
    latc: float   # latitude of projection centre, degrees
    alpha: float  # azimuth of initial line, degrees
    k0: float
    fe: float
    fn: float

    @property
    def f(self) -> float:
        return 1.0 / self.inv_f

    @property
    def e(self) -> float:
        return math.sqrt(self.f * (2.0 - self.f))

    @property
    def _derived(self) -> tuple[float, float, float, float, complex]:
        """(B, phi_s, R, C, G) — the GN7-2 Laborde constants."""
        e = self.e
        e2 = e * e
        phic = math.radians(self.latc)
        s, c = math.sin(phic), math.cos(phic)
        big_b = math.sqrt(1.0 + e2 * c ** 4 / (1.0 - e2))
        phi_s = math.asin(s / big_b)
        big_r = self.a * self.k0 * math.sqrt(1.0 - e2) / (1.0 - e2 * s * s)
        big_c = math.log(math.tan(math.pi / 4.0 + phi_s / 2.0)) - (
            big_b * math.log(
                math.tan(math.pi / 4.0 + phic / 2.0)
                * ((1.0 - e * s) / (1.0 + e * s)) ** (e / 2.0)
            )
        )
        two_a = 2.0 * math.radians(self.alpha)
        big_g = complex(1.0 - math.cos(two_a), math.sin(two_a)) / 12.0
        return big_b, phi_s, big_r, big_c, big_g


@dataclass(frozen=True)
class BonneParams:
    """Bonne parameters (EPSG method 9827) — the pseudoconic
    EQUAL-AREA projection of the historic French/Portuguese national
    map series.  GN7-2 Bonne formulas (meridian-arc based); lat0 = 0
    is rejected (that degenerate case is the Sinusoidal, a different
    EPSG method).  No GN7-2 worked example exists for Bonne, so the
    kernel is pinned by construction invariants instead: exactness at
    the natural origin, true scale along the central meridian and
    along every parallel, the equal-area property (numeric Jacobian
    == ellipsoidal area element), and round-trip — see
    test_projection.  The reference reaches Bonne CRSs through PROJ
    (src/reprojection-generic-proj6.cpp)."""

    a: float
    inv_f: float
    lon0: float
    lat0: float
    fe: float
    fn: float

    def __post_init__(self):
        if abs(self.lat0) < 1e-9:
            raise ValueError(
                "Bonne lat0 must be non-zero (lat0 = 0 degenerates "
                "to the Sinusoidal projection, EPSG method 9826/9842)")

    @property
    def f(self) -> float:
        return 1.0 / self.inv_f

    @property
    def e(self) -> float:
        return math.sqrt(self.f * (2.0 - self.f))

    @property
    def _derived(self) -> tuple[float, float]:
        """(a*m0/sin(phi0), M0)."""
        e2 = self.e ** 2
        phi0 = math.radians(self.lat0)
        s0 = math.sin(phi0)
        m0 = math.cos(phi0) / math.sqrt(1.0 - e2 * s0 * s0)
        return self.a * m0 / s0, float(
            _merid_arc(self.a, e2, np.asarray(phi0)))


@dataclass(frozen=True)
class BonneSoParams(BonneParams):
    """Bonne South Orientated (EPSG method 9828) — the axes-flipped
    twin used by the historic Portuguese grids: westing
    W = FE - rho*sin(T), southing S = FN - (a*m0/sin(phi0) -
    rho*cos(T)) (GN7-2; same construction as TM South Orientated's
    relation to TM)."""


#: psi(dphi) series — dphi in units of (arc-seconds * 1e-5)
_NZMG_TPSI = (
    0.6399175073, -0.1358797613, 0.063294409, -0.02526853, 0.0117879,
    -0.0055161, 0.0026906, -0.001333, 0.00067, -0.00034,
)
#: dphi(psi) inverse series (initial guess; Newton-refined against TPSI)
_NZMG_TPHI = (
    1.5627014243, 0.5185406398, -0.03333098, -0.1052906, -0.0368594,
    0.007317, 0.01220, 0.00394, -0.0013,
)
#: complex polynomial coefficients B_1..B_6 (zeta = sum B_k z^k)
_NZMG_BF = (
    complex(0.7557853228, 0.0),
    complex(0.249204646, 0.003371507),
    complex(-0.001541739, 0.041058560),
    complex(-0.10162907, 0.01727609),
    complex(-0.26623489, -0.36249218),
    complex(-0.6870983, -1.1651967),
)
_NZMG_SEC5 = 3600.0e-5  # degrees -> arc-seconds * 1e-5


def _merid_arc(a: float, e2: float, phi):
    """Meridian arc length M(phi) — the standard e^6 series (Snyder
    3-21), numpy-vectorized; exact enough for double at any latitude."""
    e4, e6 = e2 * e2, e2 * e2 * e2
    return a * (
        (1.0 - e2 / 4.0 - 3.0 * e4 / 64.0 - 5.0 * e6 / 256.0) * phi
        - (3.0 * e2 / 8.0 + 3.0 * e4 / 32.0 + 45.0 * e6 / 1024.0)
        * np.sin(2.0 * phi)
        + (15.0 * e4 / 256.0 + 45.0 * e6 / 1024.0) * np.sin(4.0 * phi)
        - (35.0 * e6 / 3072.0) * np.sin(6.0 * phi)
    )


def _q_auth(e: float, sphi):
    """Authalic q(phi) — numpy-vectorized; also valid on scalars."""
    es = e * sphi
    return (1.0 - e * e) * (
        sphi / (1.0 - es * es) - (1.0 / (2.0 * e)) * np.log((1.0 - es) / (1.0 + es))
    )


# ------------------------------------------------------------ EPSG registry

_NAMED: dict[int, TmercParams | LaeaParams] = {}


def _tm(code, ell, lon0, lat0, k0, fe, fn):
    a, inv_f = ELLIPSOIDS[ell]
    _NAMED[code] = TmercParams(a, inv_f, lon0, lat0, k0, fe, fn)


def _la(code, ell, lon0, lat0, fe, fn):
    a, inv_f = ELLIPSOIDS[ell]
    _NAMED[code] = LaeaParams(a, inv_f, lon0, lat0, fe, fn)


def _lc(code, ell, lon0, lat0, lat1, lat2, fe, fn):
    a, inv_f = ELLIPSOIDS[ell]
    _NAMED[code] = LccParams(a, inv_f, lon0, lat0, lat1, lat2, fe, fn)


def _ab(code, ell, lon0, lat0, lat1, lat2, fe, fn):
    a, inv_f = ELLIPSOIDS[ell]
    _NAMED[code] = AlbersParams(a, inv_f, lon0, lat0, lat1, lat2, fe, fn)


def _st(code, ell, lon0, lat0, k0, fe, fn):
    a, inv_f = ELLIPSOIDS[ell]
    _NAMED[code] = StereaParams(a, inv_f, lon0, lat0, k0, fe, fn)


def _ho(code, ell, lonc, latc, alpha, gamma, k0, fe, fn):
    a, inv_f = ELLIPSOIDS[ell]
    _NAMED[code] = HomParams(a, inv_f, lonc, latc, alpha, gamma, k0, fe, fn)


def _l1(code, ell, lon0, lat0, k0, fe, fn):
    a, inv_f = ELLIPSOIDS[ell]
    _NAMED[code] = Lcc1Params(a, inv_f, lon0, lat0, k0, fe, fn)


def _ps(code, ell, lon0, k0, fe, fn, south=False, lat_ts=None):
    a, inv_f = ELLIPSOIDS[ell]
    _NAMED[code] = PolarParams(a, inv_f, lon0, k0, fe, fn,
                               south=south, lat_ts=lat_ts)


def _me(code, ell, lon0, k0, fe, fn, lat_ts=None):
    a, inv_f = ELLIPSOIDS[ell]
    _NAMED[code] = MercParams(a, inv_f, lon0, k0, fe, fn, lat_ts=lat_ts)


def _kv(code, ell, lon0, latc, alphac, latp, kp, fe, fn, east_north=False):
    a, inv_f = ELLIPSOIDS[ell]
    _NAMED[code] = KrovakParams(a, inv_f, lon0, latc, alphac, latp, kp,
                                fe, fn, east_north=east_north)


def _cs(code, ell, lon0, lat0, fe, fn):
    a, inv_f = ELLIPSOIDS[ell]
    _NAMED[code] = CassiniParams(a, inv_f, lon0, lat0, fe, fn)


def _dms(d, m=0.0, s=0.0):
    """Degrees-minutes-seconds -> decimal degrees (EPSG rows publish
    DMS; converting in code keeps the registry literally the EPSG
    values)."""
    sign = -1.0 if d < 0 else 1.0
    return sign * (abs(d) + m / 60.0 + s / 3600.0)


# national grids (parameters from the public EPSG registry entries)
_tm(27700, "airy", -2.0, 49.0, 0.9996012717, 400000.0, -100000.0)  # OSGB36
_tm(2180, "GRS80", 19.0, 0.0, 0.9993, 500000.0, -5300000.0)  # Poland CS92
_la(3035, "GRS80", 10.0, 52.0, 4321000.0, 3210000.0)  # ETRS89-LAEA Europe
_lc(2154, "GRS80", 3.0, 46.5, 49.0, 44.0, 700000.0, 6600000.0)  # RGF93 / Lambert-93
_lc(3034, "GRS80", 10.0, 52.0, 35.0, 65.0, 4000000.0, 2800000.0)  # ETRS89-LCC Europe
_ab(5070, "GRS80", -96.0, 23.0, 29.5, 45.5, 0.0, 0.0)  # NAD83 / Conus Albers
_ab(3577, "GRS80", 132.0, 0.0, -18.0, -36.0, 0.0, 0.0)  # GDA94 / Australian Albers
_ab(3310, "GRS80", -120.0, 0.0, 34.0, 40.5, 0.0, -4000000.0)  # NAD83 / California Albers
# Amersfoort / RD New (Bessel 1841)
_st(28992, "bessel", 5.0 + 23.0 / 60.0 + 15.5 / 3600.0,
    52.0 + 9.0 / 60.0 + 22.178 / 3600.0, 0.9999079, 155000.0, 463000.0)
# --- round-10 registry tail (EPSG registry rows; same five families
# --- plus Hotine Oblique Mercator B) ---
# Belge 1972 / Belgian Lambert 72 — LCC 2SP on International 1924;
# false origin at the north pole (t(90) = 0 handles r0 = 0)
_lc(31370, "intl", _dms(4, 22, 2.952), 90.0,
    _dms(51, 10, 0.00204), _dms(49, 50, 0.00204), 150000.013, 5400088.438)
# NAD83 / Maryland (metres) — state-plane LCC 2SP
_lc(26985, "GRS80", -77.0, _dms(37, 40), _dms(39, 27), _dms(38, 18),
    400000.0, 0.0)
# NAD83 / BC Albers
_ab(3005, "GRS80", -126.0, 45.0, 50.0, 58.5, 1000000.0, 0.0)
# IRENET95 / Irish Transverse Mercator
_tm(2157, "GRS80", -8.0, 53.5, 0.99982, 600000.0, 750000.0)
# TM65 & TM75 / Irish Grid (Airy Modified)
_tm(29902, "airy_mod", -8.0, 53.5, 1.000035, 200000.0, 250000.0)
_tm(29903, "airy_mod", -8.0, 53.5, 1.000035, 200000.0, 250000.0)
# NZGD2000 / New Zealand Transverse Mercator 2000
_tm(2193, "GRS80", 173.0, 0.0, 0.9996, 1600000.0, 10000000.0)
# CH1903 / LV03 and CH1903+ / LV95 — Swiss Oblique Mercator as
# Hotine variant B with alpha = gamma = 90 (EPSG's published method
# for 21781/2056; matches swisstopo's exact double projection to mm)
_ho(21781, "bessel", _dms(7, 26, 22.5), _dms(46, 57, 8.66),
    90.0, 90.0, 1.0, 600000.0, 200000.0)
_ho(2056, "bessel", _dms(7, 26, 22.5), _dms(46, 57, 8.66),
    90.0, 90.0, 1.0, 2600000.0, 1200000.0)
# Timbalai 1948 / RSO Borneo (m) — the GN7-2 §3.2.6 worked example
_ho(29873, "evrst67", 115.0, 4.0, _dms(53, 18, 56.9537),
    _dms(53, 7, 48.3685), 0.99984, 590476.87, 442857.65)
# Jamaica 1969 / Jamaica National Grid — the GN7-2 §3.1.1 LCC-1SP
# worked example
_l1(24200, "clrk66", -77.0, 18.0, 1.0, 250000.0, 150000.0)
# Universal Polar Stereographic (variant A, k0 at the pole)
_ps(32661, "WGS84", 0.0, 0.994, 2000000.0, 2000000.0)           # UPS N
_ps(32761, "WGS84", 0.0, 0.994, 2000000.0, 2000000.0, south=True)  # UPS S
# variant B (standard parallel): Antarctic + NSIDC sea-ice grids
_ps(3031, "WGS84", 0.0, 1.0, 0.0, 0.0, south=True, lat_ts=-71.0)
_ps(3976, "WGS84", 0.0, 1.0, 0.0, 0.0, south=True, lat_ts=-70.0)
_ps(3413, "WGS84", -45.0, 1.0, 0.0, 0.0, lat_ts=70.0)
# Mercator: World Mercator (9804 k0=1) + the GN7-2 §3.1.3 worked
# example CRS (Makassar / NEIEZ, Bessel)
_me(3395, "WGS84", 0.0, 1.0, 0.0, 0.0)
_me(3002, "bessel", 110.0, 0.997, 3900000.0, 900000.0)
# --- round-11 registry tail ---
# S-JTSK / Krovak East North (every Czech/Slovak import) and the
# Ferro-axes original.  Longitude of origin 24d50' east of Greenwich
# (= 42d30' east of Ferro); azimuth 30d17'17.30311"; pseudo standard
# parallel 78d30' at k = 0.9999 (EPSG method 9819, GN7-2 Krovak
# worked example pinned in test_projection)
_kv(5514, "bessel", _dms(24, 50), 49.5, _dms(30, 17, 17.30311),
    78.5, 0.9999, 0.0, 0.0, east_north=True)
_kv(2065, "bessel", _dms(24, 50), 49.5, _dms(30, 17, 17.30311),
    78.5, 0.9999, 0.0, 0.0)
# Trinidad 1903 / Trinidad Grid — the GN7-2 Cassini-Soldner worked
# example (Clarke 1858; a and the coordinates in Clarke's links)
_cs(30200, "clrk58_links", _dms(-61, 20), _dms(10, 26, 30),
    430000.0, 325000.0)
# Palestine 1923 / Palestine Grid (Clarke 1880 Benoit)
_cs(28191, "clrk80b", _dms(35, 12, 43.490), _dms(31, 44, 2.749),
    170251.555, 126867.909)
# Palestine 1923 / Palestine Belt — the TM (9807) twin of the Cassini
# grid: same origin and FE, FN + 1e6
_tm(28192, "clrk80b", _dms(35, 12, 43.490), _dms(31, 44, 2.749), 1.0,
    170251.555, 1126867.909)
# S-JTSK / Krovak (Greenwich datum, southing/westing axes — the same
# projected numbers as the Ferro-axes 2065)
_kv(5513, "bessel", _dms(24, 50), 49.5, _dms(30, 17, 17.30311),
    78.5, 0.9999, 0.0, 0.0)
# NZGD49 / New Zealand Map Grid (EPSG method 9811, International 1924)
_NAMED[27200] = NzmgParams(6378388.0, 297.0, 173.0, -41.0,
                           2510000.0, 6023150.0)
# --- round-12 registry tail ---
# NAD83 / Michigan Oblique Mercator (EPSG method 9812, Hotine variant
# A: FE/FN at the natural origin, no u_c offset); 3079 is the
# NAD83(HARN) twin with identical projection parameters
_NAMED[3078] = HomAParams(*ELLIPSOIDS["GRS80"], -86.0,
                          _dms(45, 18, 33), _dms(337, 15, 20),
                          _dms(337, 15, 20), 0.9996,
                          2546731.496, -4354009.816)
_NAMED[3079] = _NAMED[3078]
# Tananarive (Paris) / Laborde Grid (EPSG method 9813) — projection
# centre 21 grads S, 49 grads east of Paris (Paris meridian
# 2d20'14.025" E), azimuth 21 grads, k0 = 0.9995
_NAMED[29701] = LabordeParams(
    *ELLIPSOIDS["intl"], 44.1 + _dms(2, 20, 14.025), -18.9, 18.9,
    0.9995, 400000.0, 800000.0)
# Tananarive (Paris) / Laborde Grid approximation (EPSG:29702) — the
# registry's published APPROXIMATION of 29701: Hotine Oblique
# Mercator variant B with the same centre/azimuth/scale (this is
# exactly how PROJ and most software realize 29702); differs from the
# true Laborde cubic by <1 m over onshore Madagascar
_ho(29702, "intl", 44.1 + _dms(2, 20, 14.025), -18.9, 18.9, 18.9,
    0.9995, 400000.0, 800000.0)

#: Method-level example parameter sets for families with no EPSG row
#: this registry can state with certainty offline (the EPSG registry
#: rows for Bonne CRSs — historic Portuguese/French series — are not
#: reproducible from public formulas alone, only from the registry
#: database).  These keys resolve through epsg_params() like codes do
#: and are exercised by the epsg_registry_tail gate; a user with a
#: real Bonne EPSG row registers it with register_epsg().
METHOD_EXAMPLES: dict[str, object] = {
    # Bonne on International 1924 centred on Portugal's belt — the
    # method example for EPSG 9827 (invariant-pinned, see BonneParams)
    "bonne_example": BonneParams(*ELLIPSOIDS["intl"], -8.0, 39.668,
                                 0.0, 0.0),
    # the South Orientated twin (EPSG method 9828, the historic
    # Portuguese axes convention)
    "bonne_so_example": BonneSoParams(*ELLIPSOIDS["bessel"], -8.0,
                                      39.668, 0.0, 0.0),
}


#: every params class forward_xy can dispatch (subclasses — TmSo,
#: HomA, BonneSo — are covered through their bases); register_epsg
#: validates against this union so an unknown params object fails
#: loudly at registration, not as garbage coordinates later
_PARAM_TYPES = (
    TmercParams, LaeaParams, LccParams, AlbersParams, StereaParams,
    Lcc1Params, PolarParams, MercParams, HomParams, KrovakParams,
    CassiniParams, NzmgParams, LabordeParams, BonneParams,
)


def register_epsg(code: int, params) -> None:
    """Register projection parameters for an EPSG code at runtime —
    the escape hatch matching the reference's any-code contract
    (src/reprojection.cpp:17-102 accepts any SRID PROJ resolves): a
    deployment whose CRS row is absent from the built-in registry
    supplies the published EPSG parameters once, and every transform
    (-E flag, flex expire, geometry functions) resolves it."""
    if not isinstance(code, int):
        raise TypeError(f"EPSG code must be int, got {type(code)}")
    if not isinstance(params, _PARAM_TYPES):
        raise TypeError(
            f"register_epsg({code}): params must be one of the "
            f"registry's parameter classes "
            f"({', '.join(t.__name__ for t in _PARAM_TYPES)}), got "
            f"{type(params).__name__}")
    _NAMED[code] = params


def epsg_params(code: int | str) -> TmercParams | LaeaParams:
    """Resolve an EPSG code (or a METHOD_EXAMPLES key) to projection
    parameters.

    Covers: WGS84 UTM 32601-32660 (N) / 32701-32760 (S), ETRS89 UTM
    25828-25838, NAD83 UTM 26901-26923, plus the named national grids
    above; register_epsg() adds codes at runtime.  Raises KeyError
    for unknown codes (the reference raises for SRIDs PROJ cannot
    resolve, src/reprojection.cpp:83-85)."""
    if isinstance(code, str):
        return METHOD_EXAMPLES[code]
    if code in _NAMED:
        return _NAMED[code]
    if 32601 <= code <= 32660:  # WGS84 / UTM north
        zone = code - 32600
        return TmercParams(*ELLIPSOIDS["WGS84"], 6.0 * zone - 183.0, 0.0, 0.9996, 500000.0, 0.0)
    if 32701 <= code <= 32760:  # WGS84 / UTM south
        zone = code - 32700
        return TmercParams(*ELLIPSOIDS["WGS84"], 6.0 * zone - 183.0, 0.0, 0.9996, 500000.0, 10000000.0)
    if 25828 <= code <= 25838:  # ETRS89 / UTM
        zone = code - 25800
        return TmercParams(*ELLIPSOIDS["GRS80"], 6.0 * zone - 183.0, 0.0, 0.9996, 500000.0, 0.0)
    if 26901 <= code <= 26923:  # NAD83 / UTM north
        zone = code - 26900
        return TmercParams(*ELLIPSOIDS["GRS80"], 6.0 * zone - 183.0, 0.0, 0.9996, 500000.0, 0.0)
    if 31466 <= code <= 31469:  # DHDN / Gauss-Krueger zones 2-5
        zone = code - 31464
        return TmercParams(*ELLIPSOIDS["bessel"], 3.0 * zone, 0.0, 1.0,
                           zone * 1e6 + 500000.0, 0.0)
    if 28402 <= code <= 28432:  # Pulkovo 1942 / Gauss-Krueger zones 2-32
        zone = code - 28400
        return TmercParams(*ELLIPSOIDS["krass"], 6.0 * zone - 3.0, 0.0, 1.0,
                           zone * 1e6 + 500000.0, 0.0)
    if 2046 <= code <= 2055:  # Hartebeesthoek94 / Lo15..Lo33 (9808)
        lon0 = 15.0 + 2.0 * (code - 2046)
        return TmSoParams(*ELLIPSOIDS["WGS84"], lon0, 0.0, 1.0, 0.0, 0.0)
    named = ", ".join(str(c) for c in sorted(_NAMED))
    raise KeyError(
        f"EPSG:{code} not supported (no PROJ in this environment; "
        "supported ranges: 32601-32660/32701-32760 (WGS84 UTM), "
        "25828-25838 (ETRS89 UTM), 26901-26923 (NAD83 UTM), "
        "31466-31469 (DHDN GK), 28402-28432 (Pulkovo GK), "
        "2046-2055 (SA Lo grids, TM South Orientated); "
        f"named codes: {named})"
    )


# ------------------------------------------------------------ TM kernels

def tmerc_forward(lon: np.ndarray, lat: np.ndarray, p: TmercParams):
    """(E, N) from degrees lon/lat.  Krueger series, order n^6."""
    lam = np.radians(lon - p.lon0)
    phi = np.radians(lat)
    e = p.e
    sphi = np.sin(phi)
    psi = np.arctanh(sphi) - e * np.arctanh(e * sphi)
    t = np.sinh(psi)
    coslam = np.cos(lam)
    xip = np.arctan2(t, coslam)
    etap = np.arcsinh(np.sin(lam) / np.sqrt(t * t + coslam * coslam))
    xi = xip.copy()
    eta = etap.copy()
    for j, a_j in enumerate(p.alpha, 1):
        xi = xi + a_j * np.sin(2.0 * j * xip) * np.cosh(2.0 * j * etap)
        eta = eta + a_j * np.cos(2.0 * j * xip) * np.sinh(2.0 * j * etap)
    k0A = p.k0 * p.big_a
    return p.fe + k0A * eta, p.fn + k0A * (xi - p.xi0)


def tmerc_inverse(E: np.ndarray, N: np.ndarray, p: TmercParams):
    """(lon, lat) degrees from (E, N).  Inverse series + Newton on the
    ellipsoidal tangent (5 iterations: double-precision converged)."""
    k0A = p.k0 * p.big_a
    xi = (np.asarray(N, dtype="f8") - p.fn) / k0A + p.xi0
    eta = (np.asarray(E, dtype="f8") - p.fe) / k0A
    xip = xi.copy()
    etap = eta.copy()
    for j, b_j in enumerate(p.beta, 1):
        xip = xip - b_j * np.sin(2.0 * j * xi) * np.cosh(2.0 * j * eta)
        etap = etap - b_j * np.cos(2.0 * j * xi) * np.sinh(2.0 * j * eta)
    lam = np.arctan2(np.sinh(etap), np.cos(xip))
    tp = np.sin(xip) / np.sqrt(np.sinh(etap) ** 2 + np.cos(xip) ** 2)
    # Newton: find phi with t(phi) = tp, t = sinh(atanh(sin phi) - e atanh(e sin phi))
    e = p.e
    phi = np.arctan(tp)
    for _ in range(5):
        sphi = np.sin(phi)
        psi = np.arctanh(sphi) - e * np.arctanh(e * sphi)
        g = np.sinh(psi) - tp
        dpsi = 1.0 / np.cos(phi) - e * e * np.cos(phi) / (1.0 - (e * sphi) ** 2)
        phi = phi - g / (np.cosh(psi) * dpsi)
    return p.lon0 + np.degrees(lam), np.degrees(phi)


def tmso_forward(lon: np.ndarray, lat: np.ndarray, p: TmSoParams):
    """(W, S) — TM South Orientated forward (EPSG 9808): the 9807
    forward on the zero-false-origin twin, axes negated."""
    e0, n0 = tmerc_forward(lon, lat, p.tm0)
    return p.fe - e0, p.fn - n0


def tmso_inverse(W: np.ndarray, S: np.ndarray, p: TmSoParams):
    return tmerc_inverse(p.fe - W, p.fn - S, p.tm0)


# ------------------------------------------------------------- LCC kernels

def lcc_forward(lon: np.ndarray, lat: np.ndarray, p: LccParams):
    """(E, N) — Lambert Conformal Conic 2SP forward (EPSG 9802)."""
    e, n = p.e, p.n
    phi = np.radians(lat)
    s = np.sin(phi)
    t = np.tan(np.pi / 4.0 - phi / 2.0) / (
        (1.0 - e * s) / (1.0 + e * s)
    ) ** (e / 2.0)
    r = p.a * p.big_f * t**n
    theta = n * np.radians(lon - p.lon0)
    return p.fe + r * np.sin(theta), p.fn + p.r0 - r * np.cos(theta)


def lcc_inverse(E: np.ndarray, N: np.ndarray, p: LccParams):
    """(lon, lat) — 9802 inverse; conformal-latitude fixed point (5
    iterations: double-precision converged)."""
    e, n = p.e, p.n
    dx = np.asarray(E, dtype="f8") - p.fe
    dy = p.r0 - (np.asarray(N, dtype="f8") - p.fn)
    r = np.sign(n) * np.hypot(dx, dy)
    t = (r / (p.a * p.big_f)) ** (1.0 / n)
    theta = np.arctan2(np.sign(n) * dx, np.sign(n) * dy)
    lon = p.lon0 + np.degrees(theta / n)
    phi = np.pi / 2.0 - 2.0 * np.arctan(t)
    for _ in range(5):
        s = np.sin(phi)
        phi = np.pi / 2.0 - 2.0 * np.arctan(
            t * ((1.0 - e * s) / (1.0 + e * s)) ** (e / 2.0)
        )
    return lon, np.degrees(phi)


# ------------------------------------------------------------ LAEA kernels

def laea_forward(lon: np.ndarray, lat: np.ndarray, p: LaeaParams):
    """(E, N) — ellipsoidal oblique LAEA (Snyder 24-2..24-30)."""
    e = p.e
    phi = np.radians(lat)
    lam = np.radians(lon - p.lon0)
    phi0 = math.radians(p.lat0)
    q = _q_auth(e, np.sin(phi))
    qp = _q_auth(e, 1.0)
    q0 = _q_auth(e, math.sin(phi0))
    beta = np.arcsin(q / qp)
    beta0 = math.asin(q0 / qp)
    rq = p.a * math.sqrt(qp / 2.0)
    s0 = math.sin(phi0)
    d = (p.a * math.cos(phi0) / math.sqrt(1.0 - (e * s0) ** 2)) / (
        rq * math.cos(beta0)
    )
    sb0, cb0 = math.sin(beta0), math.cos(beta0)
    sb, cb = np.sin(beta), np.cos(beta)
    coslam = np.cos(lam)
    b = rq * np.sqrt(2.0 / (1.0 + sb0 * sb + cb0 * cb * coslam))
    E = p.fe + (b * d) * cb * np.sin(lam)
    N = p.fn + (b / d) * (cb0 * sb - sb0 * cb * coslam)
    return E, N


# ---------------------------------------------------------- Albers kernels

def albers_forward(lon: np.ndarray, lat: np.ndarray, p: AlbersParams):
    """(E, N) — ellipsoidal Albers Equal Area Conic (Snyder 14-1..4)."""
    n, big_c = p.n, p.big_c
    q = _q_auth(p.e, np.sin(np.radians(lat)))
    rho = p.a * np.sqrt(big_c - n * q) / n
    theta = n * np.radians(lon - p.lon0)
    return p.fe + rho * np.sin(theta), p.fn + p.rho0 - rho * np.cos(theta)


def albers_inverse(E: np.ndarray, N: np.ndarray, p: AlbersParams):
    """(lon, lat) — 9822 inverse; authalic-latitude Newton (Snyder
    3-16, 5 iterations: double-precision converged)."""
    e, n, big_c = p.e, p.n, p.big_c
    dx = np.asarray(E, dtype="f8") - p.fe
    dy = p.rho0 - (np.asarray(N, dtype="f8") - p.fn)
    rho = np.sign(n) * np.hypot(dx, dy)
    theta = np.arctan2(np.sign(n) * dx, np.sign(n) * dy)
    lon = p.lon0 + np.degrees(theta / n)
    q = (big_c - (rho * n / p.a) ** 2) / n
    qp = _q_auth(e, 1.0)
    phi = np.arcsin(np.clip(q / 2.0, -1.0, 1.0))
    for _ in range(5):
        s = np.sin(phi)
        es2 = (e * s) ** 2
        phi = phi + (1.0 - es2) ** 2 / (2.0 * np.cos(phi) * (1.0 - e * e)) * (
            q - _q_auth(e, s)
        )
    return lon, np.degrees(phi)


# --------------------------------------------- oblique stereographic kernels

def _sterea_chi(p: StereaParams, phi: np.ndarray):
    """Conformal latitude chi and sphere longitude multiplier inputs."""
    _, n, c, _ = p._derived
    e = p.e
    s = np.sin(phi)
    sa = (1.0 + s) / (1.0 - s)
    sb = (1.0 - e * s) / (1.0 + e * s)
    w = c * (sa * sb**e) ** n
    return np.arcsin((w - 1.0) / (w + 1.0))


def sterea_forward(lon: np.ndarray, lat: np.ndarray, p: StereaParams):
    """(E, N) — oblique stereographic (EPSG 9809, conformal sphere)."""
    big_r, n, _, chi0 = p._derived
    phi = np.radians(lat)
    chi = _sterea_chi(p, phi)
    dlam = n * np.radians(lon - p.lon0)
    b = 1.0 + np.sin(chi) * math.sin(chi0) + np.cos(chi) * math.cos(chi0) * np.cos(dlam)
    k = 2.0 * big_r * p.k0 / b
    E = p.fe + k * np.cos(chi) * np.sin(dlam)
    N = p.fn + k * (np.sin(chi) * math.cos(chi0) - np.cos(chi) * math.sin(chi0) * np.cos(dlam))
    return E, N


def sterea_inverse(E: np.ndarray, N: np.ndarray, p: StereaParams):
    """(lon, lat) — 9809 inverse: sphere-side exact, then fixed point
    on the conformal latitude (8 iterations: double converged)."""
    big_r, n, c, chi0 = p._derived
    e = p.e
    x = np.asarray(E, dtype="f8") - p.fe
    y = np.asarray(N, dtype="f8") - p.fn
    rho = np.hypot(x, y)
    with np.errstate(invalid="ignore"):
        tau = rho / (2.0 * big_r * p.k0)
    delta = 2.0 * np.arctan(tau)
    sc0, cc0 = math.sin(chi0), math.cos(chi0)
    sind, cosd = np.sin(delta), np.cos(delta)
    # guard rho=0 (the origin): sin/cos terms collapse to chi=chi0
    unit_x = np.where(rho == 0.0, 0.0, x / np.where(rho == 0.0, 1.0, rho))
    unit_y = np.where(rho == 0.0, 0.0, y / np.where(rho == 0.0, 1.0, rho))
    chi = np.arcsin(np.clip(cosd * sc0 + unit_y * sind * cc0, -1.0, 1.0))
    dlam = np.arctan2(unit_x * sind, cc0 * cosd - unit_y * sc0 * sind)
    lon = p.lon0 + np.degrees(dlam / n)
    # invert chi(phi): w = c ((1+s)/(1-s) ((1-es)/(1+es))^e)^n
    sin_chi = np.sin(chi)
    w = (1.0 + sin_chi) / (1.0 - sin_chi)
    phi = chi
    for _ in range(8):
        s = np.sin(phi)
        sb = (1.0 - e * s) / (1.0 + e * s)
        ratio = (w / c) ** (1.0 / n) / sb**e
        phi = np.arcsin((ratio - 1.0) / (ratio + 1.0))
    return lon, np.degrees(phi)


# --------------------------------------- Polar Stereographic kernels

def polar_forward(lon: np.ndarray, lat: np.ndarray, p: PolarParams):
    """(E, N) — Polar Stereographic forward (EPSG 9810/9829,
    GN7-2 §3.1.6), north or south aspect."""
    k0 = p.k0_eff
    t = p._t(np.radians(lat))
    rho = 2.0 * p.a * k0 * t / p._ce
    theta = np.radians(lon - p.lon0)
    if p.south:
        return p.fe + rho * np.sin(theta), p.fn + rho * np.cos(theta)
    return p.fe + rho * np.sin(theta), p.fn - rho * np.cos(theta)


def polar_inverse(E: np.ndarray, N: np.ndarray, p: PolarParams):
    """(lon, lat) — 9810/9829 inverse; conformal-latitude fixed point
    (8 iterations: double-precision converged)."""
    e = p.e
    k0 = p.k0_eff
    dx = np.asarray(E, dtype="f8") - p.fe
    dy = np.asarray(N, dtype="f8") - p.fn
    rho = np.hypot(dx, dy)
    t = rho * p._ce / (2.0 * p.a * k0)
    chi = np.pi / 2.0 - 2.0 * np.arctan(t)  # aspect-local latitude
    phi = chi
    for _ in range(8):
        s = np.sin(phi)
        phi = np.pi / 2.0 - 2.0 * np.arctan(
            t * ((1.0 - e * s) / (1.0 + e * s)) ** (e / 2.0)
        )
    if p.south:
        lon = p.lon0 + np.degrees(np.arctan2(dx, dy))
        return lon, -np.degrees(phi)
    lon = p.lon0 + np.degrees(np.arctan2(dx, -dy))
    return lon, np.degrees(phi)


# ------------------------------------------------- Mercator kernels

def merc_forward(lon: np.ndarray, lat: np.ndarray, p: MercParams):
    """(E, N) — ellipsoidal Mercator forward (EPSG 9804/9805)."""
    e = p.e
    ak = p.a * p.k0_eff
    phi = np.radians(lat)
    s = np.sin(phi)
    N = ak * (np.arctanh(s) - e * np.arctanh(e * s))
    return p.fe + ak * np.radians(lon - p.lon0), p.fn + N


def merc_inverse(E: np.ndarray, N: np.ndarray, p: MercParams):
    """(lon, lat) — Mercator inverse via Newton on the isometric
    latitude (5 iterations: double-precision converged)."""
    e = p.e
    ak = p.a * p.k0_eff
    psi = (np.asarray(N, dtype="f8") - p.fn) / ak
    lon = p.lon0 + np.degrees((np.asarray(E, dtype="f8") - p.fe) / ak)
    t = np.sinh(psi)
    phi = np.arctan(t)
    for _ in range(5):
        s = np.sin(phi)
        g = np.sinh(np.arctanh(s) - e * np.arctanh(e * s)) - t
        dpsi = 1.0 / np.cos(phi) - e * e * np.cos(phi) / (
            1.0 - (e * s) ** 2
        )
        psi_phi = np.arctanh(s) - e * np.arctanh(e * s)
        phi = phi - g / (np.cosh(psi_phi) * dpsi)
    return lon, np.degrees(phi)


# ------------------------------------- Hotine Oblique Mercator kernels

def hom_forward(lon: np.ndarray, lat: np.ndarray, p: HomParams):
    """(E, N) — Hotine Oblique Mercator forward (GN7-2 §3.2.6):
    variant B (EPSG 9815) by default; for HomAParams (variant A,
    EPSG 9812) the u_c offset is zero and FE/FN apply at the natural
    origin instead of the projection centre."""
    e = p.e
    big_b, big_a, big_h, gamma0, lon0, uc = p._derived
    if isinstance(p, HomAParams):
        uc = 0.0  # variant A: u referenced to the natural origin
    sign = 1.0 if p.latc >= 0.0 else -1.0
    phi = np.radians(lat)
    s = np.sin(phi)
    t = np.tan(np.pi / 4.0 - phi / 2.0) / (
        (1.0 - e * s) / (1.0 + e * s)
    ) ** (e / 2.0)
    big_q = big_h / t**big_b
    big_s = (big_q - 1.0 / big_q) / 2.0
    big_t = (big_q + 1.0 / big_q) / 2.0
    dl = big_b * np.radians(lon - lon0)
    big_v = np.sin(dl)
    big_u = (-big_v * math.cos(gamma0) + big_s * math.sin(gamma0)) / big_t
    v = big_a * np.log((1.0 - big_u) / (1.0 + big_u)) / (2.0 * big_b)
    u = (
        big_a
        * np.arctan2(
            big_s * math.cos(gamma0) + big_v * math.sin(gamma0), np.cos(dl)
        )
        / big_b
        - abs(uc) * sign
    )
    gc = math.radians(p.gamma)
    return (
        v * math.cos(gc) + u * math.sin(gc) + p.fe,
        u * math.cos(gc) - v * math.sin(gc) + p.fn,
    )


def hom_inverse(E: np.ndarray, N: np.ndarray, p: HomParams):
    """(lon, lat) — 9815/9812 inverse; conformal-latitude fixed
    point (8 iterations: double-precision converged)."""
    e = p.e
    big_b, big_a, big_h, gamma0, lon0, uc = p._derived
    if isinstance(p, HomAParams):
        uc = 0.0
    sign = 1.0 if p.latc >= 0.0 else -1.0
    gc = math.radians(p.gamma)
    de = np.asarray(E, dtype="f8") - p.fe
    dn = np.asarray(N, dtype="f8") - p.fn
    v = de * math.cos(gc) - dn * math.sin(gc)
    u = dn * math.cos(gc) + de * math.sin(gc) + abs(uc) * sign
    big_q = np.exp(-big_b * v / big_a)
    big_s = (big_q - 1.0 / big_q) / 2.0
    big_v = np.sin(big_b * u / big_a)
    big_u = (big_v * math.cos(gamma0) + big_s * math.sin(gamma0)) / (
        (big_q + 1.0 / big_q) / 2.0
    )
    t = (big_h / np.sqrt((1.0 + big_u) / (1.0 - big_u))) ** (1.0 / big_b)
    phi = np.pi / 2.0 - 2.0 * np.arctan(t)
    for _ in range(8):
        s = np.sin(phi)
        phi = np.pi / 2.0 - 2.0 * np.arctan(
            t * ((1.0 - e * s) / (1.0 + e * s)) ** (e / 2.0)
        )
    lon = lon0 - np.degrees(
        np.arctan2(
            big_s * math.cos(gamma0) - big_v * math.sin(gamma0),
            np.cos(big_b * u / big_a),
        )
    ) / big_b
    return lon, np.degrees(phi)


# ------------------------------------------------------ Krovak kernels

def krovak_forward(lon: np.ndarray, lat: np.ndarray, p: KrovakParams):
    """(x, y) — Krovak forward (EPSG 9819, GN7-2).  Axis convention
    per p.east_north (see KrovakParams)."""
    e = p.e
    big_a, big_b, gamma0, t0, n, r0 = p._derived
    alphac = math.radians(p.alphac)
    latp = math.radians(p.latp)
    phi = np.radians(lat)
    s = np.sin(phi)
    big_u = 2.0 * (
        np.arctan(
            t0
            * np.tan(phi / 2.0 + np.pi / 4.0) ** big_b
            / ((1.0 + e * s) / (1.0 - e * s)) ** (e * big_b / 2.0)
        )
        - np.pi / 4.0
    )
    big_v = big_b * np.radians(p.lon0 - lon)
    big_t = np.arcsin(
        math.cos(alphac) * np.sin(big_u)
        + math.sin(alphac) * np.cos(big_u) * np.cos(big_v)
    )
    big_d = np.arcsin(np.cos(big_u) * np.sin(big_v) / np.cos(big_t))
    theta = n * big_d
    r = (
        r0
        * math.tan(math.pi / 4.0 + latp / 2.0) ** n
        / np.tan(big_t / 2.0 + np.pi / 4.0) ** n
    )
    southing = r * np.cos(theta) + p.fn
    westing = r * np.sin(theta) + p.fe
    if p.east_north:
        return -westing, -southing
    return westing, southing


def krovak_inverse(x: np.ndarray, y: np.ndarray, p: KrovakParams):
    """(lon, lat) — 9819 inverse; conformal-latitude fixed point (8
    iterations: double-precision converged)."""
    e = p.e
    big_a, big_b, gamma0, t0, n, r0 = p._derived
    alphac = math.radians(p.alphac)
    latp = math.radians(p.latp)
    if p.east_north:
        westing = -np.asarray(x, dtype="f8") - p.fe
        southing = -np.asarray(y, dtype="f8") - p.fn
    else:
        westing = np.asarray(x, dtype="f8") - p.fe
        southing = np.asarray(y, dtype="f8") - p.fn
    r = np.hypot(southing, westing)
    theta = np.arctan2(westing, southing)
    big_d = theta / n
    big_t = 2.0 * (
        np.arctan(
            (r0 / r) ** (1.0 / n) * math.tan(math.pi / 4.0 + latp / 2.0)
        )
        - np.pi / 4.0
    )
    big_u = np.arcsin(
        math.cos(alphac) * np.sin(big_t)
        - math.sin(alphac) * np.cos(big_t) * np.cos(big_d)
    )
    big_v = np.arcsin(np.cos(big_t) * np.sin(big_d) / np.cos(big_u))
    base = t0 ** (-1.0 / big_b) * np.tan(
        big_u / 2.0 + np.pi / 4.0
    ) ** (1.0 / big_b)
    phi = big_u
    for _ in range(8):
        s = np.sin(phi)
        phi = 2.0 * (
            np.arctan(base * ((1.0 + e * s) / (1.0 - e * s)) ** (e / 2.0))
            - np.pi / 4.0
        )
    lon = p.lon0 - np.degrees(big_v / big_b)
    return lon, np.degrees(phi)


# ----------------------------------------------- Cassini-Soldner kernels

def cassini_forward(lon: np.ndarray, lat: np.ndarray, p: CassiniParams):
    """(E, N) — Cassini-Soldner forward (EPSG 9806, GN7-2 series)."""
    e2 = p.e ** 2
    phi = np.radians(lat)
    lam = np.radians(lon - p.lon0)
    s, c = np.sin(phi), np.cos(phi)
    tanphi = np.tan(phi)
    big_a = lam * c
    big_t = tanphi * tanphi
    big_c = e2 * c * c / (1.0 - e2)
    nu = p.a / np.sqrt(1.0 - e2 * s * s)
    a2 = big_a * big_a
    E = p.fe + nu * big_a * (
        1.0 - big_t * a2 / 6.0
        - (8.0 - big_t + 8.0 * big_c) * big_t * a2 * a2 / 120.0
    )
    N = p.fn + _merid_arc(p.a, e2, phi) - p.m0 + nu * tanphi * a2 * (
        0.5 + (5.0 - big_t + 6.0 * big_c) * a2 / 24.0
    )
    return E, N


def cassini_inverse(E: np.ndarray, N: np.ndarray, p: CassiniParams):
    """(lon, lat) — 9806 inverse: rectifying-latitude series for the
    footpoint, then the GN7-2 closed series."""
    e2 = p.e ** 2
    e1 = (1.0 - math.sqrt(1.0 - e2)) / (1.0 + math.sqrt(1.0 - e2))
    m1 = p.m0 + (np.asarray(N, dtype="f8") - p.fn)
    mu1 = m1 / (p.a * (1.0 - e2 / 4.0 - 3.0 * e2 * e2 / 64.0
                       - 5.0 * e2 ** 3 / 256.0))
    phi1 = (
        mu1
        + (3.0 * e1 / 2.0 - 27.0 * e1 ** 3 / 32.0) * np.sin(2.0 * mu1)
        + (21.0 * e1 ** 2 / 16.0 - 55.0 * e1 ** 4 / 32.0) * np.sin(4.0 * mu1)
        + (151.0 * e1 ** 3 / 96.0) * np.sin(6.0 * mu1)
        + (1097.0 * e1 ** 4 / 512.0) * np.sin(8.0 * mu1)
    )
    s1 = np.sin(phi1)
    t1 = np.tan(phi1) ** 2
    nu1 = p.a / np.sqrt(1.0 - e2 * s1 * s1)
    rho1 = p.a * (1.0 - e2) / (1.0 - e2 * s1 * s1) ** 1.5
    big_d = (np.asarray(E, dtype="f8") - p.fe) / nu1
    d2 = big_d * big_d
    phi = phi1 - (nu1 * np.tan(phi1) / rho1) * d2 * (
        0.5 - (1.0 + 3.0 * t1) * d2 / 24.0
    )
    lam = (
        big_d
        - t1 * big_d * d2 / 3.0
        + (1.0 + 3.0 * t1) * t1 * big_d * d2 * d2 / 15.0
    ) / np.cos(phi1)
    return p.lon0 + np.degrees(lam), np.degrees(phi)


# ---------------------------------------------------------- NZMG kernels

def _nzmg_psi(dphi):
    """psi series (numpy-safe): sum tpsi_k * dphi^k, k = 1..10."""
    psi = np.zeros_like(np.asarray(dphi, dtype="f8"))
    for t in reversed(_NZMG_TPSI):
        psi = (psi + t) * dphi
    return psi


def nzmg_forward(lon: np.ndarray, lat: np.ndarray, p: NzmgParams):
    """(E, N) — New Zealand Map Grid forward (EPSG 9811): complex
    Horner over z = psi + i*dlambda."""
    dphi = (np.asarray(lat, dtype="f8") - p.lat0) * _NZMG_SEC5
    z = _nzmg_psi(dphi) + 1j * np.radians(
        np.asarray(lon, dtype="f8") - p.lon0
    )
    zeta = np.full_like(z, _NZMG_BF[-1])
    for b in reversed(_NZMG_BF[:-1]):
        zeta = zeta * z + b
    zeta = zeta * z
    return p.fe + p.a * zeta.imag, p.fn + p.a * zeta.real


def nzmg_inverse(E: np.ndarray, N: np.ndarray, p: NzmgParams):
    """(lon, lat) — 9811 inverse: Newton on the complex polynomial to
    recover z, the published inverse series for the first latitude
    guess, then Newton against the forward psi series (double
    converged)."""
    zeta = (
        (np.asarray(N, dtype="f8") - p.fn)
        + 1j * (np.asarray(E, dtype="f8") - p.fe)
    ) / p.a
    z = zeta / _NZMG_BF[0]
    for _ in range(10):
        pz = np.full_like(z, _NZMG_BF[-1])
        dp = np.zeros_like(z)
        for b in reversed(_NZMG_BF[:-1]):
            dp = dp * z + pz
            pz = pz * z + b
        dp = dp * z + pz  # d/dz of (poly(z) * z)
        pz = pz * z
        z = z - (pz - zeta) / dp
    psi, lam = z.real, z.imag
    dphi = np.zeros_like(psi)
    for t in reversed(_NZMG_TPHI):
        dphi = (dphi + t) * psi
    for _ in range(4):  # Newton against the forward series
        f = _nzmg_psi(dphi) - psi
        df = np.zeros_like(dphi)
        for k in range(len(_NZMG_TPSI), 0, -1):
            df = df * dphi + k * _NZMG_TPSI[k - 1]
        dphi = dphi - f / df
    return p.lon0 + np.degrees(lam), p.lat0 + dphi / _NZMG_SEC5


# -------------------------------------------------- Laborde kernels

def laborde_forward(lon: np.ndarray, lat: np.ndarray, p: LabordeParams):
    """(E, N) — Laborde Oblique Mercator forward (EPSG 9813, GN7-2):
    Gauss sphere -> oblique rotation -> Mercator -> cubic complex
    correction z = H + G*H^3."""
    e = p.e
    big_b, phi_s, big_r, big_c, big_g = p._derived
    phi = np.radians(np.asarray(lat, dtype="f8"))
    s = np.sin(phi)
    big_l = big_b * np.radians(np.asarray(lon, dtype="f8") - p.lonc)
    q = big_c + big_b * np.log(
        np.tan(np.pi / 4.0 + phi / 2.0)
        * ((1.0 - e * s) / (1.0 + e * s)) ** (e / 2.0)
    )
    big_p = 2.0 * np.arctan(np.exp(q)) - np.pi / 2.0
    cp, sp = np.cos(big_p), np.sin(big_p)
    ss, cs = math.sin(phi_s), math.cos(phi_s)
    u = cp * np.cos(big_l) * cs + sp * ss
    v = cp * np.cos(big_l) * ss - sp * cs
    w = cp * np.sin(big_l)
    d = np.sqrt(u * u + v * v)
    # d = 0 only at the rotated poles (outside any CRS's use area);
    # the guarded where() keeps the kernel NaN-free regardless
    lp = np.where(d > 0.0, 2.0 * np.arctan2(v, u + d), 0.0)
    pp = np.where(d > 0.0, np.arctan2(w, d),
                  np.copysign(np.pi / 2.0, w))
    big_h = -lp + 1j * np.log(np.tan(np.pi / 4.0 + pp / 2.0))
    # explicit (H*H)*H, matching the SQL twin's expansion order so
    # both engines feed the rounding identical doubles
    h3 = (big_h * big_h) * big_h
    z = big_h + big_g * h3
    return p.fe + big_r * z.imag, p.fn + big_r * z.real


def laborde_inverse(E: np.ndarray, N: np.ndarray, p: LabordeParams):
    """(lon, lat) — 9813 inverse: Newton on H + G*H^3 = z, inverse
    rotation, then the Gauss-sphere -> ellipsoid fixed point."""
    e = p.e
    big_b, phi_s, big_r, big_c, big_g = p._derived
    z = (
        (np.asarray(N, dtype="f8") - p.fn)
        + 1j * (np.asarray(E, dtype="f8") - p.fe)
    ) / big_r
    h = z.copy()
    for _ in range(10):
        h = h - (h + big_g * h ** 3 - z) / (1.0 + 3.0 * big_g * h * h)
    lp, qp = -h.real, h.imag
    pp = 2.0 * np.arctan(np.exp(qp)) - np.pi / 2.0
    cpp = np.cos(pp)
    up = cpp * np.cos(lp)
    vp = cpp * np.sin(lp)
    wp = np.sin(pp)
    ss, cs = math.sin(phi_s), math.cos(phi_s)
    x = cs * up + ss * vp   # cos(P) cos(L)
    y = wp                  # cos(P) sin(L)
    zz = ss * up - cs * vp  # sin(P)
    d = np.sqrt(x * x + y * y)
    big_p = np.arctan2(zz, d)
    big_l = np.arctan2(y, x)
    lon = p.lonc + np.degrees(big_l) / big_b
    qe = (np.log(np.tan(np.pi / 4.0 + big_p / 2.0)) - big_c) / big_b
    phi = 2.0 * np.arctan(np.exp(qe)) - np.pi / 2.0
    for _ in range(8):
        s = np.sin(phi)
        phi = 2.0 * np.arctan(
            ((1.0 + e * s) / (1.0 - e * s)) ** (e / 2.0) * np.exp(qe)
        ) - np.pi / 2.0
    return lon, np.degrees(phi)


# ---------------------------------------------------- Bonne kernels

def bonne_forward(lon: np.ndarray, lat: np.ndarray, p: BonneParams):
    """(E, N) — Bonne forward (EPSG 9827, GN7-2): concentric arcs at
    meridian-arc distance, true scale along every parallel."""
    e2 = p.e ** 2
    rho0, m_0 = p._derived
    phi = np.radians(np.asarray(lat, dtype="f8"))
    s = np.sin(phi)
    m = np.cos(phi) / np.sqrt(1.0 - e2 * s * s)
    rho = rho0 + m_0 - _merid_arc(p.a, e2, phi)
    # rho = 0 only at the apex latitude (lat0's antipodal arc centre,
    # outside any CRS's use area); guard keeps the kernel NaN-free
    # and the formulas then collapse to the apex point (fe, fn+rho0)
    big_t = np.where(
        rho != 0.0,
        p.a * m * np.radians(np.asarray(lon, dtype="f8") - p.lon0)
        / np.where(rho != 0.0, rho, 1.0),
        0.0,
    )
    return (
        p.fe + rho * np.sin(big_t),
        p.fn + rho0 - rho * np.cos(big_t),
    )


def bonne_so_forward(lon: np.ndarray, lat: np.ndarray, p: BonneSoParams):
    """(W, S) — Bonne South Orientated forward (EPSG 9828): the 9827
    surface with westing/southing axes."""
    p27 = BonneParams(p.a, p.inv_f, p.lon0, p.lat0, 0.0, 0.0)
    e, n = bonne_forward(lon, lat, p27)
    return p.fe - e, p.fn - n


def bonne_so_inverse(W: np.ndarray, S: np.ndarray, p: BonneSoParams):
    """(lon, lat) — 9828 inverse via the 9827 inverse on flipped
    axes."""
    p27 = BonneParams(p.a, p.inv_f, p.lon0, p.lat0, 0.0, 0.0)
    return bonne_inverse(p.fe - np.asarray(W, dtype="f8"),
                         p.fn - np.asarray(S, dtype="f8"), p27)


def bonne_inverse(E: np.ndarray, N: np.ndarray, p: BonneParams):
    """(lon, lat) — 9827 inverse: radius -> meridian arc ->
    rectifying-latitude series (Snyder 3-26), then the parallel-arc
    angle."""
    e2 = p.e ** 2
    rho0, m_0 = p._derived
    x = np.asarray(E, dtype="f8") - p.fe
    y = rho0 - (np.asarray(N, dtype="f8") - p.fn)
    sign0 = 1.0 if p.lat0 >= 0.0 else -1.0
    rho = sign0 * np.sqrt(x * x + y * y)
    big_m = rho0 + m_0 - rho
    e1 = (1.0 - math.sqrt(1.0 - e2)) / (1.0 + math.sqrt(1.0 - e2))
    mu = big_m / (p.a * (1.0 - e2 / 4.0 - 3.0 * e2 * e2 / 64.0
                         - 5.0 * e2 ** 3 / 256.0))
    phi = (
        mu
        + (3.0 * e1 / 2.0 - 27.0 * e1 ** 3 / 32.0) * np.sin(2.0 * mu)
        + (21.0 * e1 ** 2 / 16.0 - 55.0 * e1 ** 4 / 32.0) * np.sin(4.0 * mu)
        + (151.0 * e1 ** 3 / 96.0) * np.sin(6.0 * mu)
        + (1097.0 * e1 ** 4 / 512.0) * np.sin(8.0 * mu)
    )
    s = np.sin(phi)
    m = np.cos(phi) / np.sqrt(1.0 - e2 * s * s)
    big_t = np.arctan2(sign0 * x, sign0 * y)
    lam = rho * big_t / (p.a * m)
    return p.lon0 + np.degrees(lam), np.degrees(phi)


def nzmg_forward_sql(
    lon_expr: str, lat_expr: str, p: NzmgParams
) -> tuple[str, str]:
    """(easting_sql, northing_sql) — DuckDB twin of nzmg_forward: the
    complex polynomial expanded into real (psi^a * lam^b) monomials
    (binomial expansion of B_k z^k, coefficients folded numerically
    from the same constants), so the twin needs no complex
    arithmetic and stays a scalar expression."""
    # zeta = sum_k B_k z^k, z = psi + i lam:
    # z^k = sum_j C(k,j) psi^(k-j) (i lam)^j
    re_c: dict[tuple[int, int], float] = {}
    im_c: dict[tuple[int, int], float] = {}
    for k, b in enumerate(_NZMG_BF, 1):
        for j in range(k + 1):
            c = math.comb(k, j)
            i_pow = 1j ** j
            coef = b * c * i_pow
            key = (k - j, j)  # psi^(k-j) lam^j
            re_c[key] = re_c.get(key, 0.0) + coef.real
            im_c[key] = im_c.get(key, 0.0) + coef.imag
    dphi = f"((({lat_expr}) - {_r(p.lat0)}) * {_r(_NZMG_SEC5)})"
    psi_terms = [
        f"{_r(t)}*pow({dphi}, {k})"
        for k, t in enumerate(_NZMG_TPSI, 1)
    ]
    psi = "(" + " + ".join(psi_terms) + ")"
    lam = f"radians(({lon_expr}) - {_r(p.lon0)})"

    def poly(coeffs: dict) -> str:
        terms = []
        for (a_, b_), c in sorted(coeffs.items()):
            if c == 0.0:
                continue
            factors = [_r(c)]
            if a_:
                factors.append(f"pow({psi}, {a_})")
            if b_:
                factors.append(f"pow({lam}, {b_})")
            terms.append("*".join(factors))
        return "(" + " + ".join(terms) + ")"

    return (
        f"({_r(p.fe)} + {_r(p.a)}*{poly(im_c)})",
        f"({_r(p.fn)} + {_r(p.a)}*{poly(re_c)})",
    )


# ------------------------------------------------------------ geometry API

def forward_xy(lon: np.ndarray, lat: np.ndarray, p):
    """Dispatch the forward projection for a resolved params object —
    vectorized (lon[], lat[]) -> (x[], y[])."""
    if isinstance(p, TmSoParams):  # subclass: must dispatch before 9807
        return tmso_forward(lon, lat, p)
    if isinstance(p, TmercParams):
        return tmerc_forward(lon, lat, p)
    if isinstance(p, LccParams):
        return lcc_forward(lon, lat, p)
    if isinstance(p, AlbersParams):
        return albers_forward(lon, lat, p)
    if isinstance(p, StereaParams):
        return sterea_forward(lon, lat, p)
    if isinstance(p, HomParams):
        return hom_forward(lon, lat, p)
    if isinstance(p, Lcc1Params):
        return lcc_forward(lon, lat, p)  # same derived surface as 2SP
    if isinstance(p, PolarParams):
        return polar_forward(lon, lat, p)
    if isinstance(p, MercParams):
        return merc_forward(lon, lat, p)
    if isinstance(p, KrovakParams):
        return krovak_forward(lon, lat, p)
    if isinstance(p, CassiniParams):
        return cassini_forward(lon, lat, p)
    if isinstance(p, NzmgParams):
        return nzmg_forward(lon, lat, p)
    if isinstance(p, LabordeParams):
        return laborde_forward(lon, lat, p)
    if isinstance(p, BonneSoParams):  # subclass: before 9827
        return bonne_so_forward(lon, lat, p)
    if isinstance(p, BonneParams):
        return bonne_forward(lon, lat, p)
    if isinstance(p, LaeaParams):
        return laea_forward(lon, lat, p)
    raise TypeError(
        f"unsupported projection params type {type(p).__name__}; "
        "register_epsg() accepts only the registry's params classes "
        "(TmercParams, LaeaParams, ..., BonneParams)")


def transform_epsg(geom, code: int):
    """Forward-transform a geometry (kind, payload) from 4326 into the
    target EPSG — same geometry model as functions/geometry.py."""
    from osm2pgsql_spark.functions.geometry import _map_coords

    p = epsg_params(code)

    def f(a: np.ndarray) -> np.ndarray:
        x, y = forward_xy(a[:, 0], a[:, 1], p)
        return np.column_stack([x, y])

    return _map_coords(geom, f)


# ------------------------------------------------------------ SQL oracles

def _r(v: float) -> str:
    return repr(float(v))


def tmerc_forward_sql(lon_expr: str, lat_expr: str, p: TmercParams) -> tuple[str, str]:
    """(easting_sql, northing_sql) — the SAME Krueger forward as
    tmerc_forward, as DuckDB-evaluable scalar SQL over `lon_expr` /
    `lat_expr`.  Constants are interpolated from the identical params
    object, so the two evaluations can only differ by libm ULPs
    (absorbed by the gate's whole-meter rounding).  sinh/cosh/asinh/
    atanh are spelled with exp/ln, which DuckDB lacks as builtins."""
    e = p.e
    lam = f"radians(({lon_expr}) - {_r(p.lon0)})"
    sphi = f"sin(radians({lat_expr}))"
    psi = (
        f"(0.5*ln((1.0+({sphi}))/(1.0-({sphi})))"
        f" - {_r(e)}*0.5*ln((1.0+{_r(e)}*({sphi}))/(1.0-{_r(e)}*({sphi}))))"
    )
    t = f"((exp({psi}) - exp(-({psi})))/2.0)"
    coslam = f"cos({lam})"
    xip = f"atan2({t}, {coslam})"
    w = f"(sin({lam})/sqrt(({t})*({t}) + ({coslam})*({coslam})))"
    etap = f"ln(({w}) + sqrt(({w})*({w}) + 1.0))"
    xi_terms = [xip]
    eta_terms = [etap]
    for j, a_j in enumerate(p.alpha, 1):
        c = 2.0 * j
        cosh_j = f"((exp({c}*({etap})) + exp(-({c})*({etap})))/2.0)"
        sinh_j = f"((exp({c}*({etap})) - exp(-({c})*({etap})))/2.0)"
        xi_terms.append(f"{_r(a_j)}*sin({c}*({xip}))*{cosh_j}")
        eta_terms.append(f"{_r(a_j)}*cos({c}*({xip}))*{sinh_j}")
    xi = "(" + " + ".join(xi_terms) + ")"
    eta = "(" + " + ".join(eta_terms) + ")"
    k0A = p.k0 * p.big_a
    return (
        f"({_r(p.fe)} + {_r(k0A)}*{eta})",
        f"({_r(p.fn)} + {_r(k0A)}*({xi} - {_r(p.xi0)}))",
    )


def tmso_forward_sql(
    lon_expr: str, lat_expr: str, p: TmSoParams
) -> tuple[str, str]:
    """(westing_sql, southing_sql) — DuckDB twin of tmso_forward:
    the 9807 twin on the zero-false-origin params, negated."""
    e0, n0 = tmerc_forward_sql(lon_expr, lat_expr, p.tm0)
    return f"({_r(p.fe)} - ({e0}))", f"({_r(p.fn)} - ({n0}))"


def lcc_forward_sql(lon_expr: str, lat_expr: str, p: LccParams) -> tuple[str, str]:
    """(easting_sql, northing_sql) — DuckDB twin of lcc_forward."""
    e, n = p.e, p.n
    sphi = f"sin(radians({lat_expr}))"
    es = f"({_r(e)}*({sphi}))"
    t = (
        f"(tan(pi()/4.0 - radians({lat_expr})/2.0)"
        f" / pow((1.0-({es}))/(1.0+({es})), {_r(e / 2.0)}))"
    )
    r = f"({_r(p.a * p.big_f)}*pow({t}, {_r(n)}))"
    theta = f"({_r(n)}*radians(({lon_expr}) - {_r(p.lon0)}))"
    return (
        f"({_r(p.fe)} + ({r})*sin({theta}))",
        f"({_r(p.fn + p.r0)} - ({r})*cos({theta}))",
    )


def laea_forward_sql(lon_expr: str, lat_expr: str, p: LaeaParams) -> tuple[str, str]:
    """(easting_sql, northing_sql) — DuckDB twin of laea_forward."""
    e = p.e
    qp = _q_auth(e, 1.0)
    q0 = _q_auth(e, math.sin(math.radians(p.lat0)))
    beta0 = math.asin(q0 / qp)
    rq = p.a * math.sqrt(qp / 2.0)
    s0 = math.sin(math.radians(p.lat0))
    d = (p.a * math.cos(math.radians(p.lat0)) / math.sqrt(1.0 - (e * s0) ** 2)) / (
        rq * math.cos(beta0)
    )
    sb0, cb0 = math.sin(beta0), math.cos(beta0)
    lam = f"radians(({lon_expr}) - {_r(p.lon0)})"
    sphi = f"sin(radians({lat_expr}))"
    es = f"({_r(e)}*({sphi}))"
    q = (
        f"({_r(1.0 - e * e)}*(({sphi})/(1.0-({es})*({es}))"
        f" - {_r(1.0 / (2.0 * e))}*ln((1.0-({es}))/(1.0+({es})))))"
    )
    beta = f"asin(({q})/{_r(qp)})"
    sb = f"sin({beta})"
    cb = f"cos({beta})"
    coslam = f"cos({lam})"
    b = f"({_r(rq)}*sqrt(2.0/(1.0 + {_r(sb0)}*({sb}) + {_r(cb0)}*({cb})*({coslam}))))"
    return (
        f"({_r(p.fe)} + ({b})*{_r(d)}*({cb})*sin({lam}))",
        f"({_r(p.fn)} + (({b})/{_r(d)})*({_r(cb0)}*({sb}) - {_r(sb0)}*({cb})*({coslam})))",
    )


def albers_forward_sql(lon_expr: str, lat_expr: str, p: AlbersParams) -> tuple[str, str]:
    """(easting_sql, northing_sql) — DuckDB twin of albers_forward."""
    e, n = p.e, p.n
    sphi = f"sin(radians({lat_expr}))"
    es = f"({_r(e)}*({sphi}))"
    q = (
        f"({_r(1.0 - e * e)}*(({sphi})/(1.0-({es})*({es}))"
        f" - {_r(1.0 / (2.0 * e))}*ln((1.0-({es}))/(1.0+({es})))))"
    )
    rho = f"({_r(p.a / n)}*sqrt({_r(p.big_c)} - {_r(n)}*({q})))"
    theta = f"({_r(n)}*radians(({lon_expr}) - {_r(p.lon0)}))"
    return (
        f"({_r(p.fe)} + ({rho})*sin({theta}))",
        f"({_r(p.fn + p.rho0)} - ({rho})*cos({theta}))",
    )


def polar_forward_sql(lon_expr: str, lat_expr: str, p: PolarParams) -> tuple[str, str]:
    """(easting_sql, northing_sql) — DuckDB twin of polar_forward."""
    e = p.e
    k0 = p.k0_eff
    lat = f"({'-' if p.south else ''}({lat_expr}))"
    sphi = f"sin(radians({lat}))"
    es = f"({_r(e)}*({sphi}))"
    t = (
        f"(tan(pi()/4.0 - radians({lat})/2.0)"
        f" / pow((1.0-({es}))/(1.0+({es})), {_r(e / 2.0)}))"
    )
    rho = f"({_r(2.0 * p.a * k0 / p._ce)}*({t}))"
    theta = f"radians(({lon_expr}) - {_r(p.lon0)})"
    op = "+" if p.south else "-"
    return (
        f"({_r(p.fe)} + ({rho})*sin({theta}))",
        f"({_r(p.fn)} {op} ({rho})*cos({theta}))",
    )


def merc_forward_sql(lon_expr: str, lat_expr: str, p: MercParams) -> tuple[str, str]:
    """(easting_sql, northing_sql) — DuckDB twin of merc_forward
    (atanh spelled with ln)."""
    e = p.e
    ak = p.a * p.k0_eff
    sphi = f"sin(radians({lat_expr}))"
    es = f"({_r(e)}*({sphi}))"
    psi = (
        f"(0.5*ln((1.0+({sphi}))/(1.0-({sphi})))"
        f" - {_r(e)}*0.5*ln((1.0+({es}))/(1.0-({es}))))"
    )
    return (
        f"({_r(p.fe)} + {_r(ak)}*radians(({lon_expr}) - {_r(p.lon0)}))",
        f"({_r(p.fn)} + {_r(ak)}*{psi})",
    )


def hom_forward_sql(lon_expr: str, lat_expr: str, p: HomParams) -> tuple[str, str]:
    """(easting_sql, northing_sql) — DuckDB twin of hom_forward
    (variants B and, with the u_c offset zeroed, A)."""
    e = p.e
    big_b, big_a, big_h, gamma0, lon0, uc = p._derived
    if isinstance(p, HomAParams):
        uc = 0.0
    sign = 1.0 if p.latc >= 0.0 else -1.0
    sphi = f"sin(radians({lat_expr}))"
    es = f"({_r(e)}*({sphi}))"
    t = (
        f"(tan(pi()/4.0 - radians({lat_expr})/2.0)"
        f" / pow((1.0-({es}))/(1.0+({es})), {_r(e / 2.0)}))"
    )
    q = f"({_r(big_h)}/pow({t}, {_r(big_b)}))"
    s = f"((({q}) - 1.0/({q}))/2.0)"
    tt = f"((({q}) + 1.0/({q}))/2.0)"
    dl = f"({_r(big_b)}*radians(({lon_expr}) - {_r(lon0)}))"
    v_ = f"sin({dl})"
    u_ = (
        f"(((-({v_}))*{_r(math.cos(gamma0))}"
        f" + ({s})*{_r(math.sin(gamma0))})/({tt}))"
    )
    v = f"({_r(big_a)}*ln((1.0-({u_}))/(1.0+({u_})))/{_r(2.0 * big_b)})"
    u = (
        f"({_r(big_a)}*atan2(({s})*{_r(math.cos(gamma0))}"
        f" + ({v_})*{_r(math.sin(gamma0))}, cos({dl}))/{_r(big_b)}"
        f" - {_r(abs(uc) * sign)})"
    )
    gc = math.radians(p.gamma)
    return (
        f"(({v})*{_r(math.cos(gc))} + ({u})*{_r(math.sin(gc))} + {_r(p.fe)})",
        f"(({u})*{_r(math.cos(gc))} - ({v})*{_r(math.sin(gc))} + {_r(p.fn)})",
    )


def krovak_forward_sql(
    lon_expr: str, lat_expr: str, p: KrovakParams
) -> tuple[str, str]:
    """(x_sql, y_sql) — DuckDB twin of krovak_forward (axis convention
    per p.east_north)."""
    e = p.e
    big_a, big_b, gamma0, t0, n, r0 = p._derived
    alphac = math.radians(p.alphac)
    latp = math.radians(p.latp)
    sphi = f"sin(radians({lat_expr}))"
    es = f"({_r(e)}*({sphi}))"
    u = (
        f"(2.0*(atan({_r(t0)}*pow(tan(radians({lat_expr})/2.0 + pi()/4.0), "
        f"{_r(big_b)})/pow((1.0+({es}))/(1.0-({es})), {_r(e * big_b / 2.0)}))"
        f" - pi()/4.0))"
    )
    v = f"({_r(big_b)}*radians({_r(p.lon0)} - ({lon_expr})))"
    t = (
        f"asin({_r(math.cos(alphac))}*sin({u})"
        f" + {_r(math.sin(alphac))}*cos({u})*cos({v}))"
    )
    d = f"asin(cos({u})*sin({v})/cos({t}))"
    theta = f"({_r(n)}*({d}))"
    rk = _r(r0 * math.tan(math.pi / 4.0 + latp / 2.0) ** n)
    r = f"({rk}/pow(tan(({t})/2.0 + pi()/4.0), {_r(n)}))"
    southing = f"(({r})*cos({theta}) + {_r(p.fn)})"
    westing = f"(({r})*sin({theta}) + {_r(p.fe)})"
    if p.east_north:
        return f"(-{westing})", f"(-{southing})"
    return westing, southing


def cassini_forward_sql(
    lon_expr: str, lat_expr: str, p: CassiniParams
) -> tuple[str, str]:
    """(easting_sql, northing_sql) — DuckDB twin of cassini_forward."""
    e2 = p.e ** 2
    e4, e6 = e2 * e2, e2 ** 3
    c0 = 1.0 - e2 / 4.0 - 3.0 * e4 / 64.0 - 5.0 * e6 / 256.0
    c2 = 3.0 * e2 / 8.0 + 3.0 * e4 / 32.0 + 45.0 * e6 / 1024.0
    c4 = 15.0 * e4 / 256.0 + 45.0 * e6 / 1024.0
    c6 = 35.0 * e6 / 3072.0
    phi = f"radians({lat_expr})"
    s = f"sin({phi})"
    c = f"cos({phi})"
    tanphi = f"tan({phi})"
    big_a = f"(radians(({lon_expr}) - {_r(p.lon0)})*({c}))"
    a2 = f"(({big_a})*({big_a}))"
    big_t = f"(({tanphi})*({tanphi}))"
    big_c = f"({_r(e2 / (1.0 - e2))}*({c})*({c}))"
    nu = f"({_r(p.a)}/sqrt(1.0 - {_r(e2)}*({s})*({s})))"
    m = (
        f"({_r(p.a)}*({_r(c0)}*({phi}) - {_r(c2)}*sin(2.0*({phi}))"
        f" + {_r(c4)}*sin(4.0*({phi})) - {_r(c6)}*sin(6.0*({phi}))))"
    )
    easting = (
        f"({_r(p.fe)} + ({nu})*({big_a})*(1.0 - ({big_t})*({a2})/6.0"
        f" - (8.0 - ({big_t}) + 8.0*({big_c}))*({big_t})"
        f"*({a2})*({a2})/120.0))"
    )
    northing = (
        f"({_r(p.fn - p.m0)} + ({m}) + ({nu})*({tanphi})*({a2})"
        f"*(0.5 + (5.0 - ({big_t}) + 6.0*({big_c}))*({a2})/24.0))"
    )
    return easting, northing


def laborde_forward_sql(
    lon_expr: str, lat_expr: str, p: LabordeParams
) -> tuple[str, str]:
    """(easting_sql, northing_sql) — DuckDB twin of laborde_forward;
    the complex cubic H + G*H^3 expanded into real/imaginary parts."""
    e = p.e
    big_b, phi_s, big_r, big_c, big_g = p._derived
    ss, cs = math.sin(phi_s), math.cos(phi_s)
    phi = f"radians({lat_expr})"
    sphi = f"sin({phi})"
    es = f"({_r(e)}*({sphi}))"
    q = (
        f"({_r(big_c)} + {_r(big_b)}*ln(tan(pi()/4.0 + ({phi})/2.0)"
        f"*pow((1.0-({es}))/(1.0+({es})), {_r(e / 2.0)})))"
    )
    bp = f"(2.0*atan(exp({q})) - pi()/2.0)"
    bl = f"({_r(big_b)}*radians(({lon_expr}) - {_r(p.lonc)}))"
    u_ = f"(cos({bp})*cos({bl})*{_r(cs)} + sin({bp})*{_r(ss)})"
    v_ = f"(cos({bp})*cos({bl})*{_r(ss)} - sin({bp})*{_r(cs)})"
    w_ = f"(cos({bp})*sin({bl}))"
    d = f"sqrt(({u_})*({u_}) + ({v_})*({v_}))"
    # same d=0 rotated-pole guards as the numpy kernel's np.where
    # (r12 ADVICE): unreachable from any registered CRS's use area,
    # but the twin must stay NaN-free wherever the kernel is.
    # d >= |u| always, so u+d >= 0 and atan(v/(u+d)) equals the
    # kernel's arctan2(v, u+d) — EXCEPT on the u+d=0 line (v=0, u<0
    # up to rounding), where DuckDB's atan(0/0) is NULL; the extra
    # branches emulate arctan2 there too (r13 ADVICE):
    # arctan2(v, 0) = sign(v)*pi/2 -> lp = +-pi; arctan2(0, 0) = 0.
    lp = (
        f"(CASE WHEN ({d}) > 0.0 AND (({u_}) + ({d})) <> 0.0"
        f" THEN 2.0*atan(({v_})/(({u_}) + ({d})))"
        f" WHEN ({d}) > 0.0 AND ({v_}) > 0.0 THEN pi()"
        f" WHEN ({d}) > 0.0 AND ({v_}) < 0.0 THEN -pi()"
        f" ELSE 0.0 END)"
    )
    pp = (
        f"(CASE WHEN ({d}) > 0.0 THEN atan(({w_})/({d}))"
        f" WHEN ({w_}) >= 0.0 THEN pi()/2.0 ELSE -pi()/2.0 END)"
    )
    # H = hr + i*hi with hr = -L', hi = ln tan(pi/4 + P'/2)
    hr = f"(-({lp}))"
    hi = f"ln(tan(pi()/4.0 + ({pp})/2.0))"
    h2r = f"(({hr})*({hr}) - ({hi})*({hi}))"
    h2i = f"(2.0*({hr})*({hi}))"
    h3r = f"(({h2r})*({hr}) - ({h2i})*({hi}))"
    h3i = f"(({h2r})*({hi}) + ({h2i})*({hr}))"
    gr, gi = big_g.real, big_g.imag
    zr = f"(({hr}) + {_r(gr)}*({h3r}) - {_r(gi)}*({h3i}))"
    zi = f"(({hi}) + {_r(gr)}*({h3i}) + {_r(gi)}*({h3r}))"
    return (
        f"({_r(p.fe)} + {_r(big_r)}*({zi}))",
        f"({_r(p.fn)} + {_r(big_r)}*({zr}))",
    )


def bonne_forward_sql(
    lon_expr: str, lat_expr: str, p: BonneParams
) -> tuple[str, str]:
    """(easting_sql, northing_sql) — DuckDB twin of bonne_forward."""
    e2 = p.e ** 2
    e4, e6 = e2 * e2, e2 ** 3
    c0 = 1.0 - e2 / 4.0 - 3.0 * e4 / 64.0 - 5.0 * e6 / 256.0
    c2 = 3.0 * e2 / 8.0 + 3.0 * e4 / 32.0 + 45.0 * e6 / 1024.0
    c4 = 15.0 * e4 / 256.0 + 45.0 * e6 / 1024.0
    c6 = 35.0 * e6 / 3072.0
    rho0, m_0 = p._derived
    phi = f"radians({lat_expr})"
    s = f"sin({phi})"
    m = f"(cos({phi})/sqrt(1.0 - {_r(e2)}*({s})*({s})))"
    big_m = (
        f"({_r(p.a)}*({_r(c0)}*({phi}) - {_r(c2)}*sin(2.0*({phi}))"
        f" + {_r(c4)}*sin(4.0*({phi})) - {_r(c6)}*sin(6.0*({phi}))))"
    )
    rho = f"({_r(rho0 + m_0)} - ({big_m}))"
    # same rho=0 apex guard as the numpy kernel (r12 ADVICE)
    bt = (
        f"(CASE WHEN ({rho}) <> 0.0"
        f" THEN {_r(p.a)}*({m})*radians(({lon_expr}) - {_r(p.lon0)})"
        f"/({rho}) ELSE 0.0 END)"
    )
    return (
        f"({_r(p.fe)} + ({rho})*sin({bt}))",
        f"({_r(p.fn + rho0)} - ({rho})*cos({bt}))",
    )


def bonne_so_forward_sql(
    lon_expr: str, lat_expr: str, p: BonneSoParams
) -> tuple[str, str]:
    """(westing_sql, southing_sql) — DuckDB twin of bonne_so_forward."""
    p27 = BonneParams(p.a, p.inv_f, p.lon0, p.lat0, 0.0, 0.0)
    e_sql, n_sql = bonne_forward_sql(lon_expr, lat_expr, p27)
    return f"({_r(p.fe)} - {e_sql})", f"({_r(p.fn)} - {n_sql})"


def sterea_forward_sql(lon_expr: str, lat_expr: str, p: StereaParams) -> tuple[str, str]:
    """(easting_sql, northing_sql) — DuckDB twin of sterea_forward."""
    big_r, n, c, chi0 = p._derived
    e = p.e
    sphi = f"sin(radians({lat_expr}))"
    sa = f"((1.0+({sphi}))/(1.0-({sphi})))"
    sb = f"((1.0-{_r(e)}*({sphi}))/(1.0+{_r(e)}*({sphi})))"
    w = f"({_r(c)}*pow(({sa})*pow({sb}, {_r(e)}), {_r(n)}))"
    chi = f"asin((({w})-1.0)/(({w})+1.0))"
    dlam = f"({_r(n)}*radians(({lon_expr}) - {_r(p.lon0)}))"
    b = (
        f"(1.0 + sin({chi})*{_r(math.sin(chi0))}"
        f" + cos({chi})*{_r(math.cos(chi0))}*cos({dlam}))"
    )
    k = f"({_r(2.0 * big_r * p.k0)}/({b}))"
    return (
        f"({_r(p.fe)} + ({k})*cos({chi})*sin({dlam}))",
        f"({_r(p.fn)} + ({k})*(sin({chi})*{_r(math.cos(chi0))}"
        f" - cos({chi})*{_r(math.sin(chi0))}*cos({dlam})))",
    )
