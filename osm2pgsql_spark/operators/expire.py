"""Tile-expiry operator: dirty web-mercator tiles from geometries.

Reference algorithm (/root/reference/src/expire-tiles.cpp:36-322):
- points:  the containing tile +- a buffer (default 0.1 tile widths)
- lines:   walk each segment in 0.4-tile steps, expire the bbox of
           each step (+ buffer)  (:268-322)
- polygons: boundary via the line walk, then in full_area mode a
           scanline fill over tile rows (:137-216); hybrid mode picks
           boundary_only when the bbox exceeds full_area_limit
           (:118-134, expire-config.hpp)
- tile coordinates: mercator meters -> tile space via
  width * (0.5 + x / EARTH_CIRCUMFERENCE)   (:64-70)

Spark-first shape: the per-geometry tile enumeration is a pandas-UDF
"UDTF" (WKB -> ARRAY<STRUCT<x,y>>), exploded and deduped; the zoom
rollup (expire-output.cpp:85-106) is the JVM-side
functions.tiles.rollup_zoom.  The dedupe is the only shuffle; caps
(max_tiles_geometry 1e7 per geometry) are enforced inside the kernel
like the reference (expire-output.hpp:24-25).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from osm2pgsql_spark.functions import geometry as G

EARTH_CIRCUMFERENCE = 40075016.68  # reference src/tile.hpp:76
MAX_TILES_GEOMETRY = 10_000_000  # reference src/expire-output.hpp:24


@dataclass(frozen=True)
class ExpireConfig:
    """Mirror of expire_config_t (/root/reference/src/expire-config.hpp)."""

    maxzoom: int = 12
    buffer: float = 0.1
    mode: str = "full_area"  # full_area | boundary_only | hybrid
    full_area_limit: float = 0.0  # meters, hybrid switch threshold
    # reference expire-output caps (src/expire-output.cpp:20-50):
    # a geometry dirtying more than max_tiles_geometry tiles expires
    # nothing (bad-geometry guard); a run whose DISTINCT dirty set
    # exceeds max_tiles_overall expires nothing (the reference's
    # mutable first-come variant is order-dependent and has no
    # declarative analog — the distinct-count form is the
    # deterministic equivalent).  0 = unlimited.
    max_tiles_geometry: int = 0
    max_tiles_overall: int = 0


def _coords_to_tile(pts: np.ndarray, map_width: int) -> np.ndarray:
    """Mercator meters -> continuous tile coords (reference :64-70)."""
    out = np.empty_like(pts)
    out[:, 0] = map_width * (0.5 + pts[:, 0] / EARTH_CIRCUMFERENCE)
    out[:, 1] = map_width * (0.5 - pts[:, 1] / EARTH_CIRCUMFERENCE)
    return out


def _norm_x(x: int, map_width: int) -> int:
    # Python % already returns a non-negative result for a positive
    # modulus, so no negative branch is needed — intentionally NOT
    # reproducing the reference's out-of-range arithmetic for x < 0
    # (reference :55-61 can yield x > map_width there)
    return x % map_width


class _TileSet:
    def __init__(self, map_width: int) -> None:
        self.tiles: set[tuple[int, int]] = set()
        self.map_width = map_width

    def add(self, x: int, y: int) -> None:
        if len(self.tiles) > MAX_TILES_GEOMETRY:
            return
        if 0 <= y < self.map_width:
            self.tiles.add((_norm_x(x, self.map_width), y))


def _expire_point(tc: np.ndarray, buf: float, ts: _TileSet) -> None:
    ymin = max(0, int(tc[1] - buf))
    ymax = min(ts.map_width - 1, int(tc[1] + buf))
    for x in range(int(tc[0] - buf), int(tc[0] + buf) + 1):
        for y in range(ymin, ymax + 1):
            ts.add(x, y)


def _expire_segment(a: np.ndarray, b: np.ndarray, buf: float, ts: _TileSet) -> None:
    """The 0.4-tile-step walk (reference :268-322)."""
    if a[0] > b[0]:
        a, b = b, a
    x_len = b[0] - a[0]
    if x_len > ts.map_width / 2:  # date-line crossing
        a = a.copy()
        a[0] += ts.map_width
        a, b = b, a
        x_len = b[0] - a[0]
    y_len = b[1] - a[1]
    hyp = float(np.hypot(x_len, y_len))
    if hyp == 0.0:
        _expire_point(a, buf, ts)
        return
    x_step, y_step = x_len / hyp, y_len / hyp
    i = 0
    while i <= hyp / 0.4:
        step = i * 0.4
        nstep = min(hyp, (i + 1) * 0.4)
        x1 = a[0] + step * x_step
        y1 = a[1] + step * y_step
        x2 = a[0] + nstep * x_step
        y2 = a[1] + nstep * y_step
        if y1 > y2:
            y1, y2 = y2, y1
        for x in range(int(x1 - buf), int(x2 + buf) + 1):
            for y in range(int(y1 - buf), int(y2 + buf) + 1):
                if y >= 0:
                    ts.add(x, y)
        i += 1


def _expire_line(pts: np.ndarray, buf: float, ts: _TileSet) -> None:
    tc = _coords_to_tile(pts, ts.map_width)
    for i in range(1, tc.shape[0]):
        _expire_segment(tc[i - 1], tc[i], buf, ts)


def _expire_polygon_area(rings: list[np.ndarray], ts: _TileSet) -> None:
    """Scanline fill over tile rows (reference :137-216)."""
    tcs = [_coords_to_tile(r, ts.map_width) for r in rings]
    ally = np.concatenate([t[:, 1] for t in tcs])
    min_tile_y = int(ally.min())
    max_tile_y = int(ally.max())
    for tile_y in range(min_tile_y, max_tile_y):
        xs: list[float] = []
        fy = float(tile_y)
        for tc in tcs:
            y0 = tc[:-1, 1]
            y1 = tc[1:, 1]
            cross = ((y1 < fy) & (y0 >= fy)) | ((y0 < fy) & (y1 >= fy))
            idx = np.nonzero(cross)[0]
            for i in idx:
                t1 = tc[i + 1]
                t2 = tc[i]
                pos = (fy - t1[1]) / (t2[1] - t1[1]) * (t2[0] - t1[0])
                xs.append(float(np.clip(t1[0] + pos, 0.0, ts.map_width - 1)))
        xs.sort()
        for i in range(0, len(xs) - 1, 2):
            if xs[i] >= ts.map_width - 1:
                break
            if xs[i + 1] > 0:
                for x in range(int(xs[i]), int(xs[i + 1])):
                    ts.add(x, tile_y)


def _bbox_meters(rings: list[np.ndarray]) -> tuple[float, float]:
    allp = np.vstack(rings)
    return (
        float(allp[:, 0].max() - allp[:, 0].min()),
        float(allp[:, 1].max() - allp[:, 1].min()),
    )


def tiles_for_geometry(geom, cfg: ExpireConfig) -> list[tuple[int, int]]:
    """Dirty (x, y) tiles at cfg.maxzoom for a geometry in EPSG:3857.

    Mirrors expire_tiles_t::from_geometry for each geometry kind."""
    if geom is None:
        return []
    map_width = 1 << cfg.maxzoom
    ts = _TileSet(map_width)
    kind, payload = geom

    def polygons_of(g):
        k, p = g
        if k == "polygon":
            return [p]
        if k == "multipolygon":
            return list(p)
        return []

    if kind == "point":
        tc = _coords_to_tile(np.asarray([payload], dtype="f8"), map_width)[0]
        _expire_point(tc, cfg.buffer, ts)
    elif kind == "multipoint":
        for p in payload:
            tc = _coords_to_tile(np.asarray([p], dtype="f8"), map_width)[0]
            _expire_point(tc, cfg.buffer, ts)
    elif kind == "linestring":
        _expire_line(payload, cfg.buffer, ts)
    elif kind == "multilinestring":
        for part in payload:
            _expire_line(part, cfg.buffer, ts)
    elif kind in ("polygon", "multipolygon"):
        polys = polygons_of(geom)
        all_rings = [r for p in polys for r in p]
        mode = cfg.mode
        if mode == "hybrid":
            w, h = _bbox_meters(all_rings)
            mode = (
                "boundary_only"
                if (w > cfg.full_area_limit or h > cfg.full_area_limit)
                else "full_area"
            )
        for ring in all_rings:
            _expire_line(ring, cfg.buffer, ts)
        if mode == "full_area" and len(ts.tiles) > 1:
            for p in polys:
                _expire_polygon_area(p, ts)
    elif kind == "collection":
        out: set[tuple[int, int]] = set()
        for g in payload:
            out.update(tiles_for_geometry(g, cfg))
        return sorted(out)
    return sorted(ts.tiles)


_UDF_CACHE: dict[tuple, object] = {}


def tiles_udf(cfg: ExpireConfig):
    """WKB (EPSG:3857) -> ARRAY<STRUCT<x:bigint,y:bigint>> pandas UDF."""
    key = (cfg.maxzoom, cfg.buffer, cfg.mode, cfg.full_area_limit,
           cfg.max_tiles_geometry)
    if key not in _UDF_CACHE:

        def kernel(wkb: pd.Series) -> pd.Series:
            out = []
            for w in wkb:
                if w is None:
                    out.append([])
                    continue
                tl = tiles_for_geometry(G.from_wkb(w), cfg)
                if cfg.max_tiles_geometry and len(tl) > cfg.max_tiles_geometry:
                    # "Tile limit reached for single geometry" — the
                    # geometry expires nothing (expire-output.cpp:29)
                    out.append([])
                    continue
                out.append([{"x": x, "y": y} for x, y in tl])
            return pd.Series(out, dtype=object)

        _UDF_CACHE[key] = pandas_udf(kernel, "array<struct<x:bigint,y:bigint>>")
    return _UDF_CACHE[key]


def dirty_tiles(
    geoms: DataFrame, cfg: ExpireConfig, wkb_col: str = "geom"
) -> DataFrame:
    """Distinct dirty (x, y) tiles at cfg.maxzoom over a WKB column.

    explode + distinct — one shuffle; feed into
    functions.tiles.rollup_zoom for the minzoom..maxzoom pyramid."""
    udf = tiles_udf(cfg)
    t = geoms.select(F.explode(udf(F.col(wkb_col))).alias("t"))
    out = t.select(F.col("t.x").alias("x"), F.col("t.y").alias("y")).distinct()
    if cfg.max_tiles_overall:
        # overall cap: a run that would dirty more than the cap
        # expires nothing (expire-output.cpp:43; deterministic
        # distinct-count form — the limit+1 probe short-circuits)
        if out.limit(cfg.max_tiles_overall + 1).count() > cfg.max_tiles_overall:
            return out.limit(0)
    return out
