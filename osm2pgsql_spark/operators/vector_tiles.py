"""Per-tile vector cutting: assign features to covering tiles and
clip them to tile envelopes.

Reference context: the gen vector-union strategy processes features
per tile with ST_TileEnvelope intersection
(/root/reference/src/gen/gen-tile-vector.cpp:41-80); tile margins via
tile_t::box(margin) (/root/reference/src/tile.hpp:150-157).

Spark-first shape: features -> explode covering tiles (the expire
kernel enumerates them) -> groupBy-free clipping in one pandas kernel
pass; the (x, y) tile key is then the spatial partition key for any
downstream per-tile work (union, simplify, encode).  Clipping uses
Sutherland–Hodgman (clip window is a rectangle = convex, so SH is
exact) for rings and Liang–Barsky for segments.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm2pgsql_spark.functions import geometry as G
from osm2pgsql_spark.operators.expire import (
    EARTH_CIRCUMFERENCE,
    ExpireConfig,
    tiles_for_geometry,
)


def tile_envelope(zoom: int, x: int, y: int, margin: float = 0.0) -> tuple[float, float, float, float]:
    """(min_x, min_y, max_x, max_y) of a tile in EPSG:3857 meters
    (reference src/tile.hpp:120-157)."""
    extent = EARTH_CIRCUMFERENCE / (1 << zoom)
    half = EARTH_CIRCUMFERENCE / 2.0
    xmin = -half + x * extent - margin * extent
    xmax = -half + (x + 1) * extent + margin * extent
    ymax = half - y * extent + margin * extent
    ymin = half - (y + 1) * extent - margin * extent
    return (xmin, ymin, xmax, ymax)


def clip_ring(ring: np.ndarray, rect: tuple[float, float, float, float]) -> np.ndarray | None:
    """Sutherland–Hodgman polygon clip against a rectangle."""
    xmin, ymin, xmax, ymax = rect
    pts = ring[:-1] if np.array_equal(ring[0], ring[-1]) else ring

    def clip_edge(poly: list, inside, intersect) -> list:
        out = []
        n = len(poly)
        for i in range(n):
            cur, prev = poly[i], poly[i - 1]
            if inside(cur):
                if not inside(prev):
                    out.append(intersect(prev, cur))
                out.append(cur)
            elif inside(prev):
                out.append(intersect(prev, cur))
        return out

    def ix(p, q, val, axis):
        t = (val - p[axis]) / (q[axis] - p[axis])
        o = p + t * (q - p)
        o[axis] = val
        return o

    poly = [p for p in pts.astype("f8")]
    poly = clip_edge(poly, lambda p: p[0] >= xmin, lambda p, q: ix(p, q, xmin, 0))
    if not poly:
        return None
    poly = clip_edge(poly, lambda p: p[0] <= xmax, lambda p, q: ix(p, q, xmax, 0))
    if not poly:
        return None
    poly = clip_edge(poly, lambda p: p[1] >= ymin, lambda p, q: ix(p, q, ymin, 1))
    if not poly:
        return None
    poly = clip_edge(poly, lambda p: p[1] <= ymax, lambda p, q: ix(p, q, ymax, 1))
    if len(poly) < 3:
        return None
    out = np.vstack([poly, poly[:1]])
    return out


def clip_line(pts: np.ndarray, rect: tuple[float, float, float, float]) -> list[np.ndarray]:
    """Liang–Barsky per segment; consecutive surviving segments are
    re-joined into parts."""
    xmin, ymin, xmax, ymax = rect
    parts: list[list[np.ndarray]] = []
    cur: list[np.ndarray] = []
    for i in range(len(pts) - 1):
        p, q = pts[i].astype("f8"), pts[i + 1].astype("f8")
        d = q - p
        t0, t1 = 0.0, 1.0
        ok = True
        for comp, lo, hi in ((0, xmin, xmax), (1, ymin, ymax)):
            if d[comp] == 0:
                if p[comp] < lo or p[comp] > hi:
                    ok = False
                    break
            else:
                ta = (lo - p[comp]) / d[comp]
                tb = (hi - p[comp]) / d[comp]
                if ta > tb:
                    ta, tb = tb, ta
                t0 = max(t0, ta)
                t1 = min(t1, tb)
                if t0 > t1:
                    ok = False
                    break
        if not ok:
            if len(cur) >= 2:
                parts.append(cur)
            cur = []
            continue
        a = p + t0 * d
        b = p + t1 * d
        if cur and np.allclose(cur[-1], a):
            cur.append(b)
        else:
            if len(cur) >= 2:
                parts.append(cur)
            cur = [a, b]
    if len(cur) >= 2:
        parts.append(cur)
    return [np.vstack(part) for part in parts]


def clip_geometry(geom, rect: tuple[float, float, float, float]):
    """Clip any geometry to a rectangle; returns geometry or None."""
    if geom is None:
        return None
    kind, payload = geom
    xmin, ymin, xmax, ymax = rect
    if kind == "point":
        x, y = payload
        return geom if (xmin <= x <= xmax and ymin <= y <= ymax) else None
    if kind == "multipoint":
        kept = [p for p in payload if xmin <= p[0] <= xmax and ymin <= p[1] <= ymax]
        return ("multipoint", kept) if kept else None
    if kind == "linestring":
        parts = clip_line(payload, rect)
        if not parts:
            return None
        return ("linestring", parts[0]) if len(parts) == 1 else ("multilinestring", parts)
    if kind == "multilinestring":
        parts = [seg for p in payload for seg in clip_line(p, rect)]
        return ("multilinestring", parts) if parts else None
    if kind == "polygon":
        outer = clip_ring(payload[0], rect)
        if outer is None:
            return None
        inners = [r for r in (clip_ring(i, rect) for i in payload[1:]) if r is not None]
        return ("polygon", [outer, *inners])
    if kind == "multipolygon":
        polys = []
        for p in payload:
            c = clip_geometry(("polygon", p), rect)
            if c is not None:
                polys.append(c[1])
        return ("multipolygon", polys) if polys else None
    if kind == "collection":
        parts = [clip_geometry(g, rect) for g in payload]
        parts = [g for g in parts if g is not None]
        return ("collection", parts) if parts else None
    return None


def cut_to_tiles(
    geoms: DataFrame,
    zoom: int,
    margin: float = 0.0,
    wkb_col: str = "geom",
    id_col: str | None = None,
    tile_filter=None,
) -> DataFrame:
    """Features (EPSG:3857 WKB) -> one row per covering tile with the
    geometry clipped to that tile's envelope(+margin).

    Output: (x, y, geom) [+ id passthrough].  The explode+clip runs in
    a single mapInPandas pass; the result is already keyed by tile for
    downstream per-tile generalization."""
    from pyspark.sql.functions import pandas_udf

    cfg = ExpireConfig(maxzoom=zoom, buffer=margin, mode="full_area")

    def kernel(it):
        for pdf in it:
            rows = []
            for _, row in pdf.iterrows():
                w = row[wkb_col]
                if w is None:
                    continue
                g = G.from_wkb(bytes(w))
                for x, y in tiles_for_geometry(g, cfg):
                    # tile_filter runs BEFORE the (expensive) clip so
                    # skipped tiles cost only the enumeration
                    if tile_filter is not None and not tile_filter(x, y):
                        continue
                    clipped = clip_geometry(g, tile_envelope(zoom, x, y, margin))
                    if clipped is None:
                        continue
                    out = {"x": int(x), "y": int(y), "geom": G.to_wkb(clipped)}
                    if id_col is not None:
                        out[id_col] = row[id_col]
                    rows.append(out)
            yield pd.DataFrame(
                rows, columns=([id_col] if id_col else []) + ["x", "y", "geom"]
            )

    schema = ("" if id_col is None else f"{id_col} bigint, ") + "x bigint, y bigint, geom binary"
    cols = ([id_col] if id_col else []) + [wkb_col]
    return geoms.select(*cols).mapInPandas(kernel, schema)
