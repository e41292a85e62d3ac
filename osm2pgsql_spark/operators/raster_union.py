"""Raster-space polygon union per tile (the builtup / raster-union
generalization strategy).

Reference: /root/reference/src/gen/gen-tile-raster.cpp:180-233 — the
reference sidesteps expensive vector union by rasterizing per-tile
geometry onto a canvas (OpenCV), applying erode/dilate open-close
smoothing (src/gen/canvas.cpp:48-76), then vectorizing the mask with
potrace (src/gen/tracer.hpp:15-44).

This implementation is numpy-only:
- rasterize: scanline polygon fill (same algorithm family as the
  expire polygon fill) + Bresenham-ish line stamping,
- morphology: binary erosion/dilation with a square structuring
  element via sliding-window minimum/maximum,
- vectorize: exact row-run rectangle decomposition of the mask (the
  union is emitted as rectilinear rings; pixel-exact, resolution-
  bounded like the reference's potrace step).

Per-tile kernels run under groupBy(tile).applyInPandas — the tile is
the spatial partition key, exactly like the reference's per-tile
workers (src/gen/osm2pgsql-gen.cpp:243-283) but scheduled by Spark.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from osm2pgsql_spark.functions import geometry as G
from osm2pgsql_spark.operators.vector_tiles import tile_envelope


# --------------------------------------------------------- rasterize

def rasterize_polygon(mask: np.ndarray, rings: list[np.ndarray], to_px) -> None:
    """Even-odd scanline fill of polygon rings onto a boolean mask."""
    H, W = mask.shape
    pxs = [to_px(r) for r in rings]
    ally = np.concatenate([p[:, 1] for p in pxs])
    y0 = max(0, int(np.floor(ally.min())))
    y1 = min(H - 1, int(np.ceil(ally.max())))
    for row in range(y0, y1 + 1):
        fy = row + 0.5
        xs: list[float] = []
        for p in pxs:
            ya, yb = p[:-1, 1], p[1:, 1]
            cross = ((ya <= fy) & (yb > fy)) | ((yb <= fy) & (ya > fy))
            for i in np.nonzero(cross)[0]:
                t = (fy - p[i, 1]) / (p[i + 1, 1] - p[i, 1])
                xs.append(p[i, 0] + t * (p[i + 1, 0] - p[i, 0]))
        xs.sort()
        for i in range(0, len(xs) - 1, 2):
            a = max(0, int(np.ceil(xs[i] - 0.5)))
            b = min(W - 1, int(np.floor(xs[i + 1] - 0.5)))
            if b >= a:
                mask[row, a : b + 1] = True


# -------------------------------------------------------- morphology

def _window_op(mask: np.ndarray, size: int, op) -> np.ndarray:
    """Separable sliding-window min/max with a (2*size+1) square."""
    if size <= 0:
        return mask
    out = mask
    for axis in (0, 1):
        padded = np.pad(
            out,
            [(size, size) if a == axis else (0, 0) for a in (0, 1)],
            constant_values=(op is np.minimum),
        )
        acc = None
        for s in range(2 * size + 1):
            sl = [slice(None)] * 2
            sl[axis] = slice(s, s + out.shape[axis])
            view = padded[tuple(sl)]
            acc = view if acc is None else op(acc, view)
        out = acc
    return out


def _window_len(mask: np.ndarray, length: int, op) -> np.ndarray:
    """Sliding-window min/max with an exact length x length rect
    element, anchor at (length//2, length//2) like OpenCV's default."""
    if length <= 1:
        return mask
    before = length // 2
    after = length - 1 - before
    out = mask
    for axis in (0, 1):
        pad = [(before, after) if a == axis else (0, 0) for a in (0, 1)]
        padded = np.pad(out, pad, constant_values=(op is np.minimum))
        acc = None
        for s in range(length):
            sl = [slice(None)] * 2
            sl[axis] = slice(s, s + out.shape[axis])
            view = padded[tuple(sl)]
            acc = view if acc is None else op(acc, view)
        out = acc
    return out


def open_close(mask: np.ndarray, buffer_size: int) -> np.ndarray:
    """The reference's per-layer smoothing (src/gen/canvas.cpp:20-32):
    erode(b) -> dilate(2b) -> erode(b) with rect elements."""
    if buffer_size <= 0:
        return mask
    m = _window_len(mask, buffer_size, np.minimum)
    m = _window_len(m, 2 * buffer_size, np.maximum)
    return _window_len(m, buffer_size, np.minimum)


def binary_close(mask: np.ndarray, size: int) -> np.ndarray:
    """dilate then erode — fills gaps smaller than the element
    (reference canvas open/close smoothing)."""
    return _window_op(_window_op(mask, size, np.maximum), size, np.minimum)


def binary_open(mask: np.ndarray, size: int) -> np.ndarray:
    """erode then dilate — removes specks smaller than the element."""
    return _window_op(_window_op(mask, size, np.minimum), size, np.maximum)


# --------------------------------------------------------- vectorize

def _optimal_polygon(ring: np.ndarray, tol: float) -> np.ndarray:
    """Potrace-style straight-line decomposition of a closed lattice
    ring (Selinger 2003 'Potrace: a polygon-based tracing algorithm'
    section 2 — the polygon stage the reference's tracer runs, since
    it keeps alphamax=0 and never enters the curve stage,
    src/gen/tracer.hpp:30).  A subpath is considered straight when
    every interior point lies within `tol` of the chord (potrace's
    half-pixel criterion at tol=0.5); the ring is then covered greedily
    by maximal straight chords, cutting pixel staircases into diagonal
    segments.  Greedy cover is at most one segment over the optimal
    cyclic cover — the cheap 99% of potrace's dynamic program.

    ring: closed [N,2] array (first == last).  Returns a closed ring.
    """
    pts = ring[:-1]
    n = len(pts)
    if n <= 4:
        return ring

    def straight_reach(i: int) -> int:
        """Number of steps s (>=1) such that the chord i -> i+s stays
        within tol of all interior points, in the L-infinity metric —
        potrace allows +-0.5 PER AXIS, so a 45-degree chord through a
        unit staircase (corners at Linf distance exactly 0.5) counts
        as straight; the Euclidean test would reject it at 0.707."""
        best = 1
        max_s = n - 1
        for s in range(2, max_s + 1):
            j = (i + s) % n
            chord = pts[j] - pts[i]
            denom = float(abs(chord[0]) + abs(chord[1]))
            if denom == 0.0:
                break
            idx = [(i + k) % n for k in range(1, s)]
            d = pts[idx] - pts[i]
            # Linf point-to-chord-line distance = |cross| / (|vx|+|vy|)
            cross = np.abs(d[:, 0] * chord[1] - d[:, 1] * chord[0]) / denom
            if float(cross.max(initial=0.0)) > tol:
                break
            best = s
        return best

    # greedy cyclic cover from a few rotations; keep the shortest
    best_poly: list[int] | None = None
    for start in range(0, n, max(1, n // 4)):
        verts = [start]
        i = start
        covered = 0
        while covered < n:
            s = min(straight_reach(i), n - covered)
            i = (i + s) % n
            covered += s
            verts.append(i)
        if best_poly is None or len(verts) < len(best_poly):
            best_poly = verts
        if len(best_poly) <= 5:
            break
    out = pts[[v % n for v in best_poly]]
    if not np.array_equal(out[0], out[-1]):
        out = np.vstack([out, out[:1]])
    return out


def trace_mask(
    mask: np.ndarray, turdsize: int = 0, simplify_tol: float = 0.0
) -> list[list[np.ndarray]]:
    """Boundary-trace a binary mask into polygons with holes —
    the potrace role in the reference tracer (src/gen/tracer.hpp:15-44
    with alphamax=0: pure polygonal output; turdsize drops paths whose
    enclosed pixel area is below the threshold).

    Walks the "cracks" between filled and empty pixels: every
    black/white pixel side contributes one directed lattice edge with
    a consistent orientation, so following edges (rightmost-turn rule
    at diagonal-touch corners, which separates 4-connected regions
    exactly like potrace's default policy resolves ambiguities) yields
    closed loops.  Loop orientation distinguishes outer boundaries
    from holes; collinear lattice points are merged so a rectangle
    comes out as 5 points, not 4*side.  Returns [[outer, hole...]]
    rings as float64 [N,2] arrays in pixel coordinates."""
    H, W = mask.shape
    m = np.zeros((H + 2, W + 2), dtype=bool)
    m[1:-1, 1:-1] = mask
    black = m[1:-1, 1:-1]

    # directed crack edges, black consistently on one side
    edges: dict[tuple[int, int], list[tuple[int, int]]] = {}

    def add(a: tuple[int, int], b: tuple[int, int]) -> None:
        edges.setdefault(a, []).append(b)

    rs, cs = np.nonzero(black)
    for r, c in zip(rs.tolist(), cs.tolist()):
        if not m[r, c + 1]:  # white above
            add((c, r), (c + 1, r))
        if not m[r + 2, c + 1]:  # white below
            add((c + 1, r + 1), (c, r + 1))
        if not m[r + 1, c]:  # white left
            add((c, r + 1), (c, r))
        if not m[r + 1, c + 2]:  # white right
            add((c + 1, r), (c + 1, r + 1))

    used: set[tuple[tuple[int, int], tuple[int, int]]] = set()

    def walk(start: tuple[int, int], first: tuple[int, int]) -> list[tuple[int, int]]:
        loop = [start, first]
        used.add((start, first))
        prev, cur = start, first
        while cur != start:
            outs = [
                n for n in edges.get(cur, ()) if (cur, n) not in used
            ]
            if not outs:
                raise ValueError("open boundary loop (corrupt mask?)")
            if len(outs) == 1:
                nxt = outs[0]
            else:
                # diagonal-touch corner: take the rightmost turn
                # relative to the incoming direction — keeps the two
                # diagonally-touching regions as separate loops
                dx, dy = cur[0] - prev[0], cur[1] - prev[1]
                # right of (dx,dy) in pixel coords (y down) is (-dy,dx)
                want = (cur[0] - dy, cur[1] + dx)
                nxt = want if want in outs else outs[0]
            used.add((cur, nxt))
            loop.append(nxt)
            prev, cur = cur, nxt
        return loop

    loops: list[tuple[float, np.ndarray]] = []
    for a, outs in list(edges.items()):
        for b in outs:
            if (a, b) in used:
                continue
            pts = walk(a, b)
            arr = np.asarray(pts, dtype="f8")
            # merge collinear runs (axis-parallel lattice steps)
            keep = [0]
            for i in range(1, len(arr) - 1):
                d0 = arr[i] - arr[keep[-1]]
                d1 = arr[i + 1] - arr[i]
                if d0[0] * d1[1] - d0[1] * d1[0] != 0:
                    keep.append(i)
            # the walk's start vertex may itself lie mid-run; drop it
            # when collinear between its ring neighbors and re-close on
            # the next kept vertex (ADVICE r4 — minimal rings for holes
            # whose first crack edge starts mid-run)
            if len(keep) >= 3:
                d0 = arr[keep[0]] - arr[keep[-1]]
                d1 = arr[keep[1]] - arr[keep[0]]
                if d0[0] * d1[1] - d0[1] * d1[0] == 0:
                    keep = keep[1:]
            ring = np.vstack([arr[keep], arr[keep[0] : keep[0] + 1]])
            area2 = float(
                np.sum(ring[:-1, 0] * ring[1:, 1] - ring[1:, 0] * ring[:-1, 1])
            )
            if simplify_tol > 0.0:
                # exact crack area decides turdsize/orientation; the
                # emitted ring gets the potrace polygon treatment
                ring = _optimal_polygon(ring, simplify_tol)
            loops.append((area2 / 2.0, ring))

    # with the edge orientation above, outer boundaries have one area
    # sign and holes the other; normalize by checking a known outer
    outers = [(abs(a), a, r) for a, r in loops if a > 0]
    holes = [(abs(a), a, r) for a, r in loops if a <= 0]
    if not outers and holes:  # orientation flipped: swap
        outers, holes = holes, outers
    outers = [o for o in outers if o[0] >= max(turdsize, 0)]
    holes = [h for h in holes if h[0] >= max(turdsize, 0)]

    def contains(ring: np.ndarray, pt: np.ndarray) -> bool:
        x, y = float(pt[0]), float(pt[1])
        x0, y0 = ring[:-1, 0], ring[:-1, 1]
        x1, y1 = ring[1:, 0], ring[1:, 1]
        cross = (y0 > y) != (y1 > y)
        with np.errstate(divide="ignore", invalid="ignore"):
            xin = x0 + (y - y0) / (y1 - y0) * (x1 - x0)
        return bool(np.count_nonzero(cross & (x < xin)) % 2)

    outers.sort(key=lambda o: o[0])
    polys: list[list[np.ndarray]] = [[o[2]] for o in outers]
    for _ha, _hs, hring in holes:
        # probe just inside the hole boundary: midpoint of first edge
        # nudged toward the hole's interior (the side away from black)
        mid = (hring[0] + hring[1]) / 2.0
        d = hring[1] - hring[0]
        probe = mid + np.array([-d[1], d[0]]) * 0.25 / max(
            1.0, float(np.hypot(d[0], d[1]))
        )
        placed = False
        for i, (_oa, _os, oring) in enumerate(outers):
            if contains(oring, probe):
                polys[i].append(hring)
                placed = True
                break
        if not placed and outers:
            polys[-1].append(hring)
    return polys


def mask_to_rings(mask: np.ndarray) -> list[np.ndarray]:
    """Simple, robust vectorization: per-row runs -> rectangles ->
    merged row-span rings.  Produces rectilinear rings equal to the
    mask's filled area (exact in pixel space); adjacent rows with
    identical spans merge."""
    H, W = mask.shape
    rings: list[np.ndarray] = []
    r = 0
    while r < H:
        row = mask[r]
        if not row.any():
            r += 1
            continue
        # find runs in this row
        diff = np.diff(np.concatenate([[0], row.view(np.int8), [0]]))
        starts = np.nonzero(diff == 1)[0]
        ends = np.nonzero(diff == -1)[0]
        for s, e in zip(starts, ends):
            # extend downward while identical run exists
            r2 = r + 1
            while r2 < H:
                seg = mask[r2, s:e]
                left_ok = (s == 0) or (not mask[r2, s - 1])
                right_ok = (e >= W) or (not mask[r2, e])
                if seg.all() and left_ok and right_ok:
                    r2 += 1
                else:
                    break
            ring = np.asarray(
                [(s, r), (e, r), (e, r2), (s, r2), (s, r)], dtype="f8"
            )
            rings.append(ring)
            mask[r:r2, s:e] = False
        # stay on the same row index: runs were cleared
    return rings


def _component_runs(mask: np.ndarray):
    """4-connected component labeling over row runs (union-find).

    Returns (runs, root_area, find): runs = [(row, start, end, idx)],
    root_area maps each root label to its component's pixel count."""
    H, _W = mask.shape
    parent: list[int] = []

    def find(i: int) -> int:
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    runs: list[tuple[int, int, int, int]] = []
    prev: list[tuple[int, int, int]] = []
    for r in range(H):
        row = mask[r]
        if not row.any():
            prev = []
            continue
        diff = np.diff(np.concatenate([[0], row.view(np.int8), [0]]))
        starts = np.nonzero(diff == 1)[0]
        ends = np.nonzero(diff == -1)[0]
        cur: list[tuple[int, int, int]] = []
        for s, e in zip(starts, ends):
            idx = len(parent)
            parent.append(idx)
            for ps, pe, pidx in prev:
                if ps < e and s < pe:
                    union(idx, pidx)
            cur.append((s, e, idx))
            runs.append((r, s, e, idx))
        prev = cur
    root_area: dict[int, int] = {}
    for _r, s, e, idx in runs:
        root = find(idx)
        root_area[root] = root_area.get(root, 0) + (e - s)
    return runs, root_area, find


def drop_small_components(
    mask: np.ndarray, min_pixels: float
) -> np.ndarray:
    """Clear whole connected components below min_pixels — potrace's
    turdsize semantics (drop small speckle PATHS, never thin strips of
    large regions; reference gen-tile-builtup.cpp margin/turdsize)."""
    if min_pixels <= 0:
        return mask
    runs, root_area, find = _component_runs(mask)
    for r, s, e, idx in runs:
        if root_area[find(idx)] < min_pixels:
            mask[r, s:e] = False
    return mask


def union_polygons_raster(
    geoms: list,
    rect: tuple[float, float, float, float],
    resolution: int = 256,
    close_size: int = 0,
    turdsize: int = 0,
    trace: bool = True,
    simplify_tol: float = 0.0,
):
    """Union of polygons within `rect` via rasterization at
    resolution^2; returns a multipolygon mapped back to `rect`
    coordinates (pixel-exact union, like the reference's raster
    strategy; accuracy = rect_size/resolution).

    trace=True (default): boundary-traced polygons WITH holes via
    trace_mask — the reference's potrace role (tracer.hpp, alphamax=0
    polygonal output + turdsize).  trace=False keeps the older
    rectangle decomposition (hole-free, one rect ring per row-span).

    simplify_tol > 0 (in pixels; potrace's criterion is 0.5) runs the
    straight-line polygon decomposition on each traced ring, cutting
    pixel staircases into diagonal chords."""
    xmin, ymin, xmax, ymax = rect
    sx = resolution / (xmax - xmin)
    sy = resolution / (ymax - ymin)

    def to_px(ring: np.ndarray) -> np.ndarray:
        out = np.empty_like(ring)
        out[:, 0] = (ring[:, 0] - xmin) * sx
        out[:, 1] = (ring[:, 1] - ymin) * sy
        return out

    mask = np.zeros((resolution, resolution), dtype=bool)
    for g in geoms:
        if g is None:
            continue
        kind, payload = g
        polys = [payload] if kind == "polygon" else payload if kind == "multipolygon" else []
        for rings in polys:
            rasterize_polygon(mask, rings, to_px)
    if close_size:
        mask = binary_close(mask, close_size)

    def back(ring: np.ndarray) -> np.ndarray:
        out = np.empty_like(ring)
        out[:, 0] = ring[:, 0] / sx + xmin
        out[:, 1] = ring[:, 1] / sy + ymin
        return out

    if trace:
        polys = trace_mask(mask, turdsize=turdsize, simplify_tol=simplify_tol)
        if not polys:
            return None
        return ("multipolygon", [[back(r) for r in rings] for rings in polys])

    px_rings = mask_to_rings(mask.copy())
    if not px_rings:
        return None
    return ("multipolygon", [[back(ring)] for ring in px_rings])


def tile_raster_union(
    tiled: DataFrame,
    zoom: int,
    resolution: int = 256,
    close_size: int = 0,
    margin: float = 0.0,
) -> DataFrame:
    """Per-tile union over (x, y, geom WKB) — the output of
    vector_tiles.cut_to_tiles.  groupBy(tile).applyInPandas."""

    def per_tile(key, pdf: pd.DataFrame) -> pd.DataFrame:
        x, y = int(key[0]), int(key[1])
        rect = tile_envelope(zoom, x, y, margin)
        geoms = [G.from_wkb(bytes(w)) for w in pdf["geom"] if w is not None]
        u = union_polygons_raster(geoms, rect, resolution, close_size)
        if u is None:
            return pd.DataFrame(columns=["x", "y", "geom"])
        return pd.DataFrame([{"x": x, "y": y, "geom": G.to_wkb(u)}])

    return tiled.groupBy("x", "y").applyInPandas(per_tile, "x bigint, y bigint, geom binary")


def _rasterize_layer(mask: np.ndarray, geoms: list, rect, resolution: int) -> None:
    xmin, ymin, xmax, ymax = rect
    sx = resolution / (xmax - xmin)
    sy = resolution / (ymax - ymin)

    def to_px(ring: np.ndarray) -> np.ndarray:
        out = np.empty_like(ring)
        out[:, 0] = (ring[:, 0] - xmin) * sx
        out[:, 1] = (ring[:, 1] - ymin) * sy
        return out

    for g in geoms:
        if g is None:
            continue
        kind, payload = g
        polys = [payload] if kind == "polygon" else payload if kind == "multipolygon" else []
        for rings in polys:
            rasterize_polygon(mask, rings, to_px)


def tile_builtup(
    tiled: DataFrame,
    zoom: int,
    buffer_sizes: dict[str, int],
    resolution: int = 2048,
    turdsize: int = 0,
    min_area: float = 0.0,
    margin: float = 0.0,
) -> DataFrame:
    """The builtup generalization strategy
    (reference src/gen/gen-tile-builtup.cpp:180-268): input is
    (layer, x, y, geom WKB) — several source layers cut to tiles.
    Per tile: each layer rasterizes onto its own canvas, gets the
    reference's erode/dilate(2x)/erode smoothing with its per-layer
    buffer size (px), the layer masks are OR-merged; connected
    components smaller than `turdsize` pixels or `min_area` world
    units are dropped whole (potrace turdsize semantics — never thin
    strips of a large region), then the mask is vectorized.  Output:
    one row per
    polygon (x, y, geom, area) — the tile-keyed destination table
    shape (the reference's x/y columns + optional area column)."""

    def per_tile(key, pdf: pd.DataFrame) -> pd.DataFrame:
        x, y = int(key[0]), int(key[1])
        rect = tile_envelope(zoom, x, y, margin)
        xmin, ymin, xmax, ymax = rect
        sx = resolution / (xmax - xmin)
        sy = resolution / (ymax - ymin)
        merged = np.zeros((resolution, resolution), dtype=bool)
        for layer, group in pdf.groupby("layer"):
            mask = np.zeros((resolution, resolution), dtype=bool)
            geoms = [G.from_wkb(bytes(w)) for w in group["geom"] if w is not None]
            _rasterize_layer(mask, geoms, rect, resolution)
            mask = open_close(mask, int(buffer_sizes.get(layer, 0)))
            merged |= mask
        # size filters act on whole connected components (potrace
        # turdsize semantics) BEFORE rectangle decomposition — a
        # per-rectangle check would delete thin strips of large
        # sloped regions
        if turdsize:
            drop_small_components(merged, float(turdsize))
        if min_area:
            drop_small_components(merged, float(min_area) * sx * sy)
        rings = mask_to_rings(merged)
        rows = []
        for ring in rings:
            back = np.empty_like(ring)
            back[:, 0] = ring[:, 0] / sx + xmin
            back[:, 1] = ring[:, 1] / sy + ymin
            poly = ("polygon", [back])
            rows.append(
                {"x": x, "y": y, "geom": G.to_wkb(poly), "area": G.area(poly)}
            )
        return pd.DataFrame(rows, columns=["x", "y", "geom", "area"])

    return tiled.groupBy("x", "y").applyInPandas(
        per_tile, "x bigint, y bigint, geom binary, area double"
    )
