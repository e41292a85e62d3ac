"""Pole of inaccessibility ("polylabel") — the visual center of a
polygon: center of the maximum inscribed circle.

Reference: /root/reference/src/geom-pole-of-inaccessibility.cpp
(262 LoC) — itself an adaptation of the public Mapbox polylabel
algorithm (https://blog.mapbox.com/a-new-algorithm-for-finding-a-
visual-center-of-a-polygon-7c77e6492fbc) with the PostGIS-style
precision floor max(w, h)/1000 and a `stretch` factor that weights
the y axis (used to place labels in wide/flat polygons).

Pure-python quadtree refinement; runs inside pandas-UDF kernels.
"""

from __future__ import annotations

import heapq
import math

import numpy as np


def _seg_dist2(px: float, py: float, ax: float, ay: float, bx: float, by: float, stretch: float) -> float:
    x, y = ax, ay * stretch
    dx, dy = bx - x, by * stretch - y
    if dx != 0 or dy != 0:
        t = ((px - x) * dx + (py - y) * dy) / (dx * dx + dy * dy)
        if t > 1:
            x, y = bx, by * stretch
        elif t > 0:
            x += dx * t
            y += dy * t
    dx, dy = px - x, py - y
    return dx * dx + dy * dy


def _point_to_polygon_dist(px: float, py: float, rings: list[np.ndarray], stretch: float) -> float:
    """Signed distance: positive inside, negative outside."""
    inside = False
    min_d2 = math.inf
    for ring in rings:
        xs, ys = ring[:, 0], ring[:, 1]
        n = len(ring) - 1
        for i in range(n):
            ax, ay = xs[i], ys[i]
            bx, by = xs[i + 1], ys[i + 1]
            if (ay > py) != (by > py) and (
                px < (bx - ax) * (py - ay) / (by - ay) + ax
            ):
                inside = not inside
            d2 = _seg_dist2(px, py * stretch, ax, ay, bx, by, stretch)
            min_d2 = min(min_d2, d2)
    d = math.sqrt(min_d2)
    return d if inside else -d


class _Cell:
    __slots__ = ("x", "y", "h", "d", "max_d")

    def __init__(self, x: float, y: float, h: float, rings, stretch: float) -> None:
        self.x, self.y, self.h = x, y, h
        self.d = _point_to_polygon_dist(x, y, rings, stretch)
        self.max_d = self.d + self.h * math.sqrt(2)

    def __lt__(self, other) -> bool:  # max-heap via negation handled by caller
        return self.max_d > other.max_d


def pole_of_inaccessibility(
    rings: list[np.ndarray], precision: float = 0.0, stretch: float = 1.0
) -> tuple[float, float] | None:
    """Visual center of a polygon given as [outer, inner...] rings
    (closed ndarray[N,2]).  `precision` is floored at max(w,h)/1000
    like the reference; `stretch` > 1 pulls the label point toward the
    vertical center of wide polygons."""
    if not rings or len(rings[0]) < 4:
        return None
    outer = rings[0]
    min_x, min_y = outer[:, 0].min(), outer[:, 1].min()
    max_x, max_y = outer[:, 0].max(), outer[:, 1].max()
    width, height = max_x - min_x, max_y - min_y
    if width <= 0 or height <= 0:
        return None
    precision = max(precision, max(width, height) / 1000.0)
    cell_size = min(width, height)
    if cell_size == 0:
        return None
    h = cell_size / 2.0

    queue: list[_Cell] = []
    x = min_x
    while x < max_x:
        y = min_y
        while y < max_y:
            heapq.heappush(queue, _Cell(x + h, y + h, h, rings, stretch))
            y += cell_size
        x += cell_size

    # centroid + bbox-center seeds (mapbox polylabel)
    best = _Cell((min_x + max_x) / 2, (min_y + max_y) / 2, 0, rings, stretch)
    cx, cy = _ring_centroid(outer)
    c = _Cell(cx, cy, 0, rings, stretch)
    if c.d > best.d:
        best = c

    while queue:
        cell = heapq.heappop(queue)
        if cell.d > best.d:
            best = cell
        if cell.max_d - best.d <= precision:
            continue
        h = cell.h / 2.0
        for dx in (-h, h):
            for dy in (-h, h):
                heapq.heappush(queue, _Cell(cell.x + dx, cell.y + dy, h, rings, stretch))
    return (best.x, best.y)


def _ring_centroid(ring: np.ndarray) -> tuple[float, float]:
    x, y = ring[:-1, 0], ring[:-1, 1]
    x1, y1 = ring[1:, 0], ring[1:, 1]
    cross = x * y1 - x1 * y
    a = cross.sum()
    if a == 0:
        return (float(ring[:, 0].mean()), float(ring[:, 1].mean()))
    cx = ((x + x1) * cross).sum() / (3 * a)
    cy = ((y + y1) * cross).sum() / (3 * a)
    return (float(cx), float(cy))
