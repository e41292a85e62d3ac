"""Web-mercator tile math as JVM-side Column expressions.

Reference: /root/reference/src/tile.hpp:20-57 (tile_t, quadkey
encode/decode, zoom shifts), /root/reference/src/expire-tiles.cpp
(dirty-tile computation from geometries),
/root/reference/src/expire-output.cpp:85-106 (zoom rollup).

Everything here is a plain Catalyst expression — tile assignment for
billions of points must stay inside whole-stage codegen; a Python UDF
here would dominate the pipeline cost at 100 TB.  Only the
line-walk/polygon-fill variants (tiles_for_geometry) drop to a pandas
UDF, and only for rows that are actual lines/polygons.

The SQL strings (``*_SQL``) are the same formulas for splicing into
DuckDB oracle queries; they are written in the common SQL dialect
subset both engines evaluate bit-identically.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS = 6378137.0  # WGS84 spherical radius used by EPSG:3857
MAX_MERCATOR_LAT = 85.05112877980659  # atan(sinh(pi)) in degrees


def tile_x_sql(lon_expr: str, zoom: int) -> str:
    n = 1 << zoom
    return (
        f"cast(least(greatest(floor((({lon_expr}) + 180.0) / 360.0 * {n}), 0), {n - 1}) as bigint)"
    )


def tile_y_sql(lat_expr: str, zoom: int) -> str:
    # y = (1 - ln(tan(phi) + sec(phi)) / pi) / 2 * 2^z, clamped.
    n = 1 << zoom
    phi = f"radians(least(greatest(({lat_expr}), {-MAX_MERCATOR_LAT}), {MAX_MERCATOR_LAT}))"
    return (
        f"cast(least(greatest(floor((1.0 - ln(tan({phi}) + 1.0 / cos({phi})) / pi()) / 2.0 * {n}), 0), {n - 1}) as bigint)"
    )


def tile_x(lon: Column, zoom: int) -> Column:
    n = 1 << zoom
    raw = F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(float(n)))
    return F.least(F.greatest(raw, F.lit(0)), F.lit(n - 1)).cast("bigint")


def tile_y(lat: Column, zoom: int) -> Column:
    n = 1 << zoom
    phi = F.radians(
        F.least(F.greatest(lat, F.lit(-MAX_MERCATOR_LAT)), F.lit(MAX_MERCATOR_LAT))
    )
    raw = F.floor(
        (F.lit(1.0) - F.log(F.tan(phi) + F.lit(1.0) / F.cos(phi)) / F.lit(math.pi))
        / F.lit(2.0)
        * F.lit(float(n))
    )
    return F.least(F.greatest(raw, F.lit(0)), F.lit(n - 1)).cast("bigint")


def quadkey(x: Column, y: Column, zoom: int) -> Column:
    """Bit-interleaved quadkey (reference src/tile.hpp quadkey) as a
    pure expression: sum over bit positions of x/y bit shifts."""
    parts = []
    for i in range(zoom):
        parts.append(F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i))
        parts.append(F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    if not parts:
        return F.lit(0).cast("bigint")
    out = parts[0]
    for p in parts[1:]:
        out = out + p
    return out.cast("bigint")


def parent_tile(x: Column, y: Column, dz: int) -> tuple[Column, Column]:
    """Tile at ``dz`` zoom levels up (reference tile_t::down()/up
    semantics, src/tile.hpp:33-38)."""
    return F.shiftright(x, dz), F.shiftright(y, dz)


def rollup_zoom_sql(minzoom: int, maxzoom: int, x: str = "x", y: str = "y") -> str:
    """Oracle-side rollup: each maxzoom tile emitted at every zoom in
    [minzoom, maxzoom] via integer halving (src/expire-output.cpp:85-106).

    Uses floor(x / pow(2, dz)) which both engines evaluate exactly for
    tile coords < 2^26."""
    selects = []
    for z in range(minzoom, maxzoom + 1):
        dz = maxzoom - z
        selects.append(
            f"SELECT {z} AS zoom, cast(floor({x} / pow(2, {dz})) as bigint) AS x, "
            f"cast(floor({y} / pow(2, {dz})) as bigint) AS y FROM __tiles__"
        )
    return " UNION ALL ".join(selects)


def rollup_zoom(tiles, minzoom: int, maxzoom: int):
    """Spark-side rollup: tiles(x, y) at maxzoom -> distinct (zoom, x, y)
    for zoom in [minzoom, maxzoom].

    Implemented as explode(sequence) + shiftright — one narrow stage,
    the distinct is the only shuffle."""
    z = F.explode(F.sequence(F.lit(minzoom), F.lit(maxzoom))).alias("zoom")
    out = tiles.select(z, "x", "y")
    # shiftright() in the Python API needs a literal shift, so use the
    # exact floor/pow form (tile coords < 2^26, doubles exact there).
    dz = (F.lit(maxzoom) - F.col("zoom")).cast("double")
    return out.select(
        "zoom",
        F.floor(F.col("x") / F.pow(F.lit(2.0), dz)).cast("bigint").alias("x"),
        F.floor(F.col("y") / F.pow(F.lit(2.0), dz)).cast("bigint").alias("y"),
    ).distinct()
