"""PNG writer + raster tile sink tests."""

import numpy as np
import pytest

from osm2pgsql_spark.functions import geometry as G
from osm2pgsql_spark.sinks.png import png_decode_gray, png_encode_gray, write_raster_tiles


def test_png_roundtrip():
    img = (np.arange(64 * 48).reshape(48, 64) % 251).astype(np.uint8)
    data = png_encode_gray(img)
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    back = png_decode_gray(data)
    np.testing.assert_array_equal(back, img)


def test_png_bool_mask():
    m = np.zeros((8, 8), dtype=bool)
    m[2:5, 3:7] = True
    back = png_decode_gray(png_encode_gray(m))
    assert (back[2:5, 3:7] == 255).all()
    assert back.sum() == 255 * 3 * 4


def test_raster_tile_sink(spark, tmp_path):
    from osm2pgsql_spark.operators.raster_union import union_polygons_raster
    from osm2pgsql_spark.operators.vector_tiles import tile_envelope

    rect = tile_envelope(12, 2048, 2047)
    sq = G.make_polygon_from_way(
        [(1000, 1000), (5000, 1000), (5000, 5000), (1000, 5000), (1000, 1000)]
    )
    u = union_polygons_raster([sq], rect, resolution=64)
    tiles = spark.createDataFrame(
        [(2048, 2047, bytearray(G.to_wkb(u)))], "x bigint, y bigint, geom binary"
    )
    n = write_raster_tiles(tiles, str(tmp_path), zoom=12, resolution=64)
    assert n == 1
    png_path = tmp_path / "12" / "2048" / "2047.png"
    assert png_path.exists()
    img = png_decode_gray(png_path.read_bytes())
    assert img.shape == (64, 64)
    assert (img == 255).sum() > 0  # the square is rendered
