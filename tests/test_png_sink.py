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


def test_sink_is_executor_side():
    """Round-2 verdict: the sink must not collect geometry to the
    driver — rasterize/encode/write run inside mapInPandas."""
    import inspect

    from osm2pgsql_spark.sinks import png

    src = inspect.getsource(png.write_raster_tiles)
    assert ".collect(" not in src
    assert "toPandas(" not in src
    assert "mapInPandas" in src


def test_raster_tile_sink_many_tiles(spark, tmp_path):
    """>= 10^4 tiles written distributed, no driver-side geometry."""
    from pyspark.sql import functions as F

    from osm2pgsql_spark.operators.vector_tiles import tile_envelope

    zoom, n_side = 12, 100  # 100x100 = 10^4 tiles
    rows = []
    for i in range(n_side * n_side):
        x, y = 2000 + i % n_side, 2000 + i // n_side
        xmin, ymin, xmax, ymax = tile_envelope(zoom, x, y)
        dx, dy = (xmax - xmin) / 4, (ymax - ymin) / 4
        ring = np.asarray(
            [
                (xmin + dx, ymin + dy),
                (xmax - dx, ymin + dy),
                (xmax - dx, ymax - dy),
                (xmin + dx, ymax - dy),
                (xmin + dx, ymin + dy),
            ],
            dtype="f8",
        )
        rows.append((x, y, bytearray(G.to_wkb(("polygon", [ring])))))
    tiles = spark.createDataFrame(rows, "x bigint, y bigint, geom binary").repartition(16)
    n = write_raster_tiles(tiles, str(tmp_path), zoom=zoom, resolution=16)
    assert n == n_side * n_side
    # spot-check one tile: centered quarter square rendered
    img = png_decode_gray((tmp_path / "12" / "2050" / "2049.png").read_bytes())
    assert img.shape == (16, 16)
    assert (img[4:12, 4:12] == 255).all()
    assert img[0, 0] == 0
    # every file landed
    import glob

    assert len(glob.glob(str(tmp_path / "12" / "*" / "*.png"))) == n_side * n_side


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
