"""Multimodal plumbing + sink encoding tests."""

import numpy as np
import pytest

from osm2pgsql_spark.operators.multimodal import (
    image_features,
    media_stats,
    resize_images,
    sample_frames,
    synthesize_media,
)
from osm2pgsql_spark.sinks.writers import (
    copy_encode_value,
    encode_copy_rows,
    write_expire_file,
    write_parquet,
)


def test_media_pipeline(spark):
    media = synthesize_media(spark, n=16)
    feats = image_features(media, fake=True).collect()
    assert len(feats) == 16
    f0 = next(f for f in feats if f["media_id"] == 0)
    assert len(f0["feature"]) == 8
    assert 0 <= f0["mean_val"] <= 255
    # determinism
    feats2 = image_features(synthesize_media(spark, n=16), fake=True).collect()
    a = sorted((f["media_id"], tuple(f["feature"])) for f in feats)
    b = sorted((f["media_id"], tuple(f["feature"])) for f in feats2)
    assert a == b


def test_media_resize_and_frames(spark):
    media = synthesize_media(spark, n=8)
    resized = resize_images(media, 8, 8, fake=True).collect()
    assert all(len(bytes(r["payload"])) == 64 for r in resized)
    frames = sample_frames(media, every_ms=400, fake=True).collect()
    per_media = {}
    for fr in frames:
        per_media.setdefault(fr["media_id"], []).append(fr)
    # duration 1000+i ms, every 400ms -> 3 frames
    assert all(len(v) == 3 for v in per_media.values())


def test_media_stats_metadata_only(spark):
    media = synthesize_media(spark, n=10)
    stats = {r["format"]: r["n"] for r in media_stats(media).collect()}
    assert stats == {"png": 5, "wav": 5}


def test_copy_encoding():
    assert copy_encode_value(None) == r"\N"
    assert copy_encode_value(True) == "t"
    assert copy_encode_value("a\tb\nc") == "a\\tb\\nc"
    assert copy_encode_value(b"\x01\xff") == r"\\x01ff"
    assert copy_encode_value([1, None, 3]) == "{1,NULL,3}"
    # string elements always quoted; ',{}"\ would corrupt an unquoted
    # literal.  COPY-level escaping doubles the inner backslashes.
    assert copy_encode_value(["a,b", None]) == '{"a,b",NULL}'
    assert (
        copy_encode_value(['q"x', "b\\c", "{d}"])
        == '{"q\\\\"x","b\\\\\\\\c","{d}"}'
    )
    assert copy_encode_value([True, False, None]) == "{t,f,NULL}"
    # hstore-level quote escaping (\") then COPY-level backslash
    # escaping (\\) — PostgreSQL unescapes COPY first, hstore second
    assert copy_encode_value({"k": "v", "a": 'q"x'}) == '"a"=>"q\\\\"x","k"=>"v"'
    buf = encode_copy_rows([{"a": 1, "b": None}], ["a", "b"])
    assert buf == "1\t\\N\n"


def test_expire_file_sink(spark, tmp_path):
    tiles = spark.createDataFrame(
        [(12, 5, 6), (12, 5, 7), (11, 2, 3)], "zoom int, x bigint, y bigint"
    )
    p = str(tmp_path / "expire.list")
    write_expire_file(tiles, p)
    lines = open(p).read().splitlines()
    assert lines == ["11/2/3", "12/5/6", "12/5/7"]


def test_parquet_sink_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(2, "b"), (1, "a")], "id bigint, v string")
    p = str(tmp_path / "t.parquet")
    write_parquet(df, p, sort_cols=["id"])
    back = spark.read.parquet(p)
    assert {tuple(r) for r in back.collect()} == {(1, "a"), (2, "b")}


def test_expire_file_sink_large_distributed(spark, tmp_path):
    """10^6-tile expire set goes through the distributed text write
    (no driver collect) and comes out sorted and complete; an
    over-cap set is truncated to max_tiles."""
    tiles = spark.range(0, 1_000_000).selectExpr(
        "cast(14 as int) AS zoom", "cast(id % 16384 as int) AS x",
        "cast(id div 16384 as int) AS y",
    )
    p = str(tmp_path / "big.expire")
    write_expire_file(tiles, p)
    with open(p) as fh:
        lines = fh.read().splitlines()
    assert len(lines) == 1_000_000
    assert lines == sorted(lines)
    assert lines[0].startswith("14/")

    p2 = str(tmp_path / "capped.expire")
    import warnings as W
    with W.catch_warnings(record=True) as rec:
        W.simplefilter("always")
        write_expire_file(tiles, p2, max_tiles=1000)
        assert any("truncating" in str(w.message) for w in rec)
    with open(p2) as fh:
        assert len(fh.read().splitlines()) == 1000


def test_copy_lines_matches_python_encoder(spark):
    """The JVM column encoders (copy_*_expr / copy_lines) must produce
    byte-identical COPY text to the per-row python encoder
    (copy_encode_value) on every tricky case: NULLs everywhere,
    tab/newline/cr/backslash in text, NULL array elements, hstore
    quoting, binary hex."""
    from pyspark.sql import Row

    from osm2pgsql_spark.sinks.writers import copy_encode_value, copy_lines

    rows = [
        Row(
            i=1,
            s="plain",
            b=True,
            a=[1, 2, None],
            sa=['a,b', 'q"x', "c\\d", "{e}", None],
            ba=[True, None, False],
            m={"k": 'va"l', "a": "x\\y"},
            g=b"\x00\xff ab",
        ),
        Row(
            i=None, s="tab\there\nand\rmore\\end", b=False,
            a=[], sa=[], ba=[], m={}, g=b"",
        ),
        Row(i=-7, s=None, b=None, a=None, sa=None, ba=None, m=None, g=None),
    ]
    df = spark.createDataFrame(
        rows,
        "i long, s string, b boolean, a array<long>, sa array<string>, "
        "ba array<boolean>, m map<string,string>, g binary",
    )
    got = [r["copy_line"] for r in copy_lines(df).collect()]
    want = [
        "\t".join(
            copy_encode_value(r[c])
            for c in ["i", "s", "b", "a", "sa", "ba", "m", "g"]
        )
        for r in rows
    ]
    assert sorted(got) == sorted(want)


def test_write_copy_stream_jvm_and_python_paths(spark, tmp_path):
    """Both write_copy_stream encode paths must emit the same COPY
    text (modulo partition/row order)."""
    from pyspark.sql import functions as F

    from osm2pgsql_spark.sinks.writers import write_copy_stream

    df = spark.range(0, 100).select(
        F.col("id"),
        F.concat(F.lit("name\t"), F.col("id").cast("string")).alias("s"),
        (F.col("id") % 3 == 0).alias("b"),
    ).coalesce(2)

    outs = {}
    for mode in (True, False):
        path = tmp_path / f"copy_{mode}.txt"

        def factory(p=path):
            return open(p, "a", encoding="utf-8")

        write_copy_stream(df, factory, jvm_encode=mode)
        outs[mode] = sorted(path.read_text(encoding="utf-8").splitlines())
    assert outs[True] == outs[False]
    assert len(outs[True]) == 100
    assert any("\\t" in line for line in outs[True])  # escaping happened
