"""O5M reader tests: round-trip through the encoder, exercising delta
chains, the string reference table, metadata, deleted objects, and
reset markers (decoder semantics from libosmium's
o5m_input_format.hpp, format per the public O5m spec)."""

from datetime import datetime

import pytest

from osm2pgsql_spark.sources.o5m import read_o5c, read_o5m, write_o5m


@pytest.fixture()
def o5m_file(tmp_path):
    p = str(tmp_path / "mini.o5m")

    def build(enc):
        enc.node(
            1, 50.0, 9.0, {"amenity": "cafe", "name": "A"},
            version=3, ts=datetime(2020, 1, 2, 3, 4, 5), changeset=77,
            uid=42, user="alice",
        )
        enc.node(2, 50.1, 9.1, {"amenity": "cafe"})  # repeated tag -> table ref
        enc.node(5, 50.2, 9.2)
        enc.node(7, 0.0, 0.0, visible=False)  # deleted
        enc.way(10, [1, 2, 5], {"highway": "primary"},
                version=1, ts=datetime(2021, 6, 1), changeset=78, uid=42, user="alice")
        enc.way(11, [5, 2], {"highway": "primary"})  # tag + user table reuse
        enc.reset()  # mid-file reset: deltas and table cleared
        enc.node(100, 51.0, 10.0, {"amenity": "cafe"})
        enc.relation(
            20,
            [("w", 10, "outer"), ("w", 11, "inner"), ("n", 1, ""), ("r", 19, "sub")],
            {"type": "multipolygon"},
        )
        enc.relation(21, [("w", 10, "outer")], {"type": "multipolygon"})

    write_o5m(p, build)
    return p


def test_o5m_roundtrip(spark, o5m_file):
    nodes, ways, rels = read_o5m(spark, o5m_file)
    n = {r.id: r for r in nodes.collect()}
    assert set(n) == {1, 2, 5, 7, 100}
    assert n[1].tags == {"amenity": "cafe", "name": "A"}
    assert n[1].lat == pytest.approx(50.0) and n[1].lon == pytest.approx(9.0)
    assert n[1].version == 3 and n[1].changeset == 77
    assert n[1].uid == 42 and n[1].user == "alice"
    assert n[1].ts == datetime(2020, 1, 2, 3, 4, 5)
    assert n[2].tags == {"amenity": "cafe"}
    assert n[7].visible is False and n[7].lat is None
    assert n[100].lat == pytest.approx(51.0)  # post-reset deltas correct

    w = {r.id: r for r in ways.collect()}
    assert w[10].refs == [1, 2, 5]
    assert w[11].refs == [5, 2]
    assert w[10].user == "alice" and w[10].version == 1

    rl = {r.id: r for r in rels.collect()}
    assert [tuple(m) for m in rl[20].members] == [
        ("w", 10, "outer"), ("w", 11, "inner"), ("n", 1, ""), ("r", 19, "sub"),
    ]
    assert rl[20].tags == {"type": "multipolygon"}
    assert [tuple(m) for m in rl[21].members] == [("w", 10, "outer")]


def test_o5c_ops(spark, tmp_path):
    p = str(tmp_path / "mini.o5c")

    def build(enc):
        enc.node(1, 50.0, 9.0, {"a": "1"})
        enc.node(2, 0.0, 0.0, visible=False)

    write_o5m(p, build)
    # patch header to o5c
    raw = bytearray(open(p, "rb").read())
    raw[5:6] = b"c"
    open(p, "wb").write(bytes(raw))

    nodes, _, _ = read_o5c(spark, p)
    got = {(r.id, r.op, r.op_seq) for r in nodes.collect()}
    assert got == {(1, "modify", 0), (2, "delete", 1)}


def test_o5m_bad_magic(spark, tmp_path):
    p = str(tmp_path / "bad.o5m")
    open(p, "wb").write(b"\x00" * 16)
    with pytest.raises(ValueError, match="magic"):
        read_o5m(spark, p)
