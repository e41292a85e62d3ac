"""OPL / grid / OSM-XML source tests (reference fixture formats)."""

import textwrap

from osm2pgsql_spark.sources.opl import grid_nodes, parse_opl_line, read_opl
from osm2pgsql_spark.sources.osm_xml import read_osc_xml, read_osm_xml


def test_parse_opl_node():
    # OPL escapes are %<hex codepoint>% (libosmium), not URL-style
    kind, o = parse_opl_line("n17 v3 c1234 i42 utest%20%user Tamenity=cafe,name=X x9.1 y50.2")
    assert kind == "n" and o["id"] == 17
    assert o["version"] == 3 and o["uid"] == 42 and o["user"] == "test user"
    assert o["tags"] == {"amenity": "cafe", "name": "X"}
    assert o["lon"] == 9.1 and o["lat"] == 50.2


def test_parse_opl_way_and_relation():
    kind, w = parse_opl_line("w1 Tnatural=water,name=poly Nn1,n2,n4,n3,n1")
    assert kind == "w" and w["refs"] == [1, 2, 4, 3, 1]
    kind, r = parse_opl_line("r1 Ttype=multipolygon Mw2@outer,w3@inner,n9@")
    assert kind == "r"
    assert r["members"] == [
        {"type": "w", "ref": 2, "role": "outer"},
        {"type": "w", "ref": 3, "role": "inner"},
        {"type": "n", "ref": 9, "role": ""},
    ]


def test_grid_nodes():
    lines = grid_nodes(
        textwrap.dedent(
            """
            n1 . n2
            .  n3 .
            """
        )
    )
    assert lines[0].startswith("n1 x9.0000000 y50.3000000")
    assert lines[1].startswith("n2 x9.2000000 y50.3000000")
    assert lines[2].startswith("n3 x9.1000000 y50.2000000")


def test_read_opl_spark(spark):
    nodes, ways, rels = read_opl(
        spark,
        [
            "n1 x9.0 y50.0 Tamenity=pub",
            "n2 x9.1 y50.0",
            "w10 Thighway=road Nn1,n2",
            "r20 Ttype=route Mw10@",
        ],
    )
    assert nodes.count() == 2 and ways.count() == 1 and rels.count() == 1
    w = ways.collect()[0]
    assert w["refs"] == [1, 2] and w["tags"]["highway"] == "road"


OSM_XML = """<?xml version='1.0'?>
<osm version="0.6">
  <node id="1" lat="50.0" lon="9.0" version="1" timestamp="2024-01-01T00:00:00Z">
    <tag k="amenity" v="pub"/>
  </node>
  <node id="2" lat="50.1" lon="9.1"/>
  <way id="10" version="2"><nd ref="1"/><nd ref="2"/><tag k="highway" v="road"/></way>
  <relation id="20"><member type="way" ref="10" role="outer"/><tag k="type" v="multipolygon"/></relation>
</osm>
"""

OSC_XML = """<?xml version='1.0'?>
<osmChange version="0.6">
  <modify><node id="1" lat="51.0" lon="9.5"/></modify>
  <delete><node id="2" lat="0" lon="0"/></delete>
  <create><node id="3" lat="52.0" lon="9.9" version="1"/></create>
</osmChange>
"""


def test_read_osm_xml(spark, tmp_path):
    p = tmp_path / "x.osm"
    p.write_text(OSM_XML)
    nodes, ways, rels = read_osm_xml(spark, str(p))
    n = {r["id"]: r for r in nodes.collect()}
    assert n[1]["tags"]["amenity"] == "pub"
    assert n[1]["version"] == 1
    assert n[1]["ts"] is not None
    assert ways.collect()[0]["refs"] == [1, 2]
    assert rels.collect()[0]["members"][0]["type"] == "w"


def test_read_osc_xml_with_apply(spark, tmp_path):
    from osm2pgsql_spark.streaming.append import apply_diff

    p = tmp_path / "c.osc"
    p.write_text(OSC_XML)
    nodes, _, _ = read_osc_xml(spark, str(p))
    ops = {r["id"]: r["op"] for r in nodes.collect()}
    assert ops == {1: "modify", 2: "delete", 3: "create"}

    base, _, _ = read_osm_xml(spark, str(tmp_path / "x.osm")) if (tmp_path / "x.osm").exists() else (None, None, None)
    # build base inline instead
    p2 = tmp_path / "x.osm"
    p2.write_text(OSM_XML)
    base, _, _ = read_osm_xml(spark, str(p2))
    new = apply_diff(base, nodes)
    got = {r["id"]: (r["lat"], r["lon"]) for r in new.collect()}
    assert got == {1: (51.0, 9.5), 3: (52.0, 9.9)}

def test_read_compressed_roundtrips(spark, tmp_path):
    """.gz and .bz2 variants of every text format parse identically to
    the plain file (libosmium resolves compression from the suffix)."""
    import bz2
    import gzip

    from osm2pgsql_spark.sources.o5m import read_o5m, write_o5m

    # --- XML (.osm.gz / .osm.bz2)
    plain = tmp_path / "x.osm"
    plain.write_text(OSM_XML)
    want_n, want_w, want_r = (df.count() for df in read_osm_xml(spark, str(plain)))
    for suffix, opener in ((".gz", gzip.open), (".bz2", bz2.open)):
        p = tmp_path / f"x.osm{suffix}"
        with opener(p, "wb") as fh:
            fh.write(OSM_XML.encode())
        n, w, r = read_osm_xml(spark, str(p))
        assert (n.count(), w.count(), r.count()) == (want_n, want_w, want_r)

    # --- OSC (.osc.bz2)
    pc = tmp_path / "c.osc.bz2"
    with bz2.open(pc, "wb") as fh:
        fh.write(OSC_XML.encode())
    nodes, _, _ = read_osc_xml(spark, str(pc))
    assert {r["id"]: r["op"] for r in nodes.collect()} == {
        1: "modify", 2: "delete", 3: "create"}

    # --- OPL (.opl.bz2)
    opl_text = "n1 x9.0 y50.0 Tamenity=pub\nw10 Thighway=road Nn1\n"
    po = tmp_path / "d.opl.bz2"
    with bz2.open(po, "wb") as fh:
        fh.write(opl_text.encode())
    n, w, r = read_opl(spark, str(po))
    assert n.count() == 1 and w.count() == 1 and r.count() == 0

    # --- o5m (.o5m.bz2): write plain, recompress, compare
    def build(enc):
        enc.node(1, 50.0, 9.0, {"amenity": "pub"})
        enc.node(2, 50.1, 9.1)
        enc.way(10, [1, 2], {"highway": "road"})

    p5 = tmp_path / "e.o5m"
    write_o5m(str(p5), build)
    p5z = tmp_path / "e.o5m.bz2"
    with bz2.open(p5z, "wb") as fh:
        fh.write(p5.read_bytes())
    n, w, _ = read_o5m(spark, str(p5z))
    assert n.count() == 2 and w.count() == 1


def test_import_tool_detects_bz2(spark, tmp_path):
    import bz2

    from tools.import_tool import read_osm_any

    p = tmp_path / "x.osm.bz2"
    with bz2.open(p, "wb") as fh:
        fh.write(OSM_XML.encode())
    nodes, ways, rels = read_osm_any(spark, str(p))
    assert nodes.count() == 2 and ways.count() == 1
