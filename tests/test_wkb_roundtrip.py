"""WKB serialization round-trips — twin of the reference's
tests/test-wkb.cpp (null, every geometry type, nested collections)
plus the decoder's EWKB-SRID and big-endian branches, which the
reference exercises via ewkb::parse_geometry."""

import struct

import numpy as np

from osm2pgsql_spark.functions import geometry as G


def rt(geom):
    return G.from_wkb(G.to_wkb(geom))


def geq(a, b):
    if a is None or b is None:
        return a is b
    ka, pa = a
    kb, pb = b
    if ka != kb:
        return False
    if ka == "point":
        return tuple(pa) == tuple(pb)
    if ka in ("linestring",):
        return np.array_equal(np.asarray(pa), np.asarray(pb))
    if ka == "polygon":
        return len(pa) == len(pb) and all(
            np.array_equal(np.asarray(x), np.asarray(y))
            for x, y in zip(pa, pb))
    if ka == "collection":
        return len(pa) == len(pb) and all(geq(x, y) for x, y in zip(pa, pb))
    sub = {"multipoint": "point", "multilinestring": "linestring",
           "multipolygon": "polygon"}[ka]
    return len(pa) == len(pb) and all(
        geq((sub, x), (sub, y)) for x, y in zip(pa, pb))


LS = [(1.0, 2.0), (2.0, 2.0)]
POLY_OUTER = [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0), (0.0, 0.0)]
POLY_INNER = [(1.0, 1.0), (1.0, 2.0), (2.0, 2.0), (2.0, 1.0), (1.0, 1.0)]


class TestRoundTrips:
    def test_null(self):
        # "wkb: nullgeom": null geometry -> empty wkb -> null
        assert G.to_wkb(None) is None
        assert G.from_wkb(None) is None
        assert G.from_wkb(b"") is None

    def test_point(self):
        assert geq(rt(("point", (3.2, 4.2))), ("point", (3.2, 4.2)))

    def test_linestring(self):
        g = ("linestring", np.array(LS))
        assert geq(rt(g), g)

    def test_polygon_without_inner(self):
        g = ("polygon", [np.array(POLY_OUTER)])
        assert geq(rt(g), g)

    def test_polygon_with_inner(self):
        g = ("polygon", [np.array(POLY_OUTER), np.array(POLY_INNER)])
        assert geq(rt(g), g)

    def test_multipoint(self):
        g = ("multipoint", [(1.0, 2.0), (3.0, 4.0)])
        assert geq(rt(g), g)

    def test_multilinestring(self):
        g = ("multilinestring",
             [np.array(LS), np.array([(5.0, 5.0), (6.0, 7.0), (8.0, 8.0)])])
        assert geq(rt(g), g)

    def test_multipolygon(self):
        g = ("multipolygon", [[np.array(POLY_OUTER)],
                              [np.array(POLY_OUTER), np.array(POLY_INNER)]])
        assert geq(rt(g), g)

    def test_collection_nested(self):
        # "wkb: collection" with mixed members incl. a nested multi
        g = ("collection", [
            ("point", (1.0, 2.0)),
            ("linestring", np.array(LS)),
            ("multipoint", [(0.0, 0.0), (9.0, 9.0)]),
        ])
        assert geq(rt(g), g)


class TestDecoderBranches:
    def test_ewkb_srid_flag(self):
        # PostGIS-style EWKB: flag bit + 4-byte srid after the code
        body = G.to_wkb(("point", (3.2, 4.2)))
        ewkb = (b"\x01" + struct.pack("<I", 1 | 0x20000000)
                + struct.pack("<I", 3857) + body[5:])
        assert geq(G.from_wkb(ewkb), ("point", (3.2, 4.2)))

    def test_big_endian_point(self):
        be = b"\x00" + struct.pack(">I", 1) + struct.pack(">dd", 3.2, 4.2)
        # byte-order dispatch: XDR point decodes identically
        g = G.from_wkb(be)
        assert g[0] == "point" and g[1] == (3.2, 4.2)
