"""tags.feature port (/root/reference/tests/bdd/flex/tags.feature):
tag values round-trip byte-exactly through text / hstore / json
columns — full-unicode names across nine scripts, and OPL
%-codepoint-escaped control characters (space, tab, ESC, LF, 0x01,
0x1F) straight through the parser into every column form."""

import json

from pyspark.sql import functions as F

from osm2pgsql_spark.plans.flex import ColumnDef, FlexConfig
from osm2pgsql_spark.sources.opl import read_opl

UNICODE_NAMES = [
    "Paris", "Nürnberg", "Plzeň", "Αθήνα", "תל־אביב-יפו",
    "عَمَّان", "北京", "ရန်ကုန်", "मुंबई",
]

ESCAPED = {
    10: "",
    11: "<%20%>",
    12: "<%09%>",
    13: "<%1B%%0A%>",
    14: "<%01%%1F%>",
}
DECODED = {
    10: "",
    11: "< >",
    12: "<\t>",
    13: "<\x1b\n>",
    14: "<\x01\x1f>",
}


def _run(spark, lines):
    nodes, _, _ = read_opl(spark, lines)
    cfg = FlexConfig()
    cfg.define_table(
        "pois", ids="node",
        columns=[
            ColumnDef("name", "text"),
            ColumnDef("htags", "hstore"),
            ColumnDef("jtags", "json"),
        ],
    )
    cfg.insert(
        "pois", "node",
        name=F.col("tags")["name"], htags=F.col("tags"), jtags=F.col("tags"),
    )
    return cfg.run(nodes=nodes)["pois"]


def test_unicode_tags_roundtrip(spark):
    lines = [
        f"n{10 + i} v1 dV Tname={n} x10.0 y10.0"
        for i, n in enumerate(UNICODE_NAMES)
    ]
    rows = {r["osm_id"]: r for r in _run(spark, lines).collect()}
    for i, n in enumerate(UNICODE_NAMES):
        r = rows[10 + i]
        assert r["name"] == n
        assert r["htags"]["name"] == n
        assert json.loads(r["jtags"])["name"] == n


def test_escaped_control_chars_roundtrip(spark):
    lines = [
        f"n{nid} v1 dV Tname={val} x10.0 y10.0" for nid, val in ESCAPED.items()
    ]
    rows = {r["osm_id"]: r for r in _run(spark, lines).collect()}
    for nid, want in DECODED.items():
        r = rows[nid]
        assert r["name"] == want, (nid, r["name"])
        assert r["htags"]["name"] == want
        assert json.loads(r["jtags"])["name"] == want
