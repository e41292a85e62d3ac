"""Style-file parser parity, ported from
/root/reference/tests/test-output-pgsql-style-file.cpp using the
reference's own fixture files (tests/style/*.style + default.style),
plus sscanf-emulation edge cases the C parser implies."""

import pytest

from osm2pgsql_spark.plans.style_file import (
    FLAG_DELETE,
    FLAG_INT_TYPE,
    FLAG_LINEAR,
    FLAG_NOCOLUMN,
    FLAG_POLYGON,
    FLAG_REAL_TYPE,
    StyleError,
    parse_style,
    read_style_file,
)

STYLE_DIR = "/root/reference/tests/style/"


def test_parse_default_style_file():
    exlist, enable_way_area = read_style_file("/root/reference/default.style")
    assert enable_way_area
    assert len(exlist.get("node")) == 98
    assert len(exlist.get("way")) == 104


def test_parse_empty_style_file():
    with pytest.raises(StyleError) as exc:
        read_style_file(STYLE_DIR + "empty.style")
    assert str(exc.value) == (
        "Unable to parse any valid columns from the style file. Aborting."
    )


def test_parse_invalid_osm_type():
    with pytest.raises(StyleError, match="Weird style line"):
        read_style_file(STYLE_DIR + "invalid-osm-type.style")


def test_parse_comments_only():
    with pytest.raises(StyleError) as exc:
        read_style_file(STYLE_DIR + "comments.style")
    assert str(exc.value) == (
        "Unable to parse any valid columns from the style file. Aborting."
    )


def test_parse_single_node_entry():
    exlist, enable_way_area = read_style_file(STYLE_DIR + "node.style")
    assert enable_way_area
    assert len(exlist.get("node")) == 1
    assert exlist.get("way") == []
    ex = exlist.get("node")[0]
    assert ex.name == "access"
    assert ex.type == "text"
    assert ex.flags == FLAG_LINEAR
    assert ex.column_type() == "TEXT"


def test_parse_valid_entries():
    exlist, enable_way_area = read_style_file(STYLE_DIR + "valid.style")
    assert enable_way_area
    nodes = exlist.get("node")
    ways = exlist.get("way")
    assert len(nodes) == 6
    assert len(ways) == 6
    for info in [*nodes, *ways]:
        assert info.type == "text"
        assert info.column_type() == "TEXT"
    want = [FLAG_LINEAR, FLAG_LINEAR, FLAG_POLYGON, FLAG_POLYGON,
            FLAG_NOCOLUMN, FLAG_DELETE]
    assert [n.flags for n in nodes] == want
    assert [w.flags for w in ways] == want


def test_parse_missing_fields():
    exlist, enable_way_area = read_style_file(STYLE_DIR + "missing.style")
    assert enable_way_area
    nodes = exlist.get("node")
    ways = exlist.get("way")
    assert [n.flags for n in nodes] == [FLAG_LINEAR, 0]
    assert [w.flags for w in ways] == [FLAG_POLYGON, 0]
    for info in [*nodes, *ways]:
        assert info.column_type() == "TEXT"


def test_parse_way_area_style():
    exlist, enable_way_area = read_style_file(STYLE_DIR + "way-area.style")
    assert enable_way_area
    nodes = exlist.get("node")
    ways = exlist.get("way")
    assert len(nodes) == 1
    assert len(ways) == 2
    assert nodes[0].flags == FLAG_POLYGON | FLAG_NOCOLUMN
    assert ways[0].flags == FLAG_POLYGON | FLAG_NOCOLUMN
    # way_area is real in the file but NEVER gets a type flag: the
    # engine supplies a pre-formatted string (taginfo.cpp:139-146)
    assert ways[1].type == "real"
    assert ways[1].flags == 0
    assert ways[1].column_type() == "TEXT"


def test_parse_data_types():
    exlist, _ = read_style_file(STYLE_DIR + "data-types.style")
    nodes = exlist.get("node")
    ways = exlist.get("way")
    assert [(n.name, n.type, n.flags) for n in nodes] == [
        ("name", "text", FLAG_LINEAR),
        ("population", "integer", FLAG_POLYGON | FLAG_INT_TYPE),
    ]
    assert [(w.name, w.type, w.flags) for w in ways] == [
        ("name", "text", FLAG_LINEAR),
        ("width", "real", FLAG_LINEAR | FLAG_REAL_TYPE),
        ("population", "integer", FLAG_POLYGON | FLAG_INT_TYPE),
    ]
    assert nodes[1].column_type() == "INT"
    assert ways[1].column_type() == "REAL"


def test_parse_invalid_data_type_falls_back_to_text():
    exlist, _ = read_style_file(STYLE_DIR + "invalid-data-type.style")
    assert exlist.get("node") == []
    ways = exlist.get("way")
    assert len(ways) == 1
    assert ways[0].name == "highway"
    assert ways[0].type == "foo"
    assert ways[0].flags == FLAG_LINEAR
    assert ways[0].column_type() == "TEXT"


# --- behaviors pinned directly from the C parser's code paths ---


def test_few_fields_is_an_error():
    with pytest.raises(StyleError) as exc:
        parse_style("node access\n")
    assert str(exc.value) == "Error reading style file line 1 (fields=2)."


def test_wildcard_in_non_delete_entry():
    with pytest.raises(StyleError) as exc:
        parse_style("node,way  name:*  text  linear\n")
    assert str(exc.value) == "Wildcard 'name:*' in non-delete style entry."


def test_wildcard_delete_is_allowed():
    exlist, _ = parse_style("node,way  note*  text  delete\n")
    assert exlist.get("node")[0].flags == FLAG_DELETE


def test_typed_wildcard_delete_still_rejected():
    # the type flag is OR'd in BEFORE the wildcard check, so
    # flags != FLAG_DELETE and the entry is rejected (taginfo.cpp:144-154)
    with pytest.raises(StyleError, match="Wildcard"):
        parse_style("node,way  note*  int4  delete\n")


def test_way_area_delete_disables_way_area():
    _, enable = parse_style(
        "node,way  building  text  polygon\nway  way_area  real  delete\n"
    )
    assert not enable


def test_unknown_flag_warns_and_is_ignored():
    import warnings

    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        exlist, _ = parse_style("node,way  access  text  linear,frobnicate\n")
    assert any("Unknown flag 'frobnicate'" in str(w.message) for w in caught)
    assert exlist.get("node")[0].flags == FLAG_LINEAR


def test_extra_tokens_ignored():
    exlist, _ = parse_style("node access text linear trailing garbage\n")
    assert exlist.get("node")[0].flags == FLAG_LINEAR


def test_sscanf_field_width_spill():
    """C sscanf %Ns stream semantics: an over-width token spills its
    remainder into the NEXT conversion — a 30-char osmtype yields its
    last 7 chars as the tag (taginfo.cpp:121-123 buffer widths)."""
    from osm2pgsql_spark.plans.style_file import _sscanf_fields

    # 30 non-space chars: %23s takes 23, the next %63s gets the tail
    line = "nodenodenodenodenodenodenodeXY name text"
    f = _sscanf_fields(line, (23, 63, 23, 127))
    assert f == ["nodenodenodenodenodenod", "enodeXY", "name", "text"]
    # normal lines are unaffected
    assert _sscanf_fields("node,way  amenity  text  polygon",
                          (23, 63, 23, 127)) == [
        "node,way", "amenity", "text", "polygon"]
    # C-locale whitespace only: vertical tab separates, unicode doesn't
    assert _sscanf_fields("a\x0bb", (23, 63)) == ["a", "b"]

    # through parse_style: the spilled tag becomes the entry name
    exlist, _ = parse_style(line)
    names = [i.name for i in exlist.get("node")]
    assert names == ["enodeXY"]
