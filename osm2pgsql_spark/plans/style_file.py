"""Legacy ``.style`` file front-end for the pgsql-compat output.

The reference's legacy pgsql output is driven by a whitespace-separated
style file (``osmtype  tag  datatype  flags`` per line) parsed by
``read_style_file`` (/root/reference/src/taginfo.cpp:92-199) into an
export list that controls which tags survive, which become typed table
columns, and which keys make a closed way a polygon
(/root/reference/src/tagtransform-c.cpp).  This module is the exact
parser twin: same field widths, same flag/type vocabulary, same
validation errors (wordings pinned by tests ported from
/root/reference/tests/test-output-pgsql-style-file.cpp), same
``way_area`` special-casing.  Parsing happens once on the driver; the
Catalyst side that consumes the result lives in
``osm2pgsql_spark.plans.pgsql_style``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

# column_flags (reference taginfo-impl.hpp): combinable bit flags.
FLAG_POLYGON = 1
FLAG_LINEAR = 2
FLAG_NOCACHE = 4
FLAG_DELETE = 8
FLAG_NOCOLUMN = 16
FLAG_INT_TYPE = 32
FLAG_REAL_TYPE = 64
# phstore is a compatibility alias: nocolumn + polygon in one flag
# (taginfo-impl.hpp:30-31, "same as FLAG_NOCOLUMN & FLAG_POLYGON") —
# the entry keeps objects, makes closed ways polygons, and lands in
# the hstore instead of getting its own column
FLAG_PHSTORE = FLAG_NOCOLUMN | FLAG_POLYGON

_TAG_FLAGS = {
    "polygon": FLAG_POLYGON,
    "linear": FLAG_LINEAR,
    "nocache": FLAG_NOCACHE,
    "delete": FLAG_DELETE,
    "phstore": FLAG_PHSTORE,
    "nocolumn": FLAG_NOCOLUMN,
}

# SQL type name -> type flag (reference taginfo.cpp:72-86); anything
# else is handled as text.
_TAG_TYPES = {
    "smallint": FLAG_INT_TYPE,
    "integer": FLAG_INT_TYPE,
    "bigint": FLAG_INT_TYPE,
    "int2": FLAG_INT_TYPE,
    "int4": FLAG_INT_TYPE,
    "int8": FLAG_INT_TYPE,
    "real": FLAG_REAL_TYPE,
    "double precision": FLAG_REAL_TYPE,
}


class StyleError(ValueError):
    """Raised for invalid style files (reference throws std errors)."""


@dataclass
class TagInfo:
    """One style line's effect on one OSM type (reference taginfo)."""

    name: str
    type: str
    flags: int = 0

    def column_type(self) -> str:
        """'INT' | 'REAL' | 'TEXT' (reference taginfo::column_type)."""
        if self.flags & FLAG_INT_TYPE:
            return "INT"
        if self.flags & FLAG_REAL_TYPE:
            return "REAL"
        return "TEXT"


@dataclass
class ExportList:
    """Per-OSM-type style entries in file order (reference export_list_t)."""

    nodes: list[TagInfo] = field(default_factory=list)
    ways: list[TagInfo] = field(default_factory=list)

    def add(self, kind: str, info: TagInfo) -> None:
        self.get(kind).append(info)

    def get(self, kind: str) -> list[TagInfo]:
        if kind == "node":
            return self.nodes
        if kind == "way":
            return self.ways
        raise KeyError(kind)

    def normal_columns(self, kind: str) -> list[TagInfo]:
        """Entries materialized as table columns: everything not
        flagged delete or nocolumn (reference taginfo.cpp:33-44)."""
        return [
            i for i in self.get(kind)
            if not (i.flags & (FLAG_DELETE | FLAG_NOCOLUMN))
        ]


def parse_tag_flags(flags: str, lineno: int) -> int:
    """Comma-separated flag list -> bit mask; unknown flags are
    ignored with a warning (reference taginfo.cpp:46-65 splits on
    ",\\r\\n")."""
    import warnings

    out = 0
    for name in _split_multi(flags, ",\r\n"):
        bit = _TAG_FLAGS.get(name)
        if bit is not None:
            out |= bit
        else:
            warnings.warn(
                f"Unknown flag '{name}' line {lineno}, ignored", stacklevel=2
            )
    return out


def _split_multi(s: str, seps: str) -> list[str]:
    parts = [s]
    for sep in seps:
        parts = [p for chunk in parts for p in chunk.split(sep)]
    return [p for p in parts if p]


_C_SPACE = " \t\n\v\f\r"  # C-locale isspace(), NOT Unicode whitespace


def _sscanf_fields(line: str, widths: tuple[int, ...]) -> list[str]:
    """C ``sscanf`` ``%Ns`` field extraction: skip whitespace, then
    consume up to N non-whitespace characters; a longer run leaves its
    tail in the stream for the NEXT conversion (so a 30-char first
    token yields its last 7 chars as the second field)."""
    out: list[str] = []
    i, n = 0, len(line)
    for w in widths:
        while i < n and line[i] in _C_SPACE:
            i += 1
        if i >= n:
            break
        j = i
        while j < n and line[j] not in _C_SPACE and j - i < w:
            j += 1
        out.append(line[i:j])
        i = j
    return out


def parse_style(text: str, filename: str = "<style>") -> tuple[ExportList, bool]:
    """Parse style-file text (reference read_style_file,
    taginfo.cpp:92-199).  Returns (export list, enable_way_area);
    raises StyleError with the reference's wordings on invalid input.

    Field extraction mirrors ``sscanf("%23s %63s %23s %127s")``
    exactly: each ``%Ns`` consumes at most N characters of a
    non-whitespace run, and an over-width run SPILLS its remainder
    into the next conversion (C stream semantics) rather than being
    truncated to the next whitespace-separated token."""
    exlist = ExportList()
    enable_way_area = True
    read_valid_column = False

    for lineno, raw in enumerate(text.splitlines(), start=1):
        line = raw.split("#", 1)[0]
        if not line.split():
            continue
        toks = _sscanf_fields(line, (23, 63, 23, 127))
        fields = len(toks)
        if fields < 3:
            raise StyleError(
                f"Error reading style file line {lineno} (fields={fields})."
            )
        osmtype = toks[0]
        name = toks[1]
        datatype = toks[2]
        flags = parse_tag_flags(toks[3], lineno) if fields == 4 else 0

        # way_area is special: its value is produced by the engine as
        # an already-formatted string, so it never gets a type flag
        # (taginfo.cpp:139-146).
        if name != "way_area":
            flags |= _TAG_TYPES.get(datatype, 0)

        if flags != FLAG_DELETE and ("?" in name or "*" in name):
            raise StyleError(f"Wildcard '{name}' in non-delete style entry.")

        if name == "way_area" and flags == FLAG_DELETE:
            enable_way_area = False

        info = TagInfo(name=name, type=datatype, flags=flags)

        # strstr containment, exactly like the reference: "node,way"
        # hits both, but so would "waypoint" hit "way".
        kept = False
        if "node" in osmtype:
            exlist.add("node", info)
            kept = True
        if "way" in osmtype:
            exlist.add("way", info)
            kept = True
        if not kept:
            raise StyleError(f"Weird style line {filename}:{lineno}.")
        read_valid_column = True

    if not read_valid_column:
        raise StyleError(
            "Unable to parse any valid columns from the style file. Aborting."
        )
    return exlist, enable_way_area


def read_style_file(path: str) -> tuple[ExportList, bool]:
    try:
        with open(path, encoding="utf-8", errors="replace") as fh:
            text = fh.read()
    except OSError as exc:
        raise StyleError(f"Couldn't open style file '{path}'") from exc
    return parse_style(text, filename=path)
