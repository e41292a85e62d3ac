"""OSM PBF reader — a splittable source with a hand-rolled protobuf
wire decoder (no protobuf dependency in this container).

Format (public spec, https://wiki.openstreetmap.org/wiki/PBF_Format):
a PBF file is a sequence of independently-decodable blobs:

    [int32 BE header_len][BlobHeader][Blob]...

BlobHeader{1:type, 3:datasize}; Blob{1:raw, 2:raw_size, 3:zlib_data};
an OSMData blob holds one PrimitiveBlock{1:stringtable,
2:primitivegroup*, 17:granularity=100, 19:lat_offset, 20:lon_offset}
with dense nodes (delta-coded ids/lats/lons, 0-separated key/value
string ids), ways (delta-coded refs) and relations (delta-coded
member ids).

The reference reads PBF via libosmium (/root/reference/src/input.cpp:
307-336).  Spark-first: the blob boundary IS the split boundary — the
driver scans only the tiny blob headers to build an offset index,
then executors decode their blob ranges in parallel
(spark.sparkContext.parallelize(offsets) -> flatMap(decode)).  This
is what makes PBF "naturally splittable" (SURVEY §2.1).
"""

from __future__ import annotations

import struct
import zlib
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from osm2pgsql_spark.model import NODE_SCHEMA, RELATION_SCHEMA, WAY_SCHEMA

# ------------------------------------------------ protobuf wire format

def _varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _zigzag(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _fields(buf: bytes):
    """Iterate (field_no, wire_type, value) over a protobuf message.
    Length-delimited values are memoryview slices; varints are ints."""
    pos = 0
    n = len(buf)
    while pos < n:
        key, pos = _varint(buf, pos)
        field, wt = key >> 3, key & 7
        if wt == 0:  # varint
            v, pos = _varint(buf, pos)
        elif wt == 2:  # length-delimited
            ln, pos = _varint(buf, pos)
            v = buf[pos : pos + ln]
            pos += ln
        elif wt == 5:  # 32-bit
            v = struct.unpack_from("<I", buf, pos)[0]
            pos += 4
        elif wt == 1:  # 64-bit
            v = struct.unpack_from("<Q", buf, pos)[0]
            pos += 8
        else:
            raise ValueError(f"unsupported wire type {wt}")
        yield field, wt, v


def _packed_varints(buf: bytes, signed: bool = False, delta: bool = False) -> list[int]:
    out = []
    pos = 0
    acc = 0
    while pos < len(buf):
        v, pos = _varint(buf, pos)
        if signed:
            v = _zigzag(v)
        if delta:
            acc += v
            out.append(acc)
        else:
            out.append(v)
    return out


# ------------------------------------------------------- blob scanning

@dataclass(frozen=True)
class BlobRef:
    offset: int  # file offset of the blob payload
    size: int  # payload size
    type: str  # OSMHeader | OSMData


def scan_blob_index(path: str) -> list[BlobRef]:
    """Driver-side index scan: reads only the 4-byte lengths and
    BlobHeaders (a few hundred bytes per ~8 MB blob)."""
    refs = []
    with open(path, "rb") as fh:
        while True:
            head = fh.read(4)
            if len(head) < 4:
                break
            (hlen,) = struct.unpack(">I", head)
            header = fh.read(hlen)
            btype = "?"
            datasize = 0
            for field, _wt, v in _fields(header):
                if field == 1:
                    btype = bytes(v).decode()
                elif field == 3:
                    datasize = v
            offset = fh.tell()
            refs.append(BlobRef(offset=offset, size=datasize, type=btype))
            fh.seek(datasize, 1)
    return refs


def _read_blob(path: str, ref: BlobRef) -> bytes:
    with open(path, "rb") as fh:
        fh.seek(ref.offset)
        payload = fh.read(ref.size)
    raw = None
    for field, _wt, v in _fields(payload):
        if field == 1:
            raw = bytes(v)
        elif field == 3:
            raw = zlib.decompress(bytes(v))
    if raw is None:
        raise ValueError("blob has no raw/zlib data (unsupported compression)")
    return raw


# --------------------------------------------------- block decoding

def decode_primitive_block(raw: bytes):
    """PrimitiveBlock -> (nodes, ways, relations) row tuples matching
    model.NODE/WAY/RELATION_SCHEMA (attributes left NULL; add
    DenseInfo decoding when -x parity is needed)."""
    strings: list[str] = []
    groups = []
    granularity = 100
    lat_offset = 0
    lon_offset = 0
    for field, _wt, v in _fields(raw):
        if field == 1:  # stringtable
            for f2, _w2, s in _fields(v):
                if f2 == 1:
                    strings.append(bytes(s).decode("utf-8", "replace"))
        elif field == 2:
            groups.append(v)
        elif field == 17:
            granularity = v
        elif field == 19:
            lat_offset = v
        elif field == 20:
            lon_offset = v

    def coord(raw_v: int, off: int) -> float:
        return (off + granularity * raw_v) * 1e-9

    nodes, ways, rels = [], [], []

    def tags_of(keys: list[int], vals: list[int]) -> dict:
        return {strings[k]: strings[v] for k, v in zip(keys, vals)}

    for group in groups:
        for field, _wt, v in _fields(group):
            if field == 1:  # plain Node
                nid = lat = lon = 0
                keys: list[int] = []
                vals: list[int] = []
                for f2, w2, v2 in _fields(v):
                    if f2 == 1:
                        nid = _zigzag(v2) if w2 == 0 else v2
                    elif f2 == 2:
                        keys = _packed_varints(v2)
                    elif f2 == 3:
                        vals = _packed_varints(v2)
                    elif f2 == 8:
                        lat = _zigzag(v2)
                    elif f2 == 9:
                        lon = _zigzag(v2)
                nodes.append(
                    (nid, coord(lat, lat_offset), coord(lon, lon_offset),
                     tags_of(keys, vals), None, None, None, None, None, None)
                )
            elif field == 2:  # DenseNodes
                ids: list[int] = []
                lats: list[int] = []
                lons: list[int] = []
                kv: list[int] = []
                for f2, _w2, v2 in _fields(v):
                    if f2 == 1:
                        ids = _packed_varints(v2, signed=True, delta=True)
                    elif f2 == 8:
                        lats = _packed_varints(v2, signed=True, delta=True)
                    elif f2 == 9:
                        lons = _packed_varints(v2, signed=True, delta=True)
                    elif f2 == 10:
                        kv = _packed_varints(v2)
                ki = 0
                for i, nid in enumerate(ids):
                    tags = {}
                    while ki < len(kv) and kv[ki] != 0:
                        tags[strings[kv[ki]]] = strings[kv[ki + 1]]
                        ki += 2
                    ki += 1  # skip the 0 separator
                    nodes.append(
                        (nid, coord(lats[i], lat_offset), coord(lons[i], lon_offset),
                         tags, None, None, None, None, None, None)
                    )
            elif field == 3:  # Way
                wid = 0
                keys = []
                vals = []
                refs: list[int] = []
                for f2, _w2, v2 in _fields(v):
                    if f2 == 1:
                        wid = v2
                    elif f2 == 2:
                        keys = _packed_varints(v2)
                    elif f2 == 3:
                        vals = _packed_varints(v2)
                    elif f2 == 8:
                        refs = _packed_varints(v2, signed=True, delta=True)
                ways.append(
                    (wid, refs, tags_of(keys, vals), None, None, None, None, None, None)
                )
            elif field == 4:  # Relation
                rid = 0
                keys = []
                vals = []
                roles: list[int] = []
                memids: list[int] = []
                types: list[int] = []
                for f2, _w2, v2 in _fields(v):
                    if f2 == 1:
                        rid = v2
                    elif f2 == 2:
                        keys = _packed_varints(v2)
                    elif f2 == 3:
                        vals = _packed_varints(v2)
                    elif f2 == 8:
                        roles = _packed_varints(v2)
                    elif f2 == 9:
                        memids = _packed_varints(v2, signed=True, delta=True)
                    elif f2 == 10:
                        types = _packed_varints(v2)
                tchar = {0: "n", 1: "w", 2: "r"}
                members = [
                    (tchar[t], m, strings[r]) for t, m, r in zip(types, memids, roles)
                ]
                rels.append(
                    (rid, members, tags_of(keys, vals), None, None, None, None, None, None)
                )
    return nodes, ways, rels


# ----------------------------------------------------- Spark assembly

def read_pbf(
    spark: SparkSession, path: str, partitions: int | None = None
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Distributed PBF read: driver scans the blob index (headers
    only), executors decode blob ranges in parallel.  `path` must be
    visible to executors (shared fs / object store; local[*] here)."""
    refs = [r for r in scan_blob_index(path) if r.type == "OSMData"]
    if partitions is None:
        partitions = max(1, min(len(refs), spark.sparkContext.defaultParallelism))

    sc = spark.sparkContext
    blob_rdd = sc.parallelize([(r.offset, r.size) for r in refs], partitions)

    def decode(ref_tuple):
        offset, size = ref_tuple
        raw = _read_blob(path, BlobRef(offset=offset, size=size, type="OSMData"))
        return [decode_primitive_block(raw)]

    # three flatMaps consume the decode output; without persist every
    # blob would be read, decompressed and decoded three times
    decoded = blob_rdd.flatMap(decode).persist()
    nodes_rdd = decoded.flatMap(lambda t: t[0])
    ways_rdd = decoded.flatMap(lambda t: t[1])
    rels_rdd = decoded.flatMap(lambda t: t[2])

    nodes = spark.createDataFrame(nodes_rdd, NODE_SCHEMA)
    ways = spark.createDataFrame(ways_rdd, WAY_SCHEMA)
    rels = spark.createDataFrame(rels_rdd, RELATION_SCHEMA)
    return nodes, ways, rels
