"""Core data model: the OSM trio as Spark schemas.

Reference (/root/reference): nodes/ways/relations stream out of
libosmium buffers one at a time (src/input.cpp:110-128), dispatched to
middle + output (src/osmdata.cpp:40-192).  ids are int64
(src/osmtypes.hpp:31), locations fixed-point 1e-7 degrees, tags an
unordered unique-key (k,v) list (src/osmtypes.hpp:88-239), relation
members (type, ref, role) structs (src/osmtypes.hpp:33-67), optional
attributes version/timestamp/changeset/uid/user
(src/osmtypes.hpp:103-111).

Spark-first mapping: three DataFrames with MapType tags; geometry
travels as WKB BINARY plus an SRID int (reference geometry variant:
src/geom.hpp:433-437, EWKB serialization src/wkb.cpp:573-579).
"""

from __future__ import annotations

from pyspark.sql import types as T

# Optional object attributes (reference: -x / --extra-attributes,
# src/osmtypes.hpp:103-111). Kept nullable; absent in most fixtures.
_ATTR_FIELDS = [
    T.StructField("version", T.IntegerType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("changeset", T.LongType()),
    T.StructField("uid", T.LongType()),
    T.StructField("user", T.StringType()),
    T.StructField("visible", T.BooleanType()),
]

NODE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("lat", T.DoubleType()),
        T.StructField("lon", T.DoubleType()),
        T.StructField("tags", T.MapType(T.StringType(), T.StringType())),
        *_ATTR_FIELDS,
    ]
)

WAY_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("refs", T.ArrayType(T.LongType())),
        T.StructField("tags", T.MapType(T.StringType(), T.StringType())),
        *_ATTR_FIELDS,
    ]
)

MEMBER_TYPE = T.StructType(
    [
        T.StructField("type", T.StringType()),  # 'n' | 'w' | 'r'
        T.StructField("ref", T.LongType()),
        T.StructField("role", T.StringType()),
    ]
)

RELATION_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("members", T.ArrayType(MEMBER_TYPE)),
        T.StructField("tags", T.MapType(T.StringType(), T.StringType())),
        *_ATTR_FIELDS,
    ]
)

# Geometry: WKB binary + srid, the engine-wide interchange type
# (reference geom::geometry_t src/geom.hpp:433-437 + srid).
GEOMETRY_TYPE = T.StructType(
    [
        T.StructField("wkb", T.BinaryType()),
        T.StructField("srid", T.IntegerType()),
    ]
)

# Diff/change files carry an operation per object
# (reference: src/input.cpp:190-194, src/osmdata.cpp:55-70).
OP_CREATE, OP_MODIFY, OP_DELETE = "create", "modify", "delete"

# Hard cap from the reference (src/osmdata.cpp:151-156).
MAX_RELATION_MEMBERS = 32767

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
