"""Sinks: parquet (tests/lake), PostgreSQL COPY, expire files/tables.

Reference sink machinery:
- COPY pipeline: background thread streaming 10 MB tab-separated
  buffers, <=10 queued (/root/reference/src/db-copy.hpp:140-311);
  typed encoders incl. hex-EWKB and hstore k=>v
  (/root/reference/src/db-copy-mgr.hpp:84-238)
- delete-before-insert batches of <=1e6 ids
  (/root/reference/src/db-copy.hpp:76-138)
- expire file sink: z/x/y lines (/root/reference/src/expire-output.cpp:85-106)
- expire table sink: INSERT ... ON CONFLICT DO NOTHING
  (/root/reference/src/expire-output.cpp:107-143)

Spark-first: every executor partition is its own COPY stream
(foreachPartition), so the reference's single background thread
becomes N parallel streams; the same buffer/batch constants are kept.
psycopg is not in this container — the COPY path encodes identically
but is exercised against a text buffer in tests; the JDBC path is a
one-liner via df.write.jdbc when a driver jar is present.
"""

from __future__ import annotations

import os
from typing import IO

from pyspark.sql import DataFrame

COPY_BUFFER_BYTES = 10 * 1024 * 1024  # reference db-copy.hpp:148
DELETE_BATCH_MAX = 1_000_000  # reference db-copy.hpp:82,108


def copy_encode_value(v, hstore: bool = False) -> str:
    """Encode one value for COPY text format
    (reference db-copy-mgr.hpp:84-238): \\N for NULL, escaped tabs/
    newlines/backslashes, arrays as {..}, hstore as "k"=>"v",
    binary as hex."""
    if v is None:
        return r"\N"
    if isinstance(v, bool):
        return "t" if v else "f"
    if isinstance(v, (bytes, bytearray)):
        return r"\\x" + bytes(v).hex()
    if isinstance(v, dict):
        items = []
        for k, val in sorted(v.items()):
            kk = str(k).replace("\\", "\\\\").replace('"', '\\"')
            vv = str(val).replace("\\", "\\\\").replace('"', '\\"')
            items.append(f'"{kk}"=>"{vv}"')
        return _escape_copy(",".join(items))
    if isinstance(v, (list, tuple)):
        return _escape_copy("{" + ",".join("NULL" if x is None else str(x) for x in v) + "}")
    return _escape_copy(str(v))


def _escape_copy(s: str) -> str:
    return (
        s.replace("\\", "\\\\")
        .replace("\t", "\\t")
        .replace("\n", "\\n")
        .replace("\r", "\\r")
    )


def encode_copy_rows(rows, columns: list[str]) -> str:
    """Rows -> COPY text buffer (one call per <=10 MB chunk)."""
    lines = []
    for r in rows:
        lines.append("\t".join(copy_encode_value(r[c]) for c in columns))
    return "\n".join(lines) + ("\n" if lines else "")


def write_copy_stream(df: DataFrame, writer_factory, columns: list[str] | None = None) -> None:
    """foreachPartition COPY writer: writer_factory() must return a
    file-like object per partition (a psycopg copy_expert stream in
    production, any IO for tests).  Buffers are flushed at the
    reference's 10 MB boundary."""
    cols = columns or df.columns

    def handle(it) -> None:
        out: IO = writer_factory()
        buf: list[str] = []
        size = 0
        for row in it:
            line = "\t".join(copy_encode_value(row[c]) for c in cols) + "\n"
            buf.append(line)
            size += len(line)
            if size >= COPY_BUFFER_BYTES:
                out.write("".join(buf))
                buf, size = [], 0
        if buf:
            out.write("".join(buf))
        if hasattr(out, "close"):
            out.close()

    df.foreachPartition(handle)


def write_parquet(df: DataFrame, path: str, sort_cols: list[str] | None = None, partition_by: list[str] | None = None) -> None:
    """Parquet sink with optional within-partition sort — the analog
    of the reference's geometry clustering before index build
    (/root/reference/src/table.cpp:196: CREATE TABLE AS ... ORDER BY
    way).  Sort by a spatial key (quadkey/hilbert) so row groups are
    spatially coherent and min/max stats prune scans."""
    out = df
    if sort_cols:
        out = out.sortWithinPartitions(*sort_cols)
    w = out.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_expire_file(tiles: DataFrame, path: str) -> None:
    """Dirty-tile list as z/x/y text lines (reference
    expire-output.cpp:85-106 file format), single output file."""
    from pyspark.sql import functions as F

    rows = (
        tiles.select(
            F.concat_ws(
                "/", F.col("zoom").cast("string"), F.col("x").cast("string"), F.col("y").cast("string")
            ).alias("line")
        )
        .orderBy("line")
        .collect()
    )
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w", encoding="utf-8") as fh:
        for r in rows:
            fh.write(r["line"] + "\n")


def jdbc_url(host: str, port: int, db: str) -> str:
    return f"jdbc:postgresql://{host}:{port}/{db}"


def write_jdbc(df: DataFrame, url: str, table: str, mode: str = "append", batchsize: int = 10000, **options) -> None:
    """JDBC sink (needs the postgres driver jar on the classpath).
    batchsize mirrors the reference's buffered writes."""
    (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
        .options(**options)
        .mode(mode)
        .save()
    )
