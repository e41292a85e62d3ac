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
        return _escape_copy("{" + ",".join(_array_elem(x) for x in v) + "}")
    return _escape_copy(str(v))


def _array_elem(x) -> str:
    """One Postgres array-literal element.  String elements are always
    double-quoted with backslash/quote escaping (the reference's array
    builder quotes unconditionally, db-copy-mgr.hpp:120-148) — an
    unquoted string containing ',' '{' '}' '"' or backslash would
    corrupt the literal (ADVICE r4)."""
    if x is None:
        return "NULL"
    if isinstance(x, bool):
        return "t" if x else "f"
    if isinstance(x, str):
        return '"' + x.replace("\\", "\\\\").replace('"', '\\"') + '"'
    return str(x)


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


# ---------------------------------------------------------------------------
# JVM-side COPY encoding (the 100 TB path): the same typed encoders as
# copy_encode_value, but as Catalyst column expressions — the whole
# line is built inside whole-stage codegen and executors stream
# ready-made text, no per-row Python.  (reference db-copy-mgr.hpp:84-238)
# ---------------------------------------------------------------------------

_COPY_NULL = "\\N"


def copy_escape_expr(c):
    """COPY text escaping: backslash first, then tab/newline/cr."""
    from pyspark.sql import functions as F

    c = F.replace(c, F.lit("\\"), F.lit("\\\\"))
    c = F.replace(c, F.lit("\t"), F.lit("\\t"))
    c = F.replace(c, F.lit("\n"), F.lit("\\n"))
    return F.replace(c, F.lit("\r"), F.lit("\\r"))


def copy_text_expr(c):
    from pyspark.sql import functions as F

    return F.coalesce(copy_escape_expr(c), F.lit(_COPY_NULL))


def copy_int_expr(c):
    from pyspark.sql import functions as F

    return F.coalesce(c.cast("string"), F.lit(_COPY_NULL))


def copy_bool_expr(c):
    from pyspark.sql import functions as F

    # NULL must stay NULL -> \N (a bare WHEN would route NULL to 'f')
    return (
        F.when(c.isNull(), F.lit(_COPY_NULL))
        .when(c, F.lit("t"))
        .otherwise(F.lit("f"))
    )


def copy_array_expr(c, element_type=None):
    """ARRAY<numeric/bool/string> -> {a,b,NULL,...}
    (db-copy-mgr.hpp:120-148).  String elements are always
    double-quoted with backslash/quote escaping — unquoted strings
    containing ',' '{' '}' '"' or backslash corrupt the literal
    (ADVICE r4); bool elements render t/f; numerics cast bare.
    Pass the ArrayType's elementType (copy_lines does) to pick the
    element encoding; None keeps the bare-cast numeric path."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    if isinstance(element_type, T.StringType):
        def el(x):
            q = F.replace(
                F.replace(x, F.lit("\\"), F.lit("\\\\")), F.lit('"'), F.lit('\\"')
            )
            return F.concat(F.lit('"'), q, F.lit('"'))

        inner = F.array_join(F.transform(c, el), ",", "NULL")
    elif isinstance(element_type, T.BooleanType):
        inner = F.array_join(
            F.transform(
                c,
                lambda x: F.when(x.isNull(), F.lit(None).cast("string"))
                .when(x, F.lit("t"))
                .otherwise(F.lit("f")),
            ),
            ",",
            "NULL",
        )
    else:
        inner = F.array_join(F.transform(c, lambda x: x.cast("string")), ",", "NULL")
    return F.coalesce(
        copy_escape_expr(F.concat(F.lit("{"), inner, F.lit("}"))),
        F.lit(_COPY_NULL),
    )


def copy_hstore_expr(c):
    """MAP<string,string> -> "k"=>"v",... sorted by key, quote/backslash
    escaped, then COPY-escaped (db-copy-mgr.hpp:150-238)."""
    from pyspark.sql import functions as F

    def esc_q(s):
        return F.replace(
            F.replace(s, F.lit("\\"), F.lit("\\\\")), F.lit('"'), F.lit('\\"')
        )

    items = F.transform(
        F.array_sort(F.map_entries(c)),
        lambda e: F.concat(
            F.lit('"'), esc_q(e["key"]), F.lit('"=>"'), esc_q(e["value"]), F.lit('"')
        ),
    )
    return F.coalesce(
        copy_escape_expr(F.array_join(items, ",")), F.lit(_COPY_NULL)
    )


def copy_binary_expr(c):
    """BINARY (e.g. EWKB) -> \\\\x<lower hex> (db-copy-mgr.hpp:170-186)."""
    from pyspark.sql import functions as F

    return F.coalesce(
        F.concat(F.lit("\\\\x"), F.lower(F.hex(c))), F.lit(_COPY_NULL)
    )


def copy_lines(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """DataFrame -> one `copy_line` string column, typed encoding
    chosen from the schema, all JVM-side."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    cols = columns or df.columns
    enc = []
    for name in cols:
        dt = df.schema[name].dataType
        c = F.col(name)
        if isinstance(dt, T.BooleanType):
            enc.append(copy_bool_expr(c))
        elif isinstance(dt, T.BinaryType):
            enc.append(copy_binary_expr(c))
        elif isinstance(dt, T.ArrayType):
            enc.append(copy_array_expr(c, dt.elementType))
        elif isinstance(dt, T.MapType):
            enc.append(copy_hstore_expr(c))
        elif isinstance(dt, T.StringType):
            enc.append(copy_text_expr(c))
        else:
            enc.append(copy_int_expr(c))
    return df.select(F.concat_ws("\t", *enc).alias("copy_line"))


def write_copy_stream(
    df: DataFrame,
    writer_factory,
    columns: list[str] | None = None,
    jvm_encode: bool = True,
) -> None:
    """foreachPartition COPY writer: writer_factory() must return a
    file-like object per partition (a psycopg copy_expert stream in
    production, any IO for tests).  Buffers are flushed at the
    reference's 10 MB boundary.

    jvm_encode=True (default, the 100 TB path): the whole line is
    built by the Catalyst copy_lines() encoders inside whole-stage
    codegen and executors stream ready-made text; the per-row Python
    encoder remains as the fallback for exotic types."""
    cols = columns or df.columns

    if jvm_encode:
        encoded = copy_lines(df, cols)

        def handle_lines(it) -> None:
            out: IO = writer_factory()
            buf: list[str] = []
            size = 0
            for row in it:
                line = row["copy_line"] + "\n"
                buf.append(line)
                size += len(line)
                if size >= COPY_BUFFER_BYTES:
                    out.write("".join(buf))
                    buf, size = [], 0
            if buf:
                out.write("".join(buf))
            if hasattr(out, "close"):
                out.close()

        encoded.foreachPartition(handle_lines)
        return

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


# overall tile cap, reference src/expire-output.hpp:25
EXPIRE_TILES_MAX = 50_000_000


def write_expire_file(
    tiles: DataFrame, path: str, max_tiles: int = EXPIRE_TILES_MAX
) -> None:
    """Dirty-tile list as z/x/y text lines (reference
    expire-output.cpp:85-106 file format), single output file.

    Distributed write: lines are range-partitioned and sorted within
    partitions (part files are then globally ordered by name), written
    executor-side, and stream-merged into the final file with constant
    driver memory — never collect()ed.  Tile count is capped at the
    reference's 5e7 overall limit (expire-output.hpp:25); overflowing
    sets are truncated with a warning."""
    import glob
    import shutil
    import warnings

    from pyspark.sql import functions as F

    lines = tiles.select(
        F.concat_ws(
            "/", F.col("zoom").cast("string"), F.col("x").cast("string"), F.col("y").cast("string")
        ).alias("line")
    ).persist()  # two actions below (cap count + write): expire runs once
    persisted = lines  # unpersist target: limit() below rebinds `lines`
    n = lines.count()
    if n > max_tiles:
        warnings.warn(
            f"expire set has {n} tiles; truncating to the {max_tiles} cap "
            "(reference expire-output.hpp:25)",
            stacklevel=2,
        )
        lines = lines.limit(max_tiles)
    # ~5M lines (<100 MB text) per output partition
    nparts = max(1, min(256, n // 5_000_000 + 1))
    tmp_dir = path + ".spark-tmp"
    (
        lines.repartitionByRange(nparts, "line")
        .sortWithinPartitions("line")
        .write.mode("overwrite")
        .text(tmp_dir)
    )
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as out:
        for part in sorted(glob.glob(os.path.join(tmp_dir, "part-*"))):
            with open(part, "rb") as src:
                shutil.copyfileobj(src, out)
    shutil.rmtree(tmp_dir, ignore_errors=True)
    persisted.unpersist()


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
