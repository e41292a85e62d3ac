"""Live SQL target: delete-before-insert + expire-table upsert.

Reference machinery this mirrors:
- db_deleter_by_id_t / db_deleter_by_type_and_id_t — ids to delete are
  batched up to MAX_ENTRIES = 1e6 and flushed as one DELETE before the
  pending COPY data lands (/root/reference/src/db-copy.hpp:76-138,
  src/db-copy.cpp execution order: delete_rows() runs before the copy
  buffer is sent).
- expire table output — INSERT .. ON CONFLICT DO NOTHING (old 3-column
  format) or ON CONFLICT DO UPDATE SET last = now() (5-column format)
  (/root/reference/src/expire-output.cpp:107-143), table DDL at
  src/expire-output.cpp:145-163.

Spark-first distribution: the input change set is hash-partitioned by
the object id, so an object's delete and its re-insert land in the
SAME partition and per-partition delete-before-insert order is enough
— no global barrier between a delete phase and an insert phase.  Each
partition opens its own connection via a picklable connect factory
(psycopg against PostgreSQL in production — one connection per
executor slot is exactly the reference's connection-per-copy-thread
model scaled out).  The tests drive the identical executor code path
against DuckDB (the one SQL engine in this container); DuckDB allows a
single writer process, so tests run the sink at parallelism 1 — a
stand-in limitation, not a design one.
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import DataFrame

from osm2pgsql_spark.sinks.writers import DELETE_BATCH_MAX

INSERT_BATCH_ROWS = 10_000


class DuckDbConnectFactory:
    """Picklable connect factory for the DuckDB stand-in target (the
    C-extension duckdb.connect itself does not pickle into executors).
    The psycopg equivalent in production is the same shape with a DSN."""

    def __init__(self, path: str) -> None:
        self.path = path

    def __call__(self):
        import duckdb

        return duckdb.connect(self.path)


class SqlBatchWriter:
    """Per-partition delete-before-insert writer.

    Consumes rows carrying an `op` column ({create,modify,delete} —
    the apply_diff fold's vocabulary): every row's id is deleted
    (modify = delete + re-add, src/osmdata.cpp:55-70), and non-delete
    rows are re-inserted.  Invariant kept from the reference: a DELETE
    flush always precedes the flush of any INSERT whose id it covers;
    the delete batch also flushes alone when it exceeds
    delete_batch_max (db_deleter is_full(), db-copy.hpp:82,108)."""

    def __init__(
        self,
        connect: Callable[[], object],
        table: str,
        columns: Sequence[str],
        id_col: str = "id",
        type_col: str | None = None,
        delete_batch_max: int = DELETE_BATCH_MAX,
        insert_batch_rows: int = INSERT_BATCH_ROWS,
        quote_idents: bool = False,
    ) -> None:
        self.connect = connect
        self.table = table
        self.columns = list(columns)
        self.id_col = id_col
        self.type_col = type_col
        self.delete_batch_max = delete_batch_max
        self.insert_batch_rows = insert_batch_rows
        # quote identifiers in the emitted SQL (reserved-word columns
        # like "natural" in the full pgsql schema); off by default so
        # the golden transcript stays byte-identical
        self.quote_idents = quote_idents

    def _q(self, ident: str) -> str:
        return f'"{ident}"' if self.quote_idents else ident

    # -- executor side ----------------------------------------------------

    def __call__(self, rows) -> None:
        con = self.connect()
        try:
            deletes: list = []
            inserts: list[tuple] = []
            for row in rows:
                if self.type_col:
                    deletes.append((row[self.type_col], row[self.id_col]))
                else:
                    deletes.append(row[self.id_col])
                if row["op"] != "delete":
                    inserts.append(tuple(row[c] for c in self.columns))
                if len(deletes) > self.delete_batch_max:
                    self._flush_deletes(con, deletes)
                if len(inserts) >= self.insert_batch_rows:
                    # deletes first: every buffered insert's id is in
                    # the delete buffer (or already flushed)
                    self._flush_deletes(con, deletes)
                    self._flush_inserts(con, inserts)
            self._flush_deletes(con, deletes)
            self._flush_inserts(con, inserts)
            if hasattr(con, "commit"):
                try:
                    con.commit()
                except Exception:  # duckdb autocommits; psycopg needs it
                    pass
        finally:
            if hasattr(con, "close"):
                con.close()

    def _flush_deletes(self, con, deletes: list) -> None:
        if not deletes:
            return
        if self.type_col:
            # db_deleter_by_type_and_id_t: DELETE WHERE (type, id) IN (...)
            placeholders = ",".join(["(?,?)"] * len(deletes))
            flat: list = []
            for t, i in deletes:
                flat.extend((t, i))
            con.execute(
                f"DELETE FROM {self.table} WHERE "
                f"({self._q(self.type_col)}, {self._q(self.id_col)})"
                f" IN ({placeholders})",
                flat,
            )
        else:
            placeholders = ",".join(["?"] * len(deletes))
            con.execute(
                f"DELETE FROM {self.table} WHERE {self._q(self.id_col)}"
                f" IN ({placeholders})",
                list(deletes),
            )
        deletes.clear()

    def _flush_inserts(self, con, inserts: list) -> None:
        if not inserts:
            return
        cols = ", ".join(self._q(c) for c in self.columns)
        ph = ",".join(["?"] * len(self.columns))
        con.executemany(
            f"INSERT INTO {self.table} ({cols}) VALUES ({ph})", inserts
        )
        inserts.clear()


def write_delete_before_insert(
    change_set: DataFrame,
    connect: Callable[[], object],
    table: str,
    id_col: str = "id",
    type_col: str | None = None,
    columns: Sequence[str] | None = None,
    num_partitions: int | None = None,
    delete_batch_max: int = DELETE_BATCH_MAX,
    quote_idents: bool = False,
) -> None:
    """Apply one diff's change set to a live SQL table.

    change_set: entity columns + `op` in {create,modify,delete}, one
    row per id (apply_diff's folded form).  Hash-partitions on the id
    so delete+re-insert of the same object are ordered within one
    partition; each partition writes over its own connection."""
    cols = [c for c in (columns or change_set.columns) if c != "op"]
    keys = [type_col, id_col] if type_col else [id_col]
    parted = (
        change_set.repartition(num_partitions, *keys)
        if num_partitions
        else change_set.repartition(*keys)
    )
    writer = SqlBatchWriter(
        connect, table, cols, id_col=id_col, type_col=type_col,
        delete_batch_max=delete_batch_max, quote_idents=quote_idents,
    )
    parted.foreachPartition(writer)


# ---------------------------------------------------------------- index DDL

from dataclasses import dataclass, field  # noqa: E402


@dataclass
class FlexIndex:
    """Index declaration — the flex output's per-table index config
    (/root/reference/src/flex-index.hpp:22-104).  create_index_sql()
    reproduces flex_index_t::create_index
    (src/flex-index.cpp:23-71) clause for clause."""

    method: str = "btree"
    columns: Sequence[str] = field(default_factory=list)
    expression: str = ""
    include_columns: Sequence[str] = field(default_factory=list)
    name: str = ""
    tablespace: str = ""
    where: str = ""
    fillfactor: int = 0
    unique: bool = False

    def __post_init__(self) -> None:
        if self.fillfactor and not 10 <= self.fillfactor <= 100:
            raise ValueError("Fillfactor must be between 10 and 100.")
        if not self.columns and not self.expression:
            raise ValueError("index needs columns or an expression")

    def create_index_sql(self, qualified_table_name: str) -> str:
        parts = ["CREATE"]
        if self.unique:
            parts.append("UNIQUE")
        parts.append("INDEX")
        if self.name:
            parts.append(f'"{self.name}"')
        parts += ["ON", qualified_table_name, "USING", self.method]
        if self.expression:
            parts.append(f"({self.expression})")
        else:
            parts.append("(" + ",".join(f'"{c}"' for c in self.columns) + ")")
        if self.include_columns:
            parts.append(
                "INCLUDE (" + ",".join(f'"{c}"' for c in self.include_columns) + ")"
            )
        if self.fillfactor:
            parts += ["WITH", f"(fillfactor = {self.fillfactor})"]
        if self.tablespace:
            parts += ["TABLESPACE", f'"{self.tablespace}"']
        if self.where:
            parts += ["WHERE", self.where]
        return " ".join(parts)


def create_indexes(con, table: str, indexes: Sequence[FlexIndex],
                   dialect: str = "postgresql") -> list[str]:
    """Issue index DDL after the bulk load (the reference builds
    indexes only after COPY + optional geometry clustering,
    src/table.cpp:196-240).  dialect='duckdb' drops the USING clause
    and PG-only storage options the stand-in engine cannot parse."""
    issued = []
    for ix in indexes:
        sql = ix.create_index_sql(table)
        if dialect == "duckdb":
            sql = sql.replace(f" USING {ix.method}", "")
            if ix.fillfactor:
                sql = sql.replace(f" WITH (fillfactor = {ix.fillfactor})", "")
        con.execute(sql)
        issued.append(sql)
    return issued


# ------------------------------------------------------------- expire table

def create_expire_table(con, table: str, with_timestamps: bool = False) -> None:
    """DDL twin of expire_output_t::create_output_table
    (src/expire-output.cpp:145-163): zoom/x/y primary key, optional
    first/last timestamps (the 'new format')."""
    extra = (
        ", first TIMESTAMP DEFAULT CURRENT_TIMESTAMP"
        ", last TIMESTAMP DEFAULT CURRENT_TIMESTAMP"
        if with_timestamps
        else ""
    )
    con.execute(
        f"CREATE TABLE IF NOT EXISTS {table} ("
        f" zoom INTEGER NOT NULL, x INTEGER NOT NULL, y INTEGER NOT NULL"
        f"{extra}, PRIMARY KEY (zoom, x, y))"
    )


class ExpireTileUpserter:
    """Per-partition expire-tile upsert
    (src/expire-output.cpp:107-143): ON CONFLICT DO NOTHING for the
    3-column format, ON CONFLICT DO UPDATE SET last = now() when the
    table carries first/last timestamps."""

    def __init__(
        self, connect: Callable[[], object], table: str, update_last: bool = False
    ) -> None:
        self.connect = connect
        self.table = table
        self.update_last = update_last

    def __call__(self, rows) -> None:
        con = self.connect()
        try:
            if self.update_last:
                sql = (
                    f"INSERT INTO {self.table} (zoom, x, y) VALUES (?, ?, ?)"
                    f" ON CONFLICT (zoom, x, y)"
                    f" DO UPDATE SET last = now()"
                )
            else:
                sql = (
                    f"INSERT INTO {self.table} (zoom, x, y) VALUES (?, ?, ?)"
                    f" ON CONFLICT DO NOTHING"
                )
            batch = []
            for row in rows:
                batch.append((row["zoom"], row["x"], row["y"]))
                if len(batch) >= INSERT_BATCH_ROWS:
                    con.executemany(sql, batch)
                    batch = []
            if batch:
                con.executemany(sql, batch)
            if hasattr(con, "commit"):
                try:
                    con.commit()
                except Exception:
                    pass
        finally:
            if hasattr(con, "close"):
                con.close()


def upsert_expire_tiles(
    tiles: DataFrame,
    connect: Callable[[], object],
    table: str,
    update_last: bool = False,
    num_partitions: int | None = None,
) -> None:
    """Land (zoom, x, y) tile rows in a live expire table, duplicate-
    safe (the reference replays overlapping tile sets across runs)."""
    parted = (
        tiles.repartition(num_partitions, "zoom", "x", "y")
        if num_partitions
        else tiles
    )
    parted.foreachPartition(ExpireTileUpserter(connect, table, update_last))


# ------------------------------------------------------- SQL transcript

class TranscriptCon:
    """A 'connection' that records every statement with parameters
    inlined — the reviewable stand-in for a live PostgreSQL session.
    Drive the REAL writers (SqlBatchWriter, create_indexes) with it
    and the transcript shows exactly the SQL a server would receive,
    batching and ordering included."""

    def __init__(self) -> None:
        self.lines: list[str] = []

    @staticmethod
    def _lit(v) -> str:
        if v is None:
            return "NULL"
        if isinstance(v, bool):
            return "true" if v else "false"
        if isinstance(v, (int, float)):
            return str(v)
        if isinstance(v, (bytes, bytearray, memoryview)):
            return "'\\x" + bytes(v).hex() + "'"
        if isinstance(v, dict):
            # hstore literal (implicitly cast by the column type)
            items = ", ".join(
                '"{}"=>"{}"'.format(
                    str(k).replace("\\", "\\\\").replace('"', '\\"'),
                    str(x).replace("\\", "\\\\").replace('"', '\\"'),
                )
                for k, x in sorted(v.items())
            )
            return "'" + items.replace("'", "''") + "'"
        if isinstance(v, (list, tuple)):
            from osm2pgsql_spark.sinks.writers import _array_elem

            lit = "{" + ",".join(_array_elem(x) for x in v) + "}"
            return "'" + lit.replace("'", "''") + "'"
        return "'" + str(v).replace("'", "''") + "'"

    def _substitute(self, sql: str, params: list) -> str:
        parts = sql.split("?")
        if len(parts) - 1 != len(params):
            raise ValueError("placeholder/param count mismatch")
        out = [parts[0]]
        for part, p in zip(parts[1:], params):
            out.append(self._lit(p))
            out.append(part)
        return "".join(out)

    def execute(self, sql: str, params=None) -> None:
        self.lines.append(self._substitute(sql, list(params or [])) + ";")

    def executemany(self, sql: str, rows) -> None:
        for r in rows:
            self.lines.append(self._substitute(sql, list(r)) + ";")

    def commit(self) -> None:
        self.lines.append("COMMIT;")

    def close(self) -> None:
        pass


def pg_import_transcript(
    tables: dict[str, tuple[list[tuple[str, str]], list[dict]]],
    indexes: dict[str, Sequence[FlexIndex]] | None = None,
) -> str:
    """The full SQL conversation of a small CREATE-mode import against
    live PostgreSQL: per-table DDL, COPY FROM STDIN with the typed
    encoder's exact text lines, post-load index DDL, ANALYZE — the
    reference's table.cpp:118-240 flow, reviewable without a server.

    tables: name -> ([(column, pg_type)...], rows as dicts).  Rows are
    emitted in the given order (sort upstream for a stable golden)."""
    from osm2pgsql_spark.sinks.writers import encode_copy_rows

    out: list[str] = []
    for name, (cols, _rows) in tables.items():
        col_sql = ", ".join(f'"{c}" {t}' for c, t in cols)
        out.append("BEGIN;")
        out.append(f'CREATE TABLE "{name}" ({col_sql});')
        out.append("COMMIT;")
    for name, (cols, rows) in tables.items():
        names = [c for c, _t in cols]
        quoted = ", ".join(f'"{c}"' for c in names)
        out.append(f'COPY "{name}" ({quoted}) FROM STDIN;')
        buf = encode_copy_rows(rows, names)
        if buf:
            out.append(buf.rstrip("\n"))
        out.append("\\.")
    for name, (cols, _rows) in tables.items():
        for ix in (indexes or {}).get(name, []):
            out.append(ix.create_index_sql(f'"{name}"') + ";")
        out.append(f'ANALYZE "{name}";')
    return "\n".join(out) + "\n"


def pg_append_transcript(
    table: str,
    columns: Sequence[str],
    op_rows: list[dict],
    id_col: str = "id",
    type_col: str | None = None,
    delete_batch_max: int = DELETE_BATCH_MAX,
    insert_batch_rows: int = INSERT_BATCH_ROWS,
) -> str:
    """The SQL conversation of one append batch: the REAL
    SqlBatchWriter runs against a TranscriptCon, so delete batching,
    delete-before-insert ordering, and (type, id) deleter shape are
    the production code paths, just recorded instead of executed
    (db_deleter batching, reference db-copy.hpp:82-108)."""
    con = TranscriptCon()
    writer = SqlBatchWriter(
        lambda: con, table, list(columns), id_col=id_col, type_col=type_col,
        delete_batch_max=delete_batch_max, insert_batch_rows=insert_batch_rows,
    )
    writer(op_rows)
    return "\n".join(con.lines) + "\n"
