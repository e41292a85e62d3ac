"""Live PostgreSQL execution through the psql CLI.

This container ships PostgreSQL server binaries (postgres/initdb/
pg_ctl/psql) but no Python driver (psycopg2/pg8000) and no JDBC jar.
psql speaks the real wire protocol, so a thin subprocess shim turns
it into the connection the sinks already target:

- ``PsqlCon`` implements the execute/executemany/commit/close subset
  ``SqlBatchWriter`` (sinks/live.py) consumes.  Statements are
  buffered with parameters inlined by the SAME literal encoder the
  reviewable transcript uses (TranscriptCon._lit), then shipped in
  one ``psql -1 -v ON_ERROR_STOP=1`` run per commit — i.e. the live
  session executes exactly the statements the golden transcript
  records.
- ``run_psql_script`` replays full transcripts, including
  ``COPY ... FROM STDIN`` blocks (psql consumes the inline data up to
  ``\\.``) — this is how tests/data/pg_transcript_golden.sql is
  EXECUTED against a real server, not just diffed.
- ``pg_load_tables`` lands Spark DataFrames as PostgreSQL tables:
  CREATE TABLE from the Spark schema, then per-partition COPY FROM
  STDIN streams through the typed encoder (sinks/writers.py,
  reference db-copy.hpp flow) — every executor partition is its own
  COPY session, the reference's copy-thread parallelism shape.

Scale note: psql-per-partition adds a process spawn (~10 ms) per
partition-commit — noise against a COPY stream of MBs.  On a real
cluster with psycopg available, DuckDbConnectFactory's shape (a DSN
connect callable) drops in unchanged; this module exists so live
execution is TESTED here rather than deferred.
"""

from __future__ import annotations

import os
import subprocess
from collections.abc import Sequence

from osm2pgsql_spark.sinks.live import TranscriptCon

_PSQL_BASE = ["psql", "-X", "-q", "-v", "ON_ERROR_STOP=1"]


# Keywords psql receives as flags (-h/-p/-U/-d) or via its environment
# (PGPASSWORD).  Everything else in libpq's (long) keyword table —
# sslmode, connect_timeout, application_name, ... — has no psql flag;
# those are accepted with a warning rather than failing the import,
# since the --pg help advertises libpq conninfo strings.
_ROUTED_KEYWORDS = ("host", "port", "user", "dbname", "password")


def parse_conninfo(conninfo: str) -> dict:
    """libpq keyword/value conninfo -> dsn dict.  host/port/user/dbname
    map to psql flags, password rides PGPASSWORD; other libpq keywords
    (sslmode, connect_timeout, ...) are ignored with a stderr warning.
    Values may be single-quoted (shlex)."""
    import shlex
    import sys

    dsn: dict = {}
    for tok in shlex.split(conninfo):
        if "=" not in tok:
            raise ValueError(f"bad conninfo token {tok!r}")
        k, v = tok.split("=", 1)
        if k in _ROUTED_KEYWORDS:
            dsn[k] = v
        else:
            print(
                f"osm2pgsql-spark: ignoring conninfo keyword {k!r} "
                "(psql shim routes host/port/user/dbname/password only)",
                file=sys.stderr,
            )
    return dsn


def _psql_args(dsn: dict) -> list[str]:
    args = list(_PSQL_BASE)
    for flag, key in (("-h", "host"), ("-p", "port"),
                      ("-U", "user"), ("-d", "dbname")):
        v = dsn.get(key)
        if v is not None:
            args += [flag, str(v)]
    return args


def _psql_env(dsn: dict) -> dict | None:
    """password rides PGPASSWORD (libpq's own fallback), never argv."""
    if dsn.get("password") is None:
        return None
    env = dict(os.environ)
    env["PGPASSWORD"] = str(dsn["password"])
    return env


def run_psql_script(dsn: dict, script: str, single_txn: bool = True) -> str:
    """Execute a SQL script (COPY FROM STDIN blocks included) through
    psql; returns stdout.  Raises RuntimeError with stderr on any
    error (ON_ERROR_STOP)."""
    args = _psql_args(dsn) + (["-1"] if single_txn else []) + ["-f", "-"]
    proc = subprocess.run(
        args, input=script, capture_output=True, text=True, cwd="/tmp",
        env=_psql_env(dsn),
    )
    if proc.returncode != 0:
        raise RuntimeError(
            f"psql failed (rc={proc.returncode}): {proc.stderr[-2000:]}"
        )
    return proc.stdout


def query(dsn: dict, sql: str) -> list[list[str]]:
    """Run one SELECT and return unaligned tuples-only output split on
    tabs (values containing tabs/newlines need caller-side quoting —
    aggregate or hash server-side for such checks)."""
    args = _psql_args(dsn) + ["-At", "-F", "\t", "-c", sql]
    proc = subprocess.run(args, capture_output=True, text=True, cwd="/tmp",
                          env=_psql_env(dsn))
    if proc.returncode != 0:
        raise RuntimeError(
            f"psql failed (rc={proc.returncode}): {proc.stderr[-2000:]}"
        )
    out = proc.stdout.rstrip("\n")
    return [line.split("\t") for line in out.split("\n")] if out else []


class PsqlCon:
    """execute/executemany/commit/close over one psql run per commit.

    Parameters are inlined with TranscriptCon's literal encoder, so
    the statements executed live are identical to the transcript the
    test suite pins.  Buffered statements run atomically (-1) at
    commit(); close() flushes any remainder."""

    def __init__(self, dsn: dict) -> None:
        self.dsn = dsn
        self._t = TranscriptCon()

    def execute(self, sql: str, params=None) -> None:
        self._t.execute(sql, params)

    def executemany(self, sql: str, rows) -> None:
        self._t.executemany(sql, rows)

    def commit(self) -> None:
        if self._t.lines:
            script = "\n".join(self._t.lines)
            self._t.lines = []
            run_psql_script(self.dsn, script)

    def close(self) -> None:
        self.commit()


class PsqlConnectFactory:
    """Picklable connect factory (the DuckDbConnectFactory shape) for
    executor-side writers."""

    def __init__(self, dsn: dict) -> None:
        self.dsn = dict(dsn)

    def __call__(self) -> PsqlCon:
        return PsqlCon(self.dsn)


# ------------------------------------------------------------- table loading

_PG_TYPES = {
    "bigint": "int8",
    "int": "int4",
    "smallint": "int2",
    "tinyint": "int2",
    "double": "float8",
    "float": "float4",
    "string": "text",
    "boolean": "bool",
    "binary": "bytea",
    "date": "date",
    "timestamp": "timestamptz",
}


def pg_type_of(spark_type: str) -> str:
    if spark_type == "map<string,string>":
        # the reference's hstore columns (table.cpp column type table);
        # copy_encode_value already emits the "k"=>"v" literal form
        return "hstore"
    if spark_type.startswith("array<") and spark_type.endswith(">"):
        return pg_type_of(spark_type[6:-1]) + "[]"
    t = _PG_TYPES.get(spark_type)
    if t is None:
        raise ValueError(
            f"no PostgreSQL mapping for Spark type {spark_type!r} "
            "(pass explicit column DDL for structs/nested maps)"
        )
    return t


COPY_LEDGER = "_osm2pgsql_copy_ledger"


class _CopyPartition:
    """foreachPartition writer with exactly-once semantics under Spark
    task retries / speculative execution.

    Each task attempt COPYs into its own UNLOGGED staging table
    (<table>__stg_<partition>_<attempt>), then promotes atomically:
    one transaction inserts (table, partition) into the copy ledger
    (PRIMARY KEY (tbl, part)) and INSERT..SELECTs the staged rows into
    the target.  A re-run of an already-promoted partition hits the
    ledger's unique constraint, the transaction rolls back, and the
    attempt degrades to a no-op — rows land exactly once no matter how
    many times Spark replays the partition.  Failed attempts leave
    only an orphan staging table, swept by pg_load_tables afterwards."""

    def __init__(self, dsn: dict, table: str, columns: list[str],
                 schema: str = "") -> None:
        self.dsn = dsn
        self.table = table
        self.columns = columns
        self.schema = schema

    def __call__(self, rows) -> None:
        from pyspark import TaskContext

        from osm2pgsql_spark.sinks.writers import (
            COPY_BUFFER_BYTES, encode_copy_rows,
        )

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        attempt = ctx.attemptNumber() if ctx is not None else 0
        target = _qual(self.table, self.schema)
        stg = _qual(f"{self.table}__stg_{pid}_{attempt}", self.schema)
        ledger_key = (f"{self.schema}.{self.table}" if self.schema
                      else self.table)
        quoted = ", ".join(f'"{c}"' for c in self.columns)
        head = f"COPY {stg} ({quoted}) FROM STDIN;\n"
        created = False
        buf: list[dict] = []
        size = 0

        def flush() -> None:
            nonlocal created, buf, size
            if not created:
                run_psql_script(
                    self.dsn,
                    f"DROP TABLE IF EXISTS {stg};\n"
                    f"CREATE UNLOGGED TABLE {stg} "
                    f"(LIKE {target});",
                )
                created = True
            run_psql_script(
                self.dsn,
                head + encode_copy_rows(buf, self.columns) + "\\.\n",
                single_txn=False,
            )
            buf, size = [], 0

        for row in rows:
            d = row.asDict(recursive=False) if hasattr(row, "asDict") else row
            buf.append(d)
            size += sum(len(str(v)) for v in d.values() if v is not None)
            if size >= COPY_BUFFER_BYTES:
                flush()
        if buf:
            flush()
        if not created:
            return  # empty partition: nothing staged, nothing to promote
        promote = (
            f"INSERT INTO \"{COPY_LEDGER}\" (tbl, part) "
            f"VALUES ('{ledger_key}', {pid});\n"
            f"INSERT INTO {target} SELECT * FROM {stg};\n"
            f"DROP TABLE {stg};"
        )
        try:
            run_psql_script(self.dsn, promote, single_txn=True)
        except RuntimeError as e:
            if "duplicate key value" in str(e):
                # another attempt already promoted this partition
                run_psql_script(self.dsn, f"DROP TABLE IF EXISTS {stg};")
                return
            raise


def pg_load_tables(
    tables: dict, dsn: dict, ddl_overrides: dict | None = None,
    if_exists: str = "replace", schema: str = "",
) -> dict[str, int]:
    """CREATE each table from its DataFrame schema and COPY-load it —
    the reference's table.cpp:118-240 create+COPY flow against a live
    server.  `schema` qualifies every table (the reference's
    --schema / --output-pgsql-schema).  Returns row counts read back
    from PostgreSQL."""
    counts = {}
    mk_schema = (
        f'CREATE SCHEMA IF NOT EXISTS "{schema}";\n' if schema else ""
    )
    for name, df in tables.items():
        qn = _qual(name, schema)
        ledger_key = f"{schema}.{name}" if schema else name
        cols = [
            (c, (ddl_overrides or {}).get(name, {}).get(c) or pg_type_of(t))
            for c, t in df.dtypes
        ]
        col_sql = ", ".join(f'"{c}" {t}' for c, t in cols)
        drop = f"DROP TABLE IF EXISTS {qn};\n" if if_exists == "replace" else ""
        ext = (
            "CREATE EXTENSION IF NOT EXISTS hstore;\n"
            if any(t == "hstore" for _c, t in cols) else ""
        )
        run_psql_script(
            dsn,
            f"{mk_schema}{ext}{drop}CREATE TABLE {qn} ({col_sql});\n"
            f'CREATE TABLE IF NOT EXISTS "{COPY_LEDGER}" '
            "(tbl text, part int, PRIMARY KEY (tbl, part));\n"
            f"DELETE FROM \"{COPY_LEDGER}\" WHERE tbl = '{ledger_key}';",
        )
        df.foreachPartition(
            _CopyPartition(dsn, name, [c for c, _t in cols], schema=schema)
        )
        # sweep staging tables orphaned by failed/duplicate attempts
        pat = name + "~_~_stg~_%"  # literal underscores escaped
        schema_cond = (
            f"schemaname = '{schema}'" if schema
            else "schemaname NOT IN ('pg_catalog', 'information_schema')"
        )
        orphans = query(
            dsn,
            f"SELECT tablename FROM pg_tables WHERE tablename LIKE '{pat}' "
            f"ESCAPE '~' AND {schema_cond}",
        )
        for (orphan,) in orphans:
            run_psql_script(
                dsn, f"DROP TABLE IF EXISTS {_qual(orphan, schema)};")
        counts[name] = int(
            query(dsn, f"SELECT count(*) FROM {qn}")[0][0])
    return counts


# ------------------------------------------------------ capability probe

#: reference CMakeLists.txt: MINIMUM_POSTGRESQL_SERVER_VERSION_NUM
MIN_PG_VERSION_NUM = 120000
MIN_PG_VERSION = "12"


def pg_capabilities(dsn: dict, require_postgis: bool = False) -> dict:
    """The reference's database-capabilities probe, executed live
    (src/pgsql-capabilities.cpp init_database_capabilities): all
    pg_settings, database name, installed extensions, schemas,
    tablespaces, index methods, and tables, with the version and
    UTF8-encoding checks using the reference wordings.

    require_postgis=True reproduces the missing-PostGIS error this
    container necessarily hits (no PostGIS package): callers that only
    need schemas/tablespaces/index methods probe with the default."""
    caps: dict = {}
    caps["settings"] = {
        r[0]: (r[1] if len(r) > 1 else "")
        for r in query(dsn, "SELECT name, setting FROM pg_catalog.pg_settings")
    }
    caps["database_name"] = query(dsn, "SELECT current_catalog")[0][0]
    pgis = query(
        dsn,
        "SELECT extversion FROM pg_catalog.pg_extension"
        " WHERE extname='postgis'",
    )
    if not pgis and require_postgis:
        raise RuntimeError(
            f"The postgis extension is not enabled on the database "
            f"'{caps['database_name']}'. Are you using the correct "
            "database? Enable with 'CREATE EXTENSION postgis;'"
        )
    caps["postgis"] = pgis[0][0] if pgis else None
    version = int(caps["settings"]["server_version_num"])
    caps["database_version"] = version
    if version < MIN_PG_VERSION_NUM:
        raise RuntimeError(
            f"Your database version is too old (need at least "
            f"{MIN_PG_VERSION})."
        )
    if caps["settings"]["server_encoding"] != "UTF8":
        raise RuntimeError("Database is not using UTF8 encoding.")

    def _set(table: str, column: str, condition: str = "true") -> set:
        return {r[0] for r in query(
            dsn, f"SELECT {column} FROM {table} WHERE {condition}")}

    caps["extensions"] = _set("pg_catalog.pg_extension", "extname")
    caps["schemas"] = _set(
        "pg_catalog.pg_namespace", "nspname",
        "nspname !~ '^pg_' AND nspname <> 'information_schema'")
    caps["tablespaces"] = _set(
        "pg_catalog.pg_tablespace", "spcname", "spcname != 'pg_global'")
    caps["index_methods"] = _set(
        "pg_catalog.pg_am", "amname", "amtype = 'i'")
    caps["tables"] = _set(
        "pg_catalog.pg_tables", "schemaname || '.' || tablename",
        "schemaname NOT IN ('pg_catalog', 'information_schema')")
    return caps


def has_schema(caps: dict, value: str) -> bool:
    """pgsql-capabilities.cpp has_schema: empty always passes."""
    return not value or value in caps["schemas"]


def has_tablespace(caps: dict, value: str) -> bool:
    return not value or value in caps["tablespaces"]


def has_index_method(caps: dict, value: str) -> bool:
    return value in caps["index_methods"]


def _qual(table: str, schema: str = "") -> str:
    """Schema-qualified quoted name (the reference qualifies every
    table with the configured schema, properties.cpp / table.cpp)."""
    return f'"{schema}"."{table}"' if schema else f'"{table}"'


def pg_write_properties(dsn: dict, props: dict, schema: str = "") -> None:
    """Write the osm2pgsql_properties table — the reference creates it
    at import and upserts each property (src/properties.cpp:22,109);
    osm2pgsql-replication and append read it back from the database.
    `schema` qualifies the table (the reference's --middle-schema,
    BDD replication_schema feature)."""
    name = _qual("osm2pgsql_properties", schema)
    t = TranscriptCon()
    t.execute(
        f"CREATE TABLE IF NOT EXISTS {name} "
        "(property TEXT NOT NULL PRIMARY KEY, value TEXT NOT NULL)"
    )
    for k in sorted(props):
        t.execute(
            f"INSERT INTO {name} (property, value) "
            "VALUES (?, ?) ON CONFLICT (property) "
            "DO UPDATE SET value = EXCLUDED.value",
            (str(k), str(props[k])),
        )
    run_psql_script(dsn, "\n".join(t.lines))


def pg_read_properties(dsn: dict, schema: str = "") -> dict:
    """Read osm2pgsql_properties back (append-side compatibility
    check against the live database, reference osm2pgsql.cpp:102-145)."""
    rows = query(
        dsn,
        f"SELECT property, value FROM {_qual('osm2pgsql_properties', schema)}"
        " ORDER BY property",
    )
    return {r[0]: r[1] for r in rows}


# ------------------------------------------------------------- test server

def start_test_server(base_dir: str, port: int = 54399) -> dict | None:
    """initdb + start a throwaway PostgreSQL on a unix socket under
    base_dir; returns the dsn dict, or None when the environment
    can't run one (no binaries / no unprivileged user).  The server
    must run unprivileged, so when invoked as root everything is
    chown'd to and run as `nobody`."""
    import pwd
    import shutil

    if shutil.which("initdb") is None or shutil.which("pg_ctl") is None:
        return None
    os.makedirs(base_dir, exist_ok=True)
    data = os.path.join(base_dir, "data")

    def run_as_pg(cmd: str) -> subprocess.CompletedProcess:
        if os.geteuid() == 0:
            try:
                pwd.getpwnam("nobody")
            except KeyError:
                return subprocess.CompletedProcess(cmd, 1, "", "no nobody user")
            os.chmod(base_dir, 0o777)
            return subprocess.run(
                ["su", "nobody", "-s", "/bin/bash", "-c", cmd],
                capture_output=True, text=True, cwd="/tmp",
            )
        return subprocess.run(
            ["bash", "-c", cmd], capture_output=True, text=True, cwd="/tmp",
        )

    r = run_as_pg(f"initdb -D {data} -U postgres --auth=trust")
    if r.returncode != 0:
        return None
    r = run_as_pg(
        f"pg_ctl -D {data} -o \"-k {base_dir} -p {port} "
        f"-c listen_addresses=''\" -l {base_dir}/server.log start"
    )
    if r.returncode != 0:
        return None
    return {"host": base_dir, "port": port, "user": "postgres",
            "dbname": "postgres"}


def stop_test_server(base_dir: str) -> None:
    import shutil

    data = os.path.join(base_dir, "data")
    cmd = f"pg_ctl -D {data} -m immediate stop"
    if os.geteuid() == 0:
        subprocess.run(["su", "nobody", "-s", "/bin/bash", "-c", cmd],
                       capture_output=True, text=True, cwd="/tmp")
    else:
        subprocess.run(["bash", "-c", cmd], capture_output=True, text=True,
                       cwd="/tmp")
    shutil.rmtree(base_dir, ignore_errors=True)
