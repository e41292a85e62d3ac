"""Live SQL sink end-to-end against DuckDB (the container's stand-in
for PostgreSQL): delete-before-insert batching + expire-table upsert.

Reference parity: db_deleter_by_id_t / db_deleter_by_type_and_id_t
(/root/reference/src/db-copy.hpp:76-138) and the expire table's
ON CONFLICT upserts (/root/reference/src/expire-output.cpp:107-143).
DuckDB allows one writer process, so the Spark jobs run the sink at
num_partitions=1 — the executor-side code path is identical.
"""

import os
from functools import partial

import duckdb
import pytest

from osm2pgsql_spark.sinks.live import (
    DuckDbConnectFactory,
    ExpireTileUpserter,
    SqlBatchWriter,
    create_expire_table,
    upsert_expire_tiles,
    write_delete_before_insert,
)
from osm2pgsql_spark.streaming.append import apply_diff

SCHEMA = "id long, name string, ver int"


def test_delete_before_insert_parity(spark, tmp_path):
    """Insert, then apply a create/modify/delete diff through the live
    sink; the table must equal the apply_diff fold of the same diff."""
    db = str(tmp_path / "live.duckdb")
    con = duckdb.connect(db)
    con.execute("CREATE TABLE objs (id BIGINT, name VARCHAR, ver INTEGER)")
    con.close()

    base = spark.createDataFrame(
        [(i, f"name{i}", 1) for i in range(1, 101)], SCHEMA
    )
    # initial import = all creates against the empty table
    write_delete_before_insert(
        base.selectExpr("*", "'create' AS op"),
        DuckDbConnectFactory(db), "objs", num_partitions=1,
    )

    diff = spark.createDataFrame(
        # modify 10..39, delete 40..59, create 200..219
        [(i, f"mod{i}", 2, "modify") for i in range(10, 40)]
        + [(i, None, 2, "delete") for i in range(40, 60)]
        + [(i, f"new{i}", 1, "create") for i in range(200, 220)],
        SCHEMA + ", op string",
    )
    # small delete batch so the executor flushes several DELETEs
    write_delete_before_insert(
        diff, DuckDbConnectFactory(db), "objs", num_partitions=1, delete_batch_max=7,
    )

    expected = sorted(
        (r["id"], r["name"], r["ver"])
        for r in apply_diff(base, diff).collect()
    )
    con = duckdb.connect(db)
    got = sorted(con.execute("SELECT id, name, ver FROM objs").fetchall())
    con.close()
    assert got == expected
    assert len(got) == 100 - 20 + 20


def test_type_and_id_deleter(spark, tmp_path):
    """db_deleter_by_type_and_id_t semantics: (type, id) keyed rows
    (the any_object id scheme, flex-table.hpp:40-49)."""
    db = str(tmp_path / "typed.duckdb")
    con = duckdb.connect(db)
    con.execute(
        "CREATE TABLE feats (otype VARCHAR, id BIGINT, name VARCHAR)"
    )
    con.execute(
        "INSERT INTO feats VALUES ('W', 1, 'w1'), ('R', 1, 'r1'), ('W', 2, 'w2')"
    )
    con.close()

    diff = spark.createDataFrame(
        [("W", 1, "w1-new", "modify"), ("R", 1, None, "delete")],
        "otype string, id long, name string, op string",
    )
    write_delete_before_insert(
        diff, DuckDbConnectFactory(db), "feats",
        id_col="id", type_col="otype", num_partitions=1,
    )
    con = duckdb.connect(db)
    got = sorted(con.execute("SELECT otype, id, name FROM feats").fetchall())
    con.close()
    # W/1 replaced, R/1 gone, W/2 untouched (same id, different type)
    assert got == [("W", 1, "w1-new"), ("W", 2, "w2")]


class _RecordingCon:
    def __init__(self, log):
        self.log = log

    def execute(self, sql, params=None):
        self.log.append(("execute", sql, list(params or [])))

    def executemany(self, sql, rows):
        self.log.append(("executemany", sql, list(rows)))

    def close(self):
        pass


def test_delete_batching_and_order():
    """The delete buffer flushes alone when > delete_batch_max
    (db-copy.hpp is_full()) and always before any INSERT flush that
    covers its ids."""
    log = []
    w = SqlBatchWriter(
        lambda: _RecordingCon(log), "t", ["id", "v"],
        delete_batch_max=3, insert_batch_rows=5,
    )
    rows = [{"id": i, "v": i * 10, "op": "modify"} for i in range(1, 13)]
    w(iter(rows))

    deletes = [e for e in log if e[0] == "execute" and "DELETE" in e[1]]
    inserts = [e for e in log if e[0] == "executemany"]
    assert len(deletes) >= 3  # several flushes at max 3
    assert all(len(d[2]) <= 4 for d in deletes)  # is_full flushes at max+1
    # every inserted id was deleted in an earlier statement
    deleted_so_far = set()
    inserted = set()
    for e in log:
        if e[0] == "execute":
            deleted_so_far.update(e[2])
        else:
            for r in e[2]:
                assert r[0] in deleted_so_far
                inserted.add(r[0])
    assert inserted == {i for i in range(1, 13)}


def test_flex_index_ddl():
    """create_index_sql reproduces flex_index_t::create_index
    (src/flex-index.cpp:23-71) clause order."""
    from osm2pgsql_spark.sinks.live import FlexIndex

    ix = FlexIndex(method="gist", columns=["way"], fillfactor=100)
    assert (
        ix.create_index_sql('"public"."roads"')
        == 'CREATE INDEX ON "public"."roads" USING gist ("way") WITH (fillfactor = 100)'
    )
    ix = FlexIndex(
        method="btree", columns=["osm_id", "version"], name="ix_osm",
        include_columns=["tags"], tablespace="fast", where="osm_id > 0",
        unique=True,
    )
    assert ix.create_index_sql("t") == (
        'CREATE UNIQUE INDEX "ix_osm" ON t USING btree ("osm_id","version") '
        'INCLUDE ("tags") TABLESPACE "fast" WHERE osm_id > 0'
    )
    ix = FlexIndex(method="gin", expression="lower(name)")
    assert ix.create_index_sql("t") == "CREATE INDEX ON t USING gin (lower(name))"
    with pytest.raises(ValueError):
        FlexIndex(method="btree", columns=["a"], fillfactor=5)
    with pytest.raises(ValueError):
        FlexIndex(method="btree")


def test_create_indexes_on_duckdb(tmp_path):
    """The post-load index build runs against the stand-in engine
    (dialect strips PG-only clauses)."""
    from osm2pgsql_spark.sinks.live import FlexIndex, create_indexes

    db = str(tmp_path / "ix.duckdb")
    con = duckdb.connect(db)
    con.execute("CREATE TABLE roads (osm_id BIGINT, name VARCHAR)")
    issued = create_indexes(
        con, "roads",
        [FlexIndex(columns=["osm_id"], name="ix1", unique=True, fillfactor=90)],
        dialect="duckdb",
    )
    assert issued == ['CREATE UNIQUE INDEX "ix1" ON roads ("osm_id")']
    # unique index enforced
    con.execute("INSERT INTO roads VALUES (1, 'a')")
    with pytest.raises(Exception):
        con.execute("INSERT INTO roads VALUES (1, 'b')")
    con.close()


def test_expire_upsert_do_nothing(spark, tmp_path):
    """Replaying overlapping tile sets must not duplicate rows
    (expire-output.cpp:118-124, ON CONFLICT DO NOTHING)."""
    db = str(tmp_path / "expire.duckdb")
    con = duckdb.connect(db)
    create_expire_table(con, "expire")
    con.close()

    t1 = spark.createDataFrame(
        [(12, x, y) for x in range(4) for y in range(4)], "zoom int, x int, y int"
    )
    t2 = spark.createDataFrame(
        [(12, x, y) for x in range(2, 6) for y in range(2, 6)],
        "zoom int, x int, y int",
    )
    upsert_expire_tiles(t1, DuckDbConnectFactory(db), "expire", num_partitions=1)
    upsert_expire_tiles(t2, DuckDbConnectFactory(db), "expire", num_partitions=1)

    con = duckdb.connect(db)
    n, distinct_n = con.execute(
        "SELECT count(*), count(DISTINCT (zoom, x, y)) FROM expire"
    ).fetchone()
    con.close()
    assert n == distinct_n == 16 + 16 - 4  # 2x2 overlap


def test_expire_upsert_update_last(tmp_path):
    """New 5-column format: conflict refreshes `last`
    (expire-output.cpp:126-131)."""
    db = str(tmp_path / "expire2.duckdb")
    con = duckdb.connect(db)
    create_expire_table(con, "expire", with_timestamps=True)

    up = ExpireTileUpserter(lambda: duckdb.connect(db), "expire", update_last=True)
    con.close()
    up(iter([{"zoom": 10, "x": 1, "y": 2}]))
    con = duckdb.connect(db)
    con.execute(
        "UPDATE expire SET first = first - INTERVAL 1 HOUR, last = last - INTERVAL 1 HOUR"
    )
    con.close()
    up(iter([{"zoom": 10, "x": 1, "y": 2}]))  # conflict -> refresh last
    con = duckdb.connect(db)
    rows = con.execute("SELECT first < last, count(*) OVER () FROM expire").fetchall()
    con.close()
    assert rows == [(True, 1)]


def test_pg_transcript_golden():
    """The full SQL conversation of a small import + append batch,
    pinned as a golden file (tests/data/pg_transcript_golden.sql) so
    live-PostgreSQL fidelity — DDL shape, typed COPY encoding, index
    DDL, delete batching and delete-before-insert ordering — is
    reviewable without a server.  The append section is produced by
    the REAL SqlBatchWriter recorded through TranscriptCon."""
    import os

    from osm2pgsql_spark.sinks.live import (
        FlexIndex, pg_append_transcript, pg_import_transcript,
    )

    tables = {
        "planet_osm_point": (
            [("osm_id", "int8"), ("name", "text"), ("tags", "jsonb"),
             ("way", "geometry(Point,3857)")],
            [
                {"osm_id": 1, "name": "A pub", "tags": '{"amenity":"pub"}', "way": None},
                {"osm_id": 10, "name": "stop\twith\ttabs", "tags": None, "way": None},
                {"osm_id": 11, "name": "line\nbreak", "tags": '{"k":"v"}', "way": None},
            ],
        ),
        "planet_osm_line": (
            [("osm_id", "int8"), ("highway", "text"), ("z_order", "int4"),
             ("way", "geometry(LineString,3857)")],
            [
                {"osm_id": 100, "highway": "residential", "z_order": 330, "way": None},
                {"osm_id": 101, "highway": None, "z_order": 0, "way": None},
            ],
        ),
    }
    indexes = {
        "planet_osm_point": [FlexIndex(method="gist", columns=["way"])],
        "planet_osm_line": [
            FlexIndex(method="gist", columns=["way"]),
            FlexIndex(method="btree", columns=["osm_id"], fillfactor=90),
        ],
    }
    got = pg_import_transcript(tables, indexes)
    ops = [
        {"osm_id": 1, "name": "A pub renamed", "op": "modify"},
        {"osm_id": 2, "name": "new", "op": "create"},
        {"osm_id": 3, "name": None, "op": "delete"},
        {"osm_id": 4, "name": "it's quoted", "op": "create"},
        {"osm_id": 5, "name": "five", "op": "create"},
    ]
    got += "-- append batch (delete_batch_max=2 forces mid-stream delete flushes)\n"
    got += pg_append_transcript(
        "planet_osm_point", ["osm_id", "name"], ops, id_col="osm_id",
        delete_batch_max=2,
    )
    golden = os.path.join(os.path.dirname(__file__), "data", "pg_transcript_golden.sql")
    assert got == open(golden).read()
