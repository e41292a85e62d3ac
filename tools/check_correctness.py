"""Local replica of the driver's t2 correctness gate.

Runs every __spark_entry__.queries() entry on Spark and its
oracle_sql() twin on DuckDB over the same parquet dir, compares
row count, column names, and an order-insensitive value hash
(columns sorted by name, rows sorted, floats kept as-is — the
engine's rounding discipline must make them identical).

Usage: python tools/check_correctness.py [sf_dir] [query ...]
       python tools/check_correctness.py --json OUT.json [sf_dir] [query ...]

--json writes a driver-format CORRECTNESS artifact (one object per
query with rows_match/schema_match/hash_match/spark_rows/oracle_rows/
err plus a secs timing) — commit one full sweep per round as
CORRECTNESS_full_rN.json so every registered query has a fresh green
oracle row even when the driver's own budget rotates gates out.
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def normalize(rows: list[tuple], cols: list[str]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def norm_cell(v):
        if v is None:
            return "\x00NULL"
        if isinstance(v, bool):
            return "true" if v else "false"
        if isinstance(v, float):
            if v == int(v) and abs(v) < 1e15:
                return str(int(v))
            return repr(v)
        if isinstance(v, (bytes, bytearray)):
            return v.hex()
        return str(v)

    return sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)


def value_hash(rows: list[tuple]) -> str:
    h = hashlib.sha256()
    for r in rows:
        h.update("\x01".join(r).encode())
        h.update(b"\x02")
    return h.hexdigest()[:16]


def main() -> int:
    argv = sys.argv[1:]
    json_out = None
    if argv and argv[0] == "--json":
        if len(argv) < 2:
            print("usage: check_correctness.py [--json OUT.json] "
                  "[sf_dir] [query ...]", file=sys.stderr)
            return 2
        json_out = argv[1]
        argv = argv[2:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"
    only = set(argv[1:])

    import __spark_entry__ as E
    from osm2pgsql_spark.session import get_spark

    spark = get_spark("correctness-check", shuffle_partitions=8)
    con = duck_con(sf_dir)

    qs = E.queries()
    oracles = E.oracle_sql()
    # registry census up front so docs can't silently diverge from
    # the code (r11 VERDICT #5): this line is the source of truth
    print(f"registry: {len(qs)} gates ({len(oracles)} with oracles); "
          f"driver window = first 50")
    unknown = only - set(qs)
    if unknown:
        # an unmatched filter (typo, or flags passed after sf_dir) would
        # otherwise skip every query and report a vacuous "all match"
        print(f"unknown queries: {sorted(unknown)}", file=sys.stderr)
        return 2
    failures = []
    report: dict[str, dict] = {}

    def rec(name, rows_match, schema_match, hash_match, spark_rows,
            oracle_rows, err, secs):
        report[name] = {
            "rows_match": rows_match, "schema_match": schema_match,
            "hash_match": hash_match, "spark_rows": spark_rows,
            "oracle_rows": oracle_rows, "err": err,
            "secs": round(secs, 1),
        }

    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {ex}")
            failures.append(name)
            rec(name, None, None, None, None, None,
                f"spark: {ex}"[:200], time.time() - t0)
            continue
        if name not in oracles:
            print(f"okay {name}: rows={len(srows)} (no oracle — rows-only)")
            rec(name, None, None, None, len(srows), None, "no_oracle",
                time.time() - t0)
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {ex}")
            failures.append(name)
            rec(name, None, None, None, len(srows), None,
                f"duckdb: {ex}"[:200], time.time() - t0)
            continue
        ok = True
        rows_match = len(srows) == len(drows)
        schema_match = sorted(scols) == sorted(dcols)
        hash_match = False
        if not schema_match:
            print(f"FAIL {name}: columns spark={sorted(scols)} duck={sorted(dcols)}")
            ok = False
        elif not rows_match:
            print(f"FAIL {name}: rows spark={len(srows)} duck={len(drows)}")
            ok = False
        else:
            ns = normalize(srows, scols)
            nd = normalize(drows, dcols)
            hs, hd = value_hash(ns), value_hash(nd)
            hash_match = hs == hd
            if not hash_match:
                print(f"FAIL {name}: value hash {hs} != {hd}")
                for i, (a, b) in enumerate(zip(ns, nd)):
                    if a != b:
                        print(f"  first diff row {i}:\n    spark={a}\n    duck ={b}")
                        break
                ok = False
        dt = time.time() - t0
        rec(name, rows_match, schema_match, hash_match, len(srows),
            len(drows), None, dt)
        if ok:
            print(f"PASS {name}: rows={len(srows)} ({dt:.1f}s)")
        else:
            failures.append(name)

    if json_out:
        import json

        with open(json_out, "w") as f:
            json.dump(report, f, indent=2)
        print(f"wrote {json_out}")

    print()
    if failures:
        print(f"{len(failures)} FAILURES: {failures}")
        return 1
    print("all queries match")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
