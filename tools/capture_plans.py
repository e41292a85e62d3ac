"""Dump .explain("formatted") for registered queries to text files.

Usage:
    python tools/capture_plans.py OUT_DIR SUFFIX [sf_dir] [query ...]

Writes OUT_DIR/<query>_<SUFFIX>.txt for each named query (default: the
bench HEADLINE+HEAVY set).  Explain only for most queries — but
building a query whose operators materialize eagerly (rp_near_dup_pairs
/ verified_near_dups use localCheckpoint) executes that part of the
pipeline at construction time.  With AQE on the dump shows the
initial plan (isFinalPlan=false); shape claims (Exchange count, join
strategy, PushedFilters, Python-eval nodes) are readable regardless.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    if len(sys.argv) < 3:
        print(__doc__)
        sys.exit(2)
    out_dir, suffix = sys.argv[1], sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    names = sys.argv[4:]

    from osm2pgsql_spark import queries as Q
    from osm2pgsql_spark.session import get_spark

    spark = get_spark("osm2pgsql-spark-plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    qs = Q.queries()
    if not names:
        import bench
        names = [n for n in bench.HEADLINE + bench.HEAVY if n in qs]

    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        if name not in qs:
            print(f"# unknown query {name}", file=sys.stderr)
            continue
        try:
            df = qs[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception as ex:  # noqa: BLE001
            plan = f"EXPLAIN FAILED: {type(ex).__name__}: {ex}\n"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"# wrote {path} ({len(plan)} chars)", file=sys.stderr)


if __name__ == "__main__":
    main()
