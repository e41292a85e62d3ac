"""Time individual registered queries the way bench.py does (count
action, median of N runs, sf0.001 warmup pass, CPU/steal deltas) —
for isolating one query's before/after without a full bench run.

Usage: python tools/time_queries.py [sf_dir] name [name ...]
Env: SPARK_GRAFT_BENCH_RUNS (default 3)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        sf_dir = args[0]
        args = args[1:]
    names = args
    runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))

    import bench
    from osm2pgsql_spark import queries as Q
    from osm2pgsql_spark.session import get_spark

    spark = get_spark("osm2pgsql-spark-timeq")
    spark.sparkContext.setLogLevel("ERROR")
    qs = Q.queries()
    unknown = [n for n in names if n not in qs]
    if unknown:
        print(f"unknown queries: {unknown}; known: {sorted(qs)}", file=sys.stderr)
        sys.exit(2)
    jvm_pid = bench._jvm_pid()

    warm_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    for name in names:
        qs[name](spark, warm_dir).count()

    for name in names:
        samples, jvms, steals = [], [], []
        for _ in range(runs):
            b0, s0, j0 = bench._cpu_snap(jvm_pid)
            t0 = time.time()
            n = qs[name](spark, sf_dir).count()
            samples.append(round(time.time() - t0, 3))
            b1, s1, j1 = bench._cpu_snap(jvm_pid)
            jvms.append(round((j1 - j0), 2) if j0 is not None and j1 is not None else None)
            steals.append(round(s1 - s0, 2))
        med = sorted(samples)[len(samples) // 2]
        print(f"{name}: median {med}s runs {samples} jvm {jvms} "
              f"steal {steals} rows {n}")


if __name__ == "__main__":
    main()
