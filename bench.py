"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Per-query failures never abort the run: a failing query records an
entry in "errors" and is excluded from the total, and the JSON line is
always emitted.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "pricing_summary",
    "way_node_join",
    "way_length",
    "way_polygon_area",
    "tile_expiry_rollup",
    "z_order",
    "merge_dedup",
    "reverse_deps",
    "locator_all_intersecting",
    "geom_suite",
    "copy_encoding",
    "text_stats",
    "minhash_near_dups",
    "ann_cosine_topk",
    "sessionize",
    "events_hourly",
    "discrete_isolation",
    "relation_member_join",
    "flex_casts",
    "wildcard_tag_filter",
    "quadkey_buckets",
    "topk_per_group",
]

# Heavy operators benched as a separate subtotal so their trend is
# recorded without moving the headline total's meaning across rounds.
HEAVY = [
    "ann_lsh_topk",
    "ann_ivf_topk",
    "river_contraction",
    "river_width_propagation",
    "relation_multipolygon_rings",
    "embedding_near_dups",
    "simhash_hamming_pairs",
    "flex_generic_lines",
]


RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))


def _run_set(spark, qs, names, sf_dir, timings, first_run, errors,
             all_runs):
    """Per query: RUNS timed executions; record the MEDIAN (the box is
    noisy — single-run totals swing +-17%, drowning real trends), the
    first run separately for continuity with rounds 1-4, and the full
    sample list so run-to-run spread is auditable from the JSON."""
    for name in names:
        if name not in qs:
            continue
        samples = []
        n = None
        try:
            for _ in range(RUNS):
                t0 = time.time()
                df = qs[name](spark, sf_dir)
                n = df.count()
                samples.append(time.time() - t0)
            samples_sorted = sorted(samples)
            timings[name] = round(samples_sorted[len(samples_sorted) // 2], 3)
            first_run[name] = round(samples[0], 3)
            all_runs[name] = [round(s, 3) for s in samples]
            print(
                f"# {name}: {n} rows median {timings[name]}s "
                f"(runs {[round(s, 3) for s in samples]})",
                file=sys.stderr,
            )
        except Exception as ex:  # noqa: BLE001
            errors[name] = f"{type(ex).__name__}: {ex}"[:500]
            print(f"# {name}: ERROR {errors[name]}", file=sys.stderr)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.0

    from osm2pgsql_spark import queries as Q
    from osm2pgsql_spark.session import get_spark

    spark = get_spark("osm2pgsql-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = Q.queries()

    # Warm-up (excluded from timings): run every query once at the
    # smallest SF.  Whole-stage-codegen compilation of the big
    # generated expressions (simhash/minhash folds) dominates cold
    # runs (PERF_NOTES.md), and warming compiles the same code paths.
    warm_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    for name in HEADLINE + HEAVY:
        if name in qs:
            try:
                qs[name](spark, warm_dir).count()
            except Exception as ex:  # noqa: BLE001
                print(f"# warmup {name} failed: {ex}", file=sys.stderr)

    timings: dict[str, float] = {}
    heavy_timings: dict[str, float] = {}
    first_run: dict[str, float] = {}
    errors: dict[str, str] = {}
    all_runs: dict[str, list] = {}
    _run_set(spark, qs, HEADLINE, sf_dir, timings, first_run, errors,
             all_runs)
    _run_set(spark, qs, HEAVY, sf_dir, heavy_timings, first_run, errors,
             all_runs)

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_queries_total_runtime",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "heavy_queries": heavy_timings,
        "heavy_total": round(sum(heavy_timings.values()), 3),
        "runs_per_query": RUNS,
        "first_run": first_run,
        "runs": all_runs,
        "sf": sf,
    }
    if errors:
        out["errors"] = errors
    print(json.dumps(out))


if __name__ == "__main__":
    main()
