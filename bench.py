"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints TWO JSON lines on stdout: first the full-detail record
(per-run wall samples, per-run CPU/steal deltas), then a COMPACT
totals line.  The compact line comes LAST because the driver's
artifact keeps only the tail of stdout (r13 VERDICT: the detail-only
line outgrew the capture and the headline number was truncated away);
it carries the headline value, per-query wall medians AND per-query
CPU medians, so the official artifact is complete on its own.

CPU columns (r13 VERDICT #5 — make the bench noise-separable): wall
time on this box swings 2-4x with hypervisor load, so each run also
records /proc deltas: machine busy CPU seconds (user+nice+system+
irq+softirq — actual on-CPU time, unaffected by steal), hypervisor
steal seconds (time the host withheld vCPUs — the degraded-box
signature directly), and the bench JVM's own utime+stime.  The Spark
UI and its task-metrics REST API are disabled in this session config,
so the kernel's accounting is the robust source; in local mode the
one JVM holds every executor thread, and pandas-UDF python workers
show up in the machine-busy column.

Per-query failures never abort the run: a failing query records an
entry in "errors" and is excluded from the total, and the JSON lines
are always emitted.
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

_CLK = os.sysconf("SC_CLK_TCK") if hasattr(os, "sysconf") else 100


def _stat_fields(raw: str) -> list[str]:
    """/proc/<pid>/stat fields after the (comm) — comm may contain
    spaces/parens, so split after the LAST close paren."""
    return raw[raw.rindex(")") + 2:].split()


def _jvm_pid() -> int | None:
    """The bench JVM: the 'java' process whose parent chain reaches
    this python process (local-mode Spark launches exactly one,
    possibly under an intermediate spark-submit shell)."""
    me = os.getpid()
    try:
        pids = [d for d in os.listdir("/proc") if d.isdigit()]
    except OSError:
        return None
    for d in pids:
        try:
            with open(f"/proc/{d}/stat") as fh:
                raw = fh.read()
            comm = raw[raw.index("(") + 1: raw.rindex(")")]
            if comm != "java":
                continue
            p, hops = int(_stat_fields(raw)[1]), 0
            while p > 1 and hops < 5:
                if p == me:
                    return int(d)
                with open(f"/proc/{p}/stat") as fh:
                    p = int(_stat_fields(fh.read())[1])
                hops += 1
        except (OSError, ValueError):
            continue
    return None


def _cpu_snap(jvm_pid: int | None):
    """(machine_busy_s, steal_s, jvm_cpu_s) — cumulative counters to
    be differenced around each timed run.  Any piece that cannot be
    read degrades to 0.0/None, never aborts the bench."""
    busy = steal = 0.0
    jvm = None
    try:
        with open("/proc/stat") as fh:
            f = [int(x) for x in fh.readline().split()[1:9]]
        # user nice system idle iowait irq softirq steal
        busy = (f[0] + f[1] + f[2] + f[5] + f[6]) / _CLK
        steal = f[7] / _CLK
    except (OSError, ValueError, IndexError):
        pass
    if jvm_pid:
        try:
            with open(f"/proc/{jvm_pid}/stat") as fh:
                rest = _stat_fields(fh.read())
            jvm = (int(rest[11]) + int(rest[12])) / _CLK
        except (OSError, ValueError, IndexError):
            jvm = None
    return busy, steal, jvm


def _median(xs: list[float]) -> float:
    return sorted(xs)[len(xs) // 2]


def _run_set(spark, qs, names, sf_dir, timings, first_run, errors,
             all_runs, cpu, jvm_pid):
    """Per query: RUNS timed executions; record the MEDIAN (the box is
    noisy — single-run totals swing +-17%, drowning real trends), the
    first run separately for continuity with rounds 1-4, the full
    sample list so run-to-run spread is auditable from the JSON, and
    per-run CPU/steal deltas so code cost is separable from
    hypervisor theft."""
    for name in names:
        if name not in qs:
            continue
        samples = []
        jvm_runs, busy_runs, steal_runs = [], [], []
        n = None
        try:
            for _ in range(RUNS):
                b0, s0, j0 = _cpu_snap(jvm_pid)
                t0 = time.time()
                df = qs[name](spark, sf_dir)
                n = df.count()
                samples.append(time.time() - t0)
                b1, s1, j1 = _cpu_snap(jvm_pid)
                busy_runs.append(round(b1 - b0, 2))
                steal_runs.append(round(s1 - s0, 2))
                if j0 is not None and j1 is not None:
                    jvm_runs.append(round(j1 - j0, 2))
            timings[name] = round(_median(samples), 3)
            first_run[name] = round(samples[0], 3)
            all_runs[name] = [round(s, 3) for s in samples]
            cpu[name] = {
                "jvm": _median(jvm_runs) if jvm_runs else None,
                "busy": _median(busy_runs) if busy_runs else None,
                "steal": round(sum(steal_runs), 2),
                "jvm_runs": jvm_runs,
                "busy_runs": busy_runs,
                "steal_runs": steal_runs,
            }
            print(
                f"# {name}: {n} rows median {timings[name]}s "
                f"(runs {[round(s, 3) for s in samples]}; "
                f"jvm cpu {jvm_runs}; busy {busy_runs}; "
                f"steal {steal_runs})",
                file=sys.stderr,
            )
        except Exception as ex:  # noqa: BLE001
            errors[name] = f"{type(ex).__name__}: {ex}"[:500]
            print(f"# {name}: ERROR {errors[name]}", file=sys.stderr)


def _compact(out: dict) -> dict:
    """The totals-only record printed LAST (the driver keeps the tail
    of stdout): headline value, per-query wall medians, per-query JVM
    CPU medians, machine steal total.  Everything the official
    artifact needs, in well under the ~2000-char tail capture."""
    cpu_s = {}
    steal_total = 0.0
    for name, c in out.get("cpu", {}).items():
        v = c.get("jvm") if c.get("jvm") is not None else c.get("busy")
        if v is not None:
            cpu_s[name] = round(v, 1)
        steal_total += c.get("steal") or 0.0
    compact = {
        "metric": out["metric"],
        "value": out["value"],
        "unit": out["unit"],
        "sf": out["sf"],
        "queries": out["queries"],
        "heavy_queries": out["heavy_queries"],
        "heavy_total": out["heavy_total"],
        "cpu_s": cpu_s,
        "steal_s": round(steal_total, 1),
        "runs_per_query": out["runs_per_query"],
    }
    if out.get("errors"):
        compact["errors"] = sorted(out["errors"])
    return compact


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.0

    from osm2pgsql_spark import queries as Q
    from osm2pgsql_spark.session import get_spark

    spark = get_spark("osm2pgsql-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = Q.queries()
    jvm_pid = _jvm_pid()

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
    cpu: dict[str, dict] = {}
    _run_set(spark, qs, HEADLINE, sf_dir, timings, first_run, errors,
             all_runs, cpu, jvm_pid)
    _run_set(spark, qs, HEAVY, sf_dir, heavy_timings, first_run, errors,
             all_runs, cpu, jvm_pid)

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
        "cpu": cpu,
        "sf": sf,
    }
    if errors:
        out["errors"] = errors
    print(json.dumps(out))
    # compact line LAST — this is the one the driver's tail capture
    # must always parse whole (tight separators keep worst-case
    # widths inside the capture; test_bench_output pins the bound)
    print(json.dumps(_compact(out), separators=(",", ":")))


if __name__ == "__main__":
    main()
