"""bench.py output contract (r13 VERDICT #2/#5): the compact final
JSON line must survive the driver's ~2000-char tail capture whole,
and the CPU probes must work on this kernel."""

import json
import os

import bench


def _fake_out():
    names = bench.HEADLINE + bench.HEAVY
    # worst-case widths: 4-digit wall medians, 5-digit cpu medians
    queries = {n: 9999.999 for n in bench.HEADLINE}
    heavy = {n: 9999.999 for n in bench.HEAVY}
    cpu = {
        n: {
            "jvm": 99999.9,
            "busy": 99999.9,
            "steal": 9999.99,
            "jvm_runs": [99999.9] * 3,
            "busy_runs": [99999.9] * 3,
            "steal_runs": [9999.99] * 3,
        }
        for n in names
    }
    return {
        "metric": "headline_queries_total_runtime",
        "value": 99999.999,
        "unit": "sec",
        "queries": queries,
        "heavy_queries": heavy,
        "heavy_total": 99999.999,
        "runs_per_query": 3,
        "first_run": dict(queries),
        "runs": {n: [9999.999] * 3 for n in names},
        "cpu": cpu,
        "sf": 0.1,
        "errors": {"geom_suite": "X" * 500},
    }


def test_compact_line_fits_tail_capture():
    line = json.dumps(bench._compact(_fake_out()), separators=(",", ":"))
    # driver keeps the last ~2000 chars of stdout; the compact line is
    # printed last and must fit whole even at worst-case value widths
    assert len(line) < 1900, len(line)
    parsed = json.loads(line)
    assert parsed["value"] == 99999.999
    assert parsed["heavy_total"] == 99999.999
    assert set(parsed["queries"]) == set(bench.HEADLINE)
    assert set(parsed["heavy_queries"]) == set(bench.HEAVY)
    # per-query CPU medians ride along (r13 VERDICT #5)
    assert set(parsed["cpu_s"]) == set(bench.HEADLINE + bench.HEAVY)
    assert parsed["steal_s"] > 0
    assert parsed["errors"] == ["geom_suite"]


def test_compact_falls_back_to_busy_when_jvm_missing():
    out = _fake_out()
    for c in out["cpu"].values():
        c["jvm"] = None
    compact = bench._compact(out)
    assert compact["cpu_s"]["pricing_summary"] == 99999.9  # busy fallback


def test_cpu_snap_reads_proc():
    busy, steal, jvm = bench._cpu_snap(None)
    assert busy > 0.0  # machine has been up and busy
    assert steal >= 0.0
    assert jvm is None
    # our own pid is a readable stat target for the jvm slot
    b2, s2, own = bench._cpu_snap(os.getpid())
    assert own is not None and own >= 0.0


def test_jvm_pid_walks_parent_chain():
    # no java child of the test process: must return None, not raise
    assert bench._jvm_pid() is None or isinstance(bench._jvm_pid(), int)
