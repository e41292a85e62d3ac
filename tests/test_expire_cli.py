"""osm2pgsql-expire CLI parity — tests/bdd/expire/expire.feature: the
four golden-file scenarios (tiles + geojson, buffer 0 and 0.5) are
reproduced BYTE-FOR-BYTE, including the reference's quadkey print
order and nlohmann's Grisu2 double formatting (functions/dtoa), plus
the two validation error wordings."""

import os
import re
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA = "/root/reference/tests/data/expire"
OSM = os.path.join(DATA, "test-data.osm")


def _run(args):
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "expire_tool.py"), *args],
        capture_output=True, text=True, cwd=REPO, timeout=600,
        env={**os.environ, "SPARK_GRAFT_CPUS": "4"},
    )


@pytest.mark.parametrize("fmt,buf,golden", [
    ("tiles", None, "test-z18-b0.tiles"),
    ("tiles", "0.5", "test-z18-b05.tiles"),
    ("geojson", None, "test-z18-b0.geojson"),
    ("geojson", "0.5", "test-z18-b05.geojson"),
])
def test_golden_output(fmt, buf, golden):
    # the 'b0' goldens are the tool's default buffer (0.1, matching the
    # reference expire_config_t default) — the BDD passes no -b there
    args = ["-z18", "-m", "full_area", "-f", fmt]
    if buf is not None:
        args += ["-b", buf]
    r = _run(args + [OSM])
    assert r.returncode == 0, r.stderr[-2000:]
    expected = open(os.path.join(DATA, golden)).read()
    assert r.stdout == expected


def test_invalid_mode_wording():
    r = _run(["-z18", "-m", "abc", OSM])
    assert r.returncode != 0
    assert ("Value for --mode must be 'boundary_only', 'full_area', "
            "or 'hybrid'") in (r.stderr + r.stdout)


def test_invalid_format_wording():
    r = _run(["-z18", "-m", "full_area", "-f", "foo", OSM])
    assert r.returncode != 0
    assert "Value for --format must be 'tiles' or 'geojson'" in (
        r.stderr + r.stdout)


class TestDtoa:
    def test_golden_float_tokens_round_trip(self):
        """Every float literal in both golden geojson files formats
        identically through the Grisu2 twin (38k+ vectors, including
        the ~1% where Python's repr is shorter than Grisu2)."""
        from osm2pgsql_spark.functions.dtoa import dtoa

        tok = re.compile(r"-?\d+\.\d+")
        total = 0
        for fn in ("test-z18-b0.geojson", "test-z18-b05.geojson"):
            for line in open(os.path.join(DATA, fn)):
                for t in tok.findall(line):
                    total += 1
                    assert dtoa(float(t)) == t
        assert total > 30000

    def test_edge_values(self):
        from osm2pgsql_spark.functions.dtoa import dtoa

        assert dtoa(0.0) == "0.0"
        assert dtoa(-0.0) == "-0.0"
        assert dtoa(1.0) == "1.0"
        assert dtoa(-2.5) == "-2.5"
        assert dtoa(100.0) == "100.0"
        assert dtoa(1e-7) == "1e-07"
        assert dtoa(1e22) == "1e+22"
        assert dtoa(5e-324) == "5e-324"
        assert dtoa(0.0001) == "0.0001"

    def test_round_trips_randomly(self):
        import random
        import struct

        from osm2pgsql_spark.functions.dtoa import dtoa

        rng = random.Random(7)
        for _ in range(20000):
            bits = rng.getrandbits(64)
            (v,) = struct.unpack("<d", struct.pack("<Q", bits))
            if v != v or v in (float("inf"), float("-inf")):
                continue
            s = dtoa(v)
            assert float(s) == v, (v, s)
