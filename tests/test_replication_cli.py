"""osm2pgsql-replication CLI parity — ports of
tests/bdd/command-line/replication.feature (the offline-portable
scenarios): init from stored replication info / database date /
--start-at (absolute or rollback minutes), reference error wordings
and exit codes, and the status --json object shape.

The database's property table is our properties.json; the replication
service is a file:// server tree (write_server_tree)."""

import datetime as dt
import gzip
import json
import os
import subprocess
import sys

import pytest

from osm2pgsql_spark.streaming.properties import Properties
from osm2pgsql_spark.streaming.replication import write_server_tree

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def utc(*a):
    return dt.datetime(*a, tzinfo=dt.timezone.utc)


def _run(args):
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "replication.py"), *args],
        capture_output=True, text=True, cwd=REPO, timeout=120,
    )


EMPTY_OSC = gzip.compress(
    b"<?xml version='1.0'?><osmChange version=\"0.6\"></osmChange>")


@pytest.fixture()
def server_dir(tmp_path):
    """Sequences 100..105, hourly from 2024-01-01T00:00:00Z."""
    d = str(tmp_path / "server")
    write_server_tree(
        d, [(100 + i, EMPTY_OSC, utc(2024, 1, 1, i)) for i in range(6)])
    return d


def _props(tmp_path, **kv):
    state = str(tmp_path / "state.json")
    p = Properties(state)
    for k, v in kv.items():
        p.set(k, v)
    p.save()
    return state


class TestInit:
    def test_from_import_file_info(self, tmp_path, server_dir):
        # "Replication will be initialised from the information of the
        # import file": stored base_url+seq verified against the server
        state = _props(tmp_path,
                       replication_base_url=server_dir,
                       replication_sequence_number="101",
                       replication_timestamp="2024-01-01T01:00:00Z")
        r = _run(["init", state])
        assert r.returncode == 0, r.stderr[-800:]
        p = Properties(state)
        assert p.get("replication_sequence_number") == "101"
        assert p.get("replication_timestamp") == "2024-01-01T01:00:00Z"

    def test_missing_date_information_fails(self, tmp_path, server_dir):
        # "cannot be initialised when date information is missing"
        state = _props(tmp_path)
        r = _run(["init", state, "--server", server_dir])
        assert r.returncode != 0
        assert "Cannot get timestamp from database." in (r.stderr + r.stdout)

    def test_from_database_date(self, tmp_path, server_dir):
        # db date minus the default 180-minute rollback
        state = _props(tmp_path, current_timestamp="2024-01-01T05:00:01Z")
        r = _run(["init", state, "--server", server_dir])
        assert r.returncode == 0, r.stderr[-800:]
        p = Properties(state)
        assert p.get("replication_sequence_number") == "102"
        assert p.get("replication_timestamp") == "2024-01-01T02:00:01Z"
        assert p.get("replication_base_url") == server_dir

    def test_fixed_date(self, tmp_path, server_dir):
        # --start-at with an absolute timestamp: no rollback applied
        state = _props(tmp_path, current_timestamp="2024-01-01T05:00:01Z")
        r = _run(["init", state, "--server", server_dir,
                  "--start-at", "2024-01-01T03:30:00Z"])
        assert r.returncode == 0, r.stderr[-800:]
        p = Properties(state)
        assert p.get("replication_sequence_number") == "103"
        assert p.get("replication_timestamp") == "2024-01-01T03:30:00Z"

    def test_fixed_date_overrides_previous_info(self, tmp_path, server_dir):
        state = _props(tmp_path,
                       replication_base_url=server_dir,
                       replication_sequence_number="100",
                       replication_timestamp="2024-01-01T00:00:00Z")
        r = _run(["init", state, "--start-at", "2024-01-01T04:30:00Z"])
        assert r.returncode == 0, r.stderr[-800:]
        p = Properties(state)
        assert p.get("replication_sequence_number") == "104"
        assert p.get("replication_timestamp") == "2024-01-01T04:30:00Z"

    def test_rollback_minutes(self, tmp_path, server_dir):
        # integer --start-at = rollback minutes from the database date,
        # even when previous replication info exists
        state = _props(tmp_path,
                       replication_base_url=server_dir,
                       replication_sequence_number="105",
                       replication_timestamp="2024-01-01T05:00:00Z",
                       current_timestamp="2024-01-01T05:00:01Z")
        r = _run(["init", state, "--start-at", "60"])
        assert r.returncode == 0, r.stderr[-800:]
        p = Properties(state)
        assert p.get("replication_sequence_number") == "104"
        assert p.get("replication_timestamp") == "2024-01-01T04:00:01Z"

    def test_different_server_ignores_stored_info(self, tmp_path, server_dir):
        # --server forces the database-date path even with stored info
        other = str(tmp_path / "other")
        write_server_tree(
            other, [(1345 + i, EMPTY_OSC, utc(2024, 1, 1, i)) for i in range(6)])
        state = _props(tmp_path,
                       replication_base_url=server_dir,
                       replication_sequence_number="105",
                       replication_timestamp="2024-01-01T05:00:00Z",
                       current_timestamp="2024-01-01T05:00:01Z")
        r = _run(["init", state, "--server", other])
        assert r.returncode == 0, r.stderr[-800:]
        p = Properties(state)
        assert p.get("replication_base_url") == other
        assert p.get("replication_sequence_number") == "1347"
        assert p.get("replication_timestamp") == "2024-01-01T02:00:01Z"

    def test_diffs_not_old_enough(self, tmp_path):
        # server's oldest diff is newer than the requested date
        d = str(tmp_path / "server")
        write_server_tree(d, [(10000000, EMPTY_OSC, utc(2024, 6, 1))])
        state = _props(tmp_path, current_timestamp="2024-01-01T05:00:01Z")
        r = _run(["init", state, "--server", d])
        assert r.returncode != 0
        assert ("The replication service does not have diff files for "
                "the requested date.") in (r.stderr + r.stdout)

    def test_stored_sequence_unknown_on_server(self, tmp_path, server_dir):
        # stored info points at a sequence the server has pruned
        state = _props(tmp_path,
                       replication_base_url=server_dir,
                       replication_sequence_number="90",
                       replication_timestamp="2023-12-31T00:00:00Z")
        r = _run(["init", state])
        assert r.returncode != 0
        assert (f"Cannot load state information for 90 from replication "
                f"service {server_dir}.") in (r.stderr + r.stdout)


class TestUpdateStatus:
    def test_update_needs_init(self, tmp_path, server_dir):
        state = _props(tmp_path)
        r = _run(["update", state, str(tmp_path / "db")])
        assert r.returncode != 0
        assert "Updates not set up correctly." in (r.stderr + r.stdout)

    def test_status_uninitialised_exit_2(self, tmp_path):
        state = _props(tmp_path)
        r = _run(["status", state, "--json"])
        assert r.returncode == 2
        obj = json.loads(r.stdout)
        assert obj["status"] == 2
        assert obj["error"].startswith("Updates not set up correctly.")

    def test_status_fresh_json_shape(self, tmp_path, server_dir):
        state = _props(tmp_path,
                       replication_base_url=server_dir,
                       replication_sequence_number="101",
                       replication_timestamp="2024-01-01T01:00:00Z")
        r = _run(["status", state, "--json"])
        assert r.returncode == 0, r.stdout + r.stderr[-500:]
        obj = json.loads(r.stdout)
        assert obj["status"] == 0
        assert obj["server"]["base_url"] == server_dir
        assert obj["server"]["sequence"] == 105
        assert obj["server"]["timestamp"] == "2024-01-01T05:00:00Z"
        assert obj["local"]["sequence"] == 101
        assert obj["local"]["timestamp"] == "2024-01-01T01:00:00Z"
        # ages measured from now, local is 4h older than server
        assert obj["local"]["age_sec"] - obj["server"]["age_sec"] == 4 * 3600

    def test_status_unreachable_server_exit_3(self, tmp_path):
        state = _props(tmp_path,
                       replication_base_url=str(tmp_path / "nosuch"),
                       replication_sequence_number="101",
                       replication_timestamp="2024-01-01T01:00:00Z")
        r = _run(["status", state, "--json"])
        assert r.returncode == 3
        obj = json.loads(r.stdout)
        assert obj["status"] == 3
        assert "Unable to download the state information" in obj["error"]
