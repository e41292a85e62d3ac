"""Replication-server state machine: sequence->URL path math, state
file parsing, timestamp->sequence search, and --max-diff-size diff
batching — the network-independent core of the reference's
scripts/osm2pgsql-replication (which delegates these exact behaviors
to pyosmium's ReplicationServer; both the script and pyosmium's
published behavior are the spec here).

The OSM replication layout (public osmosis/pyosmium convention):

    {base}/state.txt                     current server state
    {base}/AAA/BBB/CCC.state.txt         state at sequence AAABBBCCC
    {base}/AAA/BBB/CCC.osc.gz            the diff AAABBBCCC

where a 9-digit zero-padded sequence splits 3/3/3 into the path.
state.txt is `key=value` lines with `\\:` escapes in timestamps and
`#` comments.

Fetching is PLUGGABLE: `fetch(url) -> bytes | None` (None = 404).  The
default fetcher handles file:// URLs and plain directories (the
testable offline path) and falls back to urllib for http(s) where a
network exists.  Everything above the fetcher — path math, state
parsing, catch-up iteration, batch sizing — is what the tests pin.
"""

from __future__ import annotations

import datetime as dt
import os
import re
from dataclasses import dataclass
from urllib.parse import urlparse


def osm_date(date: dt.datetime) -> str:
    """Format like the reference script's osm_date
    (scripts/osm2pgsql-replication:82-83)."""
    return date.strftime("%Y-%m-%dT%H:%M:%SZ")


def from_osm_date(datestr: str) -> dt.datetime:
    return dt.datetime.strptime(datestr, "%Y-%m-%dT%H:%M:%SZ").replace(
        tzinfo=dt.timezone.utc
    )


def sequence_path(seq: int) -> str:
    """9-digit sequence -> AAA/BBB/CCC path (osmosis convention used by
    pyosmium's ReplicationServer and every OSM diff server)."""
    if seq < 0:
        raise ValueError("sequence must be >= 0")
    s = f"{seq:09d}"
    return f"{s[0:3]}/{s[3:6]}/{s[6:9]}"


def diff_url(base_url: str, seq: int) -> str:
    return f"{base_url.rstrip('/')}/{sequence_path(seq)}.osc.gz"


def state_url(base_url: str, seq: int | None = None) -> str:
    base = base_url.rstrip("/")
    if seq is None:
        return f"{base}/state.txt"
    return f"{base}/{sequence_path(seq)}.state.txt"


@dataclass
class ReplicationStateInfo:
    sequence: int
    timestamp: dt.datetime | None


def parse_state_txt(text: str) -> ReplicationStateInfo:
    """state.txt: java-properties-ish `key=value`, '#' comments, and
    `\\:` escapes inside the ISO timestamp."""
    seq = None
    ts = None
    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        key, _, value = line.partition("=")
        key = key.strip()
        value = value.strip().replace("\\:", ":")
        if key == "sequenceNumber":
            seq = int(value)
        elif key == "timestamp":
            ts = from_osm_date(value)
    if seq is None:
        raise ValueError("state file has no sequenceNumber")
    return ReplicationStateInfo(sequence=seq, timestamp=ts)


def format_state_txt(state: ReplicationStateInfo) -> str:
    ts = ""
    if state.timestamp is not None:
        ts = osm_date(state.timestamp).replace(":", "\\:")
    return f"sequenceNumber={state.sequence}\ntimestamp={ts}\n"


def default_fetch(url: str) -> bytes | None:
    """file:// and plain-path fetcher, urllib fallback for http(s).
    Returns None for a missing resource (the 404 signal)."""
    parsed = urlparse(url)
    if parsed.scheme in ("", "file"):
        path = parsed.path if parsed.scheme == "file" else url
        if not os.path.exists(path):
            return None
        with open(path, "rb") as fh:
            return fh.read()
    import urllib.error
    import urllib.request

    try:
        req = urllib.request.Request(
            url, headers={"User-Agent": "osm2pgsql-spark-replication"}
        )
        with urllib.request.urlopen(req) as resp:
            return resp.read()
    except urllib.error.HTTPError as err:
        if err.code == 404:
            return None
        raise


class ReplicationServer:
    """The catch-up protocol against one diff server (pyosmium
    ReplicationServer twin, consumed by scripts/osm2pgsql-replication
    through get_state_info / timestamp_to_sequence / apply_diffs)."""

    def __init__(self, base_url: str, fetch=None) -> None:
        self.base_url = base_url.rstrip("/")
        self.fetch = fetch or default_fetch

    def get_state_info(self, seq: int | None = None) -> ReplicationStateInfo | None:
        raw = self.fetch(state_url(self.base_url, seq))
        if raw is None:
            return None
        return parse_state_txt(raw.decode("utf-8"))

    def get_diff(self, seq: int) -> bytes | None:
        return self.fetch(diff_url(self.base_url, seq))

    def timestamp_to_sequence(self, date: dt.datetime) -> int | None:
        """Lowest sequence whose state timestamp is > `date` minus one —
        i.e. the newest diff that still precedes `date` (pyosmium
        semantics: start applying at the returned sequence + 1...).
        Binary search over per-sequence state files; sequences whose
        state file is missing are probed upward (servers prune old
        states)."""
        current = self.get_state_info()
        if current is None or current.timestamp is None:
            return None
        if current.timestamp <= date:
            return current.sequence
        lo, hi = 0, current.sequence
        # find any reachable lower bound
        lower = self.get_state_info(lo)
        while lower is None and lo < hi:
            lo = lo + max(1, (hi - lo) // 2)
            lower = self.get_state_info(lo)
        if lower is None:
            return None
        if lower.timestamp is not None and lower.timestamp >= date:
            return lower.sequence
        lo = lower.sequence
        while hi - lo > 1:
            mid = (lo + hi) // 2
            st = self.get_state_info(mid)
            probe = mid
            while st is None and probe < hi - 1:
                probe += 1
                st = self.get_state_info(probe)
            if st is None or st.timestamp is None:
                hi = mid
                continue
            if st.timestamp > date:
                hi = st.sequence
            else:
                lo = st.sequence
        return lo

    def collect_diffs(
        self, start_seq: int, max_size_kb: int = 50 * 1024
    ) -> tuple[int, list[tuple[int, bytes]]] | None:
        """Diffs from `start_seq` upward until the server runs out or
        the accumulated (compressed) size would exceed max_size_kb —
        the --max-diff-size batching of the reference update loop
        (scripts/osm2pgsql-replication:552-556: apply_diffs with
        max_size=args.max_diff_size * 1024).  Returns (last_seq,
        [(seq, gz_bytes)...]) or None if start_seq isn't available."""
        out: list[tuple[int, bytes]] = []
        total = 0
        seq = start_seq
        while True:
            blob = self.get_diff(seq)
            if blob is None:
                break
            if out and (total + len(blob)) > max_size_kb * 1024:
                break
            out.append((seq, blob))
            total += len(blob)
            seq += 1
        if not out:
            return None
        return out[-1][0], out


# ------------------------------------------------- PBF header discovery

def replication_header_from_pbf(path: str):
    """(base_url, sequence, timestamp) from a PBF's OSMHeader blob —
    osmosis_replication_base_url / _sequence_number / _timestamp
    (fields 34/33/32 of HeaderBlock; reference init path
    scripts/osm2pgsql-replication:440-444 via pyosmium's
    get_replication_header).  Missing fields come back None."""
    from osm2pgsql_spark.sources.pbf import _fields, _read_blob, scan_blob_index

    refs = [r for r in scan_blob_index(path) if r.type == "OSMHeader"]
    if not refs:
        return None, None, None
    raw = _read_blob(path, refs[0])
    base_url = None
    seq = None
    ts = None
    for field, _wt, v in _fields(raw):
        if field == 32:
            ts = dt.datetime.fromtimestamp(int(v), tz=dt.timezone.utc)
        elif field == 33:
            seq = int(v)
        elif field == 34:
            base_url = bytes(v).decode("utf-8")
    return base_url, seq, ts


# ------------------------------------------------------- local "server"

def write_server_tree(
    directory: str, diffs: list[tuple[int, bytes, dt.datetime | None]]
) -> None:
    """Lay a list of (seq, osc_gz_bytes, timestamp) out as a
    replication-server directory tree (AAA/BBB/CCC.osc.gz + state
    files + top-level state.txt) — the offline twin of a diff server,
    used by tests and by anyone staging diffs for air-gapped catch-up."""
    latest = None
    for seq, blob, ts in diffs:
        rel = sequence_path(seq)
        p = os.path.join(directory, rel + ".osc.gz")
        os.makedirs(os.path.dirname(p), exist_ok=True)
        with open(p, "wb") as fh:
            fh.write(blob)
        with open(os.path.join(directory, rel + ".state.txt"), "w") as fh:
            fh.write(format_state_txt(ReplicationStateInfo(seq, ts)))
        if latest is None or seq > latest[0]:
            latest = (seq, ts)
    if latest is not None:
        with open(os.path.join(directory, "state.txt"), "w") as fh:
            fh.write(format_state_txt(ReplicationStateInfo(*latest)))
