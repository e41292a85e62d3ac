"""Properties store: the engine's run-state key/value table.

Reference: the osm2pgsql_properties table
(/root/reference/src/properties.cpp:22,109) holds attributes on/off,
flat-node path, db format, replication sequence/timestamp; read and
compatibility-checked on every append run
(/root/reference/src/osm2pgsql.cpp:102-145,300-309).

Spark-first: a small JSON state file (atomic replace).  At cluster
scale this lives next to the lake data (same object store as the
tables and streaming checkpoints).
"""

from __future__ import annotations

import json
import os
import tempfile

INCOMPATIBLE_KEYS = ("attributes", "output", "flat_node_file")


class Properties:
    def __init__(self, path: str) -> None:
        self.path = path
        self._data: dict[str, str] = {}
        if os.path.exists(path):
            with open(path, encoding="utf-8") as fh:
                self._data = json.load(fh)

    def get(self, key: str, default: str | None = None) -> str | None:
        return self._data.get(key, default)

    def as_dict(self) -> dict[str, str]:
        return dict(self._data)

    def set(self, key: str, value: str) -> None:
        self._data[key] = str(value)

    def save(self) -> None:
        d = os.path.dirname(self.path) or "."
        os.makedirs(d, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=d, suffix=".json")
        with os.fdopen(fd, "w", encoding="utf-8") as fh:
            json.dump(self._data, fh, indent=1, sort_keys=True)
        os.replace(tmp, self.path)

    def check_compatible(self, **expected: str) -> list[str]:
        """Append-mode compatibility check (reference
        src/osm2pgsql.cpp:300-309): returns the list of mismatched
        keys; empty means compatible."""
        problems = []
        for key, want in expected.items():
            have = self._data.get(key)
            if have is not None and have != str(want):
                problems.append(f"{key}: stored={have!r} requested={want!r}")
        return problems

    def update_replication_state(self, sequence: int, timestamp: str) -> None:
        self.set("replication_sequence_number", str(sequence))
        self.set("replication_timestamp", timestamp)
        self.save()
