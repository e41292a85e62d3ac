"""Fixed CPU reference probe — separates box speed from code speed.

bench.py numbers swing +-35% round-to-round on this infrastructure
(PERF_NOTES documents repeated broad-spectrum drifts on untouched
queries).  This probe measures the MACHINE, not the engine: a pinned
numpy matmul (BLAS), a pure-Python loop (interpreter speed), and a
hash loop (memory + ALU).  Run it next to bench.py and divide: if
bench moved but the probe moved the same way, it's the box.

Usage: python tools/cpu_probe.py   ->  one JSON line, higher = faster.
"""

from __future__ import annotations

import hashlib
import json
import time

import numpy as np


def _med3(fn) -> float:
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[1]


def main() -> None:
    rng = np.random.RandomState(42)
    a = rng.standard_normal((1024, 1024))
    b = rng.standard_normal((1024, 1024))
    t_blas = _med3(lambda: a @ b)

    def pyloop():
        s = 0
        for i in range(2_000_000):
            s += i * 3 % 7
        return s

    t_py = _med3(pyloop)

    blob = bytes(range(256)) * 4096  # 1 MiB

    def hashloop():
        h = hashlib.sha256()
        for _ in range(64):
            h.update(blob)
        return h.digest()

    t_hash = _med3(hashloop)

    print(json.dumps({
        "blas_gflops": round(2 * 1024**3 / t_blas / 1e9, 2),
        "pyloop_mops": round(2.0 / t_py, 2),
        "hash_mbps": round(64.0 / t_hash, 1),
    }))


if __name__ == "__main__":
    main()
