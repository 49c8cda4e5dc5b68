"""Machine memory-subsystem scaling ceilings (context for shuffle-bound
probes).

Two micro-probes, each run as N independent OS processes so there is no
shared-allocator or GIL coupling, reporting aggregate throughput at 2
and 8 processes plus the 2->8 scaling efficiency:

- stream: np.copyto over a 256 MB buffer (sequential read+write) — the
  best case a shuffle write / scan can hit.
- gather: np.take with a random permutation index over a 128 MB value
  array (every load a cache+TLB miss) — the pattern of hash probes and
  sort-merge exchanges. Nominal bytes only; each random 8-byte load
  really moves a 64-byte line, so true traffic is ~8x the nominal
  figure. The RATIO between process counts is the point, not the GB/s.

Rationale: on one box, DRAM channels are shared across cores, so a
memory-bound job cannot scale with core count past the channel limit —
while on a real cluster every node brings its own memory subsystem, so
the same job DOES scale with node count. These ceilings let a probe
separate "the plan stops scaling" (a real defect) from "the box's
memory stops scaling" (a sandbox artifact): a join-family probe whose
efficiency lands at-or-above the gather ceiling is memory-limited, not
plan-limited.

    python tools/bench_membw.py [seconds_per_leg]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time

import numpy as np


def _stream_worker(q, seconds: float) -> None:
    a = np.ones(256 * 1024 * 1024 // 8, dtype=np.int64)
    b = np.empty_like(a)
    np.copyto(b, a)
    np.copyto(b, a)  # fault both buffers in before timing
    t0 = time.time()
    n = 0
    while time.time() - t0 < seconds:
        np.copyto(b, a)
        n += 1
    q.put(n * a.nbytes * 2 / (time.time() - t0))


def _gather_worker(q, seconds: float) -> None:
    rng = np.random.default_rng(7)
    a = rng.integers(0, 1 << 60, size=128 * 1024 * 1024 // 8, dtype=np.int64)
    idx = rng.permutation(len(a)).astype(np.int64)
    out = np.empty_like(a)
    np.take(a, idx, out=out)  # warm
    t0 = time.time()
    n = 0
    while time.time() - t0 < seconds:
        np.take(a, idx, out=out)
        n += 1
    q.put(n * (a.nbytes * 2 + idx.nbytes) / (time.time() - t0))


def _run(worker, nproc: int, seconds: float) -> float:
    q = mp.Queue()
    ps = [mp.Process(target=worker, args=(q, seconds)) for _ in range(nproc)]
    for p in ps:
        p.start()
    rates = [q.get() for _ in ps]
    for p in ps:
        p.join()
    return sum(rates) / 1e9


def main() -> None:
    seconds = float(sys.argv[1]) if len(sys.argv) > 1 else 8.0
    out: dict = {}
    for name, worker in (("stream", _stream_worker), ("gather", _gather_worker)):
        lo = _run(worker, 2, seconds)
        hi = _run(worker, 8, seconds)
        out[name] = {
            "gbps_2proc": round(lo, 1),
            "gbps_8proc": round(hi, 1),
            "scaling_efficiency_2to8": round(hi / lo / 4.0, 3),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
