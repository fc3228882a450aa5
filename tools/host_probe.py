"""Host scaling-physics probe: how much does identical per-process work
stretch as active-core count rises?

The pass rule measures throughput scaling efficiency between N and 4N
parallelism on ONE shared host.  That conflates software scaling with
hardware physics: more active cores means lower all-core turbo
frequency, a smaller per-core share of LLC/DRAM bandwidth, and more
kernel-side page-fault contention — none of which exist in the rule's
real setting (an N-node vs 4N-node cluster, where every node keeps its
own frequency/bandwidth envelope).  This probe quantifies the artifact
so the recorded efficiencies can be read against the host's own
ceiling:

- ``compute``: a tight loop over an L1-resident array — no memory
  traffic; any stretch is frequency derating / SMT sharing.  Its 8->32
  stretch IS the hard ceiling for any software's 8->32 efficiency.
- ``stream``:  DRAM-bandwidth-bound array sweeps (64 MB per process).
- ``alloc``:   fresh-page allocation churn (the kernel-side page-fault
  path), the failure mode of temporary-heavy numpy code.

Usage: ``python tools/host_probe.py [N ...]`` (default 4 8 16 32).
Prints one JSON line: per mode, mean per-process seconds at each N and
the per-step stretch ratios.
"""

import json
import sys
import time
from multiprocessing import Process, Queue

import numpy as np


def _worker(q, mode: str) -> None:
    if mode == "compute":
        a = np.random.rand(4096)  # 32 KB, L1-resident
        t0 = time.perf_counter()
        for _ in range(20_000):
            b = a * 1.0001
            b += a
            b *= b
        q.put(time.perf_counter() - t0)
    elif mode == "stream":
        a = np.random.rand(8_000_000)  # 64 MB, DRAM-resident
        b = np.empty_like(a)
        t0 = time.perf_counter()
        for _ in range(12):
            np.multiply(a, 1.0001, out=b)
            np.add(b, a, out=b)
        q.put(time.perf_counter() - t0)
    elif mode == "alloc":
        t0 = time.perf_counter()
        for _ in range(4_000):
            w = np.empty((64, 1024))  # 512 KB fresh allocation
            w.fill(1.0)
            x = np.empty((64, 1024))
            x.fill(2.0)
            del w, x
        q.put(time.perf_counter() - t0)


def probe(counts=(4, 8, 16, 32), modes=("compute", "stream", "alloc")) -> dict:
    out: dict = {"counts": list(counts)}
    for mode in modes:
        means = []
        for n in counts:
            q: Queue = Queue()
            ps = [Process(target=_worker, args=(q, mode)) for _ in range(n)]
            [p.start() for p in ps]
            times = [q.get() for _ in ps]
            [p.join() for p in ps]
            means.append(round(float(np.mean(times)), 4))
        out[mode] = {
            "mean_sec": means,
            "stretch": [round(means[i] / means[0], 3) for i in range(len(means))],
        }
    return out


if __name__ == "__main__":
    counts = tuple(int(a) for a in sys.argv[1:]) or (4, 8, 16, 32)
    print(json.dumps(probe(counts)))
