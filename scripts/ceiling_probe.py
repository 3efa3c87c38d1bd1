"""Sandbox per-core ceiling probes: what 8->32 pinned procs CAN give.

Two no-Ray controls bracket this box's achievable 8->32 scaling:

- ``arith``: a tight integer loop (no cache/bandwidth pressure) — the
  compute-bound ceiling.
- ``zlib``: repeated 1 MB zlib decompression (memory-streaming, the
  closest control to the flagship's decompress+extract+Arrow row path)
  — the memory-bound ceiling.

Run each at 8 and 32 pinned CPUs and compare total throughput; the
flagship's own 8->32 efficiency should be judged against the ``zlib``
control, not against 1.0. Usage:

    taskset -c 0-7  python scripts/ceiling_probe.py 8
    taskset -c 0-31 python scripts/ceiling_probe.py 32
"""

from __future__ import annotations

import multiprocessing as mp
import statistics
import sys
import time
import zlib


def _arith_worker(n: int, out: mp.Queue) -> None:
    x = 0
    t0 = time.time()
    for _ in range(n):
        x = (x * 1103515245 + 12345) & 0x7FFFFFFF
    out.put(time.time() - t0)


def _zlib_worker(n: int, out: mp.Queue) -> None:
    blob = bytes(range(256)) * 4096  # 1 MB
    c = zlib.compress(blob, 6)
    t0 = time.time()
    for _ in range(n):
        zlib.decompress(c)
    out.put(time.time() - t0)


def run(target, nproc: int, n: int) -> float:
    q: mp.Queue = mp.Queue()
    ps = [mp.Process(target=target, args=(n, q)) for _ in range(nproc)]
    t0 = time.time()
    for p in ps:
        p.start()
    for p in ps:
        p.join()
    return nproc * n / (time.time() - t0)


def main() -> None:
    nproc = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    for name, target, n in (("arith", _arith_worker, 20_000_000),
                            ("zlib", _zlib_worker, 400)):
        r = [run(target, nproc, n) for _ in range(3)]
        print(f"{name} {nproc} procs: median {statistics.median(r):,.0f} "
              f"work-units/s (trials {[round(x) for x in r]})")


if __name__ == "__main__":
    main()
