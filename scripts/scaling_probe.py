"""Attribute single-host scaling loss to hardware effects.

Runs two synthetic per-process workloads at N and 4N processes (no
Ray): (a) a register-resident arithmetic burn — its per-process rate
ratio isolates frequency scaling (turbo boost at low core counts);
(b) a memory-streaming burn over arrays far larger than LLC — its
ratio isolates shared memory-bandwidth contention.  On a real multi-
node cluster both per-NODE factors are constant, so the product of
these two ratios is the hardware-induced ceiling baked into any
single-host N-vs-4N measurement; engine efficiency beyond it is what
generalizes.  Results feed BASELINE.md's scaling section.
"""

import json
import multiprocessing as mp
import sys
import time


def arith_worker(q):
    x = 1234567
    t0 = time.perf_counter()
    n = 0
    # ~1.5s of integer mul/xor in registers
    while time.perf_counter() - t0 < 1.5:
        for _ in range(100_000):
            x = (x * 1103515245 + 12345) & 0x7FFFFFFF
        n += 100_000
    q.put(n / (time.perf_counter() - t0))


def mem_worker(q):
    import numpy as np

    a = np.arange(32_000_000, dtype=np.float64)  # 256 MB, far beyond LLC
    t0 = time.perf_counter()
    n = 0
    s = 0.0
    while time.perf_counter() - t0 < 1.5:
        s += float(a.sum())
        n += 1
    q.put(n * a.nbytes / (time.perf_counter() - t0) / 1e9)  # GB/s per proc


def run(worker, nprocs: int) -> float:
    q = mp.Queue()
    procs = [mp.Process(target=worker, args=(q,)) for _ in range(nprocs)]
    for p in procs:
        p.start()
    rates = [q.get() for _ in procs]
    for p in procs:
        p.join()
    return sum(rates) / len(rates)


def main():
    lo = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    hi = lo * 4
    out = {}
    for name, worker in (("arith", arith_worker), ("mem", mem_worker)):
        r_lo = run(worker, lo)
        r_hi = run(worker, hi)
        out[name] = {
            "per_proc_lo": round(r_lo, 3),
            "per_proc_hi": round(r_hi, 3),
            "per_proc_ratio_hi_over_lo": round(r_hi / r_lo, 3),
        }
    # any real workload is a blend of the two behaviors, so its
    # hardware-imposed per-proc ratio lies BETWEEN them (not their
    # product — that would double-count)
    out["hardware_ceiling_range"] = sorted(
        [
            out["arith"]["per_proc_ratio_hi_over_lo"],
            out["mem"]["per_proc_ratio_hi_over_lo"],
        ]
    )
    out["lo_procs"], out["hi_procs"] = lo, hi
    print(json.dumps(out))


if __name__ == "__main__":
    main()
