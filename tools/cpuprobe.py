#!/usr/bin/env python
"""Pure-CPU burn probe (no Spark): total iters/s at N processes.

Used to bracket benchmark legs: a leg is 'quiet' when the probe reads
the same before and after (host CPU-steal on this VM arrives in
multi-minute waves; all BENCH.md numbers state their probe bracket).

Usage: python tools/cpuprobe.py [nprocs ...]   (default: 1 8)
"""
import multiprocessing as mp
import sys
import time


def burn(q):
    t0 = time.time()
    n = 0
    x = 1
    while time.time() - t0 < 3.0:
        for _ in range(100000):
            x = (x * 31 + 7) % 1000003
        n += 100000
    q.put(n / (time.time() - t0))


def probe(nproc: int) -> float:
    q = mp.Queue()
    ps = [mp.Process(target=burn, args=(q,)) for _ in range(nproc)]
    [p.start() for p in ps]
    [p.join() for p in ps]
    return sum(q.get() for _ in ps)


if __name__ == "__main__":
    ns = [int(a) for a in sys.argv[1:]] or [1, 8]
    out = {}
    for n in ns:
        out[n] = round(probe(n) / 1e6, 1)
    print({f"p{n}": v for n, v in out.items()}, "M iters/s")
