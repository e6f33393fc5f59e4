#!/usr/bin/env python
"""Round-6 optimization harness (NOT the driver bench — bench.py is frozen).

Per-query measurement + physical-plan capture for the optimization round:

    python bench_extra.py --plans                 # dump explain() for all rows
    python bench_extra.py --time [--reps 3]       # per-query interleaved minima
    python bench_extra.py --time -q segment_dedup -q dsl_top_hits
    python bench_extra.py --plans -q bm25_phrase2 --tag after

Timing methodology matches bench.py run_queries (collect(), interleaved
sweeps, per-query min) so numbers here are comparable to the frozen
bench's rows; plans land in plans/r06/<query>_<tag>.txt for the
deliverable.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import time
from contextlib import redirect_stdout

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

from bench import BENCH_QUERIES  # noqa: E402  (frozen list, reused read-only)


def _spark():
    from gopensearch_spark.session import get_spark

    return get_spark("bench-extra", master=f"local[{CPUS}]")


def _qmap():
    import __spark_entry__ as entry

    return entry.queries()


def dump_plans(names: list[str], tag: str) -> None:
    spark = _spark()
    qmap = _qmap()
    outdir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r06")
    os.makedirs(outdir, exist_ok=True)
    qmap["bm25_tail_term"](spark, SF_DIR).collect()  # warm index/engine caches
    for name in names:
        df = qmap[name](spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}")


def time_queries(names: list[str], reps: int) -> None:
    spark = _spark()
    qmap = _qmap()
    qmap["bm25_tail_term"](spark, SF_DIR).collect()  # warm (same as bench.py)
    samples: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(reps):
        for name in names:
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            qmap[name](spark, SF_DIR).collect()
            samples[name].append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
    out = {n: {"min": min(rs), "samples": rs} for n, rs in samples.items()}
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--plans", action="store_true")
    p.add_argument("--time", action="store_true")
    p.add_argument("--tag", default="before")
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("-q", "--query", action="append", default=None)
    a = p.parse_args()
    names = a.query or list(BENCH_QUERIES)
    if a.plans:
        dump_plans(names, a.tag)
    if a.time:
        time_queries(names, a.reps)
