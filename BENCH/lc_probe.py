#!/usr/bin/env python
"""Probe: extraction throughput under local-cluster (separate executor JVMs).

The north rule's proxy question is "N executors vs 4N executors". local[K]
conflates executor cores with the single shared JVM; local-cluster[E,C,mem]
launches E real executor JVMs with C cores each — the faithful sandbox
analog. This probe times the same extract job (scan -> salted repartition ->
mapInPandas -> noop sink) at two executor counts, interleaved, fresh JVMs
per run, under constant-load emulation (see scaling.py).

Usage: python BENCH/lc_probe.py [--docs 80000] [--runs 3] [--low 1x8] [--high 4x8]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "src"))
sys.path.insert(0, os.path.join(REPO, "BENCH"))

from scaling import equalize_load  # noqa: E402

RUN_SNIPPET = r"""
import os, sys, time
sys.path.insert(0, os.path.join(os.environ["REPO"], "src"))
from webextract.session import get_spark
from webextract.sparkjob import extract_df

master = os.environ["PROBE_MASTER"]
cores = int(os.environ["PROBE_CORES"])
spark = get_spark(app="lc-probe", master=master, shuffle_partitions=cores,
                  extra={"spark.sql.files.maxPartitionBytes": str(4*1024*1024)})
pages = spark.read.parquet(os.environ["PROBE_PARQUET"])
n = pages.count()
# warm-up: spin up workers on every executor; single-stage production plan
extract_df(pages.limit(cores * 128), repartition=False).write \
    .format("noop").mode("overwrite").save()
t0 = time.perf_counter()
extract_df(pages, repartition=False).write.format("noop") \
    .mode("overwrite").save()
dt = time.perf_counter() - t0
print(f"PROBE_RESULT {dt:.3f} {n}")
spark.stop()
"""


def parse_level(s: str) -> tuple[int, int]:
    e, c = s.split("x")
    return int(e), int(c)


def master_of(execs: int, cores: int, mem_mb: int = 4096) -> str:
    if execs == 0:  # plain local mode with `cores` threads
        return f"local[{cores}]"
    return f"local-cluster[{execs},{cores},{mem_mb}]"


def bench_once(execs: int, cores: int, parquet: str) -> tuple[float, int]:
    total_cores = cores if execs == 0 else execs * cores
    env = dict(os.environ, REPO=REPO,
               PROBE_MASTER=master_of(execs, cores),
               PROBE_CORES=str(total_cores),
               PROBE_PARQUET=parquet)
    with equalize_load(total_cores) as eq:
        out = subprocess.run([sys.executable, "-c", RUN_SNIPPET], env=env,
                             capture_output=True, text=True, timeout=1800,
                             check=True,
                             preexec_fn=eq.preexec)  # bound ALL executor JVMs
                                                     # + workers to the budget
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("PROBE_RESULT")][-1]
    _, dt, n = line.split()
    return float(dt), int(n)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=80_000)
    ap.add_argument("--scale", type=int, default=10)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--low", default="1x8")
    ap.add_argument("--high", default="4x8")
    args = ap.parse_args()

    sys.path.insert(0, REPO)
    from bench import corpus_parquet

    parquet = corpus_parquet(args.docs, content_scale=args.scale)
    lo, hi = parse_level(args.low), parse_level(args.high)
    t_lo, t_hi, rows = [], [], 0
    for r in range(args.runs):
        tl, rows = bench_once(*lo, parquet)
        th, _ = bench_once(*hi, parquet)
        t_lo.append(round(tl, 2))
        t_hi.append(round(th, 2))
        print(f"run {r}: low={tl:.2f}s high={th:.2f}s", file=sys.stderr)
    thr_lo = rows / min(t_lo)
    thr_hi = rows / min(t_hi)
    factor = (hi[0] * hi[1] or hi[1]) / (lo[0] * lo[1] or lo[1])
    eff = thr_hi / (factor * thr_lo)
    print(json.dumps({
        "low": {"level": args.low, "times": t_lo, "docs_per_sec": round(thr_lo, 1)},
        "high": {"level": args.high, "times": t_hi, "docs_per_sec": round(thr_hi, 1)},
        "factor": factor, "efficiency": round(eff, 3), "docs": rows,
    }))


if __name__ == "__main__":
    main()
