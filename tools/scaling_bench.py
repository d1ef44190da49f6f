"""Two-cluster-size scaling evidence (north rule: efficiency ≥ 0.8).

Runs the identical index-build + query job at local[8] and local[32]
(the sandbox proxy for N and 4N executors — same code path as
spark-submit --py-files on a real cluster), computes throughput at
both and the scaling efficiency, and writes BENCH.md.

Usage: python tools/scaling_bench.py [turns] [sf_dir]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cpus: int, turns: int, sf_dir: str) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    env["BENCH_TURNS"] = str(turns)
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, env=env, timeout=3600,
    )
    lines = [l for l in p.stdout.strip().splitlines() if l.startswith("{")]
    if not lines:
        print(p.stdout[-3000:], p.stderr[-3000:])
        raise RuntimeError(f"bench at local[{cpus}] produced no JSON")
    return json.loads(lines[-1])


def main():
    turns = int(sys.argv[1]) if len(sys.argv) > 1 else 2000000
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    r8 = run(8, turns, sf_dir)
    r32 = run(32, turns, sf_dir)

    tps8 = r8["index_build"]["turns_per_sec"]
    tps32 = r32["index_build"]["turns_per_sec"]
    eff = tps32 / (4.0 * tps8)

    pps8 = r8["index_build"]["postings_per_sec"]
    pps32 = r32["index_build"]["postings_per_sec"]

    md = f"""# BENCH — throughput & two-parallelism scaling evidence

North rule: throughput scaling efficiency ≥ 0.8 from N to 4N
executors. Sandbox proxy (per driver instruction): the identical
index-build job — same code, same deterministic transcript corpus
({r8["index_build"]["turns"]:,} turns), same input — executed at
`local[8]` (N) and `local[32]` (4N) in separate JVMs.

| parallelism | build secs (warm) | turns/sec (warm) | cold secs | postings/sec |
|---|---|---|---|---|
| local[8]  | {r8["index_build"]["seconds"]} | {tps8:,.0f} | {r8["index_build"]["cold"]["seconds"]} | {pps8:,.0f} |
| local[32] | {r32["index_build"]["seconds"]} | {tps32:,.0f} | {r32["index_build"]["cold"]["seconds"]} | {pps32:,.0f} |

**Scaling efficiency (warm turns/sec): {tps32:,.0f} / (4 × {tps8:,.0f})
= {eff:.3f}** {"(≥ 0.8 ✓)" if eff >= 0.8 else "(< 0.8 ✗)"}

Warm vs cold: the cold run pays one-time Python-worker spin-up
(32 interpreter + numpy/pyarrow imports) — a fixed cost that is
amortized to nothing over a real 10^12-turn corpus, so warm
throughput is the steady-state number the rule cares about. Both are
reported.

Build shape: stage 1 is the shuffle-free file-per-segment build
(one columnar read + analyze + encode task per source file — the
reference's offline Builder batches documents by arrival order the
same way, /root/reference/index/scorch/builder.go:116-167).

Why this extrapolates to a real 1000-executor cluster at 10^12 turns:

* stage-1 build has ZERO cross-task traffic: each task streams one
  file from storage and writes one immutable segment; no shuffle, no
  driver-side per-term state — adding executors adds exactly their
  cores AND their memory bandwidth (on this single box all 32 cores
  share one memory controller, which is what the 8→32 curve bends on;
  a real 4N-executor cluster scales bandwidth 4× too);
* segment merging is log₁₀(#segments) shuffle rounds, each keyed by
  (segment-group, field, term) with optional chunk-band sub-keys that
  bound any single reducer's group regardless of term skew;
* query-time global stats are one tiny aggregate broadcast (the
  reference's PreSearchData), independent of cluster size;
* top-k is per-partition heap + driver k-merge
  (TakeOrderedAndProject), no global sort.

Single-box contention findings baked into the engine (session.py
`_WORKER_ALLOC_ENV`, measured at local[32]): PyArrow's bundled
jemalloc pool + CPython pymalloc arena churn caused mmap/munmap
page-fault storms across 32 workers (5-15× CPU inflation on identical
work); routing allocations through glibc malloc with trim/mmap
disabled removes it. Arrow's per-worker thread pool is pinned to 1
(Spark already runs one task per core).

Headline query suite ({r32["sf"]}): {r32["value"]}s total at
local[32] vs {r8["value"]}s at local[8].

Per-query seconds (local[32]):

```json
{json.dumps(r32["queries"], indent=2)}
```

Raw bench lines:

```json
{json.dumps(r8)}
{json.dumps(r32)}
```
"""
    with open(os.path.join(REPO, "BENCH.md"), "w") as f:
        f.write(md)
    print(md)
    print(f"scaling efficiency: {eff:.3f}")


if __name__ == "__main__":
    main()
