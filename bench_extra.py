"""Extra benchmarks for the optimization round (guide §1): per-query
noop-sink isolation, Spark job/stage counts via the UI REST API, and
plan capture. bench.py is FROZEN; this file carries the
measurement-only extras cited in OPTIMIZATION_r07.md.

Usage:
  python bench_extra.py [--queries a,b,c] [--plans-dir plans/r07] \
      [--suffix _before] [--runs 3]

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


SUITE = [
    "q_term_bm25", "q_match_or", "q_match_and", "q_phrase",
    "q_boolean", "q_disjunction_min2", "q_fuzzy", "q_prefix",
    "q_numeric_range", "q_query_string", "q_facet_lang",
    "dedup_exact", "dedup_minhash_pairs", "ann_cosine_topk",
    "text_profile",
    "q_prefix_dist", "q_geo_shape_intersects", "q_hybrid_filtered",
]


def _group_stats(sc, group):
    """(jobs, stages, tasks) recorded for a job group (UI is off, so
    the StatusTracker is the source)."""
    tr = sc.statusTracker()
    jobs = tr.getJobIdsForGroup(group)
    stages = 0
    tasks = 0
    for j in jobs:
        ji = tr.getJobInfo(j)
        if ji is None:
            continue
        for s in ji.stageIds:
            si = tr.getStageInfo(s)
            if si is not None:
                stages += 1
                tasks += si.numTasks
    return len(jobs), stages, tasks


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default="")
    ap.add_argument("--plans-dir", default="")
    ap.add_argument("--suffix", default="_before")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--json-out", default="")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from bleve_spark.session import get_spark

    import __spark_entry__ as E

    spark = get_spark("bleve-spark-bench-extra", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")

    names = [s for s in args.queries.split(",") if s] or SUITE
    qs = E.queries()
    E._docs_index(spark, sf_dir).postings.count()

    out = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        # plan capture (first build, uncached plan)
        if args.plans_dir:
            os.makedirs(args.plans_dir, exist_ok=True)
            df = qs[name](spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution
                .ExplainMode.fromString("formatted")
            )
            with open(os.path.join(
                    args.plans_dir, f"{name}{args.suffix}.txt"), "w") as f:
                f.write(plan)
        runs = []
        job_counts = []
        sc = spark.sparkContext
        for i in range(args.runs):
            group = f"bx_{name}_{i}"
            sc.setJobGroup(group, name)
            t0 = time.time()
            qs[name](spark, sf_dir).collect()
            dt = time.time() - t0
            sc.setJobGroup(None, None)
            njobs, stages, tasks = _group_stats(sc, group)
            runs.append(round(dt, 3))
            job_counts.append(njobs)
            if i == args.runs - 1:
                out[name] = {
                    "runs": runs,
                    "best": min(runs),
                    "jobs": job_counts,
                    "stages_last": stages,
                    "tasks_last": tasks,
                }
        spark.sparkContext.setJobDescription(None)
        print(f"{name:26s} best={min(runs):7.3f} runs={runs} "
              f"jobs={job_counts} stages={out[name]['stages_last']} "
              f"tasks={out[name]['tasks_last']}", flush=True)
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
