"""Benchmark harness — one JSON line for the round driver.

Measures (1) inverted-index build throughput in turns/sec over the
deterministic synthetic transcript corpus (the north-rule metric), and
(2) the headline query suite over the sf documents/embeddings tables.

Env knobs:
  SPARK_GRAFT_SF_DIR   parquet dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     local[] parallelism (default 32)
  BENCH_TURNS          approx transcript turns to index (default 200000)
  BENCH_JSON_EXTRA     if set, merged into the output dict (used by the
                       scaling harness to tag runs)

Output: ONE json line
  {"metric": ..., "value": <total query secs>, "unit": "sec",
   "queries": {name: secs, ...}, "sf": ..., "index_build": {...}}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_turns_target = int(os.environ.get("BENCH_TURNS", "200000"))

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from bleve_spark.corpus import transcripts_df
    from bleve_spark.index.segments import build_segments
    from bleve_spark.session import get_spark

    import __spark_entry__ as E

    spark = get_spark("bleve-spark-bench", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}

    # ---- index-build throughput (turns/sec) ----
    # avg 16.5 turns/conv → conv count for the target turn volume
    n_convs = max(64, int(n_turns_target / 16.5))
    corpus_dir = tempfile.mkdtemp(prefix="bench_corpus_")
    seg_root = tempfile.mkdtemp(prefix="bench_segs_") + "/idx"
    try:
        transcripts_df(spark, n_convs, parts=cpus * 2).write.mode(
            "overwrite"
        ).parquet(corpus_dir)
        src = spark.read.parquet(corpus_dir)
        n_turns = src.count()

        t0 = time.time()
        stats = build_segments(
            src,
            ["conv_id", "turn_idx"],
            {"text": "standard"},
            seg_root,
            n_segments=cpus * 2,
            resume=False,
        )
        build_secs = time.time() - t0
        turns_per_sec = n_turns / build_secs
        total_postings = sum(s["postings"] for s in stats)
        index_build = {
            "turns": int(n_turns),
            "seconds": round(build_secs, 3),
            "turns_per_sec": round(turns_per_sec, 1),
            "postings": int(total_postings),
            "postings_per_sec": round(total_postings / build_secs, 1),
            "segments": len(stats),
            "cpus": cpus,
        }
    finally:
        shutil.rmtree(corpus_dir, ignore_errors=True)
        shutil.rmtree(os.path.dirname(seg_root), ignore_errors=True)

    # ---- headline query suite over the sf tables ----
    suite = [
        "q_term_bm25", "q_match_or", "q_match_and", "q_phrase",
        "q_boolean", "q_disjunction_min2", "q_fuzzy", "q_prefix",
        "q_numeric_range", "q_query_string", "q_facet_lang",
        "dedup_exact", "dedup_minhash_pairs", "ann_cosine_topk",
        "text_profile",
    ]
    qs = E.queries()
    # warm the index caches once (build cost isn't a per-query cost;
    # it's reported separately above)
    E._docs_index(spark, sf_dir).postings.count()

    total = 0.0
    for name in suite:
        t0 = time.time()
        qs[name](spark, sf_dir).collect()
        dt = time.time() - t0
        timings[name] = round(dt, 3)
        total += dt

    out = {
        "metric": (
            "index-build turns/sec + headline query suite seconds "
            "(bleve-parity BM25 engine)"
        ),
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir.rstrip("/").split("/")[-1],
        "index_build": index_build,
    }
    extra = os.environ.get("BENCH_JSON_EXTRA")
    if extra:
        out.update(json.loads(extra))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
