"""Per-segment HNSW graph ANN: recall floor, determinism, sharded
probe pruning. Same planted-neighbor design as test_ann_recall.py —
recall only means something when near neighbors exist."""

import numpy as np
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def planted(spark):
    rng = np.random.RandomState(321)
    dim, n_noise, n_planted = 64, 600, 10
    q = rng.standard_normal(dim)
    q /= np.linalg.norm(q)
    rows = []
    for i in range(n_noise):
        v = rng.standard_normal(dim)
        rows.append((i, [float(x) for x in v]))
    for j in range(n_planted):
        v = q + (0.33 / np.sqrt(dim)) * rng.standard_normal(dim)
        rows.append((1000 + j, [float(x) for x in v]))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).cache()
    return df, q, {1000 + j for j in range(n_planted)}


@pytest.fixture(scope="module")
def hnsw_root(spark, planted, tmp_path_factory):
    from bleve_spark.functions.hnsw import write_hnsw_partitioned

    df, _, _ = planted
    root = str(tmp_path_factory.mktemp("hnsw") / "idx")
    write_hnsw_partitioned(
        df, "embedding", "vec_id", root, n_segments=4, m=8,
        ef_construction=64,
    )
    return root


def test_hnsw_recall_on_planted(spark, planted, hnsw_root):
    from bleve_spark.functions.hnsw import hnsw_topk_at_rest

    _, q, truth = planted
    top = hnsw_topk_at_rest(
        spark, hnsw_root, "vec_id", q, k=10, ef=64
    ).collect()
    got = {r["vec_id"] for r in top}
    assert len(got & truth) / len(truth) >= 0.9
    # cosine of a planted hit must reflect the planting (~0.95)
    assert max(r["cosine"] for r in top) > 0.9


def test_hnsw_matches_bruteforce_order(spark, planted, hnsw_root):
    """With ef well above k on a small corpus, the graph search must
    return the exact brute-force top-k (same keys, same leading
    cosines) — HNSW is exact in the high-ef limit."""
    from bleve_spark.functions.hnsw import hnsw_topk_at_rest
    from bleve_spark.functions.similarity import cosine_topk

    df, q, _ = planted
    exact = cosine_topk(df, "embedding", "vec_id", q, k=10).collect()
    approx = hnsw_topk_at_rest(
        spark, hnsw_root, "vec_id", q, k=10, ef=200
    ).collect()
    assert [r["vec_id"] for r in approx] == [r["key"] for r in exact]
    # beam sims are float32 (normalized-vector dot): equal to the
    # double cosine to ~1e-6; the gate's exact re-rank restores
    # oracle-grade doubles
    for a, e in zip(approx, exact):
        assert abs(a["cosine"] - e["cosine"]) < 5e-5


def test_hnsw_build_deterministic(spark, planted, tmp_path):
    """Two builds of the same data produce identical adjacency —
    seeded layer assignment over sorted-key node order."""
    from bleve_spark.functions.hnsw import write_hnsw_partitioned

    df, _, _ = planted
    roots = [str(tmp_path / f"idx{i}") for i in (0, 1)]
    for r in roots:
        write_hnsw_partitioned(
            df, "embedding", "vec_id", r, n_segments=4, m=8,
            ef_construction=64,
        )
    def graph_set(root):
        return {
            (r["segment"], r["node_id"], r["level"],
             tuple(r["neighbors"]))
            for r in spark.read.parquet(root + "/graph").collect()
        }
    assert graph_set(roots[0]) == graph_set(roots[1])


def test_hnsw_segment_probe_prunes(spark, planted, hnsw_root):
    """Restricting the probe to a segment subset must only return
    keys from those segments (partition predicate prunes the rest)."""
    from bleve_spark.functions.hnsw import hnsw_topk_at_rest

    _, q, _ = planted
    segs = {
        r["segment"]: r["cnt"]
        for r in spark.read.parquet(hnsw_root + "/vectors")
        .groupBy("segment").agg(F.count("*").alias("cnt")).collect()
    }
    assert set(segs) == {0, 1, 2, 3}
    pick = [0, 2]
    allowed = {
        r["vec_id"]
        for r in spark.read.parquet(hnsw_root + "/vectors")
        .where(F.col("segment").isin(pick)).select("vec_id").collect()
    }
    top = hnsw_topk_at_rest(
        spark, hnsw_root, "vec_id", q, k=10, ef=64, segments=pick
    ).collect()
    assert top and {r["vec_id"] for r in top} <= allowed


def test_hnsw_batch_matches_single(spark, planted, hnsw_root):
    """The batched probe must agree per-query with the single-query
    probe (same keys in the same order)."""
    from bleve_spark.functions.hnsw import (
        hnsw_topk_at_rest, hnsw_topk_batch,
    )

    df, q, _ = planted
    q2 = np.asarray(
        df.where(F.col("vec_id") == 3).first()["embedding"],
        dtype=np.float64,
    )
    batch = hnsw_topk_batch(
        spark, hnsw_root, "vec_id", [q, q2], k=5, ef=64
    ).collect()
    by_q = {}
    for r in sorted(batch, key=lambda r: -r["cosine"]):
        by_q.setdefault(r["query_idx"], []).append(r["vec_id"])
    for qi, qv in ((0, q), (1, q2)):
        single = [
            r["vec_id"]
            for r in hnsw_topk_at_rest(
                spark, hnsw_root, "vec_id", qv, k=5, ef=64
            ).collect()
        ]
        assert by_q[qi] == single
