"""SearchRequest.KNN served from an ATTACHED at-rest ANN layout
(search/hybrid.attach_ann) — the reference serves KNN from the
per-segment faiss index (search_knn.go:389). The attached path must
(a) reproduce the brute-force leg exactly (candidate generation +
exact re-rank, never a score change), (b) prune the probe IO
(partition-pruned cells for IVF), and (c) fall back to brute force
for metrics the cosine-ranked layouts can't serve."""

import copy

import pytest
from pyspark.sql import functions as F

from bleve_spark.search.hybrid import attach_ann, knn_request_df

SFDIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def knn_idx(spark):
    from bleve_spark.index.mapping import IndexMapping, index_with_mapping

    df = spark.read.parquet(f"{SFDIR}/embeddings.parquet").select(
        "vec_id", "embedding",
        F.concat(F.lit("v"), (F.col("vec_id") % 5).cast("string"))
        .alias("tag"),
    )
    im = IndexMapping.from_dict({
        "default_mapping": {"dynamic": False, "properties": {
            "tag": {"fields": [
                {"type": "text", "analyzer": "keyword"}]},
            "embedding": {"fields": [
                {"type": "vector", "dims": 64,
                 "similarity": "dot_product"}]},
        }},
        "scoring_model": "bm25",
    })
    return index_with_mapping(df, ["vec_id"], im, persist=True)


def _page(idx, qv, **kw):
    return [
        (r["vec_id"], round(float(r["score"]), 6))
        for r in knn_request_df(
            idx,
            [{"field": "embedding", "vector": qv, "k": 10,
              "boost": 2.0}],
            q={"field": "tag", "term": "v3"},
            size=10, **kw,
        ).collect()
    ]


def test_attached_layouts_match_brute_force(spark, knn_idx, tmp_path):
    from bleve_spark.functions.hnsw import write_hnsw_partitioned
    from bleve_spark.functions.similarity import write_ivf_partitioned

    df = spark.read.parquet(f"{SFDIR}/embeddings.parquet")
    qv = df.where(F.col("vec_id") == 0).select("embedding").first()[0]
    n = df.count()
    brute = _page(knn_idx, qv)
    assert len(brute) == 10

    hpath = str(tmp_path / "hnsw")
    write_hnsw_partitioned(df, "embedding", "vec_id", hpath,
                           n_segments=4)
    h_idx = attach_ann(copy.copy(knn_idx), "embedding", "hnsw", hpath,
                       key_col="vec_id", ef=int(n), oversample=3)
    assert _page(h_idx, qv) == brute

    ipath = str(tmp_path / "ivf")
    write_ivf_partitioned(df, "embedding", ipath, cell_bits=4, seed=11)
    i_idx = attach_ann(copy.copy(knn_idx), "embedding", "ivf", ipath,
                       key_col="vec_id", vec_col="embedding",
                       cell_bits=4, n_probe_cells=16, oversample=3)
    # n_probe_cells = all cells → exact probe → identical page
    assert _page(i_idx, qv) == brute
    # the original index is untouched (per-object attach)
    assert not getattr(knn_idx, "ann_layouts", None)


def test_ivf_attached_probe_prunes_partitions(spark, knn_idx, tmp_path):
    from bleve_spark.functions.similarity import write_ivf_partitioned
    from bleve_spark.search.hybrid import _ann_candidate_keys

    df = spark.read.parquet(f"{SFDIR}/embeddings.parquet")
    qv = df.where(F.col("vec_id") == 0).select("embedding").first()[0]
    ipath = str(tmp_path / "ivf")
    write_ivf_partitioned(df, "embedding", ipath, cell_bits=4, seed=11)
    idx = attach_ann(copy.copy(knn_idx), "embedding", "ivf", ipath,
                     key_col="vec_id", vec_col="embedding",
                     cell_bits=4, n_probe_cells=4)
    cand = _ann_candidate_keys(
        idx, "embedding", idx.ann_layouts["embedding"], qv, 10
    )
    plan = cand._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "cell" in plan.split("PartitionFilters", 1)[1][:400]


def test_non_cosine_metric_keeps_brute_force(spark, knn_idx, tmp_path):
    """l2_norm ranking is not cosine ranking — an attached cosine
    layout must NOT serve it (silent recall loss otherwise)."""
    from bleve_spark.functions.similarity import write_ivf_partitioned

    df = spark.read.parquet(f"{SFDIR}/embeddings.parquet")
    qv = df.where(F.col("vec_id") == 0).select("embedding").first()[0]
    ipath = str(tmp_path / "ivf")
    write_ivf_partitioned(df, "embedding", ipath, cell_bits=4, seed=11)
    idx = attach_ann(copy.copy(knn_idx), "embedding", "ivf", ipath,
                     key_col="vec_id", vec_col="embedding",
                     cell_bits=4, n_probe_cells=1)  # 1 cell: lossy
    page_l2 = [
        (r["vec_id"], round(float(r["score"]), 6))
        for r in knn_request_df(
            idx,
            [{"field": "embedding", "vector": qv, "k": 10,
              "similarity": "l2_norm"}],
            size=10,
        ).collect()
    ]
    brute_l2 = [
        (r["vec_id"], round(float(r["score"]), 6))
        for r in knn_request_df(
            knn_idx,
            [{"field": "embedding", "vector": qv, "k": 10,
              "similarity": "l2_norm"}],
            size=10,
        ).collect()
    ]
    assert page_l2 == brute_l2
