"""The driver-contract ANN entries must exercise the AT-REST layouts:
ann_ivf_topk through real partition pruning (PartitionFilters on the
cell directory column), ann_lsh_topk through a pushed-down filter on
the STORED signature column — and both must return exactly what the
scan-bound variants return (same oracle)."""

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as E
from bleve_spark.functions.similarity import ivf_topk, lsh_topk

SF = "/root/testdata/sf0.001"


def _rows(df):
    return [(r["key"], r["cosine"]) for r in df.collect()]


@pytest.fixture(scope="module")
def qv(spark):
    df = spark.read.parquet(f"{SF}/embeddings.parquet")
    return df.where(F.col("vec_id") == 0).select("embedding").first()[0]


def test_ivf_gate_entry_partition_pruned(spark, qv):
    out = E.queries()["ann_ivf_topk"](spark, SF)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    seg = plan.split("PartitionFilters")[1][:300]
    assert "cell" in seg and "IN" in seg.upper(), seg

    # identical to the in-memory scan variant (same cells, same cosine)
    df = spark.read.parquet(f"{SF}/embeddings.parquet")
    want = ivf_topk(
        df, "embedding", "vec_id", qv, k=10, cell_bits=6,
        n_probe_cells=16,
    ).select("key", F.round("cosine", 6).alias("cosine"))
    assert _rows(out) == _rows(want)


def test_lsh_gate_entry_stored_signature_pushed(spark, qv):
    out = E.queries()["ann_lsh_topk"](spark, SF)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    seg = plan.split("PushedFilters")[1][:400]
    assert "bucket" in seg, seg
    # the probe must NOT recompute the signature at scan time — no
    # aggregate over the embedding column on the probe side's filter
    filter_side = plan.split("PushedFilters")[0]
    assert "bucket IN" in filter_side or "bucket#" in filter_side

    df = spark.read.parquet(f"{SF}/embeddings.parquet")
    want = lsh_topk(
        df, "embedding", "vec_id", qv, k=10, planes=12, probe_hamming=3,
    ).select("key", F.round("cosine", 6).alias("cosine"))
    assert _rows(out) == _rows(want)
