"""ANN recall floors on structured data.

The synthetic corpus embeddings are near-uniform random (top-1 cosine
≈ 0.33), where aggressive LSH/IVF pruning cannot retain recall — no
index can, the neighbors carry no signal. Recall guarantees only mean
something when near neighbors EXIST, so this test plants a cluster of
true neighbors (cosine ≈ 0.95) and asserts the pruned searchers
recover them. The algorithmic exactness of lsh/ivf is separately
hash-verified against SQL oracles in the driver contract."""

import numpy as np
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def planted(spark):
    rng = np.random.RandomState(123)
    dim, n_noise, n_planted = 64, 500, 10
    q = rng.standard_normal(dim)
    q /= np.linalg.norm(q)
    rows = []
    for i in range(n_noise):
        v = rng.standard_normal(dim)
        rows.append((i, [float(x) for x in v]))
    for j in range(n_planted):
        # E‖noise‖ ≈ 0.33 (unit q + scaled gaussian) → cosine ≈ 0.95
        v = q + (0.33 / np.sqrt(dim)) * rng.standard_normal(dim)
        rows.append((1000 + j, [float(x) for x in v]))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).cache()
    return df, q, {1000 + j for j in range(n_planted)}


def _recall(top_df, truth):
    got = {r["key"] for r in top_df.collect()}
    return len(got & truth) / len(truth)


def test_lsh_recall_on_planted(planted):
    from bleve_spark.functions.similarity import cosine_topk, lsh_topk

    df, q, truth = planted
    exact = cosine_topk(df, "embedding", "vec_id", q, k=10)
    assert _recall(exact, truth) == 1.0  # sanity: brute force is exact
    lsh = lsh_topk(df, "embedding", "vec_id", q, k=10,
                   planes=12, probe_hamming=3)
    assert _recall(lsh, truth) >= 0.9


def test_ivf_recall_on_planted(planted):
    from bleve_spark.functions.similarity import ivf_topk

    df, q, truth = planted
    ivf = ivf_topk(df, "embedding", "vec_id", q, k=10,
                   cell_bits=6, n_probe_cells=16)
    assert _recall(ivf, truth) >= 0.8


def test_lsh_prunes_scan(planted):
    """The point of LSH: the candidate set must be a small fraction
    of the table (here ≤ 60% even with generous multi-probe)."""
    from bleve_spark.functions.similarity import (
        _planes,
        signature_col,
    )

    df, q, _ = planted
    mat = _planes(64, 12, seed=7)
    qsig = 0
    for i, plane in enumerate(mat):
        if float(plane @ np.asarray(q, dtype=np.float64)) > 0:
            qsig |= 1 << i
    with_sig = df.withColumn("b", signature_col("embedding", mat))
    ham = F.bit_count(F.col("b").bitwiseXOR(F.lit(qsig).cast("long")))
    surv = with_sig.where(ham <= 3).count()
    assert surv < 0.6 * df.count()
