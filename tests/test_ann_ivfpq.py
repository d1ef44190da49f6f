"""IVF-PQ at-rest layout: codes-only partition-pruned probe + ADC +
exact re-rank. Verifies (a) a planted-neighbor recall floor for the
ADC path, (b) refine=None re-ranks every probed row and matches the
flat IVF probe exactly, and (c) the codes layout is materially
smaller on disk than the flat vector layout — the probe-bytes claim.

PQ reference: Jégou/Douze/Schmid TPAMI 2011; the reference engine's
go-faiss IVF,PQ indexes (document/field_vector.go) are the parity
target."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def planted(spark):
    rng = np.random.RandomState(123)
    dim, n_noise, n_planted = 64, 2000, 10
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


def _recall(top_df, truth):
    got = {r["key"] for r in top_df.collect()}
    return len(got & truth) / len(truth)


@pytest.fixture(scope="module")
def layout(spark, planted, tmp_path_factory):
    from bleve_spark.functions.similarity import write_ivfpq_partitioned

    df, _, _ = planted
    path = str(tmp_path_factory.mktemp("ivfpq") / "layout")
    write_ivfpq_partitioned(
        df, "embedding", "vec_id", path, cell_bits=6, m=8, nbits=8,
        train_sample=256,
    )
    return path


def test_ivfpq_adc_recall_on_planted(spark, planted, layout):
    from bleve_spark.functions.similarity import ivfpq_topk_at_rest

    df, q, truth = planted
    top = ivfpq_topk_at_rest(
        spark, layout, df, "embedding", "vec_id", q, k=10,
        n_probe_cells=16, refine=4,
    )
    assert _recall(top, truth) >= 0.8


def test_ivfpq_full_refine_matches_flat_ivf(spark, planted, layout,
                                            tmp_path):
    """refine=None: exact cosine over every probed row — identical
    result set to the flat IVF probe with the same planes/cells."""
    from bleve_spark.functions.similarity import (
        ivf_topk_at_rest,
        ivfpq_topk_at_rest,
        write_ivf_partitioned,
    )

    df, q, _ = planted
    flat = str(tmp_path / "flat")
    write_ivf_partitioned(df, "embedding", flat, cell_bits=6, seed=11)
    want = [
        (r["key"], round(r["cosine"], 6))
        for r in ivf_topk_at_rest(
            spark, flat, "embedding", "vec_id", q, k=10,
            cell_bits=6, n_probe_cells=16,
        ).collect()
    ]
    got = [
        (r["key"], round(r["cosine"], 6))
        for r in ivfpq_topk_at_rest(
            spark, layout, df, "embedding", "vec_id", q, k=10,
            n_probe_cells=16, refine=None,
        ).collect()
    ]
    assert got == want and len(got) == 10


def test_ivfpq_codes_layout_smaller(spark, planted, layout, tmp_path):
    """The probe-bytes claim: M=8 code bytes per vector vs 64 float32
    — the codes layout must be materially smaller than the flat
    vector layout (parquet overhead eats some of the 32×)."""
    from bleve_spark.functions.similarity import write_ivf_partitioned

    df, _, _ = planted
    flat = str(tmp_path / "flat2")
    write_ivf_partitioned(df, "embedding", flat, cell_bits=6, seed=11)

    def _sz(root):
        tot = 0
        for dp, _, fns in os.walk(root):
            for fn in fns:
                if fn.endswith(".parquet"):
                    tot += os.path.getsize(os.path.join(dp, fn))
        return tot

    assert _sz(layout) < _sz(flat) / 3


def test_ivfpq_deterministic_codebook(spark, planted, tmp_path):
    from bleve_spark.functions.similarity import train_pq_codebook

    df, _, _ = planted
    a = train_pq_codebook(df, "embedding", "vec_id", m=8, nbits=4,
                          train_sample=200)
    b = train_pq_codebook(df, "embedding", "vec_id", m=8, nbits=4,
                          train_sample=200)
    assert np.array_equal(a, b) and a.shape == (8, 16, 8)
