"""IVF at-rest layout: probing a cell-partitioned table must (a) give
identical results to the in-memory IVF computation and (b) prune the
scan to the probed partitions only (static partition pruning — the
100 TB path where unprobed cells are never read)."""

from pyspark.sql import functions as F


def test_ivf_at_rest_equals_inmemory_and_prunes(spark, tmp_path):
    from bleve_spark.functions.similarity import (
        ivf_topk,
        ivf_topk_at_rest,
        write_ivf_partitioned,
    )

    df = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).cache()
    qv = df.where(F.col("vec_id") == 0).select("embedding").first()[0]

    path = str(tmp_path / "ivf")
    write_ivf_partitioned(df, "embedding", path, cell_bits=6, seed=11)

    mem = ivf_topk(df, "embedding", "vec_id", qv, k=10,
                   cell_bits=6, n_probe_cells=16)
    rest = ivf_topk_at_rest(spark, path, "embedding", "vec_id", qv,
                            k=10, cell_bits=6, n_probe_cells=16)
    a = [(r["key"], round(r["cosine"], 9)) for r in mem.collect()]
    b = [(r["key"], round(r["cosine"], 9)) for r in rest.collect()]
    assert a == b and len(a) == 10

    # the probe must reach the scan as PartitionFilters: the physical
    # plan's parquet scan shows the cell IN (...) predicate pushed to
    # the partition column, i.e. unprobed cell directories are pruned
    plan = rest._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "cell" in plan.split("PartitionFilters", 1)[1][:400]
