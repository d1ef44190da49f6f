"""Similarity search over embedding columns (array<float>).

* :func:`cosine_topk` — brute-force exact cosine top-k, fully native
  (zip_with + aggregate → whole-stage codegen; one pass, one
  TakeOrderedAndProject). The correctness baseline.
* :func:`lsh_topk` — random-hyperplane LSH with multi-probe: prune to
  buckets within hamming ≤ probe_hamming of the query signature, then
  exact cosine on the survivors. The 100 TB path: the scan is cut by
  ~2^planes/Σprobes and the plan stays a filter + top-k (no shuffle).
* :func:`ivf_topk` — IVF-style: coarse cells from seeded hyperplane
  signs (training-free quantizer), cell stats precomputable; probing =
  partition-prunable equality filter on the cell id when the table is
  written partitioned/bucketed by ``cell``.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Column, DataFrame, functions as F


def cosine_expr(a: Column, b: Column) -> Column:
    """Exact cosine via native higher-order functions (JVM-side)."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(
        F.aggregate(
            a, F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )
    nb = F.sqrt(
        F.aggregate(
            b, F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )
    return dot / (na * nb)


def _query_lit(query_vec) -> Column:
    return F.array(*[F.lit(float(x)) for x in query_vec])


def cosine_topk(
    df: DataFrame, vec_col: str, key_col: str, query_vec, k: int = 10
) -> DataFrame:
    """Brute-force exact top-k: (key, cosine) ordered desc, key asc."""
    cos = cosine_expr(F.col(vec_col), _query_lit(query_vec))
    return (
        df.select(F.col(key_col).alias("key"), cos.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("key").asc())
        .limit(k)
    )


def _planes(dim: int, planes: int, seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((planes, dim))


def signature_col(vec_col: str, planes_mat: np.ndarray) -> Column:
    """Sign-bit signature of a vector against fixed hyperplanes —
    built from native dot products (no UDF)."""
    sig = F.lit(0).cast("long")
    for i, plane in enumerate(planes_mat):
        dot = F.lit(0.0)
        # plane is dense & short (≤ 64 dims typical embeddings are
        # larger — use aggregate over zip_with against a literal array)
        dot = F.aggregate(
            F.zip_with(
                F.col(vec_col),
                F.array(*[F.lit(float(x)) for x in plane]),
                lambda x, y: x.cast("double") * y,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        sig = sig + F.when(dot > 0, F.lit(1 << i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return sig


def add_hyperplane_bucket(
    df: DataFrame, vec_col: str, planes: int = 16, seed: int = 7
) -> DataFrame:
    dim = len(df.select(vec_col).first()[0])
    mat = _planes(dim, planes, seed)
    return df.withColumn("bucket", signature_col(vec_col, mat))


def lsh_topk(
    df: DataFrame,
    vec_col: str,
    key_col: str,
    query_vec,
    k: int = 10,
    planes: int = 12,
    probe_hamming: int = 2,
    seed: int = 7,
) -> DataFrame:
    """Approximate top-k: prune to buckets near the query signature,
    exact cosine on survivors. Recall grows with probe_hamming."""
    q = np.asarray(query_vec, dtype=np.float64)
    mat = _planes(len(q), planes, seed)
    qsig = 0
    for i, plane in enumerate(mat):
        if float(plane @ q) > 0:
            qsig |= 1 << i
    with_sig = df.withColumn("bucket", signature_col(vec_col, mat))
    ham = F.bit_count(
        F.col("bucket").bitwiseXOR(F.lit(qsig).cast("long"))
    )
    pruned = with_sig.where(ham <= probe_hamming)
    cos = cosine_expr(F.col(vec_col), _query_lit(q))
    return (
        pruned.select(F.col(key_col).alias("key"), cos.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("key").asc())
        .limit(k)
    )


def ivf_topk(
    df: DataFrame,
    vec_col: str,
    key_col: str,
    query_vec,
    k: int = 10,
    cell_bits: int = 8,
    n_probe_cells: int = 8,
    seed: int = 11,
) -> DataFrame:
    """IVF-flavored ANN: training-free coarse cells (hyperplane signs),
    probe the n nearest cells by signature hamming distance.

    At rest, write the table PARTITIONED BY (cell) — the probe becomes
    static partition pruning and only n_probe/2^bits of the data is
    read."""
    q = np.asarray(query_vec, dtype=np.float64)
    mat = _planes(len(q), cell_bits, seed)
    qsig = 0
    for i, plane in enumerate(mat):
        if float(plane @ q) > 0:
            qsig |= 1 << i
    # n_probe cells with smallest hamming distance to query cell
    cells = sorted(
        range(1 << cell_bits),
        key=lambda c: (bin(c ^ qsig).count("1"), c),
    )[:n_probe_cells]
    with_cell = df.withColumn("cell", signature_col(vec_col, mat))
    pruned = with_cell.where(F.col("cell").isin(cells))
    cos = cosine_expr(F.col(vec_col), _query_lit(q))
    return (
        pruned.select(F.col(key_col).alias("key"), cos.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("key").asc())
        .limit(k)
    )


def _probe_buckets(qsig: int, planes: int, probe_hamming: int) -> list:
    """All signatures within hamming ≤ probe_hamming of qsig —
    Σ C(planes, i) values, enumerated driver-side (a few hundred for
    typical planes/probe settings)."""
    from itertools import combinations

    out = []
    for h in range(probe_hamming + 1):
        for bits in combinations(range(planes), h):
            m = qsig
            for b in bits:
                m ^= 1 << b
            out.append(m)
    return sorted(out)


def write_lsh_signed(
    df: DataFrame,
    vec_col: str,
    path: str,
    planes: int = 12,
    seed: int = 7,
) -> None:
    """Materialize the LSH layout: the table with a PERSISTED
    ``bucket`` signature column, clustered by bucket so parquet
    min/max stats are tight. Probes then filter on the stored column
    — a pushed-down ``bucket IN (...)`` — instead of recomputing
    ``planes`` dot products per row per query. The signature is paid
    ONCE at write time (the 100 TB pattern: index-time work amortized
    over every query)."""
    dim = len(df.select(vec_col).first()[0])
    mat = _planes(dim, planes, seed)
    (
        df.withColumn("bucket", signature_col(vec_col, mat))
        .sortWithinPartitions("bucket")
        .write.mode("overwrite")
        .parquet(path)
    )


def lsh_topk_at_rest(
    spark,
    path: str,
    vec_col: str,
    key_col: str,
    query_vec,
    k: int = 10,
    planes: int = 12,
    probe_hamming: int = 2,
    seed: int = 7,
) -> DataFrame:
    """Probe a :func:`write_lsh_signed` layout: the probe set (all
    buckets within hamming ≤ probe_hamming) becomes an explicit
    ``bucket IN (...)`` predicate on the STORED column — pushed to the
    parquet scan (row-group stats pruning), no per-row signature
    recomputation. Scores are identical to :func:`lsh_topk`."""
    q = np.asarray(query_vec, dtype=np.float64)
    mat = _planes(len(q), planes, seed)
    qsig = 0
    for i, plane in enumerate(mat):
        if float(plane @ q) > 0:
            qsig |= 1 << i
    probes = _probe_buckets(qsig, planes, probe_hamming)
    pruned = spark.read.parquet(path).where(F.col("bucket").isin(probes))
    cos = cosine_expr(F.col(vec_col), _query_lit(q))
    return (
        pruned.select(F.col(key_col).alias("key"), cos.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("key").asc())
        .limit(k)
    )


def write_ivf_partitioned(
    df: DataFrame,
    vec_col: str,
    path: str,
    cell_bits: int = 8,
    seed: int = 11,
) -> None:
    """Materialize the IVF layout: the table written PARTITIONED BY
    (cell). Probing then reads only n_probe/2^bits of the data via
    STATIC partition pruning — the 100 TB ANN path (each cell
    directory is an independent scan unit; on a cluster, cells map to
    file groups and the probe never touches unprobed files)."""
    dim = len(df.select(vec_col).first()[0])
    mat = _planes(dim, cell_bits, seed)
    (
        df.withColumn("cell", signature_col(vec_col, mat))
        .write.partitionBy("cell")
        .mode("overwrite")
        .parquet(path)
    )


def ivf_topk_at_rest(
    spark,
    path: str,
    vec_col: str,
    key_col: str,
    query_vec,
    k: int = 10,
    cell_bits: int = 8,
    n_probe_cells: int = 8,
    seed: int = 11,
) -> DataFrame:
    """Probe an IVF-partitioned table: the `cell IN (...)` predicate
    on the partition column becomes PartitionFilters in the parquet
    scan — only the probed cells' files are read."""
    q = np.asarray(query_vec, dtype=np.float64)
    mat = _planes(len(q), cell_bits, seed)
    qsig = 0
    for i, plane in enumerate(mat):
        if float(plane @ q) > 0:
            qsig |= 1 << i
    cells = sorted(
        range(1 << cell_bits),
        key=lambda c: (bin(c ^ qsig).count("1"), c),
    )[:n_probe_cells]
    pruned = spark.read.parquet(path).where(F.col("cell").isin(cells))
    cos = cosine_expr(F.col(vec_col), _query_lit(q))
    return (
        pruned.select(F.col(key_col).alias("key"), cos.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("key").asc())
        .limit(k)
    )


def pairwise_cosine_topk_pandas(
    df: DataFrame,
    vec_col: str,
    key_col: str,
    query_vecs: np.ndarray,
    k: int = 10,
) -> DataFrame:
    """Batched many-query brute force as a vectorized Arrow stage:
    one matmul per Arrow batch (numpy BLAS), partial top-k per
    partition, global top-k per query via one small shuffle."""
    import pandas as pd

    qm = np.asarray(query_vecs, dtype=np.float32)
    qn = qm / np.linalg.norm(qm, axis=1, keepdims=True)
    nq = qn.shape[0]

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            vm = np.stack(pdf[vec_col].values).astype(np.float32)
            vm = vm / np.linalg.norm(vm, axis=1, keepdims=True)
            sims = vm @ qn.T  # (rows, nq)
            for qi in range(nq):
                s = sims[:, qi]
                top = np.argsort(-s)[:k]
                yield pd.DataFrame(
                    {
                        "query_id": qi,
                        "key": pdf[key_col].values[top],
                        "cosine": s[top].astype(np.float64),
                    }
                )

    partial = df.select(key_col, vec_col).mapInPandas(
        score, schema=f"query_id int, key long, cosine double"
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("query_id")
        .orderBy(F.col("cosine").desc(), F.col("key").asc())
    )
    return (
        partial.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .drop("rn")
    )
