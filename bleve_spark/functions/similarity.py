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


# ------------------------------------------------------------- IVF-PQ --
# Product quantization on top of the IVF cell layout — the at-rest
# substitute for the reference's go-faiss IVF,PQ vector indexes
# (/root/reference/document/field_vector.go, mapping_vector.go; go.mod
# go-faiss). Jégou/Douze/Schmid "Product Quantization for Nearest
# Neighbor Search" (TPAMI 2011): split vectors into M subvectors,
# k-means each subspace to 2^nbits centroids, store each vector as M
# code bytes, score queries against codes via an asymmetric-distance
# lookup table (ADC). One GLOBAL codebook trained on a seeded sample
# (FAISS IndexIVFPQ with by_residual=false — the hyperplane cells have
# no centroids to form residuals against), deterministic end-to-end.


def _kmeans_1sub(x: np.ndarray, k: int, seed: int,
                 iters: int = 15) -> np.ndarray:
    """Deterministic Lloyd k-means for one PQ subspace (sample is
    driver-sized by construction; empty clusters keep their previous
    centroid so the codebook shape is stable)."""
    rng = np.random.RandomState(seed)
    n = len(x)
    init = rng.choice(n, size=min(k, n), replace=False)
    cents = x[init].copy()
    if len(cents) < k:  # tiny sample: pad by repeating (codes unused)
        cents = np.vstack([cents, cents[rng.choice(len(cents),
                                                   k - len(cents))]])
    for _ in range(iters):
        # (n, k) squared distances via ||x||² - 2x·c + ||c||²
        d = (
            (x * x).sum(1)[:, None]
            - 2.0 * (x @ cents.T)
            + (cents * cents).sum(1)[None, :]
        )
        assign = d.argmin(1)
        for j in range(k):
            m = assign == j
            if m.any():
                cents[j] = x[m].mean(0)
    return cents


def train_pq_codebook(
    df: DataFrame, vec_col: str, key_col: str,
    m: int = 8, nbits: int = 8, train_sample: int = 4096,
    seed: int = 13,
) -> np.ndarray:
    """(m, 2^nbits, dim//m) codebook from a DETERMINISTIC sample (the
    ``train_sample`` smallest keys — reproducible across runs and
    cluster sizes, unlike RDD sampling)."""
    rows = (
        df.select(key_col, vec_col)
        .orderBy(F.col(key_col).asc())
        .limit(train_sample)
        .collect()
    )
    x = np.asarray([r[1] for r in rows], dtype=np.float64)
    dim = x.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    k = 1 << nbits
    return np.stack([
        _kmeans_1sub(
            np.ascontiguousarray(x[:, i * dsub:(i + 1) * dsub]),
            k, seed + i,
        )
        for i in range(m)
    ])


def write_ivfpq_partitioned(
    df: DataFrame,
    vec_col: str,
    key_col: str,
    path: str,
    cell_bits: int = 6,
    m: int = 8,
    nbits: int = 8,
    train_sample: int = 4096,
    seed: int = 11,
    pq_seed: int = 13,
) -> None:
    """Materialize the IVF-PQ layout: (key, codes binary) PARTITIONED
    BY (cell), full vectors NOT stored — the probe scan reads M bytes
    per vector instead of the flat layout's 4·dim, and partition
    pruning cuts it to the probed cells. The trained codebook + params
    persist beside the data (_pq_codebook.npz)."""
    import os

    dim = len(df.select(vec_col).first()[0])
    cents = train_pq_codebook(
        df, vec_col, key_col, m=m, nbits=nbits,
        train_sample=train_sample, seed=pq_seed,
    )
    mat = _planes(dim, cell_bits, seed)
    bc = df.sparkSession.sparkContext.broadcast(cents)
    dsub = dim // m

    def encode(batches):
        import pandas as pd

        cb = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf["_v"]]
            )
            codes = np.empty((len(x), m), dtype=np.uint8)
            for i in range(m):
                xs = x[:, i * dsub:(i + 1) * dsub]
                c = cb[i]
                d = (
                    (xs * xs).sum(1)[:, None]
                    - 2.0 * (xs @ c.T)
                    + (c * c).sum(1)[None, :]
                )
                codes[:, i] = d.argmin(1).astype(np.uint8)
            yield pd.DataFrame({
                "key": pdf["key"],
                "codes": [r.tobytes() for r in codes],
                "cell": pdf["cell"],
            })

    with_cell = df.select(
        F.col(key_col).alias("key"),
        F.col(vec_col).alias("_v"),
        signature_col(vec_col, mat).alias("cell"),
    )
    key_t = df.schema[key_col].dataType.simpleString()
    (
        with_cell.mapInPandas(
            encode, schema=f"key {key_t}, codes binary, cell long"
        )
        # one file per cell: codes are tiny (M bytes/vector), so
        # per-file parquet overhead would otherwise dominate the
        # layout's size advantage
        .repartition("cell")
        .write.partitionBy("cell")
        .mode("overwrite")
        .parquet(path)
    )
    np.savez(
        os.path.join(path, "_pq_codebook.npz"),
        centroids=cents,
        params=np.array([cell_bits, m, nbits, dim, seed], dtype=np.int64),
    )


def ivfpq_topk_at_rest(
    spark,
    path: str,
    source_df: DataFrame,
    vec_col: str,
    key_col: str,
    query_vec,
    k: int = 10,
    n_probe_cells: int = 16,
    refine: int | None = 4,
) -> DataFrame:
    """Probe the IVF-PQ layout: partition-pruned scan of code bytes →
    ADC approximate cosine in one Arrow stage → exact re-rank of the
    top ``refine·k`` candidates against the source vectors (the
    candidate keys push down into the source scan). ``refine=None``
    re-ranks EVERY probed row — recall then equals the flat IVF probe
    exactly (used by the oracle-checked gate; the ADC path's recall is
    floor-tested in pytest instead)."""
    import os

    with np.load(os.path.join(path, "_pq_codebook.npz")) as z:
        cents = z["centroids"]
        cell_bits, m, nbits, dim, seed = (int(v) for v in z["params"])
    q = np.asarray(query_vec, dtype=np.float64)
    dsub = dim // m
    mat = _planes(dim, cell_bits, seed)
    qsig = 0
    for i, plane in enumerate(mat):
        if float(plane @ q) > 0:
            qsig |= 1 << i
    cells = sorted(
        range(1 << cell_bits),
        key=lambda c: (bin(c ^ qsig).count("1"), c),
    )[:n_probe_cells]
    pruned = spark.read.parquet(path).where(F.col("cell").isin(cells))

    if refine is not None:
        # ADC lookup tables: dot(q_sub, centroid) and ||centroid||²
        # per (subspace, code) — cosine(q, x̂) falls out of two gathers
        lut_dot = np.stack([
            cents[i] @ q[i * dsub:(i + 1) * dsub] for i in range(m)
        ])                                           # (m, 2^nbits)
        lut_n2 = (cents * cents).sum(2)              # (m, 2^nbits)
        qn = float(np.sqrt(q @ q))
        bc = spark.sparkContext.broadcast((lut_dot, lut_n2, qn))

        def adc(batches):
            import pandas as pd

            ld, ln, qnorm = bc.value
            sub = np.arange(m)
            for pdf in batches:
                if not len(pdf):
                    continue
                codes = np.frombuffer(
                    b"".join(pdf["codes"]), dtype=np.uint8
                ).reshape(len(pdf), m)
                dot = ld[sub, codes].sum(1)
                n2 = ln[sub, codes].sum(1)
                approx = np.where(
                    n2 > 0, dot / (qnorm * np.sqrt(np.maximum(n2,
                                                              1e-300))),
                    -1.0,
                )
                yield pd.DataFrame({"key": pdf["key"],
                                    "approx": approx})

        key_t = pruned.schema["key"].dataType.simpleString()
        scored = pruned.select("key", "codes").mapInPandas(
            adc, schema=f"key {key_t}, approx double"
        )
        cand = (
            scored.orderBy(F.col("approx").desc(), F.col("key").asc())
            .limit(refine * k)
            .select("key")
        )
        cand_keys = [r["key"] for r in cand.collect()]
        elig = source_df.where(F.col(key_col).isin(cand_keys))
    else:
        keys = pruned.select("key")
        elig = source_df.join(
            keys.withColumnRenamed("key", key_col), key_col, "left_semi"
        )
    cos = cosine_expr(F.col(vec_col), _query_lit(q))
    return (
        elig.select(F.col(key_col).alias("key"), cos.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("key").asc())
        .limit(k)
    )
