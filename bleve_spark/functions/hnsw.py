"""Per-segment HNSW graph ANN — the reference's go-faiss/HNSW vector
index (document/field_vector.go, mapping_vector.go, go.mod go-faiss),
re-expressed for Spark's execution model.

The reference (like Lucene) builds one small-world graph PER SEGMENT
and fans a query out over every segment's graph, merging the per-
segment top-k. That shape is exactly Spark-native: the graph build is
one `applyInPandas` task per segment (embarrassingly parallel, no
shuffle beyond the initial segment assignment), the at-rest layout is
parquet `PARTITIONED BY (segment)` so a probe reads each segment's
adjacency + vectors as an independent scan unit, and query serving is
one beam search per segment task followed by a driver-side k-merge —
the same per-partition-heap + global-merge pattern as the BM25 TopN
collector.

The graph algorithm is the published HNSW construction/search
(Malkov & Yashunin 2016, "Efficient and robust approximate nearest
neighbor search using Hierarchical Navigable Small World graphs"):
exponentially-distributed layer assignment, greedy descent through
the upper layers, beam (ef) search at each layer, M-bounded
bidirectional links. Similarity is cosine via normalized vectors, so
beam comparisons are one BLAS matvec per step.

Determinism: layer assignment draws from a RandomState seeded per
segment, applied to nodes in sorted-key order — two builds of the
same data produce identical graphs (the tests' recall floors are
stable, and a resumed build reproduces byte-identical adjacency).

Scale notes (100 TB): segments are bounded by the partition count —
each build task holds one segment's vectors (choose n_segments so a
segment fits an executor; 1M × 128-d float32 ≈ 512 MB). Unlike IVF
cells, probing EVERY segment means segmentation costs zero recall —
so the scale dial is simply more, smaller segments: construction is
sequential per segment (the published algorithm's insert loop) but
embarrassingly parallel across them, and the probe fan-out is one
beam search per segment, merged by the same per-partition-heap
pattern as BM25 TopN. Keep segments ≤ ~100k vectors so the build
task stays minutes, not hours; for query-cost-bounded serving over
huge segment counts, restrict the probe to a segment subset (sharded
ANN) or stack this under the IVF router — both are one-line
predicates on the partition column.
"""

from __future__ import annotations

import heapq
import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F


GRAPH_SCHEMA = (
    "segment int, node_id int, level int, neighbors array<int>"
)
VEC_SCHEMA_SUFFIX = "segment int, node_id int, norm_vec array<float>"


def _normalize(mat: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(mat, axis=1, keepdims=True)
    n[n == 0.0] = 1.0
    return (mat / n).astype(np.float32)


def _search_layer(
    q: np.ndarray,
    vecs: np.ndarray,
    adj: dict,
    entry: list[int],
    ef: int,
) -> list[tuple[float, int]]:
    """Beam search one layer: returns up to ``ef`` (sim, node) pairs,
    best-first. ``adj`` maps node -> neighbor id list/array for THIS
    layer. Maximizes cosine (vectors pre-normalized: sim = dot)."""
    sims = {e: float(vecs[e] @ q) for e in entry}
    # candidates: max-heap on sim (python heapq is a min-heap → negate)
    cand = [(-s, n) for n, s in sims.items()]
    heapq.heapify(cand)
    # results: min-heap on sim, capped at ef
    res = [(s, n) for n, s in sims.items()]
    heapq.heapify(res)
    visited = set(sims)
    while cand:
        cs, cn = heapq.heappop(cand)
        if -cs < res[0][0] and len(res) >= ef:
            break
        nbrs = [n for n in adj.get(cn, ()) if n not in visited]
        if not nbrs:
            continue
        visited.update(nbrs)
        nsims = vecs[nbrs] @ q
        for n, s in zip(nbrs, nsims.tolist()):
            if len(res) < ef or s > res[0][0]:
                heapq.heappush(cand, (-s, n))
                heapq.heappush(res, (s, n))
                if len(res) > ef:
                    heapq.heappop(res)
    return sorted(res, reverse=True)


def _select_neighbors(
    cand: list[tuple[float, int]], m: int
) -> list[int]:
    """Simple selection: the M most-similar candidates (the paper's
    SELECT-NEIGHBORS-SIMPLE; the heuristic variant matters for
    clustered data but simple keeps recall within a point on the
    planted-neighbor tests)."""
    return [n for _, n in sorted(cand, reverse=True)[:m]]


def _build_graph(
    vecs: np.ndarray,
    m: int,
    ef_construction: int,
    seed: int,
) -> list[dict[int, np.ndarray]]:
    """Sequential HNSW construction over one segment's (normalized)
    vectors. Returns per-layer adjacency dicts, layer 0 first."""
    n = vecs.shape[0]
    rng = np.random.RandomState(seed)
    ml = 1.0 / math.log(m)
    levels = np.floor(
        -np.log(np.clip(rng.random_sample(n), 1e-12, None)) * ml
    ).astype(np.int64)
    layers: list[dict[int, list[int]]] = [
        {} for _ in range(int(levels.max()) + 1)
    ]
    m_max0 = 2 * m
    entry, top = 0, int(levels[0])
    for lc in range(top + 1):
        layers[lc][0] = []
    for i in range(1, n):
        li = int(levels[i])
        q = vecs[i]
        ep = [entry]
        for lc in range(top, li, -1):
            ep = [_search_layer(q, vecs, layers[lc], ep, 1)[0][1]]
        for lc in range(min(top, li), -1, -1):
            w = _search_layer(
                q, vecs, layers[lc], ep, ef_construction
            )
            nbrs = _select_neighbors(w, m)
            layers[lc][i] = list(nbrs)
            cap = m_max0 if lc == 0 else m
            for nb in nbrs:
                cur = layers[lc][nb]
                cur.append(i)
                if len(cur) > cap:
                    sims = vecs[cur] @ vecs[nb]
                    keep = np.argsort(-sims)[:cap]
                    layers[lc][nb] = [cur[j] for j in keep]
            ep = [nd for _, nd in w]
        if li > top:
            for lc in range(top + 1, li + 1):
                layers[lc][i] = []
            entry, top = i, li
    return layers


def write_hnsw_partitioned(
    df: DataFrame,
    vec_col: str,
    key_col: str,
    path: str,
    n_segments: int = 8,
    m: int = 16,
    ef_construction: int = 100,
    seed: int = 47,
) -> None:
    """Build the at-rest per-segment HNSW layout under ``path``:

    - ``vectors/`` parquet PARTITIONED BY (segment):
      (node_id, <key_col>, norm_vec) — normalized float32 vectors
    - ``graph/``   parquet PARTITIONED BY (segment):
      (node_id, level, neighbors) — adjacency rows; the segment's
      entry point is the max-level node (ties → lowest node_id)

    Segment assignment hashes the key (stable across runs); the graph
    build is one applyInPandas task per segment."""
    key_t = dict(df.dtypes)[key_col]
    seg = df.select(
        F.col(key_col), F.col(vec_col),
        F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_segments))
        .cast("int").alias("segment"),
    )

    def build_one(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(key_col, kind="mergesort")
        sid = int(pdf["segment"].iloc[0])
        vecs = _normalize(
            np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
        ).astype(np.float32)
        layers = _build_graph(
            vecs.astype(np.float32), m, ef_construction, seed + sid
        )
        out_node, out_level, out_nbrs = [], [], []
        for lvl, lay in enumerate(layers):
            for node, nbrs in lay.items():
                out_node.append(node)
                out_level.append(lvl)
                out_nbrs.append([int(x) for x in nbrs])
        return pd.DataFrame({
            "segment": sid,
            "node_id": pd.array(out_node, dtype="int32"),
            "level": pd.array(out_level, dtype="int32"),
            "neighbors": out_nbrs,
        })

    graph = seg.groupBy("segment").applyInPandas(
        build_one, schema=GRAPH_SCHEMA
    )
    graph.write.partitionBy("segment").mode("overwrite").parquet(
        path + "/graph"
    )

    def vec_rows(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(key_col, kind="mergesort")
        vecs = _normalize(
            np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
        )
        return pd.DataFrame({
            "segment": pdf["segment"].values,
            "node_id": pd.array(
                np.arange(len(pdf)), dtype="int32"
            ),
            key_col: pdf[key_col].values,
            "norm_vec": list(vecs),
        })

    vec_schema = (
        f"segment int, node_id int, {key_col} {key_t}, "
        "norm_vec array<float>"
    )
    seg.groupBy("segment").applyInPandas(
        vec_rows, schema=vec_schema
    ).write.partitionBy("segment").mode("overwrite").parquet(
        path + "/vectors"
    )


def _load_segment(pdf: pd.DataFrame, key_col: str):
    """Rebuild one segment's search state from the unioned
    graph+vector rows: (vecs float32 matrix, keys, per-layer
    adjacency, top level, entry node). None on an empty segment."""
    vmask = ~pdf["_is_graph"].values
    vrows = pdf[vmask].sort_values("node_id")
    if not len(vrows):
        return None
    vecs = np.asarray(vrows["norm_vec"].tolist(), dtype=np.float32)
    keys = vrows[key_col].values
    grows = pdf[~vmask]
    layers: dict[int, dict[int, np.ndarray]] = {}
    top_level, entry = -1, 0
    for node, lvl, nbrs in zip(
        grows["node_id"].values.astype(np.int64),
        grows["level"].values.astype(np.int64),
        grows["neighbors"].values,
    ):
        layers.setdefault(int(lvl), {})[int(node)] = np.asarray(
            nbrs, dtype=np.int64
        )
        if lvl > top_level or (lvl == top_level and node < entry):
            top_level, entry = int(lvl), int(node)
    return vecs, keys, layers, top_level, entry


def _probe_loaded(vecs, layers, top_level, entry, q, k, ef):
    """Greedy descent + layer-0 beam over loaded segment state."""
    ep = [entry]
    for lc in range(top_level, 0, -1):
        ep = [_search_layer(q, vecs, layers.get(lc, {}), ep, 1)[0][1]]
    return _search_layer(q, vecs, layers.get(0, {}), ep, ef)[:k]


def _graph_vector_union(spark, path: str, key_col: str,
                        segments: list[int] | None):
    """Graph + vector rows unioned into one segment-partitioned
    relation (both datasets are PARTITIONED BY segment, so the
    groupBy(segment) that follows shuffles co-located files only;
    a ``segments`` subset becomes a partition-pruning predicate)."""
    graph = spark.read.parquet(path + "/graph")
    vectors = spark.read.parquet(path + "/vectors")
    if segments is not None:
        segs = [int(s) for s in segments]
        graph = graph.where(F.col("segment").isin(segs))
        vectors = vectors.where(F.col("segment").isin(segs))
    key_t = dict(vectors.dtypes)[key_col]
    g = graph.select(
        "segment", "node_id", "level", "neighbors",
        F.lit(None).cast("array<float>").alias("norm_vec"),
        F.lit(None).cast(key_t).alias(key_col),
        F.lit(True).alias("_is_graph"),
    )
    v = vectors.select(
        "segment", "node_id",
        F.lit(-1).cast("int").alias("level"),
        F.lit(None).cast("array<int>").alias("neighbors"),
        "norm_vec", F.col(key_col), F.lit(False).alias("_is_graph"),
    )
    return g.unionByName(v), key_t


def hnsw_topk_at_rest(
    spark,
    path: str,
    key_col: str,
    query_vec,
    k: int = 10,
    ef: int = 64,
    segments: list[int] | None = None,
) -> DataFrame:
    """Probe the per-segment graphs: one beam search per segment task
    (graph + vectors co-partitioned on the segment column), then a
    global top-k merge — the reference's per-segment KNN collector
    shape. ``segments`` restricts the probe to a shard subset (the
    partition-column predicate prunes unprobed files at the scan)."""
    q = np.asarray(query_vec, dtype=np.float64)
    qn = np.linalg.norm(q)
    q = (q / (qn if qn else 1.0)).astype(np.float32)

    both, key_t = _graph_vector_union(spark, path, key_col, segments)
    kq = int(k)
    efq = max(int(ef), kq)
    qb = q  # captured in the closure; broadcast with the task binary

    def probe_one(pdf: pd.DataFrame) -> pd.DataFrame:
        loaded = _load_segment(pdf, key_col)
        if loaded is None:
            return pd.DataFrame({key_col: [], "cosine": []})
        vecs, keys, layers, top_level, entry = loaded
        res = _probe_loaded(
            vecs, layers, top_level, entry, qb, kq, efq
        )
        return pd.DataFrame({
            key_col: [keys[nid] for _, nid in res],
            "cosine": [float(s) for s, _ in res],
        })

    per_seg = both.groupBy("segment").applyInPandas(
        probe_one, schema=f"{key_col} {key_t}, cosine double"
    )
    return per_seg.orderBy(
        F.col("cosine").desc(), F.col(key_col).asc()
    ).limit(kq)


def hnsw_topk_batch(
    spark,
    path: str,
    key_col: str,
    query_vecs,
    k: int = 10,
    ef: int = 64,
    segments: list[int] | None = None,
    max_queries: int = 65536,
) -> DataFrame:
    """Batched multi-query probe → (query_idx, <key>, cosine): each
    segment task loads its graph ONCE and runs every query's beam
    search against it — the training-pipeline shape (amortizes the
    graph load over the batch exactly as the batched brute-force
    matmul in similarity.pairwise_cosine_topk_pandas amortizes the
    scan). Per-query global top-k via one window over the per-segment
    k-candidates. ``query_vecs`` is a driver-side list/matrix of
    query vectors (bounded: it ships inside the task closure —
    ``max_queries`` fails loudly instead of silently shipping GBs; a
    bigger batch should be split or routed per-shard)."""
    from pyspark.sql import Window

    qm = np.asarray(query_vecs, dtype=np.float64)
    if qm.ndim != 2:
        raise ValueError("query_vecs must be a (n_queries, dim) batch")
    if qm.shape[0] > max_queries:
        raise ValueError(
            f"{qm.shape[0]} queries exceed max_queries={max_queries}"
        )
    norms = np.linalg.norm(qm, axis=1, keepdims=True)
    norms[norms == 0.0] = 1.0
    qb = (qm / norms).astype(np.float32)

    both, key_t = _graph_vector_union(spark, path, key_col, segments)
    kq = int(k)
    efq = max(int(ef), kq)

    def probe_batch(pdf: pd.DataFrame) -> pd.DataFrame:
        loaded = _load_segment(pdf, key_col)
        if loaded is None:
            return pd.DataFrame(
                {"query_idx": [], key_col: [], "cosine": []}
            )
        vecs, keys, layers, top_level, entry = loaded
        qi_out, key_out, cos_out = [], [], []
        for qi in range(qb.shape[0]):
            res = _probe_loaded(
                vecs, layers, top_level, entry, qb[qi], kq, efq
            )
            qi_out.extend([qi] * len(res))
            key_out.extend(keys[nid] for _, nid in res)
            cos_out.extend(float(s) for s, _ in res)
        return pd.DataFrame({
            "query_idx": pd.array(qi_out, dtype="int32"),
            key_col: key_out,
            "cosine": cos_out,
        })

    per_seg = both.groupBy("segment").applyInPandas(
        probe_batch,
        schema=f"query_idx int, {key_col} {key_t}, cosine double",
    )
    w = Window.partitionBy("query_idx").orderBy(
        F.col("cosine").desc(), F.col(key_col).asc()
    )
    return (
        per_seg.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= kq)
        .drop("_rn")
    )
