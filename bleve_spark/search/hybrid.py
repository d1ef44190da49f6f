"""Hybrid full-text + vector search with rank fusion.

The reference's SearchRequest carries both a Query and KNN clauses
(/root/reference/search_knn.go:41-97) whose result lists are fused by
RRF or RSF (/root/reference/fusion/rrf.go:34, rsf.go:35). Here the
FTS leg is the ordinary compiled query plan and the KNN leg is the
brute-force/LSH/IVF cosine top-k from
:mod:`bleve_spark.functions.similarity`; fusion is pure window
arithmetic (:mod:`bleve_spark.search.fusion`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from bleve_spark.index.build import IndexedTable, qcol
from bleve_spark.search import query as Q
from bleve_spark.search.fusion import rrf_fuse, rsf_fuse
from bleve_spark.search.searcher import compile_query


def hybrid_search_df(
    idx: IndexedTable,
    q: Q.Query | dict,
    emb_df: DataFrame,
    vec_col: str,
    key_col: str,
    query_vec,
    size: int = 10,
    leg_k: int = 20,
    method: str = "rrf",
    weights: list[float] | None = None,
    rrf_k: int = 60,
    knn_filter: dict | None = None,
) -> DataFrame:
    """Fused top-``size`` (keys..., score).

    Each leg is truncated to its own top-``leg_k`` (rounded scores,
    deterministic (score desc, key asc) order) before fusion — the
    reference fuses the FTS hit list with each KNN hit list the same
    way. Requires a single-column key that matches ``emb_df``'s
    ``key_col`` ids.

    ``knn_filter`` (a Query dict) implements the reference's
    FILTERED-KNN eligible-doc pre-selection
    (/root/reference/search/collector/eligible.go +
    search_knn.go:389): the filter compiles to an unscored doc-key
    set and prunes the embedding table with a semi-join BEFORE any
    vector scoring — "KNN among docs matching X", not post-filtering
    of the top-k."""
    if len(idx.key_cols) != 1:
        raise ValueError("hybrid fusion needs a single-column key")
    key = idx.key_cols[0]
    order = [F.col("score").desc(), F.col(key).asc()]

    fts = (
        compile_query(idx, q)
        .select(key, F.round(F.col("score"), 6).alias("score"))
        .orderBy(*order)
        .limit(leg_k)
    )

    from bleve_spark.functions.similarity import cosine_topk

    if knn_filter is not None:
        eligible = (
            compile_query(idx, knn_filter)
            .select(F.col(key).cast(dict(emb_df.dtypes)[key_col])
                    .alias(key_col))
        )
        emb_df = emb_df.join(eligible, key_col, "left_semi")

    knn = cosine_topk(emb_df, vec_col, key_col, query_vec, k=leg_k)
    knn = knn.select(
        F.col("key").cast(dict(idx.source.dtypes)[key]).alias(key),
        F.round(F.col("cosine"), 6).alias("score"),
    )

    fuse = rrf_fuse if method == "rrf" else rsf_fuse
    kwargs = {"weights": weights}
    if method == "rrf":
        kwargs["k"] = rrf_k
    fused = fuse([fts, knn], [key], **kwargs)
    return (
        fused.select(key, F.round(F.col("score"), 6).alias("score"))
        .orderBy(*order)
        .limit(size)
    )


def _leg_score_expr(vec_col: F.Column, qv: list, similarity: str):
    """Per-row similarity of the stored vector vs the query vector.

    * ``dot_product`` — plain inner product.
    * ``cosine`` — vectors are NORMALIZED at index time
      (mapping_vectors.go:160-163), so the query vector is normalized
      here and the score is again a dot product.
    * ``l2_norm`` (the reference default) — scored as 1/(1+d²), a
      monotone inverse of the squared euclidean distance: identical
      ranking to faiss's L2 metric with a bounded, descending score.
    """
    import math

    if similarity == "cosine":
        n = math.sqrt(sum(float(x) * float(x) for x in qv)) or 1.0
        qv = [float(x) / n for x in qv]
    lit = F.array(*[F.lit(float(x)) for x in qv])
    if similarity in ("dot_product", "cosine"):
        return F.aggregate(
            F.zip_with(vec_col, lit,
                       lambda x, y: x.cast("double") * y),
            F.lit(0.0), lambda a, x: a + x,
        )
    if similarity == "l2_norm":
        d2 = F.aggregate(
            F.zip_with(vec_col, lit,
                       lambda x, y: (x.cast("double") - y)
                       * (x.cast("double") - y)),
            F.lit(0.0), lambda a, x: a + x,
        )
        return F.lit(1.0) / (F.lit(1.0) + d2)
    raise ValueError(f"unknown similarity: {similarity!r}")


def attach_ann(idx: IndexedTable, field: str, kind: str, path: str,
               **params) -> IndexedTable:
    """Attach an at-rest ANN layout to a mapped vector ``field`` so
    SearchRequest.KNN clauses over it probe the layout instead of
    scanning every vector (the reference serves KNN from the
    per-segment faiss index, search_knn.go:389).

    ``kind``: ``hnsw`` | ``ivf`` | ``ivfpq`` | ``lsh`` — a layout
    previously written by write_hnsw_partitioned /
    write_ivf_partitioned / write_ivfpq_partitioned / write_lsh_signed
    over the SAME vectors the index stores. ``params`` carry probe
    defaults (``ef``, ``n_probe_cells``, ``probe_hamming``,
    ``oversample``, ``key_col``, ``vec_col``); clauses can override
    none — tune at attach time.

    Probing is candidate generation only: the leg's final scores come
    from an exact re-rank of the candidates with the clause's mapped
    similarity, so an attached layout changes WHICH docs are scanned
    (probe bytes ≪ full scan), never how a returned doc is scored.
    The layouts rank by cosine, so they attach to ``cosine`` /
    ``dot_product`` fields (unit-normalized storage); other metrics
    keep the brute-force scan."""
    layouts = dict(getattr(idx, "ann_layouts", None) or {})
    layouts[field] = {"kind": kind, "path": path, **params}
    idx.ann_layouts = layouts
    return idx


def _ann_candidate_keys(idx: IndexedTable, field: str, layout: dict,
                        vector, k: int) -> DataFrame | None:
    """Top-``oversample·k`` candidate doc keys from an attached ANN
    layout (1-column DataFrame named like the index key), or None when
    the layout kind is unknown (caller falls back to brute force)."""
    spark = idx.source.sparkSession
    key = idx.key_cols[0]
    kc = layout.get("key_col", key)
    over = max(int(layout.get("oversample", 4)) * k, k)
    kind = layout["kind"]
    path = layout["path"]
    if kind == "hnsw":
        from bleve_spark.functions.hnsw import hnsw_topk_at_rest

        cand = hnsw_topk_at_rest(
            spark, path, kc, vector, k=over,
            ef=max(int(layout.get("ef", 64)), over),
        )
        return cand.select(F.col(kc).alias(key))
    if kind == "ivf":
        from bleve_spark.functions.similarity import ivf_topk_at_rest

        cand = ivf_topk_at_rest(
            spark, path, layout.get("vec_col", field), kc, vector,
            k=over, cell_bits=int(layout.get("cell_bits", 8)),
            n_probe_cells=int(layout.get("n_probe_cells", 8)),
            seed=int(layout.get("seed", 11)),
        )
        return cand.select(F.col("key").alias(key))
    if kind == "lsh":
        from bleve_spark.functions.similarity import lsh_topk_at_rest

        cand = lsh_topk_at_rest(
            spark, path, layout.get("vec_col", field), kc, vector,
            k=over, planes=int(layout.get("planes", 12)),
            probe_hamming=int(layout.get("probe_hamming", 2)),
            seed=int(layout.get("seed", 7)),
        )
        return cand.select(F.col("key").alias(key))
    if kind == "ivfpq":
        from bleve_spark.functions.similarity import ivfpq_topk_at_rest

        cand = ivfpq_topk_at_rest(
            spark, path, idx.source, layout.get("vec_col", field), kc,
            vector, k=over,
            n_probe_cells=int(layout.get("n_probe_cells", 16)),
            refine=layout.get("refine", 4),
        )
        return cand.select(F.col("key").alias(key))
    return None


def knn_request_full_df(
    idx: IndexedTable,
    knn: list[dict],
    q: Q.Query | dict | None = None,
    knn_operator: str = "or",
) -> DataFrame:
    """UNLIMITED (keys..., score) for a SearchRequest.KNN — every doc
    matched by the KNN legs (post knn_operator) and/or the optional
    query; :func:`knn_request_df` adds the top-``size`` cut. Exposed
    separately so callers can compute the true match total (the
    reference's SearchResult.Total counts all matches, not the page).

    The reference's SearchRequest.KNN contract
    (/root/reference/search_knn.go:41-97, 460-530): each clause is
    ``{"field": ..., "vector": [...], "k": ..., "boost": ...}`` over a
    MAPPED vector field (mapping_vectors.go; the field's similarity
    metric was fixed at mapping time); every clause contributes its
    top-k, a doc's KNN score is the SUM of its matched legs
    (finalizeKNNResults), ``knn_operator: "and"`` keeps only docs
    matched by EVERY clause, and an optional query's score ADDS to
    the KNN score (setKnnHitsInCollector: ftsMatch.Score +=
    knnMatch.Score).

    All-native: one scan per clause, TakeOrdered top-k, outer-join
    merge on the doc key — no shuffle beyond the top-k exchanges.
    """
    if len(idx.key_cols) != 1:
        raise ValueError("knn_request_df needs a single-column key")
    key = idx.key_cols[0]
    planned = getattr(idx, "planned_fields", {}) or {}

    ann_layouts = getattr(idx, "ann_layouts", None) or {}
    legs = []
    for clause in knn:
        f = clause["field"]
        p = planned.get(f)
        sim = clause.get("similarity") or (
            p.similarity if p is not None else "l2_norm"
        )
        k = int(clause.get("k", 10))
        boost = float(clause.get("boost", 1.0))
        sc = _leg_score_expr(qcol(f), clause["vector"], sim) * boost
        src = idx.source
        layout = ann_layouts.get(f)
        if layout is not None and sim in ("cosine", "dot_product"):
            # attached at-rest ANN layout: probe for candidates, then
            # exact re-rank with the clause's similarity — probe bytes
            # ≪ full scan; scores identical to the brute-force leg as
            # long as the candidate set contains the true top-k
            # (oversample + ef control that; the layouts rank by
            # cosine == dot over the unit-normalized storage these
            # metrics imply). Unknown kinds fall back to brute force.
            cand = _ann_candidate_keys(idx, f, layout,
                                       clause["vector"], k)
            if cand is not None:
                src = src.join(cand, key, "left_semi")
        legs.append(
            src
            .where(qcol(f).isNotNull())
            .select(F.col(key), F.round(sc, 6).alias("_s"))
            .orderBy(F.col("_s").desc(), F.col(key).asc())
            .limit(k)
        )

    merged = None
    for i, leg in enumerate(legs):
        leg = leg.withColumnRenamed("_s", f"_s{i}")
        merged = leg if merged is None else merged.join(
            leg, key, "full_outer"
        )
    score_cols = [F.coalesce(F.col(f"_s{i}"), F.lit(0.0))
                  for i in range(len(legs))]
    if knn_operator == "and":
        # finalizeKNNResults: keep docs with a breakdown entry for
        # EVERY clause
        cond = None
        for i in range(len(legs)):
            c = F.col(f"_s{i}").isNotNull()
            cond = c if cond is None else (cond & c)
        merged = merged.where(cond)
    knn_scored = merged.select(
        F.col(key),
        sum(score_cols[1:], score_cols[0]).alias("_knn"),
    )

    if q is not None:
        fts = compile_query(idx, q).select(
            F.col(key), F.col("score").alias("_fts")
        )
        out = fts.join(knn_scored, key, "full_outer").select(
            F.col(key),
            (F.coalesce(F.col("_fts"), F.lit(0.0))
             + F.coalesce(F.col("_knn"), F.lit(0.0))).alias("score"),
        )
    else:
        out = knn_scored.select(F.col(key),
                                F.col("_knn").alias("score"))
    return out.select(key, F.round("score", 6).alias("score"))


def knn_request_df(
    idx: IndexedTable,
    knn: list[dict],
    q: Q.Query | dict | None = None,
    size: int = 10,
    knn_operator: str = "or",
) -> DataFrame:
    """Top-``size`` page of :func:`knn_request_full_df` (score desc,
    key asc tie-break)."""
    key = idx.key_cols[0]
    return (
        knn_request_full_df(idx, knn, q=q, knn_operator=knn_operator)
        .orderBy(F.col("score").desc(), F.col(key).asc())
        .limit(size)
    )
