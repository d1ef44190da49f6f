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

from bleve_spark.index.build import IndexedTable
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
