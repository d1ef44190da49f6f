"""Block-max WAND-style pruned top-k over the segment store.

The reference's only top-k pruning is the collector floor
(/root/reference/search/collector/topn.go:584-604); this module is the
block-max upgrade the north rule asks for, expressed as DataFrame
pre-join pruning:

1. every chunk row carries (max_tf, max_norm) — an upper bound on any
   BM25 contribution from that chunk is computable WITHOUT opening the
   blob (BM25 is increasing in tf and in norm — max fieldLength⁻¹);
2. θ = the k-th best EXACT partial score over the rarest query term's
   postings (partial ≤ total ⇒ θ lower-bounds the true k-th score);
3. a chunk of term t survives iff bound_t(chunk) + Σ_{t'≠t} gmax_{t'}
   ≥ θ (otherwise no doc inside can reach the top-k — the classic
   block-max argument);
4. candidate docs come only from surviving chunks; the final exact
   rescoring decodes query-term chunks for candidate segments only and
   semi-joins candidates.

Soundness: a doc d with total(d) ≥ θ must have, for its best term t*,
bound_{t*}(chunk(d)) + Σ_{t'≠t*} gmax_{t'} ≥ partial_{t*}(d) +
Σ rest ≥ total(d) ≥ θ — so at least one of d's chunks survives and d
becomes a candidate.

The payoff at scale: pruning happens on chunk METADATA (tiny, no blob
IO, parquet column pruning) and the expensive decode touches only
surviving chunks + candidate rescoring.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from bleve_spark.index.build import IndexStats
from bleve_spark.index.segments import SegmentStore
from bleve_spark.search.searcher import SPREAD_MIN_DF
from bleve_spark.search.scorer import BM25_B, BM25_K1, idf_value


def _bound_col(idf: float, avg_len: float):
    """Upper-bound BM25 score for a chunk from (max_tf, max_norm)."""
    tf = F.sqrt(F.col("max_tf").cast("double"))
    norm = F.col("max_norm").cast("double")
    fl = F.lit(1.0) / (norm * norm)
    return (
        F.lit(idf)
        * (tf * F.lit(BM25_K1))
        / (tf + F.lit(BM25_K1) * (F.lit(1.0 - BM25_B)
                                  + (F.lit(BM25_B) * fl) / F.lit(avg_len)))
    )


def _term_scores(store: SegmentStore, stats: IndexStats, field: str,
                 term: str, idf: float, spread: bool = False) -> DataFrame:
    """(doc_num, score) exact BM25 partials for one term."""
    from bleve_spark.index.segments import decode_chunk_rows

    pred = (F.col("field") == field) & (F.col("term") == term)
    rows = store.chunk_rows(with_blobs=True).where(pred)
    avg = stats.avg_len(field)
    tf = F.sqrt(F.col("tf").cast("double"))
    if store.has_posting_lens():
        # norms ride in the postings: zero doc-table involvement —
        # the theta seed is one pruned chunk scan + decode. Deleted
        # docs must still drop out (a deleted doc's partial could
        # push theta ABOVE the true k-th live score and prune a
        # chunk holding a real top-k doc): anti-join the (small)
        # deletion set instead of inner-joining the whole doc table.
        joined = decode_chunk_rows(
            rows, with_positions=False, with_norm=True, spread=spread
        )
        dels = store.deletions()
        if dels is not None:
            joined = joined.join(dels, "doc_num", "left_anti")
        norm = F.col("norm").cast("double")
    else:
        decoded = decode_chunk_rows(rows, with_positions=False)
        docs = store.doc_table().select(
            "doc_num", F.col(f"len_{field}").alias("_len")
        )
        joined = decoded.join(docs, "doc_num")
        norm = F.when(
            F.col("_len") > 0,
            (F.lit(1.0) / F.sqrt(F.col("_len"))).cast("float"),
        ).cast("double")
    fl = F.lit(1.0) / (norm * norm)
    score = (
        F.lit(idf) * (tf * F.lit(BM25_K1))
        / (tf + F.lit(BM25_K1) * (F.lit(1.0 - BM25_B)
                                  + (F.lit(BM25_B) * fl) / F.lit(avg)))
    )
    return joined.select("doc_num", score.alias("score"))


def pruned_disjunction_topk(
    store: SegmentStore,
    stats: IndexStats,
    key_cols: list[str],
    field: str,
    terms: list[str],
    k: int = 10,
) -> DataFrame:
    """Top-k (keys..., score) for a scored OR of ``terms`` with
    block-max pruning. Plain disjunction semantics (sum × coord over
    all terms, min=1, root queryNorm) — rank-identical to the unpruned
    plan (asserted in tests)."""
    spark = store.spark
    chunks = store.chunk_rows().where(
        (F.col("field") == field) & F.col("term").isin(terms)
    ).persist()

    df_by_term = {
        r["term"]: int(r["df"])
        for r in chunks.groupBy("term")
        .agg(F.sum("n_docs").alias("df"))
        .collect()
    }
    idfs = {
        t: idf_value("bm25", stats.doc_count, df_by_term.get(t, 0),
                     stats.avg_len(field))
        for t in terms
    }
    qn = 1.0 / math.sqrt(sum((idfs[t]) ** 2 for t in terms))
    total = float(len(terms))
    qw = {t: idfs[t] * qn for t in terms}  # per-leaf queryWeight

    # Contribution of term t to a doc's pre-coord sum is
    # base_t(d)·qw_t (base includes idf once). Coord ≤ 1 gives
    # S(d) ≤ Σ_t base_t(d)·qw_t ≤ B_{t*}(chunk) + Σ_{t'≠t*} Gmax_{t'}.
    avg = stats.avg_len(field)
    per_term_bounds = (
        chunks.groupBy("term")
        .agg(F.max(_bound_col(1.0, avg)).alias("_raw"))
        .collect()
    )
    gmax = {t: 0.0 for t in terms}
    for r in per_term_bounds:
        t = r["term"]
        gmax[t] = float(r["_raw"]) * idfs[t] * qw[t]

    # θ: docs matching the rarest term have final score ≥
    # base_rare(d)·qw_rare·(1/total)  (coord ≥ 1/total, others ≥ 0) —
    # so the k-th best of those partials lower-bounds the true k-th.
    present = [t for t in terms if df_by_term.get(t, 0) > 0]
    if not present:
        empty = store.doc_table().select(*key_cols).where(F.lit(False))
        return empty.withColumn("score", F.lit(0.0))
    rare = min(present, key=lambda t: df_by_term[t])
    rare_scores = _term_scores(
        store, stats, field, rare, idfs[rare],
        spread=df_by_term[rare] >= SPREAD_MIN_DF,
    )
    kth = rare_scores.orderBy(F.col("score").desc()).limit(k).collect()
    theta = (
        float(kth[-1]["score"]) * qw[rare] / total
        if len(kth) >= k
        else 0.0
    )

    # prune: chunk of t survives iff B_t(chunk) + Σ_{t'≠t} Gmax ≥ θ
    sum_gmax = sum(gmax.values())
    others_df = spark.createDataFrame(
        [(t, float(sum_gmax - gmax[t]), float(idfs[t] * qw[t]))
         for t in terms],
        "term string, others double, idf_qw double",
    )
    with_bound = chunks.join(F.broadcast(others_df), "term").withColumn(
        "_bound", _bound_col(1.0, avg) * F.col("idf_qw")
    )
    surviving = with_bound.where(
        F.col("_bound") + F.col("others") >= F.lit(theta)
    ).select("segment_id", "term", "chunk_id")

    blob_rows = store.chunk_rows(with_blobs=True).where(
        (F.col("field") == field) & F.col("term").isin(terms)
    )
    # exact rescoring happens over ALL query-term postings in
    # candidate segments; candidate segment ids come from the
    # surviving-chunk METADATA (segment_id is a chunk-row column) —
    # collecting them costs a tiny metadata scan, no blob decode
    cand_segs = [
        int(r["segment_id"])
        for r in surviving.select("segment_id").distinct().collect()
    ]
    rescore_rows = blob_rows.where(F.col("segment_id").isin(cand_segs))
    meta = spark.createDataFrame(
        [(t, float(idfs[t]), float(idfs[t] * qn)) for t in terms],
        "term string, idf double, qw double",
    )
    tf = F.sqrt(F.col("tf").cast("double"))
    use_lens = store.has_posting_lens()
    if use_lens:
        # norm rides in the postings: score + aggregate on doc_num
        # alone, and the doc table enters only AFTER the per-doc
        # aggregation — a join over matched candidates, not a
        # corpus-sized norm lookup per posting. The rescore decode is
        # a SUPERSET of the surviving chunks, so it runs ONCE
        # (persisted, chunk ids carried through) and the candidate
        # set is derived from it by a broadcast semi-join against the
        # surviving-chunk metadata — the store is never decoded twice
        from bleve_spark.index.segments import decode_chunk_rows

        decoded_all = decode_chunk_rows(
            rescore_rows, with_positions=False, with_norm=True,
            with_chunk=True,
            spread=sum(df_by_term.values()) >= SPREAD_MIN_DF,
        )
        dels = store.deletions()
        if dels is not None:
            decoded_all = decoded_all.join(
                dels, "doc_num", "left_anti"
            )
        decoded_all = decoded_all.persist()
        candidates = decoded_all.join(
            F.broadcast(surviving),
            ["segment_id", "term", "chunk_id"], "left_semi",
        ).select("doc_num").distinct()
        decoded = decoded_all.join(candidates, "doc_num", "left_semi")
        joined = decoded.join(F.broadcast(meta), "term")
        norm = F.col("norm").cast("double")
    else:
        # legacy stores: candidates from a decode of the surviving
        # chunks only (lazy — it runs inside the final job)
        surv_blobs = blob_rows.join(
            surviving, ["segment_id", "term", "chunk_id"], "left_semi"
        )
        candidates = _decode_rows(store, surv_blobs).select(
            "doc_num"
        ).distinct()
        decoded = _decode_rows(store, rescore_rows).join(
            candidates, "doc_num", "left_semi"
        )
        docs = store.doc_table().select(
            "doc_num", *key_cols, F.col(f"len_{field}").alias("_len")
        )
        joined = decoded.join(docs, "doc_num").join(
            F.broadcast(meta), "term"
        )
        norm = F.when(
            F.col("_len") > 0,
            (F.lit(1.0) / F.sqrt(F.col("_len"))).cast("float"),
        ).cast("double")
    fl = F.lit(1.0) / (norm * norm)
    s = (
        F.col("idf") * (tf * F.lit(BM25_K1))
        / (tf + F.lit(BM25_K1) * (F.lit(1.0 - BM25_B)
                                  + (F.lit(BM25_B) * fl) / F.lit(avg)))
    ) * F.col("qw")
    if use_lens:
        agg = joined.select(
            "doc_num", s.alias("s")
        ).groupBy("doc_num").agg(
            F.sum("s").alias("_sum"), F.count(F.lit(1)).alias("_cnt")
        )
        per_doc = agg.select(
            "doc_num",
            (F.col("_sum") * F.col("_cnt").cast("double")
             / F.lit(total)).alias("score"),
        )
        result = per_doc.join(
            store.doc_table().select("doc_num", *key_cols), "doc_num"
        ).select(*key_cols, "score")
    else:
        scored = joined.select(*key_cols, s.alias("s"))
        agg = scored.groupBy(*key_cols).agg(
            F.sum("s").alias("_sum"), F.count(F.lit(1)).alias("_cnt")
        )
        result = agg.select(
            *key_cols,
            (F.col("_sum") * F.col("_cnt").cast("double")
             / F.lit(total)).alias("score"),
        )
    chunks.unpersist()
    order = [F.col("score").desc()] + [F.col(c).asc() for c in key_cols]
    return result.orderBy(*order).limit(k)


def _decode_rows(store: SegmentStore, rows: DataFrame) -> DataFrame:
    """Decode arbitrary pre-filtered chunk-row DataFrames via the
    shared Arrow batch kernel, positions-free: the pos_blob column
    (the largest blob) is never read — WAND candidate generation and
    rescoring only need (term, doc_num, tf)."""
    from bleve_spark.index.segments import decode_chunk_rows

    return decode_chunk_rows(rows, with_positions=False).select(
        "term", "doc_num", "tf"
    )
