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
4. candidate docs are decoded from SURVIVING chunks only; the exact
   rescoring then decodes just the additional chunks whose
   [min_doc, max_doc] span overlaps a candidate doc interval — chunk
   granularity end-to-end, never "all chunks of a candidate segment"
   (on a merged single-segment store that degenerates to a full
   decode and the pruning buys nothing).

Soundness: a doc d with total(d) ≥ θ must have, for its best term t*,
bound_{t*}(chunk(d)) + Σ_{t'≠t*} gmax_{t'} ≥ partial_{t*}(d) +
Σ rest ≥ total(d) ≥ θ — so at least one of d's chunks survives and d
becomes a candidate. Every posting of a candidate doc lives in a chunk
whose [min_doc, max_doc] contains the doc, and the candidate intervals
are a superset of the candidate docs — so the rescore decode set is
complete.

The payoff at scale: pruning happens on chunk METADATA (tiny, no blob
IO, parquet column pruning) and the expensive decode touches only
surviving chunks + interval-overlapping chunks of candidate docs.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame, functions as F

from bleve_spark.index.build import IndexStats
from bleve_spark.index.segments import SegmentStore
from bleve_spark import config as _cfg
from bleve_spark.search.scorer import BM25_B, BM25_K1, idf_value

# candidate-interval compaction knobs: buckets are doc_num >> shift;
# the shift grows until the distinct-bucket count fits MAX_BUCKETS,
# and the merged bucket runs are further coalesced (smallest gaps
# first) down to MAX_INTERVALS literal (lo, hi) ranges — the overlap
# filter is then ≤ MAX_INTERVALS comparisons per chunk row, all
# whole-stage codegen on metadata columns.
MAX_BUCKETS = 65536
MAX_INTERVALS = 256
# when the surviving chunks hold more than this fraction of the
# query terms' postings, pruning can't win — take the one-decode
# unpruned plan instead of paying the two-stage machinery.
PRUNE_MIN_BENEFIT = 0.5


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


def _candidate_intervals(decoded_surv: DataFrame) -> list[tuple[int, int]]:
    """Compact the candidate doc set into ≤ MAX_INTERVALS global
    [lo, hi] doc-num ranges (a SUPERSET — coarsening only ever widens
    coverage, never drops a candidate).

    Adaptive bucketing keeps the collected set bounded: start at
    4096-doc buckets and widen until the distinct count fits
    MAX_BUCKETS — at 10¹² docs a pathological spread still collects
    ≤ 64k longs. Bucket runs then merge driver-side (numpy) and the
    smallest inter-run gaps close first until ≤ MAX_INTERVALS remain.
    """
    shift = 12
    while True:
        b = (
            decoded_surv.select(
                F.shiftright("doc_num", shift).alias("b")
            )
            .distinct()
        )
        vals = None
        if shift >= 40:
            vals = [int(r["b"]) for r in b.collect()]
        else:
            cnt = b.count()
            if cnt <= MAX_BUCKETS:
                vals = [int(r["b"]) for r in b.collect()]
        if vals is not None:
            break
        shift += 4
    if not vals:
        return []
    bs = np.sort(np.asarray(vals, dtype=np.int64))
    # merge adjacent buckets into runs
    breaks = np.nonzero(np.diff(bs) > 1)[0]
    lo_i = np.concatenate(([0], breaks + 1))
    hi_i = np.concatenate((breaks, [bs.size - 1]))
    lo = bs[lo_i] << shift
    hi = ((bs[hi_i] + 1) << shift) - 1
    # close smallest gaps until the interval count is bounded
    while lo.size > MAX_INTERVALS:
        gaps = lo[1:] - hi[:-1]
        order = np.argsort(gaps)
        n_close = lo.size - MAX_INTERVALS
        drop = np.sort(order[:n_close])
        keep_lo = np.ones(lo.size, dtype=bool)
        keep_hi = np.ones(hi.size, dtype=bool)
        keep_lo[drop + 1] = False  # merged into the left neighbour
        keep_hi[drop] = False
        lo, hi = lo[keep_lo], hi[keep_hi]
    return [(int(a), int(b)) for a, b in zip(lo, hi)]


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
    plan (asserted in tests).

    Returns a small materialized DataFrame (≤ k rows): the internal
    decode caches are unpersisted before returning, so repeated calls
    in a long-lived driver don't accumulate cached blocks."""
    from bleve_spark.index.segments import decode_chunk_rows

    spark = store.spark
    chunks = store.chunk_rows().where(
        (F.col("field") == field) & F.col("term").isin(terms)
    ).persist()
    decoded_surv = None
    try:
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
        # S(d) ≤ Σ_t base_t(d)·qw_t ≤ B_{t*}(chunk) + Σ_{t'≠t*} Gmax.
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
        # base_rare(d)·qw_rare·(1/total) (coord ≥ 1/total, others ≥ 0)
        # — the k-th best of those partials lower-bounds the true k-th
        present = [t for t in terms if df_by_term.get(t, 0) > 0]
        if not present:
            empty = store.doc_table().select(*key_cols).where(
                F.lit(False)
            ).withColumn("score", F.lit(0.0))
            return spark.createDataFrame([], empty.schema)
        rare = min(present, key=lambda t: df_by_term[t])
        rare_scores = _term_scores(
            store, stats, field, rare, idfs[rare],
            spread=df_by_term[rare] >= _cfg.SPREAD_MIN_DF,
        )
        kth = rare_scores.orderBy(
            F.col("score").desc()
        ).limit(k).collect()
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
        with_bound = chunks.join(
            F.broadcast(others_df), "term"
        ).withColumn(
            "_bound", _bound_col(1.0, avg) * F.col("idf_qw")
        )
        surviving = with_bound.where(
            F.col("_bound") + F.col("others") >= F.lit(theta)
        ).select("segment_id", "term", "chunk_id", "n_docs")

        # pruning-effectiveness guard from metadata alone: when the
        # surviving chunks hold most of the postings anyway, the
        # two-stage candidate machinery costs more than the one
        # unpruned decode it would replace
        total_postings = sum(df_by_term.values())
        surv_postings = (
            surviving.agg(F.sum("n_docs").alias("s")).collect()[0]["s"]
            or 0
        )
        prune_wins = (
            theta > 0.0
            and surv_postings < PRUNE_MIN_BENEFIT * total_postings
        )

        blob_rows = store.chunk_rows(with_blobs=True).where(
            (F.col("field") == field) & F.col("term").isin(terms)
        )
        use_lens = store.has_posting_lens()
        spread = total_postings >= _cfg.SPREAD_MIN_DF
        surv_ids = surviving.select("segment_id", "term", "chunk_id")
        dels = store.deletions()

        if prune_wins:
            # stage 1: decode ONLY the surviving chunks → candidates
            surv_blob = blob_rows.join(
                F.broadcast(surv_ids),
                ["segment_id", "term", "chunk_id"], "left_semi",
            )
            decoded_surv = decode_chunk_rows(
                surv_blob, with_positions=False, with_norm=use_lens,
                with_chunk=True,
                spread=surv_postings >= _cfg.SPREAD_MIN_DF,
            )
            if dels is not None:
                decoded_surv = decoded_surv.join(
                    dels, "doc_num", "left_anti"
                )
            decoded_surv = decoded_surv.persist()

            # stage 2: the rescore needs every query-term posting of
            # every candidate — candidates live inside chunks whose
            # [min_doc, max_doc] overlaps a candidate interval, a
            # metadata-only filter BEFORE any further blob IO
            intervals = _candidate_intervals(decoded_surv)
            if not intervals:
                empty = store.doc_table().select(*key_cols).where(
                    F.lit(False)
                ).withColumn("score", F.lit(0.0))
                return spark.createDataFrame([], empty.schema)
            iv = F.array(*[
                F.struct(F.lit(lo).alias("lo"), F.lit(hi).alias("hi"))
                for lo, hi in intervals
            ])
            overlap = F.exists(
                iv,
                lambda r: (F.col("max_doc") >= r["lo"])
                & (F.col("min_doc") <= r["hi"]),
            )
            extra_blob = blob_rows.where(overlap).join(
                F.broadcast(surv_ids),
                ["segment_id", "term", "chunk_id"], "left_anti",
            )
            decoded_extra = decode_chunk_rows(
                extra_blob, with_positions=False, with_norm=use_lens,
                with_chunk=True, spread=spread,
            )
            candidates = decoded_surv.select("doc_num").distinct()
            decoded = decoded_surv.unionByName(decoded_extra).join(
                candidates, "doc_num", "left_semi"
            )
        else:
            # pruning can't win (θ=0 or survivors ≈ everything):
            # single unpruned decode — the plain bulk-disjunction plan
            decoded = decode_chunk_rows(
                blob_rows, with_positions=False, with_norm=use_lens,
                spread=spread,
            )
            if dels is not None:
                decoded = decoded.join(dels, "doc_num", "left_anti")

        meta = spark.createDataFrame(
            [(t, float(idfs[t]), float(idfs[t] * qn)) for t in terms],
            "term string, idf double, qw double",
        )
        tf = F.sqrt(F.col("tf").cast("double"))
        if use_lens:
            # norm rides in the postings: score + aggregate on
            # doc_num alone; the doc table enters only AFTER the
            # per-doc aggregation — a join over matched candidates,
            # not a corpus-sized norm lookup per posting
            joined = decoded.join(F.broadcast(meta), "term")
            norm = F.col("norm").cast("double")
        else:
            docs = store.doc_table().select(
                "doc_num", F.col(f"len_{field}").alias("_len")
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
                                      + (F.lit(BM25_B) * fl)
                                      / F.lit(avg)))
        ) * F.col("qw")
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
        order = [F.col("score").desc()] + [
            F.col(c).asc() for c in key_cols
        ]
        topk = result.orderBy(*order).limit(k)
        # materialize (≤ k rows) so every cache this call created can
        # be released before returning — a lazy return would leak the
        # persisted decode across queries in a long-lived driver
        rows = topk.collect()
        return spark.createDataFrame(rows, topk.schema)
    finally:
        chunks.unpersist()
        if decoded_surv is not None:
            decoded_surv.unpersist()
