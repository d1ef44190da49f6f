"""Hybrid result fusion: reciprocal-rank (RRF) and relative-score (RSF).

Parity targets: /root/reference/fusion/rrf.go:34 (score =
Σ weight_i / (rank_i + k), default k=60) and /root/reference/fusion/
rsf.go:35 (min-max normalize each list's scores then weighted sum).
Both are pure window-function arithmetic — one shuffle per input list
for the rank, one groupBy to merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

RRF_K = 60


def rrf_fuse(
    results: list[DataFrame],
    key_cols: list[str],
    k: int = RRF_K,
    weights: list[float] | None = None,
    input_k: int | None = None,
) -> DataFrame:
    """results: scored DataFrames (keys..., score) → fused
    (keys..., score) where score = Σ w_i/(rank_i + k); rank is 1-based
    by (score desc, keys asc) within each list.

    Each input MUST be a bounded top-k hit list (the reference fuses
    collector outputs, never full scans): the global rank is a
    single-partition window, fine for k rows, a bottleneck for a full
    corpus. Pass ``input_k`` to have each list truncated here
    (orderBy+limit = TakeOrderedAndProject, distributed) when the
    caller can't guarantee pre-truncation."""
    weights = weights or [1.0] * len(results)
    parts = []
    order = [F.col("score").desc()] + [F.col(c).asc() for c in key_cols]
    for df, w in zip(results, weights):
        if input_k is not None:
            df = df.orderBy(*order).limit(int(input_k))
        rank = F.row_number().over(Window.orderBy(*order))
        parts.append(
            df.select(
                *key_cols,
                (F.lit(float(w)) / (rank + F.lit(int(k)))).alias("_c"),
            )
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return u.groupBy(*key_cols).agg(F.sum("_c").alias("score"))


def rsf_fuse(
    results: list[DataFrame],
    key_cols: list[str],
    weights: list[float] | None = None,
) -> DataFrame:
    """Relative-score fusion: per-list min-max normalization, weighted
    sum (rsf.go:35). Lists with constant scores normalize to 1.0."""
    weights = weights or [1.0] * len(results)
    parts = []
    for df, w in zip(results, weights):
        mm = df.agg(
            F.min("score").alias("lo"), F.max("score").alias("hi")
        ).collect()[0]
        lo, hi = float(mm["lo"] or 0.0), float(mm["hi"] or 0.0)
        span = hi - lo
        if span > 0:
            norm = (F.col("score") - F.lit(lo)) / F.lit(span)
        else:
            norm = F.lit(1.0)
        parts.append(
            df.select(
                *key_cols, (norm * F.lit(float(w))).alias("_c")
            )
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return u.groupBy(*key_cols).agg(F.sum("_c").alias("score"))
