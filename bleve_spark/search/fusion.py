"""Hybrid result fusion: reciprocal-rank (RRF) and relative-score (RSF).

Parity targets: /root/reference/fusion/rrf.go:34 (score =
Σ weight_i / (rank_i + k), default k=60) and /root/reference/fusion/
rsf.go:35 (min-max normalize each list's scores then weighted sum).
Both are pure window-function arithmetic — r7: the per-list windows
collapse into ONE window partitioned by a leg id over the unioned
lists (one exchange instead of one per list; ranks and min/max per
leg are unchanged), and RSF's per-list min/max driver collects become
window columns (two fewer Spark jobs per fusion).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

RRF_K = 60


def _union_legs(results: list[DataFrame], key_cols: list[str],
                weights: list[float]) -> DataFrame:
    parts = []
    for i, (df, w) in enumerate(zip(results, weights)):
        parts.append(
            df.select(
                *key_cols,
                F.col("score"),
                F.lit(i).alias("_leg"),
                F.lit(float(w)).alias("_w"),
            )
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return u


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
    collector outputs, never full scans): the per-leg rank is a
    single-partition-per-leg window, fine for k rows, a bottleneck for
    a full corpus. Pass ``input_k`` to have each list truncated here
    (orderBy+limit = TakeOrderedAndProject, distributed) when the
    caller can't guarantee pre-truncation."""
    weights = weights or [1.0] * len(results)
    order = [F.col("score").desc()] + [F.col(c).asc() for c in key_cols]
    if input_k is not None:
        results = [
            df.orderBy(*order).limit(int(input_k)) for df in results
        ]
    u = _union_legs(results, key_cols, weights)
    rank = F.row_number().over(
        Window.partitionBy("_leg").orderBy(*order)
    )
    contrib = u.select(
        *key_cols, (F.col("_w") / (rank + F.lit(int(k)))).alias("_c")
    )
    return contrib.groupBy(*key_cols).agg(F.sum("_c").alias("score"))


def rsf_fuse(
    results: list[DataFrame],
    key_cols: list[str],
    weights: list[float] | None = None,
) -> DataFrame:
    """Relative-score fusion: per-list min-max normalization, weighted
    sum (rsf.go:35). Lists with constant scores normalize to 1.0."""
    weights = weights or [1.0] * len(results)
    u = _union_legs(results, key_cols, weights)
    leg = Window.partitionBy("_leg")
    lo = F.min("score").over(leg)
    hi = F.max("score").over(leg)
    span = hi - lo
    norm = F.when(span > 0, (F.col("score") - lo) / span).otherwise(
        F.lit(1.0)
    )
    contrib = u.select(
        *key_cols, (norm * F.col("_w")).alias("_c")
    )
    return contrib.groupBy(*key_cols).agg(F.sum("_c").alias("score"))
