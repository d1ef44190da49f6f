"""Facets: terms / numeric-range / datetime-range over matched docs.

Reference: /root/reference/search/facets_builder.go:111,404 (per-hit
docvalue visit → hash count) and search/facet/facet_builder_*.go.
In Spark the docvalue visit is just a join hits×source followed by a
groupBy — and the cross-shard FacetResult.Merge
(facets_builder.go:320-386) is the same shuffle, for free.

Terms facets are ordered by count desc then term asc; ``other`` counts
the mass beyond the requested size; ``missing`` counts matched docs with
NULL in the facet field.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from bleve_spark.index.build import IndexedTable


def _matched_source(idx: IndexedTable, scored: DataFrame) -> DataFrame:
    return idx.source.join(
        scored.select(*idx.key_cols), idx.key_cols, "left_semi"
    )


def _term_filter_pred(field: str, prefix: str | None, regex: str | None):
    """Prefix/regex term filter (facet_builder_terms.go:79-105). The
    reference's regex is an UNANCHORED match (regexp.Match), unlike the
    dictionary automaton in regexp queries."""
    pred = F.lit(True)
    if prefix:
        pred = pred & F.col(field).startswith(prefix)
    if regex:
        # rlike is unanchored, matching Go's regexp.Match semantics
        pred = pred & F.col(field).rlike(regex)
    return pred


def terms_facet(
    idx: IndexedTable,
    scored: DataFrame,
    field: str,
    size: int = 10,
    prefix: str | None = None,
    regex: str | None = None,
) -> dict:
    """Fully distributed: the only driver collects are one stats row
    (total/missing) and the ``size`` result buckets — a high-cardinality
    facet field never floods the driver (the reference's per-hit hash
    map is bounded the same way by its own size truncation,
    facet_builder_terms.go:118-134).

    Filter semantics (facet_builder_terms.go:92-121): ``total`` counts
    every visited term (filtered or not); a doc whose terms all FAIL
    the filter counts as ``missing`` (sawValue stays false); buckets
    count only filter-passing terms; other = total − Σ top counts."""
    src = _matched_source(idx, scored).persist()
    match = _term_filter_pred(field, prefix, regex)
    try:
        stats = src.agg(
            F.sum(
                F.when(F.col(field).isNotNull(), 1).otherwise(0)
            ).alias("total"),
            F.sum(
                F.when(
                    F.col(field).isNull()
                    | (F.col(field).isNotNull() & ~match),
                    1,
                ).otherwise(0)
            ).alias("missing"),
        ).collect()[0]
        top = terms_facet_df(
            idx, src.select(*idx.key_cols), field, size,
            prefix=prefix, regex=regex,
        ).collect()
    finally:
        src.unpersist()
    total = int(stats["total"] or 0)
    buckets = [(r["term"], int(r["count"])) for r in top]
    other = total - sum(c for _, c in buckets)
    return {
        "field": field,
        "total": total,
        "missing": int(stats["missing"] or 0),
        "other": other,
        "terms": [{"term": t, "count": c} for t, c in buckets],
    }


def numeric_range_facet(
    idx: IndexedTable,
    scored: DataFrame,
    field: str,
    ranges: list[dict],
) -> dict:
    """``ranges``: [{"name": ..., "min": x|None, "max": y|None}] —
    min inclusive, max exclusive (facet_builder_numeric.go:53-133)."""
    src = _matched_source(idx, scored)
    col = F.col(field)
    agg_exprs = []
    for r in ranges:
        cond = F.lit(True)
        if r.get("min") is not None:
            cond = cond & (col >= float(r["min"]))
        if r.get("max") is not None:
            cond = cond & (col < float(r["max"]))
        cond = cond & col.isNotNull()
        agg_exprs.append(
            F.sum(F.when(cond, 1).otherwise(0)).alias(r["name"])
        )
    agg_exprs.append(
        F.sum(F.when(col.isNull(), 1).otherwise(0)).alias("__missing")
    )
    agg_exprs.append(F.count(F.lit(1)).alias("__total"))
    row = src.agg(*agg_exprs).collect()[0]
    buckets = [
        {
            "name": r["name"],
            "min": r.get("min"),
            "max": r.get("max"),
            "count": int(row[r["name"]]),
        }
        for r in ranges
    ]
    total = int(row["__total"])
    return {
        "field": field,
        "total": total,
        "missing": int(row["__missing"]),
        # facet_builder_numeric Result(): other = total − Σ kept
        # bucket counts (0 when the ranges partition the values)
        "other": total - int(row["__missing"])
        - sum(b["count"] for b in buckets),
        "numeric_ranges": buckets,
    }


def datetime_range_facet(
    idx: IndexedTable,
    scored: DataFrame,
    field: str,
    ranges: list[dict],
) -> dict:
    """``ranges``: [{"name":..., "start": iso|None, "end": iso|None}]."""
    src = _matched_source(idx, scored)
    col = F.col(field)
    agg_exprs = []
    for r in ranges:
        cond = col.isNotNull()
        if r.get("start"):
            cond = cond & (col >= F.to_timestamp(F.lit(r["start"])))
        if r.get("end"):
            cond = cond & (col < F.to_timestamp(F.lit(r["end"])))
        agg_exprs.append(
            F.sum(F.when(cond, 1).otherwise(0)).alias(r["name"])
        )
    agg_exprs.append(
        F.sum(F.when(col.isNull(), 1).otherwise(0)).alias("__missing")
    )
    agg_exprs.append(F.count(F.lit(1)).alias("__total"))
    row = src.agg(*agg_exprs).collect()[0]
    total = int(row["__total"])
    counts = [int(row[r["name"]]) for r in ranges]
    return {
        "field": field,
        "total": total,
        "missing": int(row["__missing"]),
        "other": total - int(row["__missing"]) - sum(counts),
        "date_ranges": [
            {
                "name": r["name"],
                "start": r.get("start"),
                "end": r.get("end"),
                "count": int(row[r["name"]]),
            }
            for r in ranges
        ],
    }


def terms_facet_df(
    idx: IndexedTable,
    scored: DataFrame,
    field: str,
    size: int = 10,
    prefix: str | None = None,
    regex: str | None = None,
) -> DataFrame:
    """DataFrame variant of :func:`terms_facet` (term, count), ordered
    count desc / term asc, limited to ``size`` — the distributed facet
    path (merge-across-shards is the groupBy shuffle). ``prefix`` /
    ``regex`` filter terms before counting (facet_builder_terms.go)."""
    src = _matched_source(idx, scored)
    return (
        src.where(
            F.col(field).isNotNull()
            & _term_filter_pred(field, prefix, regex)
        )
        .groupBy(F.col(field).alias("term"))
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy(F.col("count").desc(), F.col("term").asc())
        .limit(size)
    )


def compute_facets(
    idx: IndexedTable, scored: DataFrame, requests: dict
) -> dict:
    """``requests``: {name: {"field":..., "size":N}} or with
    "numeric_ranges"/"date_ranges" lists — mirroring the reference's
    FacetRequest JSON (/root/reference/index_impl.go:891-950)."""
    out = {}
    for name, req in requests.items():
        if "numeric_ranges" in req:
            out[name] = numeric_range_facet(
                idx, scored, req["field"], req["numeric_ranges"]
            )
        elif "date_ranges" in req:
            out[name] = datetime_range_facet(
                idx, scored, req["field"], req["date_ranges"]
            )
        else:
            out[name] = terms_facet(
                idx, scored, req["field"], int(req.get("size", 10)),
                prefix=req.get("prefix"), regex=req.get("regex"),
            )
    return out
