"""Index alias: scatter-gather search over N shard indexes.

Mirrors the reference's two-phase alias search
(/root/reference/index_alias_impl.go:197,1002 and pre_search.go:96-110):
phase 1 merges global stats (doc count + per-field cardinality summed
across shards — exactly bleve's BM25Stats accumulation), phase 2 runs
the query on every shard with the merged stats and concatenates.

Deliberate improvement over the reference: we also globalize per-term
doc frequency (summed via a unioned dictionary), so alias scores are
EXACTLY the single-index scores. The reference leaves docTerm
per-shard (search_term.go:146 uses the local reader count even under
GlobalScoring), which makes alias scores shard-layout-dependent; our
stronger invariant is asserted in tests (alias(2 shards) ≡ one index).

In Spark a distributed query already IS the alias case (partitions =
shards); this module exists for API parity and for federating indexes
built separately (e.g. per-day transcript indexes).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from bleve_spark.index.build import IndexStats, IndexedTable
from bleve_spark.search import query as Q
from bleve_spark.search.searcher import compile_query


def merged_stats(indexes: list[IndexedTable]) -> IndexStats:
    """pre_search.go:96-110: sum doc counts and field cardinalities,
    avg_doc_len = ceil(Σcard / Σcount)."""
    doc_count = sum(i.stats.doc_count for i in indexes)
    card: dict[str, int] = {}
    for i in indexes:
        for f, c in i.stats.field_cardinality.items():
            card[f] = card.get(f, 0) + c
    avg = {
        f: (math.ceil(c / doc_count) if doc_count else 0.0)
        for f, c in card.items()
    }
    return IndexStats(
        doc_count=doc_count,
        field_cardinality=card,
        avg_doc_len=avg,
        scoring=indexes[0].stats.scoring,
    )


class AliasIndex(IndexedTable):
    """A virtual IndexedTable unioning shard postings with merged
    global stats — compiles through the ordinary searcher."""

    def __init__(self, indexes: list[IndexedTable]):
        if not indexes:
            raise ValueError("alias needs at least one index")
        keys = indexes[0].key_cols
        for i in indexes[1:]:
            if i.key_cols != keys:
                raise ValueError("alias shards must share key columns")
        postings = indexes[0].postings
        source = indexes[0].source
        for i in indexes[1:]:
            postings = postings.unionByName(i.postings)
            source = source.unionByName(i.source)
        dictionary = (
            postings.groupBy("field", "term")
            .agg(
                F.count(F.lit(1)).alias("doc_freq"),
                F.max("tf").alias("max_tf"),
                F.min("norm").alias("min_norm"),
            )
        )
        super().__init__(
            source=source,
            postings=postings,
            key_cols=list(keys),
            field_analyzers=dict(indexes[0].field_analyzers),
            stats=merged_stats(indexes),
            dictionary=dictionary,
        )


def alias_search_df(
    indexes: list[IndexedTable], q: Q.Query | dict, size: int = 10,
    from_: int = 0,
) -> DataFrame:
    from bleve_spark.search.searcher import search_df

    return search_df(AliasIndex(indexes), q, size=size, from_=from_)


def alias_search(indexes: list[IndexedTable], q: Q.Query | dict,
                 **kw) -> dict:
    from bleve_spark.search.searcher import search

    return search(AliasIndex(indexes), q, **kw)


__all__ = [
    "AliasIndex",
    "alias_search",
    "alias_search_df",
    "merged_stats",
    "compile_query",
]
