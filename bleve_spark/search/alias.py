"""Index alias: scatter-gather search over N shard indexes.

Mirrors the reference's two-phase alias search
(/root/reference/index_alias_impl.go:197,1002 and pre_search.go:96-110):
phase 1 merges global stats (doc count + per-field cardinality summed
across shards — exactly bleve's BM25Stats accumulation), phase 2 runs
the query on every shard with the merged stats and concatenates.

Two scoring modes (a documented semantic switch):
* default — we ALSO globalize per-term doc frequency (summed via a
  unioned dictionary), so alias scores are EXACTLY the single-index
  scores: a stronger invariant than the reference (alias ≡ one
  index, asserted in tests), at the cost of not being bit-identical
  to bleve multi-shard deployments.
* strict_parity — bleve rank identity: global doc_count/avg_doc_len
  from the merged pre-search stats but PER-SHARD doc frequency and
  per-shard queryNorm, exactly like the reference (search_term.go:146
  keeps the local reader count even under GlobalScoring; each shard
  runs its own searcher tree). Use :func:`alias_search_df` with
  ``strict_parity=True``.

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
        # pre-search synonym phase (pre_search.go): the alias exposes
        # the union of shard thesauri so query-time expansion sees
        # synonym definitions indexed on ANY shard
        from bleve_spark.index.thesaurus import merge_thesauri

        merged_thes = merge_thesauri([i.thesaurus for i in indexes])
        syn_colls: dict = {}
        for i in indexes:
            syn_colls.update(i.synonym_collections or {})
        super().__init__(
            source=source,
            postings=postings,
            key_cols=list(keys),
            field_analyzers=dict(indexes[0].field_analyzers),
            stats=merged_stats(indexes),
            dictionary=dictionary,
            thesaurus=merged_thes,
            synonym_collections=syn_colls or None,
        )
        self.shards = list(indexes)


def compile_query_strict(
    indexes: list[IndexedTable], q: Q.Query | dict
) -> DataFrame:
    """Strict bleve parity: each shard compiles the query against its
    OWN dictionary (per-shard doc frequency + per-shard queryNorm,
    search_term.go:146) while doc_count/avg_doc_len come from the
    merged pre-search stats (pre_search.go:96-110). Returns the
    unioned scored rows."""
    import dataclasses

    merged = merged_stats(indexes)
    parts = [
        compile_query(dataclasses.replace(i, stats=merged), q)
        for i in indexes
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def alias_search_df(
    indexes: list[IndexedTable], q: Q.Query | dict, size: int = 10,
    from_: int = 0, strict_parity: bool = False,
) -> DataFrame:
    from bleve_spark.search.searcher import search_df

    if strict_parity:
        keys = indexes[0].key_cols
        scored = compile_query_strict(indexes, q)
        order = [F.col("score").desc()] + [F.col(k).asc() for k in keys]
        return scored.orderBy(*order).limit(from_ + size)
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
