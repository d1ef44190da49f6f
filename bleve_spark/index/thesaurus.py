"""Index-time synonym thesaurus.

The reference models synonyms as indexed documents: a ``Batch.
IndexSynonym(id, collection, definition)`` call analyzes each input /
synonym phrase with the synonym source's analyzer, drops any that
don't reduce to exactly ONE token, and stores a term → synonyms map in
a thesaurus collection that lives INSIDE the index and travels with
its segments (/root/reference/index.go:360-390,
document/field_synonym.go:79-141, index/scorch/snapshot_index_thes.go).
Queries on a field wired to a synonym source expand through the
thesaurus at search time; alias searches run a pre-search phase that
merges thesauri across shards (pre_search.go).

Spark-native shape: the thesaurus is a DataFrame of
``(collection, term, synonym)`` pairs attached to the IndexedTable —
it distributes with the index (persisted/written next to the postings)
and never requires collecting the whole mapping to the driver; lookups
for a query's terms are bounded ``limit(cap)`` pulls, the same
discipline as dictionary expansion.

SynonymDefinition semantics (index.go:360-376):
* ``input`` non-empty → unidirectional: every input term maps to all
  synonyms.
* ``input`` empty → bidirectional: every synonym maps to all OTHER
  synonyms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from bleve_spark.analysis.analyzers import get_analyzer

# a term with more synonyms than this is served by the distributed
# disjunction path rather than a driver-side list (same contract as
# dictionary expansion's cache cap)
SYNONYM_CACHE_MAX = 4096


def _analyze_one(analyzer, phrase: str) -> str | None:
    """document/field_synonym.go:143-149 — a synonym entry is usable
    only if the analyzer reduces it to exactly one token."""
    toks = [t for t, _ in analyzer.analyze_terms(phrase)]
    return toks[0] if len(toks) == 1 else None


def build_thesaurus(
    spark: SparkSession,
    definitions: list[dict],
    analyzer: str = "standard",
    collection: str = "default",
) -> DataFrame:
    """Analyze SynonymDefinitions and return the thesaurus DataFrame
    ``(collection, term, synonym)``.

    ``definitions`` uses the reference's JSON shape:
    ``{"input": [...], "synonyms": [...]}`` (input optional).
    Definitions are configuration-scale (they arrive through the same
    batch API as documents but are a vocabulary, not a corpus), so
    analysis happens on the driver with the exact single-token rule;
    the RESULT is distributed and all query-time use stays bounded.
    """
    an = get_analyzer(analyzer)
    rows: list[tuple[str, str, str]] = []
    seen: set[tuple[str, str]] = set()
    for d in definitions:
        inputs = [t for t in (
            _analyze_one(an, p) for p in d.get("input") or []
        ) if t]
        syns = [t for t in (
            _analyze_one(an, p) for p in d.get("synonyms") or []
        ) if t]
        if inputs:
            pairs = ((i, s) for i in inputs for s in syns)
        else:
            pairs = ((a, b) for a in syns for b in syns if a != b)
        for term, syn in pairs:
            if (term, syn) not in seen:
                seen.add((term, syn))
                rows.append((collection, term, syn))
    return spark.createDataFrame(
        rows or [("", "", "")],
        "collection string, term string, synonym string",
    ).filter("term <> ''")


def merge_thesauri(dfs: list[DataFrame]) -> DataFrame | None:
    """Alias pre-search (pre_search.go): union shard thesauri,
    de-duplicated, before the query phase."""
    dfs = [d for d in dfs if d is not None]
    if not dfs:
        return None
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out.distinct()
