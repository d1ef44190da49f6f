"""Distributed dictionary expansion (SDictDisj) — the scale path for
prefix/regexp/wildcard/fuzzy/term-range when the term dictionary cannot
be cached driver-side (DICT_CACHE_MAX=0 forces it here).

Contract: the distributed dictionary→postings join must be
score-identical to the r01-verified driver-cached expansion, and both
paths must enforce the reference's tooManyClauses guard
(/root/reference/search/searcher/search_disjunction.go:25-28,127-137).
"""

import dataclasses

import pytest
from pyspark.sql import functions as F

from bleve_spark.search import searcher as S
from bleve_spark.search.searcher import compile_query


@pytest.fixture(scope="module")
def tindex_nodict(tindex):
    return dataclasses.replace(tindex, dict_cache_max=0, _dict_map=None)


def _rows(ix, q):
    df = compile_query(ix, q).select(
        "conv_id", "turn_idx", F.round("score", 6).alias("s")
    )
    return sorted(tuple(r) for r in df.collect())


EXPANSION_QUERIES = [
    {"field": "text", "prefix": "re"},
    {"field": "text", "prefix": "marker"},
    {"field": "text", "term": "eror", "fuzziness": 1},
    {"field": "text", "term": "errr", "fuzziness": "auto"},
    {"field": "text", "wildcard": "err*"},
    {"field": "text", "regexp": "err.+"},
    {"field": "text", "min": "a", "max": "m",
     "inclusive_min": True, "inclusive_max": False},
    # expansion nested under a boolean: SDictDisj.weight feeds the
    # outer composite's queryNorm
    {"must": {"conjuncts": [{"field": "text", "prefix": "err"}]},
     "should": {"disjuncts": [{"field": "text", "term": "query"}],
                "min": 0}},
]


@pytest.mark.parametrize("q", EXPANSION_QUERIES,
                         ids=lambda q: str(sorted(q))[:50])
def test_distributed_expansion_matches_cached(tindex, tindex_nodict, q):
    cached = _rows(tindex, q)
    dist = _rows(tindex_nodict, q)
    assert cached, "query must match something for the test to mean anything"
    assert dist == cached


def test_distributed_path_never_caches_dictionary(tindex_nodict):
    _rows(tindex_nodict, {"field": "text", "prefix": "re"})
    # cache must have been refused, not populated
    assert tindex_nodict._dict_map is False


def test_too_many_clauses_both_paths(tindex, tindex_nodict):
    old = S.DisjunctionMaxClauseCount
    S.DisjunctionMaxClauseCount = 5
    try:
        for ix in (tindex, tindex_nodict):
            with pytest.raises(S.TooManyClausesError):
                _rows(ix, {"field": "text", "prefix": "marker"})
    finally:
        S.DisjunctionMaxClauseCount = old


def test_empty_distributed_expansion_is_none(tindex_nodict):
    assert _rows(tindex_nodict,
                 {"field": "text", "prefix": "zzzznope"}) == []


def test_explain_distributed_expansion(tindex_nodict):
    """Explanation root value must equal the engine score on the
    SDictDisj path too."""
    from bleve_spark.search.explain import explain_hits

    q = {"field": "text", "prefix": "err"}
    top = (
        compile_query(tindex_nodict, q)
        .orderBy(F.col("score").desc(), "conv_id", "turn_idx")
        .limit(3)
        .collect()
    )
    keys = [(r["conv_id"], r["turn_idx"]) for r in top]
    expls = explain_hits(tindex_nodict, q, keys)
    for r, e in zip(top, expls):
        assert e is not None
        assert abs(e["value"] - r["score"]) < 1e-9
