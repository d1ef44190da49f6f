"""Slop-phrase native path: the nested `exists` chain must accept the
exact same docs (and scores) as the reference-DFS pandas fallback
(findPhrasePaths, /root/reference/search/search_phrase.go:439)."""

import pytest
from pyspark.sql import functions as F

from bleve_spark.search import searcher as S
from bleve_spark.search.searcher import compile_query


# (query, must_match): must_match pins queries verified to hit the
# deterministic corpus so the equivalence isn't vacuously [] == []
SLOP_QUERIES = [
    ({"field": "text", "terms": ["quick", "fox"], "slop": 1}, True),
    ({"field": "text", "terms": ["cat", "quick", "score"], "slop": 4},
     True),
    ({"field": "text", "terms": ["quick", "brown", "fox"], "slop": 2},
     False),
    ({"field": "text", "match_phrase": "quick fox", "slop": 2}, True),
]


def _rows(ix, q):
    df = compile_query(ix, q).select(
        "conv_id", "turn_idx", F.round("score", 6).alias("s")
    )
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("q,must_match", SLOP_QUERIES,
                         ids=lambda v: str(v)[:60])
def test_native_slop_equals_dfs(tindex, q, must_match, monkeypatch):
    native = _rows(tindex, q)
    monkeypatch.setattr(S, "_SLOP_NATIVE_MAX_SLOTS", 0)
    dfs = _rows(tindex, q)
    assert native == dfs
    if must_match:
        assert native, "slop phrase should match at least one turn"


def test_python_dfs_budget_semantics():
    # shared budget: [1], [3], [4] with gaps 1,1 → costs |3-2|+|4-4|=1
    assert S._find_phrase_path([[1], [3], [4]], [1, 1], 1)
    # budget exceeded: |3-2| + |5-4| = 2 > 1
    assert not S._find_phrase_path([[1], [3], [5]], [1, 1], 1)
    # strict increase required even within budget
    assert not S._find_phrase_path([[5], [5]], [1], 2)
