"""Query-time synonym expansion: term@boost + synonyms@boost/2 as a
disjunction (reference NewSynonymSearcher,
/root/reference/search/searcher/search_term.go:154-196; synonym map
shape /root/reference/search/util.go:252)."""

import pytest


@pytest.fixture(scope="module")
def syn_index(spark, transcripts):
    from bleve_spark.index.build import index_table

    return index_table(
        transcripts,
        key_cols=["conv_id", "turn_idx"],
        fields={"text": "standard"},
        synonyms={"text": {"quick": ["fast", "rapid"]}},
    )


def test_synonym_equals_explicit_disjunction(syn_index, tindex):
    """term with synonyms ≡ disjunction(term@1, syn@0.5...) min=0 on a
    synonym-free index — scores identical."""
    from bleve_spark.search.searcher import search_df

    got = [
        (r["conv_id"], r["turn_idx"], round(r["score"], 9))
        for r in search_df(
            syn_index, {"field": "text", "term": "quick"}, size=15
        ).collect()
    ]
    want = [
        (r["conv_id"], r["turn_idx"], round(r["score"], 9))
        for r in search_df(
            tindex,
            {"disjuncts": [
                {"field": "text", "term": "quick"},
                {"field": "text", "term": "fast", "boost": 0.5},
                {"field": "text", "term": "rapid", "boost": 0.5},
            ], "min": 0},
            size=15,
        ).collect()
    ]
    assert got == want and len(got) == 15


def test_synonym_widens_match(syn_index, tindex, transcripts_pd):
    from bleve_spark.search.searcher import compile_query

    plain = compile_query(
        tindex, {"field": "text", "term": "quick"}
    ).count()
    expanded = compile_query(
        syn_index, {"field": "text", "term": "quick"}
    ).count()
    # corpus must actually contain 'fast'-only docs for this to widen
    has_fast_only = (
        transcripts_pd["text"].str.contains("fast").any()
    )
    assert expanded > plain or not has_fast_only


def test_no_synonyms_unaffected(syn_index, tindex):
    from bleve_spark.search.searcher import search_df

    q = {"field": "text", "term": "dogs"}
    a = [
        (r["conv_id"], r["turn_idx"], round(r["score"], 9))
        for r in search_df(syn_index, q, size=10).collect()
    ]
    b = [
        (r["conv_id"], r["turn_idx"], round(r["score"], 9))
        for r in search_df(tindex, q, size=10).collect()
    ]
    assert a == b
