"""Explain mode: the explanation tree's root value must equal the
engine score bit-for-bit (reference Explain,
/root/reference/search/explanation.go + scorer_term.go:159-197)."""

import pytest


QUERIES = [
    {"field": "text", "term": "quick"},
    {"field": "text", "match": "quick dogs"},
    {"field": "text", "match": "quick dogs", "operator": "and"},
    {"conjuncts": [
        {"field": "text", "term": "quick"},
        {"field": "text", "term": "dogs"},
    ]},
    {"disjuncts": [
        {"field": "text", "term": "quick"},
        {"field": "text", "term": "dogs"},
        {"field": "text", "term": "grep"},
    ], "min": 1},
    {
        "must": {"conjuncts": [{"field": "text", "term": "quick"}]},
        "should": {"disjuncts": [{"field": "text", "term": "dogs"}],
                   "min": 0},
        "must_not": {"disjuncts": [{"field": "role", "term": "system"}]},
    },
    {"field": "text", "match_phrase": "quick brown"},
]


@pytest.mark.parametrize("q", QUERIES, ids=[str(i) for i in
                                            range(len(QUERIES))])
def test_explanation_value_equals_score(tindex, q):
    from bleve_spark.search.searcher import search

    res = search(tindex, q, size=5, explain=True)
    assert res["hits"], f"no hits for {q}"
    for h in res["hits"]:
        e = h["explanation"]
        assert e is not None, f"missing explanation for {h['id']}"
        assert e["value"] == pytest.approx(h["score"], rel=0, abs=1e-12)


def test_explanation_tree_structure(tindex):
    from bleve_spark.search.searcher import search

    res = search(
        tindex, {"field": "text", "match": "quick dogs"}, size=3,
        explain=True,
    )
    e = res["hits"][0]["explanation"]
    # disjunction: product of (sum of term weights, coord)
    assert e["message"] == "product of:"
    [s, coord] = e["children"]
    assert s["message"] == "sum of:"
    assert coord["message"].startswith("coord(")
    term = s["children"][0]
    # composite → leaves carry queryWeight × fieldWeight products
    assert term["message"].startswith("weight(")
    qw, fw = term["children"]
    assert qw["message"].startswith("queryWeight(")
    assert fw["message"].startswith("fieldWeight(")
    msgs = [c["message"] for c in fw["children"]]
    assert any(m.startswith("tf(") for m in msgs)
    assert any(m.startswith("idf(") for m in msgs)
    assert any(m.startswith("fieldNorm(") for m in msgs)
