"""End-to-end rank-identity: Spark engine vs the independent NumPy oracle
on the synthetic transcript corpus — the role the reference's
cross-engine versus tests play (/root/reference/test/versus_score_test.go)."""

import math

import pytest

from bleve_spark.search.searcher import search
from tests import oracle as O


def ids_scores(hits):
    return [(h["id"], h["score"]) for h in hits]


def oracle_ids_scores(ranked):
    return [
        (f"{k[0]}:{k[1]}", s) for k, s in ranked
    ]


def assert_rank_identical(engine_hits, oracle_ranked, rel=1e-9):
    e = ids_scores(engine_hits)
    o = oracle_ids_scores(oracle_ranked)
    assert [x[0] for x in e] == [x[0] for x in o], (e, o)
    for (eid, es), (_, os) in zip(e, o):
        assert es == pytest.approx(os, rel=rel), (eid, es, os)


def run_both(tindex, toracle, engine_q, oracle_node, size=10):
    res = search(tindex, engine_q, size=size)
    expected = toracle.search(oracle_node, size=size)
    assert_rank_identical(res["hits"], expected)
    assert res["total_hits"] == len(toracle.eval(
        oracle_node,
        _root_qn(toracle, oracle_node),
    ))
    return res


def _root_qn(toracle, node):
    if node["type"] in ("conj", "disj", "bool", "phrase"):
        w = toracle.weight(node)
        return 1.0 / math.sqrt(w) if w > 0 else 1.0
    return 1.0


# ------------------------------------------------------------- tests --


def test_term_rare_marker(tindex, toracle):
    run_both(
        tindex, toracle,
        {"field": "text", "term": "marker_017"},
        O.term("text", "marker_017"),
    )


def test_term_common(tindex, toracle):
    run_both(
        tindex, toracle,
        {"field": "text", "term": "quick"},
        O.term("text", "quick"),
        size=15,
    )


def test_term_on_keyword_field(tindex, toracle):
    run_both(
        tindex, toracle,
        {"field": "tool", "term": "grep"},
        O.term("tool", "grep"),
    )


def test_match_or(tindex, toracle):
    run_both(
        tindex, toracle,
        {"field": "text", "match": "quick Dogs"},
        O.disj([O.term("text", "quick"), O.term("text", "dogs")], min=1),
    )


def test_match_and(tindex, toracle):
    run_both(
        tindex, toracle,
        {"field": "text", "match": "quick dogs", "operator": "and"},
        O.conj([O.term("text", "quick"), O.term("text", "dogs")]),
    )


def test_disjunction_min2_coord(tindex, toracle):
    disjuncts = [
        {"field": "text", "term": "quick"},
        {"field": "text", "term": "brown"},
        {"field": "text", "term": "dogs"},
    ]
    run_both(
        tindex, toracle,
        {"disjuncts": disjuncts, "min": 2},
        O.disj(
            [O.term("text", "quick"), O.term("text", "brown"),
             O.term("text", "dogs")],
            min=2,
        ),
    )


def test_conjunction_sum(tindex, toracle):
    run_both(
        tindex, toracle,
        {"conjuncts": [
            {"field": "text", "term": "search"},
            {"field": "text", "term": "data"},
        ]},
        O.conj([O.term("text", "search"), O.term("text", "data")]),
    )


def test_boolean_must_should_mustnot(tindex, toracle):
    engine_q = {
        "must": {"conjuncts": [{"field": "text", "term": "quick"}]},
        "should": {"disjuncts": [{"field": "text", "term": "dogs"}],
                   "min": 0},
        "must_not": {"disjuncts": [{"field": "role", "term": "system"}]},
    }
    oracle_node = {
        "type": "bool",
        "must": O.conj([O.term("text", "quick")]),
        "should": O.disj([O.term("text", "dogs")], min=0),
        "must_not": O.disj([O.term("role", "system")], min=0),
    }
    run_both(tindex, toracle, engine_q, oracle_node)


def test_boolean_with_boost(tindex, toracle):
    engine_q = {
        "must": {"conjuncts": [{"field": "text", "term": "quick"}]},
        "should": {"disjuncts": [
            {"field": "text", "term": "dogs", "boost": 2.0}], "min": 0},
    }
    oracle_node = {
        "type": "bool",
        "must": O.conj([O.term("text", "quick")]),
        "should": O.disj([O.term("text", "dogs", boost=2.0)], min=0),
    }
    run_both(tindex, toracle, engine_q, oracle_node)


def test_match_phrase(tindex, toracle, transcripts_pd):
    # pick a real 3-word window from the corpus so the phrase exists
    text = transcripts_pd.iloc[0]["text"]
    words = text.split()[:3]
    phrase = " ".join(words)
    from bleve_spark.analysis.analyzers import REGISTRY

    pairs = REGISTRY["standard"].analyze_terms(phrase)
    assert pairs, "need analyzable phrase"
    oracle_node = {
        "type": "phrase",
        "field": "text",
        "boost": 1.0,
        "slots": [(p, [t]) for t, p in pairs],
    }
    res = search(tindex, {"field": "text", "match_phrase": phrase}, size=10)
    expected = toracle.search(oracle_node, size=10)
    assert_rank_identical(res["hits"], expected)
    assert res["total_hits"] >= 1


def test_prefix_expansion(tindex, toracle):
    terms = toracle.expand_prefix("text", "marker_0")
    assert terms
    run_both(
        tindex, toracle,
        {"field": "text", "prefix": "marker_0"},
        O.disj([O.term("text", t) for t in terms], min=0),
        size=12,
    )


def test_regexp(tindex, toracle):
    rx = "marker_0[0-9]{2}"
    terms = toracle.expand_regexp("text", rx)
    run_both(
        tindex, toracle,
        {"field": "text", "regexp": rx},
        O.disj([O.term("text", t) for t in terms], min=0),
    )


def test_wildcard(tindex, toracle):
    terms = toracle.expand_regexp("text", "marker_0.3")
    run_both(
        tindex, toracle,
        {"field": "text", "wildcard": "marker_0?3"},
        O.disj([O.term("text", t) for t in terms], min=0),
    )


def test_fuzzy_with_distance_boost(tindex, toracle):
    cands = toracle.expand_fuzzy("text", "quikc", 2)
    assert any(t == "quick" for t, _ in cands)
    run_both(
        tindex, toracle,
        {"field": "text", "term": "quikc", "fuzziness": 2},
        O.disj(
            [O.term("text", t, boost_mult=1.0 / (d + 1.0))
             for t, d in cands],
            min=0,
        ),
    )


def test_term_range(tindex, toracle):
    terms = sorted(
        t for t in toracle.postings["text"]
        if "marker_010" <= t < "marker_020"
    )
    run_both(
        tindex, toracle,
        {"field": "text", "min": "marker_010", "max": "marker_020",
         "inclusive_min": True, "inclusive_max": False},
        O.disj([O.term("text", t) for t in terms], min=0),
    )


def test_numeric_range_constant_score(tindex, toracle, transcripts_pd):
    keys = [
        (r.conv_id, int(r.turn_idx))
        for r in transcripts_pd.itertuples()
        if 2 <= r.turn_idx < 5
    ]
    run_both(
        tindex, toracle,
        {"field": "turn_idx", "min": 2, "max": 5,
         "inclusive_min": True, "inclusive_max": False},
        {"type": "const", "keys": keys, "boost": 1.0},
        size=20,
    )


def test_date_range(tindex, toracle, transcripts_pd):
    import pandas as pd

    lo = pd.Timestamp("2026-01-05T00:00:00")
    hi = pd.Timestamp("2026-01-12T00:00:00")
    keys = [
        (r.conv_id, int(r.turn_idx))
        for r in transcripts_pd.itertuples()
        if lo <= r.ts < hi
    ]
    run_both(
        tindex, toracle,
        {"field": "ts", "start": "2026-01-05T00:00:00",
         "end": "2026-01-12T00:00:00"},
        {"type": "const", "keys": keys, "boost": 1.0},
        size=25,
    )


def test_ids_query(tindex, toracle, transcripts_pd):
    ids = ["conv00000003:0", "conv00000005:1", "conv00000007:2"]
    keys = [
        (r.conv_id, int(r.turn_idx))
        for r in transcripts_pd.itertuples()
        if f"{r.conv_id}:{r.turn_idx}" in ids
    ]
    run_both(
        tindex, toracle,
        {"ids": ids},
        {"type": "const", "keys": keys, "boost": 1.0},
    )


def test_match_all_tiebreak(tindex, toracle, transcripts_pd):
    keys = [
        (r.conv_id, int(r.turn_idx)) for r in transcripts_pd.itertuples()
    ]
    res = run_both(
        tindex, toracle,
        {"match_all": {}},
        {"type": "const", "keys": keys, "boost": 1.0},
        size=5,
    )
    # ties broken by ascending doc key = index natural order
    assert [h["id"] for h in res["hits"]] == [
        f"{k[0]}:{k[1]}" for k in sorted(keys)[:5]
    ]


def test_match_none(tindex):
    res = search(tindex, {"match_none": {}})
    assert res["total_hits"] == 0 and res["hits"] == []


def test_pagination(tindex, toracle):
    full = search(tindex, {"field": "text", "term": "quick"}, size=20)
    page = search(
        tindex, {"field": "text", "term": "quick"}, size=5, from_=5
    )
    assert ids_scores(page["hits"]) == ids_scores(full["hits"])[5:10]


def test_query_string(tindex, toracle):
    engine_q = {"query": "+text:quick -role:system text:dogs^2"}
    oracle_node = {
        "type": "bool",
        "must": O.conj([O.disj([O.term("text", "quick")], min=1)]),
        "should": O.disj(
            [O.disj([O.term("text", "dogs", boost=2.0)], min=1)], min=0
        ),
        "must_not": O.disj([O.disj([O.term("role", "system")], min=1)],
                           min=0),
    }
    run_both(tindex, toracle, engine_q, oracle_node)


def test_facets(tindex):
    res = search(
        tindex,
        {"match_all": {}},
        size=1,
        facets={"roles": {"field": "role", "size": 4}},
    )
    fr = res["facets"]["roles"]
    assert fr["total"] == res["total_hits"]
    assert {t["term"] for t in fr["terms"]} == {
        "user", "assistant", "system", "tool"
    }
    assert fr["terms"] == sorted(
        fr["terms"], key=lambda t: (-t["count"], t["term"])
    )


def test_facet_term_filters(tindex):
    """facet_builder_terms.go:92-121: total counts ALL visited terms;
    a doc whose value fails the filter counts as missing; buckets only
    over filter-passing terms."""
    res = search(
        tindex, {"match_all": {}}, size=1,
        facets={
            "pfx": {"field": "role", "size": 4, "prefix": "s"},
            "rex": {"field": "role", "size": 4, "regex": "^(user|tool)$"},
        },
    )
    pfx = res["facets"]["pfx"]
    assert {t["term"] for t in pfx["terms"]} == {"system"}
    assert pfx["total"] == res["total_hits"]  # all visited terms
    # filtered-out docs count as missing (sawValue stays false)
    assert pfx["missing"] == pfx["total"] - sum(
        t["count"] for t in pfx["terms"]
    )
    rex = res["facets"]["rex"]
    assert {t["term"] for t in rex["terms"]} == {"user", "tool"}


def test_highlight(tindex):
    res = search(
        tindex,
        {"field": "text", "term": "marker_017"},
        size=3,
        highlight_field="text",
    )
    assert res["hits"]
    frag = res["hits"][0]["fragments"]["text"][0]
    assert "<mark>marker_017</mark>" in frag


def test_partition_invariance(spark, transcripts, toracle):
    """TestBM25GlobalScoring analogue (/root/reference/index_test.go:447):
    same corpus, different partitioning → identical scores."""
    from bleve_spark.index.build import index_table

    idx1 = index_table(
        transcripts.repartition(1),
        key_cols=["conv_id", "turn_idx"],
        fields={"text": "standard"},
        scoring="bm25",
        persist=False,
    )
    idx7 = index_table(
        transcripts.repartition(7),
        key_cols=["conv_id", "turn_idx"],
        fields={"text": "standard"},
        scoring="bm25",
        persist=False,
    )
    q = {"field": "text", "match": "quick dogs search"}
    h1 = search(idx1, q, size=10)["hits"]
    h7 = search(idx7, q, size=10)["hits"]
    assert ids_scores(h1) == ids_scores(h7)


def test_tfidf_scoring_mode(spark, transcripts, transcripts_pd):
    from bleve_spark.index.build import index_table
    from tests.oracle import PyIndex

    idx = index_table(
        transcripts,
        key_cols=["conv_id", "turn_idx"],
        fields={"text": "standard"},
        scoring="tfidf",
        persist=False,
    )
    orc = PyIndex(
        transcripts_pd.to_dict("records"),
        key_fn=lambda r: (r["conv_id"], int(r["turn_idx"])),
        fields={"text": "standard"},
        scoring="tfidf",
    )
    res = search(idx, {"field": "text", "term": "quick"}, size=10)
    expected = orc.search(O.term("text", "quick"), size=10)
    assert_rank_identical(res["hits"], expected)


def test_geo_bbox_dateline_wrap(spark, tindex):
    """minLon > maxLon wraps the dateline — two lon ranges OR'd
    (reference search_geoboundingbox.go split)."""
    from pyspark.sql import functions as F

    from bleve_spark.search.searcher import compile_query

    import dataclasses

    src = tindex.source.withColumn(
        "geo_lat", (F.crc32(F.col("conv_id")) % 181 - 90).cast("double")
    ).withColumn(
        "geo_lon",
        ((F.crc32(F.col("conv_id")) * 7) % 361 - 180).cast("double"),
    )
    idx = dataclasses.replace(tindex, source=src)
    q = {"field": "geo",
         "top_left": {"lon": 150.0, "lat": 90.0},
         "bottom_right": {"lon": -150.0, "lat": -90.0}}
    got = {
        (r["conv_id"], r["turn_idx"])
        for r in compile_query(idx, q).collect()
    }
    want = {
        (r["conv_id"], r["turn_idx"])
        for r in src.where(
            (F.col("geo_lon") >= 150.0) | (F.col("geo_lon") <= -150.0)
        ).select("conv_id", "turn_idx").collect()
    }
    assert got == want and len(want) > 0


def test_composite_all_field(spark, transcripts):
    """_all composite (document/field_composite.go:33-41): terms from
    every member column are searchable under one field."""
    from bleve_spark.index.build import index_table
    from bleve_spark.search.searcher import compile_query

    idx = index_table(
        transcripts,
        key_cols=["conv_id", "turn_idx"],
        fields={"text": "standard"},
        composite_fields={"_all": ["text", "role", "tool"]},
    )
    # union semantics: docs where ANY member column carries the term
    hits_all = {
        (r["conv_id"], r["turn_idx"])
        for r in compile_query(
            idx, {"field": "_all", "term": "assistant"}
        ).collect()
    }
    in_role = {
        (r["conv_id"], r["turn_idx"])
        for r in transcripts.where(
            transcripts.role == "assistant"
        ).select("conv_id", "turn_idx").collect()
    }
    in_text = {
        (r["conv_id"], r["turn_idx"])
        for r in compile_query(
            idx, {"field": "text", "term": "assistant"}
        ).collect()
    }
    assert hits_all == in_role | in_text
    assert in_role <= hits_all
    # text terms also reachable via _all
    assert compile_query(
        idx, {"field": "_all", "term": "quick"}
    ).count() > 0
