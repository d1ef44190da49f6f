"""IndexAlias scatter-gather, RRF/RSF fusion, and search_after cursor.

Reference parity targets:
* alias two-phase global-stats search —
  /root/reference/index_alias_impl.go:197,1002 +
  /root/reference/pre_search.go:96-110 (stats are SUMMED across shards,
  including per-segment field cardinality — the multisegment quirk);
* RRF/RSF — /root/reference/fusion/rrf.go:34, rsf.go:35;
* search_after — /root/reference/search/collector/topn.go:103-128.
"""

import math

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def shards(spark, transcripts):
    from bleve_spark.index.build import index_table

    lo = transcripts.where(F.col("conv_id") < "conv00000020")
    hi = transcripts.where(F.col("conv_id") >= "conv00000020")
    mk = lambda df: index_table(
        df, key_cols=["conv_id", "turn_idx"], fields={"text": "standard"}
    )
    return mk(lo), mk(hi)


def test_alias_stats_merge(tindex, shards):
    from bleve_spark.search.alias import AliasIndex

    sh1, sh2 = shards
    al = AliasIndex([sh1, sh2])
    # doc counts sum exactly (pre_search.go:96-110)
    assert al.stats.doc_count == tindex.stats.doc_count
    assert al.stats.doc_count == sh1.stats.doc_count + sh2.stats.doc_count
    # cardinality = Σ per-shard unique terms — the reference's quirk:
    # it EXCEEDS the global distinct count when shards share terms
    card = al.stats.field_cardinality["text"]
    assert card == (
        sh1.stats.field_cardinality["text"]
        + sh2.stats.field_cardinality["text"]
    )
    assert card > tindex.stats.field_cardinality["text"]
    assert al.stats.avg_doc_len["text"] == math.ceil(
        card / al.stats.doc_count
    )


def test_alias_equals_segmented_single_index(tindex, shards):
    """alias(2 shards) ≡ a single index with the same 2-segment layout:
    identical postings union + summed-cardinality stats + globalized
    per-term docFreq. This is STRONGER than the reference (which leaves
    docFreq per-shard, search_term.go:146) — asserted exactly."""
    from dataclasses import replace

    from bleve_spark.search.alias import AliasIndex
    from bleve_spark.search.searcher import search_df

    al = AliasIndex(list(shards))
    seg_equiv = replace(tindex, stats=al.stats)

    q = {"field": "text", "match": "spark data"}
    a = [
        (r["conv_id"], r["turn_idx"], round(r["score"], 9))
        for r in search_df(al, q, size=15).collect()
    ]
    b = [
        (r["conv_id"], r["turn_idx"], round(r["score"], 9))
        for r in search_df(seg_equiv, q, size=15).collect()
    ]
    assert a == b and len(a) > 0


def test_alias_rank_identity_vs_single(tindex, shards):
    """Ranks (not scores — avgDocLen differs by segmentation) must match
    the single-segment index: the scale-invariance the engine relies on."""
    from bleve_spark.search.alias import AliasIndex
    from bleve_spark.search.searcher import search_df

    al = AliasIndex(list(shards))
    q = {"field": "text", "match": "spark data"}
    a = [
        (r["conv_id"], r["turn_idx"])
        for r in search_df(al, q, size=10).collect()
    ]
    b = [
        (r["conv_id"], r["turn_idx"])
        for r in search_df(tindex, q, size=10).collect()
    ]
    assert a == b and len(a) == 10


def test_rrf_fusion_hand_computed(spark):
    from bleve_spark.search.fusion import rrf_fuse

    l1 = spark.createDataFrame(
        [("a", 3.0), ("b", 2.0), ("c", 1.0)], "k string, score double"
    )
    l2 = spark.createDataFrame(
        [("b", 9.0), ("c", 8.0)], "k string, score double"
    )
    out = {
        r["k"]: r["score"]
        for r in rrf_fuse([l1, l2], ["k"], k=60).collect()
    }
    assert out["a"] == pytest.approx(1 / 61)
    assert out["b"] == pytest.approx(1 / 62 + 1 / 61)
    assert out["c"] == pytest.approx(1 / 63 + 1 / 62)


def test_rsf_fusion_minmax(spark):
    from bleve_spark.search.fusion import rsf_fuse

    l1 = spark.createDataFrame(
        [("a", 4.0), ("b", 2.0), ("c", 0.0)], "k string, score double"
    )
    l2 = spark.createDataFrame(
        [("a", 7.0), ("c", 7.0)], "k string, score double"
    )  # constant list → everyone normalizes to 1.0
    out = {
        r["k"]: r["score"]
        for r in rsf_fuse([l1, l2], ["k"], weights=[1.0, 0.5]).collect()
    }
    assert out["a"] == pytest.approx(1.0 + 0.5)
    assert out["b"] == pytest.approx(0.5)
    assert out["c"] == pytest.approx(0.0 + 0.5)


def test_search_after_continues_page(tindex):
    from bleve_spark.search.searcher import search_df

    q = {"field": "text", "match": "spark data"}
    full = search_df(tindex, q, size=10).collect()
    page1 = full[:4]
    last = page1[-1]
    cursor = [last["score"], last["conv_id"], last["turn_idx"]]
    page2 = search_df(tindex, q, size=6, search_after=cursor).collect()
    got = [(r["conv_id"], r["turn_idx"], r["score"]) for r in page2]
    want = [(r["conv_id"], r["turn_idx"], r["score"]) for r in full[4:10]]
    assert got == want and len(got) == 6


def test_search_before_pages_backwards(tindex):
    """search_before = flipped-sort search_after, results re-presented
    in the original order (index_alias_impl.go:721-724,1016-1020)."""
    from bleve_spark.search.searcher import search_df

    q = {"field": "text", "match": "spark data"}
    full = search_df(tindex, q, size=10).collect()
    anchor = full[6]
    cursor = [anchor["score"], anchor["conv_id"], anchor["turn_idx"]]
    page = search_df(tindex, q, size=4, search_before=cursor).collect()
    got = [(r["conv_id"], r["turn_idx"], r["score"]) for r in page]
    want = [(r["conv_id"], r["turn_idx"], r["score"]) for r in full[2:6]]
    assert got == want and len(got) == 4


def test_custom_score_query(tindex):
    """custom_score hook: registered parser + JVM-side rescoring
    expression (query.go:311-324 surface)."""
    from pyspark.sql import functions as F

    from bleve_spark.search import query as Q
    from bleve_spark.search.searcher import search_df

    def parse_double(d):
        return Q.CustomScoreQuery(
            sub=Q.parse_query(d["custom_score"]),
            score_fn=lambda s: s * F.lit(2.0),
        )

    Q.register_custom_parser("custom_score", parse_double)
    try:
        base = search_df(
            tindex, {"field": "text", "term": "quick"}, size=5
        ).collect()
        doubled = search_df(
            tindex,
            {"custom_score": {"field": "text", "term": "quick"}},
            size=5,
        ).collect()
        assert [
            (r["conv_id"], r["turn_idx"], round(r["score"] * 2.0, 9))
            for r in base
        ] == [
            (r["conv_id"], r["turn_idx"], round(r["score"], 9))
            for r in doubled
        ]
    finally:
        Q.CUSTOM_PARSERS.pop("custom_score", None)
