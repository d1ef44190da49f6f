"""Index-time synonym thesaurus — reference semantics from
document/field_synonym.go (analysis + single-token rule,
uni/bidirectional definitions), index.go:360-390 (SynonymDefinition),
and pre_search.go (alias-wide synonym phase)."""

from bleve_spark.index.build import index_table
from bleve_spark.index.thesaurus import build_thesaurus, merge_thesauri
from bleve_spark.search.alias import alias_search
from bleve_spark.search.searcher import search


def _pairs(df):
    return sorted((r["term"], r["synonym"]) for r in df.collect())


def test_unidirectional_definition(spark):
    t = build_thesaurus(
        spark, [{"input": ["car", "automobile"], "synonyms": ["vehicle"]}]
    )
    assert _pairs(t) == [("automobile", "vehicle"), ("car", "vehicle")]


def test_bidirectional_definition(spark):
    t = build_thesaurus(spark, [{"synonyms": ["quick", "fast", "rapid"]}])
    assert _pairs(t) == [
        ("fast", "quick"), ("fast", "rapid"),
        ("quick", "fast"), ("quick", "rapid"),
        ("rapid", "fast"), ("rapid", "quick"),
    ]


def test_multi_token_phrases_dropped(spark):
    """field_synonym.go:143-149: an entry must analyze to exactly one
    token or it is silently dropped."""
    t = build_thesaurus(
        spark,
        [{"input": ["new york city"], "synonyms": ["nyc"]},
         {"input": ["car"], "synonyms": ["motor vehicle", "auto"]}],
    )
    assert _pairs(t) == [("car", "auto")]


def test_analysis_applied_to_entries(spark):
    """Entries run through the synonym source's analyzer (stemming)."""
    t = build_thesaurus(
        spark, [{"input": ["Running"], "synonyms": ["Jogging"]}],
        analyzer="en",
    )
    assert _pairs(t) == [("run", "jog")]


def test_indexed_thesaurus_expands_term_query(spark):
    df = spark.createDataFrame(
        [(1, "the quick spark engine"), (2, "a table scan runs"),
         (3, "spark and scan together"), (4, "nothing relevant")],
        "doc_id int, text string",
    )
    thes = build_thesaurus(
        spark, [{"input": ["spark"], "synonyms": ["scan"]}]
    )
    idx = index_table(
        df, ["doc_id"], {"text": "standard"},
        thesaurus=thes, synonym_collections={"text": "default"},
    )
    got = {h["id"] for h in
           search(idx, {"field": "text", "term": "spark"},
                  size=10)["hits"]}
    assert got == {"1", "2", "3"}
    # a field NOT wired to the collection must not expand
    idx2 = index_table(df, ["doc_id"], {"text": "standard"},
                       thesaurus=thes)
    got2 = {h["id"] for h in
            search(idx2, {"field": "text", "term": "spark"},
                   size=10)["hits"]}
    assert got2 == {"1", "3"}


def test_alias_presearch_merges_shard_thesauri(spark):
    """pre_search.go: synonyms indexed on one shard apply alias-wide."""
    df = spark.createDataFrame(
        [(1, "the quick spark engine"), (2, "a table scan runs"),
         (3, "spark and scan together"), (4, "nothing relevant")],
        "doc_id int, text string",
    )
    thes = build_thesaurus(
        spark, [{"input": ["spark"], "synonyms": ["scan"]}]
    )
    i1 = index_table(
        df.where("doc_id <= 2"), ["doc_id"], {"text": "standard"},
        thesaurus=thes, synonym_collections={"text": "default"},
    )
    i2 = index_table(
        df.where("doc_id > 2"), ["doc_id"], {"text": "standard"},
    )
    got = {h["id"] for h in
           alias_search([i1, i2], {"field": "text", "term": "spark"},
                        size=10)["hits"]}
    assert got == {"1", "2", "3"}   # doc 2 (scan, shard 1) + doc 3 (shard 2)


def test_merge_thesauri_dedups(spark):
    a = build_thesaurus(spark, [{"input": ["x"], "synonyms": ["y"]}])
    b = build_thesaurus(spark, [{"input": ["x"], "synonyms": ["y", "z"]}])
    m = merge_thesauri([a, b])
    assert _pairs(m) == [("x", "y"), ("x", "z")]
    assert merge_thesauri([None, None]) is None
