"""Top-level bleve-style Index API (bleve_spark/bleve.py) — the
reference's bleve.New/Open + Index contract (index_impl.go,
index.go Batch)."""

import pytest

from bleve_spark import bleve


@pytest.fixture()
def idx_path(tmp_path):
    return str(tmp_path / "idx")


MAPPING = {
    "default_mapping": {
        "properties": {
            "name": {"fields": [{"type": "text", "analyzer": "en"}]},
        },
    },
    "scoring_model": "bm25",
}


def _seed(ix):
    b = bleve.Batch()
    b.index("a", {"name": "quick brown fox", "age": 7,
                  "body": {"lang": "en"}})
    b.index("b", {"name": "lazy dogs", "age": 3,
                  "body": {"lang": "de"}})
    ix.batch(b)


def test_new_batch_search_roundtrip(spark, idx_path):
    ix = bleve.new(idx_path, MAPPING, spark)
    _seed(ix)
    res = ix.search({"query": {"field": "name", "term": "quick"}})
    assert res["total_hits"] == 1
    assert res["hits"][0]["id"] == "a"
    # dynamic nested path (body.lang) indexed too
    res = ix.search({"query": {"field": "body.lang", "term": "de"}})
    assert [h["id"] for h in res["hits"]] == ["b"]
    # numeric dynamic field serves range queries
    res = ix.search({"query": {"field": "age", "min": 5}})
    assert [h["id"] for h in res["hits"]] == ["a"]
    assert ix.doc_count() == 2


def test_delete_update_revive(spark, idx_path):
    ix = bleve.new(idx_path, MAPPING, spark)
    _seed(ix)
    ix.delete("a")
    assert ix.doc_count() == 1
    assert ix.search(
        {"query": {"field": "name", "term": "quick"}}
    )["total_hits"] == 0
    # delete -> reindex revives with the new revision
    ix.index("a", {"name": "quick red panda", "age": 9,
                   "body": {"lang": "en"}})
    assert ix.doc_count() == 2
    assert ix.document("a")["name"] == "quick red panda"
    # update replaces the old revision (old term gone)
    ix.index("b", {"name": "sleepy cats", "age": 3,
                   "body": {"lang": "de"}})
    assert ix.search(
        {"query": {"field": "name", "term": "lazi"}}
    )["total_hits"] == 0  # en-stemmed 'lazy' from revision 1 is gone
    assert ix.doc_count() == 2


def test_open_reads_persisted_mapping(spark, idx_path):
    ix = bleve.new(idx_path, MAPPING, spark)
    _seed(ix)
    ix.close()
    with pytest.raises(ValueError, match="closed"):
        ix.doc_count()
    re = bleve.open(idx_path, spark)
    assert re.mapping().scoring_model == "bm25"
    assert re.mapping().analyzer_name_for_path("name") == "en"
    res = re.search({"query": {"field": "name", "match": "foxes"}})
    assert res["hits"][0]["id"] == "a"     # en stemming persisted
    # new() refuses to clobber an existing index
    with pytest.raises(FileExistsError):
        bleve.new(idx_path, MAPPING, spark)


def test_field_dict_and_stats(spark, idx_path):
    ix = bleve.new(idx_path, MAPPING, spark)
    _seed(ix)
    terms = dict(ix.field_dict("name"))
    assert terms["quick"] == 1 and terms["fox"] == 1   # en-stemmed
    assert ix.field_dict("name", prefix="qu") == [("quick", 1)]
    assert [t for t, _ in ix.field_dict("name", start="d", end="g")] \
        == ["dog", "fox"]
    assert "name" in ix.fields() and "_all" in ix.fields()
    sm = ix.stats_map()
    assert sm["doc_count"] == 2 and sm["scoring"] == "bm25"


def test_search_request_sort_and_facets(spark, idx_path):
    ix = bleve.new(idx_path, MAPPING, spark)
    _seed(ix)
    res = ix.search({
        "query": {"match_all": {}},
        "sort": ["-age"],
        "size": 10,
    })
    assert [h["id"] for h in res["hits"]] == ["a", "b"]
    res = ix.search({
        "query": {"match_all": {}},
        "facets": {"langs": {"field": "body.lang"}},
    })
    buckets = {t["term"]: t["count"]
               for t in res["facets"]["langs"]["terms"]}
    assert buckets == {"en": 1, "de": 1}


def test_mapping_json_roundtrip():
    from bleve_spark.index.mapping import IndexMapping

    im = IndexMapping.from_dict(MAPPING)
    d = bleve.mapping_to_dict(im)
    im2 = IndexMapping.from_dict(d)
    assert im2.scoring_model == "bm25"
    assert im2.analyzer_name_for_path("name") == "en"
    assert im2.default_mapping.properties["name"].fields[0].analyzer \
        == "en"


def test_index_alias(spark, tmp_path):
    """bleve.NewIndexAlias: scatter-gather over member indexes with
    merged global stats."""
    ix1 = bleve.new(str(tmp_path / "s1"), MAPPING, spark)
    ix1.index("a", {"name": "quick brown fox"})
    ix2 = bleve.new(str(tmp_path / "s2"), MAPPING, spark)
    ix2.index("b", {"name": "quick dogs"})
    al = bleve.new_index_alias(ix1, ix2)
    assert al.doc_count() == 2
    res = al.search({"query": {"field": "name", "term": "quick"}})
    assert sorted(h["id"] for h in res["hits"]) == ["a", "b"]


def test_multi_field_highlight(spark, idx_path):
    """SearchRequest.Highlight.Fields: fragments for EVERY requested
    field (search.go HighlightRequest)."""
    ix = bleve.new(idx_path, {
        "default_mapping": {"properties": {
            "title": {"fields": [{"type": "text"}]},
            "body": {"fields": [{"type": "text"}]},
        }},
        "scoring_model": "bm25",
    }, spark)
    ix.index("d1", {"title": "spark engines", "body":
                    "the spark engine joins tables"})
    res = ix.search({
        "query": {"must": {"conjuncts": [
            {"field": "title", "match": "spark"},
            {"field": "body", "match": "joins"},
        ]}},
        "highlight": {"fields": ["title", "body"]},
    })
    frags = res["hits"][0]["fragments"]
    assert set(frags) == {"title", "body"}
    assert "spark" in frags["title"][0] and "join" in frags["body"][0]


def test_batch_last_op_wins(tmp_path, spark):
    """index.go Batch ops map: index-then-delete of the same id inside
    ONE batch deletes it; delete-then-index keeps it (last op wins)."""
    import bleve_spark.bleve as bleve

    idx = bleve.new(str(tmp_path / "b1"), None, spark=spark)
    b = bleve.Batch()
    b.index("a", {"text": "alpha"})
    b.delete("a")
    b.delete("b")
    b.index("b", {"text": "beta"})
    assert len(b) == 2
    idx.batch(b)
    assert idx.doc_count() == 1
    assert idx.document("a") is None
    assert idx.document("b") is not None
    idx.close()


def test_sort_branch_reports_true_total(tmp_path, spark):
    """The sort/search_after branch reports the real match total, not
    the collected page length."""
    import bleve_spark.bleve as bleve

    idx = bleve.new(str(tmp_path / "b2"), None, spark=spark)
    b = bleve.Batch()
    for i in range(7):
        b.index(f"d{i}", {"text": "quick fox", "n": i})
    idx.batch(b)
    res = idx.search({
        "query": {"field": "text", "match": "quick"},
        "size": 2, "from": 1, "sort": ["_id"],
    })
    assert res["total_hits"] == 7
    assert len(res["hits"]) == 2
    idx.close()


def test_index_synonym_and_internal_kv(tmp_path, spark):
    """IndexSynonym (index_impl.go:336): synonym definitions indexed
    into the index expand wired fields at query time; plus the
    internal KV (Get/Set/DeleteInternal)."""
    import bleve_spark.bleve as bleve

    mapping = {
        "analysis": {"synonym_sources": {
            "mysrc": {"collection": "c1", "analyzer": "standard"},
        }},
        "default_mapping": {"properties": {
            "text": {"fields": [{"type": "text",
                                 "synonym_source": "mysrc"}]},
        }},
    }
    idx = bleve.new(str(tmp_path / "syn"), mapping, spark=spark)
    b = bleve.Batch()
    b.index("d1", {"text": "the quick brown fox"})
    b.index("d2", {"text": "a slow red panda"})
    idx.batch(b)
    # before the synonym doc: no match for 'fast'
    res = idx.search({"query": {"field": "text", "match": "fast"}})
    assert res["total_hits"] == 0
    idx.index_synonym("s1", "c1",
                      {"synonyms": ["quick", "fast", "rapid"]})
    res = idx.search({"query": {"field": "text", "match": "fast"}})
    assert res["total_hits"] == 1
    assert res["hits"][0]["id"] == "d1"
    # re-indexing the same synonym id REPLACES the definition
    idx.index_synonym("s1", "c1", {"synonyms": ["slow", "fast"]})
    res = idx.search({"query": {"field": "text", "match": "fast"}})
    assert [h["id"] for h in res["hits"]] == ["d2"]

    idx.set_internal("checkpoint", "42")
    assert idx.get_internal("checkpoint") == "42"
    idx.set_internal("checkpoint", "43")
    assert idx.get_internal("checkpoint") == "43"
    idx.delete_internal("checkpoint")
    assert idx.get_internal("checkpoint") is None
    idx.close()


def test_advanced_and_train(tmp_path, spark):
    import pytest as _pytest

    import bleve_spark.bleve as bleve

    idx = bleve.new(str(tmp_path / "adv"), None, spark=spark)
    idx.index("a", {"text": "hello world"})
    adv = idx.advanced()
    assert adv.postings is not None and adv.stats.doc_count == 1
    with _pytest.raises(NotImplementedError):
        idx.train(bleve.Batch())
    idx.close()


def test_total_hits_parity_across_branches(spark, tmp_path):
    """SearchResult.Total counts ALL matches on every branch —
    default, sort/search_after, and KNN — not the collected page."""
    mp = {
        "default_mapping": {"properties": {
            "name": {"fields": [{"type": "text"}]},
            "emb": {"fields": [{"type": "vector", "dims": 2,
                                "similarity": "dot_product"}]},
        }},
        "scoring_model": "bm25",
    }
    ix = bleve.new(str(tmp_path / "totals"), mp, spark)
    b = bleve.Batch()
    for i in range(5):
        b.index(f"d{i}", {"name": "quick item",
                          "emb": [1.0, float(i)]})
    ix.batch(b)
    q = {"field": "name", "term": "quick"}
    default = ix.search({"query": q, "size": 2})
    sorted_ = ix.search({"query": q, "size": 2, "sort": ["_id"]})
    knn = ix.search({
        "knn": [{"field": "emb", "vector": [1.0, 0.0], "k": 5}],
        "size": 2,
    })
    assert default["total_hits"] == 5
    assert sorted_["total_hits"] == 5
    assert knn["total_hits"] == 5
    assert (len(default["hits"]) == len(sorted_["hits"])
            == len(knn["hits"]) == 2)
