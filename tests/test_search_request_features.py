"""SearchRequest parity extras: Fields (stored-field retrieval),
IncludeLocations (per-term {pos,start,end}), Score="none"
(search.go:758-770 — scoring skipped, natural order)."""

import pytest

from bleve_spark.index.build import index_table
from bleve_spark.search.searcher import search


@pytest.fixture(scope="module")
def idx(spark):
    df = spark.createDataFrame(
        [(1, "the quick spark engine runs spark jobs", 7),
         (2, "a table scan", 3), (3, "spark again", 5),
         (4, "nothing here", 9)],
        "doc_id int, text string, n int",
    )
    return index_table(df, ["doc_id"], {"text": "standard"})


def test_fields_returns_stored_columns(idx):
    r = search(idx, {"field": "text", "term": "spark"}, size=5,
               fields=["n"])
    by_id = {h["id"]: h["fields"] for h in r["hits"]}
    assert by_id == {"1": {"n": 7}, "3": {"n": 5}}
    r2 = search(idx, {"field": "text", "term": "scan"}, size=5,
                fields="*")
    assert r2["hits"][0]["fields"]["text"] == "a table scan"
    assert r2["hits"][0]["fields"]["n"] == 3


def test_include_locations(idx):
    r = search(idx, {"field": "text", "term": "spark"}, size=5,
               include_locations=True)
    locs = {h["id"]: h["locations"] for h in r["hits"]}
    assert locs["3"] == {"text": {"spark": [
        {"pos": 1, "start": 0, "end": 5}]}}
    assert locs["1"]["text"]["spark"] == [
        {"pos": 3, "start": 10, "end": 15},
        {"pos": 6, "start": 28, "end": 33},
    ]


def test_include_locations_match_query(idx):
    r = search(idx, {"field": "text", "match": "quick scan"}, size=5,
               include_locations=True)
    locs = {h["id"]: h["locations"] for h in r["hits"]}
    assert locs["2"]["text"]["scan"][0]["pos"] == 3
    assert locs["1"]["text"]["quick"][0]["start"] == 4


def test_score_none_natural_order(idx):
    r = search(idx, {"field": "text", "term": "spark"}, size=5,
               score="none")
    assert [h["id"] for h in r["hits"]] == ["1", "3"]   # key order
    assert all(h["score"] == 0.0 for h in r["hits"])
    assert r["max_score"] == 0.0
    assert r["total_hits"] == 2


def test_ipv6_cidr_range(spark):
    """IPv6 CIDR containment incl. v4-mapped docs (the reference
    stores every IP as its 16-byte To16() form)."""
    df = spark.createDataFrame(
        [(1, "2001:db8::1"), (2, "2001:db8::ff00"),
         (3, "2001:db9::1"), (4, "10.0.0.5"),
         (5, "::ffff:10.0.0.5"), (6, "not-an-ip")],
        "doc_id int, addr string",
    )
    idx = index_table(df, ["doc_id"], {"addr": "keyword"})
    got = {h["id"] for h in search(
        idx, {"field": "addr", "cidr": "2001:db8::/32"}, size=10
    )["hits"]}
    assert got == {"1", "2"}
    # v4-mapped space: both the dotted-quad doc and its explicit
    # mapped form fall inside ::ffff:10.0.0.0/104
    got4 = {h["id"] for h in search(
        idx, {"field": "addr", "cidr": "::ffff:10.0.0.0/104"}, size=10
    )["hits"]}
    assert got4 == {"4", "5"}


def test_include_locations_composite_all(spark):
    """Field-less query on a mapping-built index resolves to the
    composite `_all`, which has NO source column: locations must come
    from the member fields (keyed by member name), not from selecting
    `_all` off the source (r3 raised UNRESOLVED_COLUMN here)."""
    from bleve_spark.index.mapping import (
        IndexMapping,
        index_with_mapping,
    )
    from bleve_spark.search.searcher import search

    df = spark.createDataFrame(
        [(1, "quick brown fox", "lazy dog"),
         (2, "quick dog", "fox den")],
        "doc_id int, title string, body string",
    )
    im = IndexMapping.from_dict({"default_mapping": {"properties": {
        "title": {"fields": [{"type": "text"}]},
        "body": {"fields": [{"type": "text"}]},
    }}})
    idx = index_with_mapping(df, ["doc_id"], im, persist=True)
    res = search(idx, {"match": "fox"}, size=5,
                 include_locations=True)
    assert res["total_hits"] == 2
    by_id = {h["id"]: h["locations"] for h in res["hits"]}
    assert "title" in by_id["1"] and "fox" in by_id["1"]["title"]
    assert "body" in by_id["2"] and "fox" in by_id["2"]["body"]
