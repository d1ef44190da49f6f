"""Run the reference's OWN golden search suite (test/tests/basic: 4
docs, 39 searches with expected total_hits + ordered hit ids) through
this engine — the integration harness the reference drives with
integration_test.go:44-160, re-pointed at the Spark engine.

Mapping notes (mapping.json): name → en analyzer; title/tags →
standard; age numeric, birthday datetime (native columns); the
default search field is the `_all` composite of the text members
(bleve's default include_in_all). The `tags` array field is indexed
as its space-joined elements (same terms/freqs; element-local
positions are not exercised by this suite)."""

import json

import pytest
from pyspark.sql import functions as F

from bleve_spark.index.build import index_table
from bleve_spark.search.searcher import compile_query, search_df

BASIC = "/root/reference/test/tests/basic"


@pytest.fixture(scope="module")
def basic_idx(spark):
    """Index driven by the suite's OWN mapping.json through the
    IndexMapping layer (bleve_spark/index/mapping.py): id disabled,
    name → en, everything else dynamic (title/tags text standard, age
    number, birthday datetime — typed columns stand in for bleve's
    per-value date sniffing), include_in_all default → the `_all`
    composite carries 16 trie terms per age/birthday value. tags stays
    an array<string>: same merged freqs and summed length as bleve's
    same-name instances. scoring stays bm25 (the configuration the
    whole golden harness runs under; the suite asserts total_hits +
    hit ids, identical under both models for these fixtures)."""
    import glob

    from bleve_spark.index.mapping import IndexMapping, index_with_mapping

    docs = [json.load(open(f)) for f in sorted(glob.glob(f"{BASIC}/data/*.json"))]
    rows = [
        (
            d["id"], d["name"], d.get("title"),
            int(d["age"]) if "age" in d else None,
            d.get("birthday"),
            d.get("tags"),
        )
        for d in docs
    ]
    df = spark.createDataFrame(
        rows,
        "id string, name string, title string, age long, "
        "birthday_s string, tags array<string>",
    ).withColumn(
        "birthday", F.to_timestamp("birthday_s")
    ).drop("birthday_s")
    im = IndexMapping.from_dict(json.load(open(f"{BASIC}/mapping.json")))
    return index_with_mapping(df, ["id"], im, scoring="bm25")


SEARCHES = json.load(open(f"{BASIC}/searches.json"))


@pytest.mark.parametrize(
    "case", SEARCHES,
    ids=[f"{i:02d}-{c.get('comment', '')[:40]}" for i, c in
         enumerate(SEARCHES)],
)
def test_reference_basic_golden(basic_idx, case):
    req = case["search"]
    q = req["query"]
    want_total = case["result"]["total_hits"]
    want_ids = [h["id"] for h in case["result"].get("hits", [])]

    total = compile_query(basic_idx, q).count()
    assert total == want_total, f"total_hits: got {total}"

    out = search_df(
        basic_idx, q,
        size=int(req.get("size", 10)),
        from_=int(req.get("from", 0)),
        sort=req.get("sort") or ["-_score", "_id"],
    ).collect()
    got_ids = [r["id"] for r in out[int(req.get("from", 0)):]]
    assert got_ids == want_ids, f"hits: got {got_ids}"
