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
    import glob

    docs = [json.load(open(f)) for f in sorted(glob.glob(f"{BASIC}/data/*.json"))]
    rows = [
        (
            d["id"], d["name"], d.get("title"),
            int(d["age"]) if "age" in d else None,
            d.get("birthday"),
            " ".join(d.get("tags", [])) or None,
        )
        for d in docs
    ]
    df = spark.createDataFrame(
        rows,
        "id string, name string, title string, age long, "
        "birthday_s string, tags string",
    ).withColumn(
        "birthday", F.to_timestamp("birthday_s")
    ).drop("birthday_s")
    # mapping.json: id disabled; name en; everything else dynamic
    # default (standard text / numeric / datetime, include_in_all) —
    # so bleve's `_all` carries 16 trie terms per age/birthday value
    return index_table(
        df,
        key_cols=["id"],
        fields={"name": "en", "title": "standard", "tags": "standard"},
        composite_fields={
            "_all": ["name", "title", "tags", "age", "birthday"],
        },
    )


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
