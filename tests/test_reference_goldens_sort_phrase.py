"""Reference golden suites `sort` (18 searches / 6 docs) and `phrase`
(22 searches / 2 docs) run through this engine — sort-order parity
(missing-value placement, multi-valued min mode, cursors over sort
values) and phrase parity (stopword gaps, stemming, multi_phrase).

Sort searches 16/17 page by bleve's ABSOLUTE `_all` tf-idf scores
("search_after": ["0.286889"]), which bake in the 16 prefix-coded
trie terms bleve emits per numeric/datetime field into the `_all`
norm (field lengths 22/24/40 for docs e/f/d). The `_all` composite
here includes those typed members (build._typed_member_postings), so
the cursor constants land exactly where bleve's do — no skips."""

import json

import pytest
from pyspark.sql import functions as F

from bleve_spark.index.build import index_table
from bleve_spark.search.searcher import compile_query, search_df

SORT_DIR = "/root/reference/test/tests/sort"
PHRASE_DIR = "/root/reference/test/tests/phrase"

SORT_SKIP = set()


@pytest.fixture(scope="module")
def sort_idx(spark):
    import glob

    docs = [json.load(open(f))
            for f in sorted(glob.glob(f"{SORT_DIR}/data/*.json"))]
    rows = [
        (d["id"], d.get("name"), d.get("age"), d.get("born"),
         d.get("title"), d.get("tags"))
        for d in docs
    ]
    df = spark.createDataFrame(
        rows,
        "id string, name string, age long, born_s string, "
        "title string, tags array<string>",
    ).withColumn("born", F.to_timestamp("born_s")).drop("born_s")
    # mapping.json is EMPTY → bleve's default dynamic mapping: every
    # field indexed (id included), include_in_all, default tf-idf
    # scoring; `_all` = text members + 16 trie terms per numeric
    # (age) / datetime (born) value
    return index_table(
        df, key_cols=["id"],
        fields={"title": "standard", "name": "keyword"},
        composite_fields={
            "_all": ["id", "name", "title", "tags", "age", "born"],
        },
        scoring="tfidf",
    )


SORT_SEARCHES = json.load(open(f"{SORT_DIR}/searches.json"))


@pytest.mark.parametrize(
    "i,case",
    [(i, c) for i, c in enumerate(SORT_SEARCHES) if i not in SORT_SKIP],
    ids=[f"{i:02d}-{c.get('comment', '')[:42]}"
         for i, c in enumerate(SORT_SEARCHES) if i not in SORT_SKIP],
)
def test_reference_sort_golden(sort_idx, i, case):
    req = case["search"]
    out = search_df(
        sort_idx, req["query"],
        size=int(req.get("size", 10)),
        from_=int(req.get("from", 0)),
        sort=req.get("sort"),
        search_after=req.get("search_after"),
        search_before=req.get("search_before"),
    ).collect()
    got = [r["id"] for r in out[int(req.get("from", 0)):]]
    want = [h["id"] for h in case["result"].get("hits", [])]
    assert got == want, f"search {i}: got {got}"


@pytest.fixture(scope="module")
def phrase_idx(spark):
    import glob
    import os

    rows = []
    for f in sorted(glob.glob(f"{PHRASE_DIR}/data/*.json")):
        d = json.load(open(f))
        body = d["body"]
        if isinstance(body, list):
            body = " ".join(body)
        rows.append((os.path.basename(f)[:-5], body))
    df = spark.createDataFrame(rows, "id string, body string")
    return index_table(df, key_cols=["id"], fields={"body": "en"})


PHRASE_SEARCHES = json.load(open(f"{PHRASE_DIR}/searches.json"))


@pytest.mark.parametrize(
    "i,case", list(enumerate(PHRASE_SEARCHES)),
    ids=[f"{i:02d}" for i in range(len(PHRASE_SEARCHES))],
)
def test_reference_phrase_golden(phrase_idx, i, case):
    req = case["search"]
    total = compile_query(phrase_idx, req["query"]).count()
    assert total == case["result"]["total_hits"], f"search {i} total"
    out = search_df(
        phrase_idx, req["query"],
        size=int(req.get("size", 10)), from_=int(req.get("from", 0)),
        sort=req.get("sort") or ["-_score", "_id"],
    ).collect()
    got = [r["id"] for r in out]
    want = [h["id"] for h in case["result"].get("hits", [])]
    assert got == want, f"search {i}: got {got}"
