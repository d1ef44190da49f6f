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
    # mapping.json is EMPTY → bleve's default dynamic mapping through
    # the IndexMapping layer: every DATA field indexed (the docs'
    # "id" property included — bleve's excludedFromAll covers only
    # "_id", so a separate `_id_key` carries doc identity while "id"
    # stays a mapped field), include_in_all everywhere, default
    # tf-idf scoring; `_all` = text members + 16 trie terms per
    # numeric (age) / datetime (born) value, so searches 16/17's
    # absolute score cursors land exactly where bleve's do
    from bleve_spark.index.mapping import IndexMapping, index_with_mapping

    df = df.withColumn("_id_key", F.col("id"))
    idx = index_with_mapping(df, ["_id_key"], IndexMapping())
    return idx


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
    key = sort_idx.key_cols[0]
    got = [r[key] for r in out[int(req.get("from", 0)):]]
    want = [h["id"] for h in case["result"].get("hits", [])]
    assert got == want, f"search {i}: got {got}"


@pytest.fixture(scope="module")
def phrase_idx(spark):
    import glob
    import os

    # mapping.json: types.book body → en (default_type book). Doc b's
    # body is a 2-element ARRAY — through the mapping layer it indexes
    # as same-name instances (merged freqs, element-local positions),
    # bleve's actual array semantics, not a pre-joined string.
    from bleve_spark.index.mapping import IndexMapping, index_with_mapping

    rows = []
    for f in sorted(glob.glob(f"{PHRASE_DIR}/data/*.json")):
        d = json.load(open(f))
        body = d["body"]
        if not isinstance(body, list):
            body = [body]
        rows.append((os.path.basename(f)[:-5], body))
    df = spark.createDataFrame(rows, "id string, body array<string>")
    im = IndexMapping.from_dict(
        json.load(open(f"{PHRASE_DIR}/mapping.json"))
    )
    return index_with_mapping(df, ["id"], im, scoring="bm25")


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
