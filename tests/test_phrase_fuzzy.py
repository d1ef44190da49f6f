"""Fuzzy match / match-phrase golden — the reference's TestAutoFuzzy
(/root/reference/search_test.go:3626-3806): 15 product docs, a custom
"splitter" analyzer (whitespace tokenizer + lowercase), six queries
(match + match_phrase at fuzziness 2 and "auto"), exact hit ORDER
asserted under sort [-_score, _id].

Also pins the PhraseQuery / MultiPhraseQuery fuzziness surface
(phrase.go:32,54-58,75; search_phrase.go:69): per-position fuzzy term
expansion with prefix length 0 feeding the position-adjacency
machinery.
"""

import pytest
from pyspark.sql import functions as F  # noqa: F401

from bleve_spark.index.mapping import IndexMapping, index_with_mapping
from bleve_spark.search.searcher import search_df

DOCS = {
    "product1": "apple iphone 12",
    "product2": "apple iphone 13",
    "product3": "samsung galaxy s22",
    "product4": "samsung galaxy note",
    "product5": "google pixel 5",
    "product6": "oneplus 9 pro",
    "product7": "xiaomi mi 11",
    "product8": "oppo find x3",
    "product9": "vivo x60 pro",
    "product10": "oneplus 8t pro",
    "product11": "nokia xr20",
    "product12": "poco f1",
    "product13": "asus rog 5",
    "product14": "samsung galaxy a15 5g",
    "product15": "tecno camon 17",
}

CASES = [
    (
        {"match": "applle iphone 12", "fuzziness": 2, "field": "model"},
        ["product1", "product2", "product7", "product14", "product15",
         "product12", "product10", "product3", "product6", "product8"],
    ),
    (
        {"match": "applle iphone 12", "fuzziness": "auto",
         "field": "model"},
        ["product1", "product2"],
    ),
    (
        {"match": "applle iphone 12", "fuzziness": 2, "field": "model",
         "operator": "and"},
        ["product1", "product2"],
    ),
    (
        {"match": "applle iphone 12", "fuzziness": "auto",
         "field": "model", "operator": "and"},
        ["product1"],
    ),
    (
        {"match_phrase": "onplus 9 pro", "fuzziness": 2,
         "field": "model"},
        ["product6", "product10"],
    ),
    (
        {"match_phrase": "onplus 9 pro", "fuzziness": "auto",
         "field": "model"},
        ["product6"],
    ),
]


@pytest.fixture(scope="module")
def products_idx(spark):
    df = spark.createDataFrame(
        sorted(DOCS.items()), "id string, model string"
    )
    im = IndexMapping.from_dict({
        "analysis": {
            "analyzers": {
                "splitter": {
                    "type": "custom", "tokenizer": "whitespace",
                    "token_filters": ["to_lower"],
                },
            },
        },
        "default_mapping": {"dynamic": False, "properties": {
            "model": {"fields": [
                {"type": "text", "analyzer": "splitter",
                 "store": True, "include_term_vectors": True},
            ]},
        }},
    })
    return index_with_mapping(df, ["id"], im, persist=True)


@pytest.mark.parametrize(
    "i,case", list(enumerate(CASES)),
    ids=[f"{i}-{list(c[0])[0]}-{c[0]['fuzziness']}"
         for i, c in enumerate(CASES)],
)
def test_auto_fuzzy_golden(products_idx, i, case):
    query, want = case
    out = search_df(
        products_idx, query, size=10, sort=["-_score", "_id"]
    ).collect()
    got = [r["id"] for r in out]
    assert got == want, f"case {i}: got {got}"


def test_phrase_query_fuzziness(products_idx):
    """PhraseQuery.Fuzziness — raw terms (pre-analyzed), per-position
    fuzzy expansion (phrase.go:75)."""
    out = search_df(
        products_idx,
        {"terms": ["onplus", "9", "pro"], "fuzziness": 2,
         "field": "model"},
        size=10, sort=["-_score", "_id"],
    ).collect()
    assert [r["id"] for r in out] == ["product6", "product10"]
    # fuzziness 0 (default) keeps the exact-phrase behavior: no hits
    out0 = search_df(
        products_idx,
        {"terms": ["onplus", "9", "pro"], "field": "model"},
        size=10,
    ).collect()
    assert out0 == []


def test_multi_phrase_fuzziness(products_idx):
    """MultiPhraseQuery.Fuzziness — every alternative expands."""
    out = search_df(
        products_idx,
        {"terms": [["onplus"], ["8t", "9"], ["pro"]], "fuzziness": 1,
         "field": "model"},
        size=10, sort=["-_score", "_id"],
    ).collect()
    assert [r["id"] for r in out] == ["product10", "product6"] or [
        r["id"] for r in out
    ] == ["product6", "product10"]


def test_multi_phrase_fuzzy_overlapping_neighbourhoods(products_idx):
    """Two alternatives whose Levenshtein neighbourhoods OVERLAP
    ('onplus' and 'oneplus' both reach 'oneplus' at fuzziness 1) must
    collapse to one STerm per expanded term — the slot scores exactly
    like the single alternative whose expansion covers the union, not
    double-counting the shared term's postings (r7 dedup fix; the
    reference's per-slot searcher unions reader postings once)."""
    dup = search_df(
        products_idx,
        {"terms": [["onplus", "oneplus"], ["9"], ["pro"]],
         "fuzziness": 1, "field": "model"},
        size=10, sort=["-_score", "_id"],
    ).collect()
    single = search_df(
        products_idx,
        {"terms": [["oneplus"], ["9"], ["pro"]],
         "fuzziness": 1, "field": "model"},
        size=10, sort=["-_score", "_id"],
    ).collect()
    # 'onplus'~1 expands only to 'oneplus'; dedup keeps the best
    # multiplier 1/(1+0)=1 from the exact 'oneplus' alternative, so
    # the two queries are score-identical row for row
    assert [(r["id"], round(r["score"], 6)) for r in dup] == [
        (r["id"], round(r["score"], 6)) for r in single
    ]
