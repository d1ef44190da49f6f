"""IndexMapping / DocumentMapping / FieldMapping — Spark-schema twin
of the reference's mapping package (mapping/index.go MapDocument,
mapping/document.go walkDocument/processProperty)."""

import glob
import json

import pytest
from pyspark.sql import functions as F

from bleve_spark.index.build import index_table
from bleve_spark.index.mapping import (
    DocumentMapping,
    FieldMapping,
    IndexMapping,
    index_with_mapping,
    map_table,
    plan_document_mapping,
)
from bleve_spark.search.searcher import search


def _nested_df(spark):
    rows = [
        (1, "alpha report", ("the quick brown fox", "en"), (7,),
         ["red tag", "blue"]),
        (2, "beta memo", ("lazy dogs sleep", "de"), (3,), ["green"]),
        (3, "gamma alpha", ("quick quick dogs", "en"), (9,), None),
    ]
    return spark.createDataFrame(
        rows,
        "doc_id long, title string, "
        "body struct<text:string, lang:string>, "
        "meta struct<n:long>, tags array<string>",
    )


def _hits(res):
    return sorted(h["id"] for h in res["hits"])


# ---------------------------------------------------------------- parse


def test_parse_every_reference_fixture_mapping():
    """Every mapping.json the reference ships parses without loss of
    the semantics the golden tests hand-coded."""
    paths = sorted(glob.glob("/root/reference/test/tests/*/mapping.json"))
    assert paths
    parsed = {}
    for p in paths:
        with open(p) as f:
            parsed[p.split("/")[-2]] = IndexMapping.from_dict(json.load(f))
    basic = parsed["basic"]
    assert basic.default_type == "person"
    assert basic.analyzer_name_for_path("name") == "en"
    person = basic.mapping_for_type("person")
    exact, _ = person.mapping_for_path(["id"])
    assert exact is not None and not exact.enabled
    fosdem = parsed["fosdem"]
    assert fosdem.analyzer_name_for_path("category") == "keyword"
    assert fosdem.analyzer_name_for_path("description") == "en"
    # sort/mapping.json is {} — everything defaults
    srt = parsed["sort"]
    assert srt.default_analyzer == "standard" and srt.default_mapping.dynamic


def test_plan_skips_disabled_property(spark):
    df = _nested_df(spark)
    im = IndexMapping.from_dict({
        "types": {"person": {"properties": {
            "title": {"fields": [{"type": "text", "analyzer": "en"}]},
            "body": {"enabled": False},
        }}},
        "default_type": "person",
    })
    plans = plan_document_mapping(
        df.schema, im.mapping_for_type("person"), im
    )
    names = {p.name for p in plans}
    assert "title" in names
    assert not any(n.startswith("body") for n in names)


def test_static_mapping_skips_unmapped(spark):
    df = _nested_df(spark)
    dm = DocumentMapping.from_dict({
        "dynamic": False,
        "properties": {
            "title": {"fields": [{"type": "text"}]},
        },
    })
    plans = plan_document_mapping(df.schema, dm, IndexMapping())
    assert [p.name for p in plans] == ["title"]


# ------------------------------------------------------------- flatten


def test_nested_flatten_dynamic(spark):
    df = _nested_df(spark)
    flat, fields, composite, planned = map_table(df, IndexMapping())
    assert set(fields) == {"title", "body.text", "body.lang", "tags"}
    assert planned["meta.n"].ftype == "number"
    assert planned["tags"].is_array
    assert set(composite["_all"]) == {
        "title", "body.text", "body.lang", "tags", "meta.n", "doc_id",
    }
    got = {
        r["doc_id"]: r["body.text"]
        for r in flat.select("doc_id", "`body.text`").collect()
    }
    assert got[1] == "the quick brown fox"


def test_mapped_search_rank_identity_with_flat(spark):
    """Scores through the mapping layer must equal the same data
    indexed as pre-flattened columns."""
    df = _nested_df(spark)
    idx_m = index_with_mapping(
        df, ["doc_id"], IndexMapping(), scoring="bm25", persist=False,
    )
    flat = df.select(
        "doc_id", F.col("body.text").alias("body.text")
    )
    idx_f = index_table(
        flat, ["doc_id"], {"body.text": "standard"},
        scoring="bm25", persist=False,
    )
    q = {"field": "body.text", "match": "quick dogs"}
    rm = search(idx_m, q, size=10)
    rf = search(idx_f, q, size=10)
    assert [(h["id"], round(h["score"], 6)) for h in rm["hits"]] == \
        [(h["id"], round(h["score"], 6)) for h in rf["hits"]]
    assert rm["total_hits"] == 3


def test_type_routing_and_disabled_type(spark):
    rows = [
        (1, "a", "quick fox"),
        (2, "b", "quick fox"),
        (3, "c", "quick fox"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, _type string, t string")
    im = IndexMapping.from_dict({
        "types": {
            "a": {"dynamic": False, "properties": {
                "t": {"fields": [{"type": "text"}]},
            }},
            "b": {"enabled": False},
        },
        # unmapped type "c" falls to the default mapping (dynamic)
    })
    idx = index_with_mapping(df, ["doc_id"], im, scoring="bm25",
                             persist=False)
    # type b rows never reach the index: not in doc_count, not matched
    assert idx.stats.doc_count == 2
    res = search(idx, {"field": "t", "term": "quick"}, size=10)
    assert _hits(res) == ["1", "3"]


def test_field_name_override(spark):
    df = _nested_df(spark)
    im = IndexMapping.from_dict({
        "default_mapping": {"dynamic": False, "properties": {
            "title": {"fields": [
                {"type": "text", "name": "headline"},
            ]},
        }},
    })
    idx = index_with_mapping(df, ["doc_id"], im, persist=False)
    fields = [r["field"] for r in
              idx.postings.select("field").distinct().collect()]
    assert "headline" in fields and "title" not in fields


def test_include_in_all_exclusion(spark):
    df = _nested_df(spark)
    im = IndexMapping.from_dict({
        "default_mapping": {"dynamic": False, "properties": {
            "title": {"fields": [
                {"type": "text", "include_in_all": False},
            ]},
            "body": {"properties": {"text": {"fields": [
                {"type": "text", "include_in_all": True},
            ]}}},
        }},
    })
    idx = index_with_mapping(df, ["doc_id"], im, scoring="bm25",
                             persist=False)
    # "alpha" only occurs in title (excluded): no _all hit
    assert search(idx, {"field": "_all", "term": "alpha"})["total_hits"] == 0
    # "fox" occurs in body.text (included)
    assert search(idx, {"field": "_all", "term": "fox"})["total_hits"] == 1


def test_analyzer_default_chain(spark):
    """field.Analyzer empty → walk default_analyzer root→leaf, last
    non-empty wins (document.go:380-395); else index default."""
    df = _nested_df(spark)
    im = IndexMapping.from_dict({
        "default_mapping": {
            "default_analyzer": "keyword",
            "dynamic": False,
            "properties": {
                "title": {"fields": [{"type": "text"}]},
                "body": {
                    "default_analyzer": "standard",
                    "properties": {"text": {"fields": [
                        {"type": "text"},
                    ]}},
                },
            },
        },
    })
    _, fields, _, _ = map_table(df, im)
    assert fields["title"] == "keyword"
    assert fields["body.text"] == "standard"
    assert im.analyzer_name_for_path("body.text") == "standard"
    idx = index_with_mapping(df, ["doc_id"], im, persist=False)
    # keyword analyzer keeps the whole title as one term
    terms = {r["term"] for r in idx.postings
             .where(F.col("field") == "title").collect()}
    assert "alpha report" in terms


def test_array_field_instance_merge(spark):
    """array<string>: same-name instances merge — summed tf,
    element-local positions, norm over the SUMMED length
    (document/document.go:35,173-181; scorch same-name instance
    accumulation)."""
    df = _nested_df(spark)
    idx = index_with_mapping(df, ["doc_id"], IndexMapping(),
                             scoring="bm25", persist=False)
    rows = {
        r["term"]: r for r in idx.postings
        .where((F.col("field") == "tags") & (F.col("doc_id") == 1))
        .collect()
    }
    # doc 1 tags = ["red tag", "blue"] → 3 tokens total
    assert set(rows) == {"red", "tag", "blue"}
    import math
    for r in rows.values():
        assert r["norm"] == pytest.approx(1 / math.sqrt(3), rel=1e-6)
    # element-local positions, element encoded via the stride
    # (phrase adjacency needs equal array positions — search.go:113)
    from bleve_spark.index.build import ARRAY_POSITION_STRIDE as S

    assert rows["blue"]["positions"] == [S + 1]
    assert rows["tag"]["positions"] == [2]
    # phrases never span elements
    res = search(idx, {"field": "tags", "terms": ["tag", "blue"]})
    assert res["total_hits"] == 0
    res = search(idx, {"field": "tags", "terms": ["red", "tag"]})
    assert res["total_hits"] == 1


def test_scoring_model_defaults_to_tfidf(spark):
    df = _nested_df(spark)
    idx = index_with_mapping(df, ["doc_id"], IndexMapping(),
                             persist=False)
    assert idx.stats.scoring == "tfidf"
    im2 = IndexMapping(scoring_model="bm25")
    idx2 = index_with_mapping(df, ["doc_id"], im2, persist=False)
    assert idx2.stats.scoring == "bm25"


def test_datetime_string_column_parses(spark):
    df = spark.createDataFrame(
        [(1, "2024-01-05T00:00:00", "x"), (2, "not a date", "y")],
        "doc_id long, ts string, t string",
    )
    im = IndexMapping.from_dict({
        "default_mapping": {"dynamic": False, "properties": {
            "ts": {"fields": [{"type": "datetime"}]},
            "t": {"fields": [{"type": "text"}]},
        }},
    })
    flat, _, _, planned = map_table(df, im)
    assert planned["ts"].ftype == "datetime"
    vals = {r["doc_id"]: r["ts"] for r in flat.collect()}
    assert vals[1] is not None and vals[2] is None


# ------------------------------------------------- custom analysis


def test_custom_analysis_edge_ngram(spark):
    """mapping `analysis` section: config-defined token filter +
    custom analyzer referenced by a field mapping
    (mapping/analysis.go; token/edgengram/edgengram.go:95-108)."""
    df = _nested_df(spark)
    im = IndexMapping.from_dict({
        "analysis": {
            "token_filters": {
                "eng23": {"type": "edge_ngram", "min": 2, "max": 3},
            },
            "analyzers": {
                "autocomplete": {
                    "type": "custom", "tokenizer": "unicode",
                    "token_filters": ["to_lower", "eng23"],
                },
            },
        },
        "default_mapping": {"dynamic": False, "properties": {
            "title": {"fields": [
                {"type": "text", "analyzer": "autocomplete"},
            ]},
        }},
    })
    idx = index_with_mapping(df, ["doc_id"], im, scoring="bm25",
                             persist=False)
    terms = {
        r["term"] for r in idx.postings
        .where((F.col("field") == "title") & (F.col("doc_id") == 1))
        .collect()
    }
    assert terms == {"al", "alp", "re", "rep"}   # "alpha report"
    res = search(idx, {"field": "title", "term": "alp"}, size=10)
    assert _hits(res) == ["1", "3"]              # both contain alpha


def test_custom_analysis_stop_map_and_char_filter(spark):
    """custom token_map-backed stop filter + regexp char filter
    (tokenmap/custom.go:47-55, token/stop/stop.go:57-66,
    char/regexp/regexp.go:44-57)."""
    df = _nested_df(spark)
    im = IndexMapping.from_dict({
        "analysis": {
            "char_filters": {
                "digits_out": {"type": "regexp", "regexp": "[0-9]+",
                               "replace": " "},
            },
            "token_maps": {
                "my_stops": {"type": "custom", "tokens": ["quick"]},
            },
            "token_filters": {
                "my_stop": {"type": "stop_tokens",
                            "stop_token_map": "my_stops"},
            },
            "analyzers": {
                "clean": {
                    "type": "custom", "tokenizer": "unicode",
                    "char_filters": ["digits_out"],
                    "token_filters": ["to_lower", "my_stop"],
                },
            },
        },
        "default_mapping": {"dynamic": False, "properties": {
            "body": {"properties": {"text": {"fields": [
                {"type": "text", "analyzer": "clean"},
            ]}}},
        }},
    })
    idx = index_with_mapping(df, ["doc_id"], im, scoring="bm25",
                             persist=False)
    assert search(idx, {"field": "body.text", "term": "quick"},
                  )["total_hits"] == 0
    assert search(idx, {"field": "body.text", "term": "fox"},
                  )["total_hits"] == 1


# ----------------------------------------------------------- geopoint


def test_geopoint_field_formats(spark):
    """geopoint field mapping over the three source shapes bleve's
    ExtractGeoPoint accepts (geo/parse.go): struct{lat,lon}, GeoJSON
    [lon, lat] array, 'lat,lon' string — all flatten to the engine's
    <name>_lat/<name>_lon columns and serve geo queries."""
    rows = [
        (1, (10.0, 20.0), [20.0, 10.0], "10.0, 20.0"),
        (2, (55.0, 66.0), [66.0, 55.0], "55.0, 66.0"),
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id long, a struct<lat:double, lon:double>, "
        "b array<double>, c string",
    )
    im = IndexMapping.from_dict({
        "default_mapping": {"dynamic": False, "properties": {
            "a": {"fields": [{"type": "geopoint"}]},
            "b": {"fields": [{"type": "geopoint"}]},
            "c": {"fields": [{"type": "geopoint"}]},
            # a text field so the index has postings
            "_anchor": {"fields": [{"type": "text"}]},
        }},
    })
    df = df.withColumn("_anchor", F.lit("x"))
    idx = index_with_mapping(df, ["doc_id"], im, persist=False)
    row = {r["doc_id"]: r for r in idx.source.collect()}
    for f in ("a", "b", "c"):
        assert row[1][f"{f}_lat"] == 10.0 and row[1][f"{f}_lon"] == 20.0
        assert row[2][f"{f}_lat"] == 55.0 and row[2][f"{f}_lon"] == 66.0
    # geo bbox query over the mapped field
    res = search(idx, {"field": "a",
                       "top_left": {"lon": 15.0, "lat": 12.0},
                       "bottom_right": {"lon": 25.0, "lat": 8.0}})
    assert _hits(res) == ["1"]


# ----------------------------------------------------- synonym source


def test_synonym_source_via_mapping(spark):
    """mapping/synonym.go: a field's synonym_source names a
    {collection, analyzer} config in analysis.synonym_sources; the
    collection keys the index-time thesaurus, and term queries expand
    through it."""
    from bleve_spark.index.thesaurus import build_thesaurus

    df = spark.createDataFrame(
        [(1, "the quick spark engine"), (2, "a table scan runs"),
         (3, "spark and scan together"), (4, "nothing relevant")],
        "doc_id int, text string",
    )
    thes = build_thesaurus(
        spark, [{"input": ["spark"], "synonyms": ["scan"]}],
        collection="c1",
    )
    im = IndexMapping.from_dict({
        "analysis": {"synonym_sources": {
            "my_src": {"collection": "c1", "analyzer": "standard"},
        }},
        "default_mapping": {"dynamic": False, "properties": {
            "text": {"fields": [
                {"type": "text", "synonym_source": "my_src"},
            ]},
        }},
        "scoring_model": "bm25",
    })
    idx = index_with_mapping(df, ["doc_id"], im, persist=False,
                             thesaurus=thes)
    got = {h["id"] for h in
           search(idx, {"field": "text", "term": "spark"},
                  size=10)["hits"]}
    assert got == {"1", "2", "3"}
    # unknown source name fails validation
    bad = IndexMapping.from_dict({
        "default_mapping": {"dynamic": False, "properties": {
            "text": {"fields": [
                {"type": "text", "synonym_source": "nope"},
            ]},
        }},
    })
    with pytest.raises(ValueError, match="unknown synonym source"):
        index_with_mapping(df, ["doc_id"], bad, persist=False)


# ------------------------------------------------------------- vector


def test_vector_field_and_knn_request(spark):
    """vector field mapping (mapping_vectors.go:139-171) + the
    SearchRequest.KNN contract (search_knn.go:460-530): per-clause
    top-k, leg-score sum, knn_operator=and, fts score addition."""
    from bleve_spark.search.hybrid import knn_request_df

    rows = [
        (1, [1.0, 0.0, 0.0, 0.0], [3.0, 4.0, 0.0, 0.0], "y"),
        (2, [0.5, 0.0, 0.0, 0.0], [1.0, 0.0, 0.0, 0.0], "y"),
        (3, [0.0, 1.0, 0.0, 0.0], [0.0, 2.0, 0.0, 0.0], "x"),
        (4, [1.0, 0.0], None, "y"),          # wrong dims
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id long, emb array<float>, embc array<float>, tag string",
    )
    im = IndexMapping.from_dict({
        "default_mapping": {"dynamic": False, "properties": {
            "emb": {"fields": [
                {"type": "vector", "dims": 4,
                 "similarity": "dot_product"},
            ]},
            "embc": {"fields": [
                {"type": "vector", "dims": 4, "similarity": "cosine"},
            ]},
            "tag": {"fields": [{"type": "text"}]},
        }},
        "scoring_model": "bm25",
    })
    idx = index_with_mapping(df, ["doc_id"], im, persist=False)
    src = {r["doc_id"]: r for r in idx.source.collect()}
    assert src[4]["emb"] is None               # dims guard
    # cosine: stored vectors are unit-normalized at index time
    assert src[1]["embc"] == pytest.approx([0.6, 0.8, 0.0, 0.0])
    assert idx.planned_fields["emb"].similarity == "dot_product"

    qv = [1.0, 0.0, 0.0, 0.0]
    top = knn_request_df(
        idx, [{"field": "emb", "vector": qv, "k": 2}], size=10
    ).collect()
    assert [(r["doc_id"], r["score"]) for r in top] == [
        (1, 1.0), (2, 0.5)
    ]
    # two legs, operator=and: only docs in BOTH top-k lists survive,
    # scores sum
    both = knn_request_df(
        idx,
        [{"field": "emb", "vector": qv, "k": 2},
         {"field": "embc", "vector": qv, "k": 2, "boost": 2.0}],
        knn_operator="and", size=10,
    ).collect()
    # embc top2 by cosine: doc2 (1.0), doc1 (0.6) → and-overlap {1,2}
    assert [(r["doc_id"], r["score"]) for r in both] == [
        (2, 0.5 + 2.0), (1, 1.0 + 1.2)
    ]
    # fts score ADDS (setKnnHitsInCollector)
    from bleve_spark.search.searcher import search

    s3 = search(idx, {"field": "tag", "term": "x"})["hits"][0]["score"]
    mixed = {r["doc_id"]: r["score"] for r in knn_request_df(
        idx, [{"field": "emb", "vector": qv, "k": 2}],
        q={"field": "tag", "term": "x"}, size=10,
    ).collect()}
    assert mixed[3] == pytest.approx(round(s3, 6))
    assert mixed[1] == 1.0


# ----------------------------------------------------- date parsers


def test_custom_date_time_parsers(spark):
    """`analysis.date_time_parsers`: flexiblego (Go reference-time
    layouts) and percentstyle (strptime) compile to cascaded native
    parses; a field's date_format picks its parser
    (analysis/datetime/flexible/flexible.go, percent/percent.go)."""
    df = spark.createDataFrame(
        [(1, "25/12/2023 10:30", "31.01.2024", "x"),
         (2, "not a date", "also not", "y")],
        "doc_id long, d1 string, d2 string, t string",
    )
    im = IndexMapping.from_dict({
        "analysis": {"date_time_parsers": {
            "uk": {"type": "flexiblego",
                   "layouts": ["02/01/2006 15:04"]},
            "dots": {"type": "percentstyle",
                     "layouts": ["%d.%m.%Y"]},
        }},
        "default_mapping": {"dynamic": False, "properties": {
            "d1": {"fields": [
                {"type": "datetime", "date_format": "uk"},
            ]},
            "d2": {"fields": [
                {"type": "datetime", "date_format": "dots"},
            ]},
            "t": {"fields": [{"type": "text"}]},
        }},
    })
    flat, _, _, planned = map_table(df, im)
    assert planned["d1"].ftype == "datetime"
    vals = {r["doc_id"]: (r["d1"], r["d2"]) for r in flat.collect()}
    assert vals[1][0].month == 12 and vals[1][0].day == 25
    assert vals[1][1].month == 1 and vals[1][1].day == 31
    assert vals[2] == (None, None)


# ----------------------------------------------------------- validate


def test_validate_catches_config_errors():
    """mapping/document.go:56-105 Validate: unknown analyzers, field
    types, date parsers, synonym sources, bad vector configs all fail
    fast — and every reference fixture mapping validates clean."""
    import glob

    ok = IndexMapping.from_dict({
        "default_mapping": {"properties": {
            "t": {"fields": [{"type": "text", "analyzer": "en"}]},
        }},
    })
    ok.validate()
    for p in sorted(glob.glob("/root/reference/test/tests/*/mapping.json")):
        IndexMapping.from_dict(json.load(open(p))).validate()

    cases = [
        ({"default_analyzer": "nope"}, "unknown analyzer"),
        ({"default_mapping": {"properties": {"t": {"fields": [
            {"type": "texty"}]}}}}, "unknown field type"),
        ({"default_mapping": {"properties": {"t": {"fields": [
            {"type": "text", "analyzer": "nope"}]}}}},
         "unknown analyzer"),
        ({"default_mapping": {"properties": {"t": {"fields": [
            {"type": "datetime", "date_format": "nope"}]}}}},
         "unknown date parser"),
        ({"default_mapping": {"properties": {"t": {"fields": [
            {"type": "vector"}]}}}}, "dims"),
        ({"default_mapping": {"properties": {"t": {"fields": [
            {"type": "vector", "dims": 4, "similarity": "wat"}]}}}},
         "unknown similarity"),
    ]
    for cfg, msg in cases:
        with pytest.raises(ValueError, match=msg):
            IndexMapping.from_dict(cfg).validate()
    # a custom analyzer defined in the analysis section IS known
    IndexMapping.from_dict({
        "analysis": {"analyzers": {"my": {
            "type": "custom", "tokenizer": "unicode",
            "token_filters": ["to_lower"],
        }}},
        "default_mapping": {"properties": {"t": {"fields": [
            {"type": "text", "analyzer": "my"}]}}},
    }).validate()


# ---------------------------------------------------- streaming hook


def test_incremental_indexer_with_mapping(spark, tmp_path):
    """IncrementalIndexer(mapping=...) compiles each micro-batch
    through the mapping layer before the segment build: nested paths
    flatten to dotted at-rest fields."""
    from bleve_spark.streaming.pipeline import IncrementalIndexer

    root = str(tmp_path / "seg")
    df1 = spark.createDataFrame(
        [(1, ("quick fox", "en")), (2, ("lazy dogs", "de"))],
        "doc_id long, body struct<text:string, lang:string>",
    )
    df2 = spark.createDataFrame(
        [(3, ("quick panda", "en"))],
        "doc_id long, body struct<text:string, lang:string>",
    )
    im = IndexMapping.from_dict({
        "default_mapping": {"dynamic": False, "properties": {
            "body": {"properties": {
                "text": {"fields": [{"type": "text"}]},
                "lang": {"fields": [
                    {"type": "text", "analyzer": "keyword"},
                ]},
            }},
        }},
        "scoring_model": "bm25",
    })
    ixer = IncrementalIndexer(root, ["doc_id"], mapping=im)
    ixer.process_batch(df1, 0)
    ixer.process_batch(df2, 1)
    assert ixer.segment_count() == 2
    store = ixer.store(spark)
    from bleve_spark.index.mapping import map_table

    flat, fields, _, planned = map_table(
        spark.createDataFrame(
            [(1, ("quick fox", "en")), (2, ("lazy dogs", "de")),
             (3, ("quick panda", "en"))],
            "doc_id long, body struct<text:string, lang:string>",
        ),
        im, ["doc_id"],
    )
    idx = store.to_indexed_table(
        flat, ["doc_id"], {**fields, "_all": "standard"}
    )
    from bleve_spark.search.searcher import search

    res = search(idx, {"field": "body.text", "term": "quick"}, size=10)
    assert sorted(h["id"] for h in res["hits"]) == ["1", "3"]
    res = search(idx, {"field": "body.lang", "term": "de"}, size=10)
    assert [h["id"] for h in res["hits"]] == ["2"]
    # the composite _all streams into the segments too: default-field
    # search works against the at-rest store
    res = search(idx, {"term": "panda"}, size=10)
    assert [h["id"] for h in res["hits"]] == ["3"]
    # both-of-fields() raises when neither/both config given
    with pytest.raises(ValueError, match="exactly one"):
        IncrementalIndexer(root, ["doc_id"])


def test_dynamic_map_runtime_keys(spark):
    """Dynamic mapping over a MapType column: runtime keys become
    searchable fields via exploded postings (the Spark analogue of
    mapping/document.go:425 reflection over JSON objects); the
    analyzer for an unmapped runtime path resolves through the
    mapping default chain."""
    from bleve_spark.index.mapping import (
        IndexMapping,
        index_with_mapping,
    )
    from bleve_spark.search.searcher import search_df

    df = spark.createDataFrame(
        [(1, "quick fox", {"color": "red", "size": "big"}),
         (2, "lazy dog", {"color": "red blue",
                          "topic": "spark engine"}),
         (3, "fox den", {"size": "small"})],
        "doc_id int, text string, attrs map<string,string>",
    )
    im = IndexMapping.from_dict({
        "scoring_model": "bm25",
        "default_mapping": {
            "dynamic": True,
            "properties": {"text": {"fields": [{"type": "text"}]}},
        },
    })
    idx = index_with_mapping(df, ["doc_id"], im, persist=True)
    dyn_fields = {
        r["field"]
        for r in idx.dictionary.select("field").distinct().collect()
    }
    assert {"attrs.color", "attrs.size", "attrs.topic"} <= dyn_fields

    got = [r["doc_id"] for r in search_df(
        idx, {"field": "attrs.color", "term": "red"}, size=10
    ).collect()]
    assert sorted(got) == [1, 2]
    # multi-token value analyzed with the default analyzer
    got = [r["doc_id"] for r in search_df(
        idx, {"field": "attrs.topic", "match": "spark"}, size=10
    ).collect()]
    assert got == [2]
    # per-entry field length: doc 1's color has 1 token (norm 1),
    # doc 2's has 2 (norm 1/sqrt(2)) → doc 1 scores higher
    rows = search_df(idx, {"field": "attrs.color", "term": "red"},
                     size=10).collect()
    by_id = {r["doc_id"]: r["score"] for r in rows}
    assert by_id[1] > by_id[2]
    # composes with static fields in a conjunction
    got = [r["doc_id"] for r in search_df(
        idx, {"conjuncts": [{"field": "text", "match": "fox"},
                            {"field": "attrs.color", "term": "red"}]},
        size=10).collect()]
    assert got == [1]


def test_numeric_array_in_composite_all(spark):
    """Non-text arrays inside the composite ``_all`` (r5): a mapped
    array<number> member contributes 16 trie terms PER ELEMENT to the
    _all length (field_composite.go merges any member type) — the
    exclusion that used to drop array members from _all is gone."""
    import numpy as np

    from bleve_spark.index.mapping import (
        IndexMapping,
        index_with_mapping,
    )
    from bleve_spark.search.searcher import search_df

    df = spark.createDataFrame(
        [(1, "spark", [1.0, 2.0]), (2, "spark", [3.0])],
        "doc_id int, text string, ratings array<double>",
    )
    im = IndexMapping.from_dict({
        "scoring_model": "tfidf",
        "default_mapping": {"dynamic": False, "properties": {
            "text": {"fields": [{"type": "text"}]},
            "ratings": {"fields": [{"type": "number"}]},
        }},
    })
    idx = index_with_mapping(df, ["doc_id"], im, persist=True)
    from pyspark.sql import functions as F
    norms = {r["doc_id"]: r["norm"] for r in idx.postings.where(
        (F.col("field") == "_all") & (F.col("term") == "spark")
    ).select("doc_id", "norm").collect()}
    # doc 1: 1 text + 2×16 = 33; doc 2: 1 + 16 = 17
    assert norms[1] == np.float32(1.0 / np.sqrt(33))
    assert norms[2] == np.float32(1.0 / np.sqrt(17))
    # default-field search still works and ranks doc 2 higher
    # (shorter _all)
    rows = search_df(idx, {"match": "spark"}, size=10).collect()
    assert [r["doc_id"] for r in rows] == [2, 1]


def test_dynamic_map_numeric_range_and_sort(spark):
    """Numeric range + sort over DYNAMIC MapType values (r5):
    "attrs.price" compiles to try_element_at(attrs, 'price') — a
    native, null-safe expression. The reference treats dynamic
    numerics as first-class trie fields (mapping/document.go:425
    walk -> processFloat64); here the map's value type governs
    (double map sorts/ranges numerically; string map values range
    via try_cast to double)."""
    from bleve_spark.index.mapping import (
        IndexMapping,
        index_with_mapping,
    )
    from bleve_spark.search.searcher import search_df

    im = IndexMapping.from_dict({
        "scoring_model": "bm25",
        "default_mapping": {
            "dynamic": True,
            "properties": {"text": {"fields": [{"type": "text"}]}},
        },
    })

    # map<string,double>: range + sort are numeric
    dfd = spark.createDataFrame(
        [(1, "alpha fox", {"price": 10.0, "qty": 5.0}),
         (2, "beta fox", {"price": 2.5}),
         (3, "gamma fox", {"price": 30.0, "qty": 1.0}),
         (4, "delta fox", {"qty": 9.0})],
        "doc_id int, text string, attrs map<string,double>",
    )
    idx = index_with_mapping(dfd, ["doc_id"], im, persist=True)
    got = sorted(r["doc_id"] for r in search_df(
        idx, {"field": "attrs.price", "min": 3.0}, size=10
    ).collect())
    assert got == [1, 3]
    got = sorted(r["doc_id"] for r in search_df(
        idx, {"field": "attrs.price", "min": 1.0, "max": 11.0},
        size=10,
    ).collect())
    assert got == [1, 2]
    # sort ascending by the dynamic value; doc 4 (absent key) lands
    # last (missing=last default)
    rows = search_df(
        idx, {"field": "text", "match": "fox"},
        sort=[{"field": "attrs.price"}], size=10,
    ).collect()
    assert [r["doc_id"] for r in rows] == [2, 1, 3, 4]
    # descending with missing first
    rows = search_df(
        idx, {"field": "text", "match": "fox"},
        sort=[{"field": "attrs.price", "desc": True,
               "missing": "first"}], size=10,
    ).collect()
    assert [r["doc_id"] for r in rows] == [4, 3, 1, 2]
    # composes: range over one dynamic key AND term over another
    got = [r["doc_id"] for r in search_df(
        idx, {"conjuncts": [
            {"field": "attrs.price", "max": 15.0,
             "inclusive_max": True},
            {"field": "attrs.qty", "min": 2.0},
        ]}, size=10,
    ).collect()]
    assert got == [1]

    # map<string,string> with numeric-looking values: range still
    # works via try_cast (non-numeric values never throw under ANSI)
    dfs = spark.createDataFrame(
        [(1, "a", {"price": "10", "tag": "red"}),
         (2, "b", {"price": "2.5"}),
         (3, "c", {"price": "thirty"})],
        "doc_id int, text string, attrs map<string,string>",
    )
    idx2 = index_with_mapping(dfs, ["doc_id"], im, persist=True)
    got = sorted(r["doc_id"] for r in search_df(
        idx2, {"field": "attrs.price", "min": 3.0}, size=10
    ).collect())
    assert got == [1]


def test_numeric_array_range(spark):
    """array<numeric> mapped number fields: a range matches when ANY
    element satisfies it (bleve emits one numeric field instance per
    element) — compiled to a native EXISTS over the array."""
    from bleve_spark.index.mapping import (
        IndexMapping,
        index_with_mapping,
    )
    from bleve_spark.search.searcher import search_df

    df = spark.createDataFrame(
        [(1, "a", [1.5, 9.0]), (2, "b", [3.0]),
         (3, "c", [12.0, 20.0]), (4, "d", [])],
        "doc_id int, text string, ratings array<double>",
    )
    im = IndexMapping.from_dict({
        "scoring_model": "bm25",
        "default_mapping": {"properties": {
            "text": {"fields": [{"type": "text"}]},
            "ratings": {"fields": [{"type": "number"}]},
        }},
    })
    idx = index_with_mapping(df, ["doc_id"], im, persist=True)

    def ids(q):
        return sorted(
            r["doc_id"] for r in search_df(idx, q, size=10).collect()
        )

    assert ids({"field": "ratings", "min": 8.0}) == [1, 3]
    assert ids({"field": "ratings", "min": 2.0, "max": 4.0}) == [2]
    assert ids({"field": "ratings", "max": 2.0}) == [1]


def test_datetime_array_range(spark):
    """array<timestamp> (and parsed array<string>) datetime fields:
    range matches when ANY element is in range — native EXISTS."""
    import datetime as dt

    from bleve_spark.index.mapping import (
        IndexMapping,
        index_with_mapping,
    )
    from bleve_spark.search.searcher import search_df

    t = dt.datetime
    df = spark.createDataFrame(
        [(1, "a", [t(2020, 1, 1), t(2023, 6, 1)]),
         (2, "b", [t(2021, 3, 1)]),
         (3, "c", [t(2025, 1, 1)])],
        "doc_id int, text string, seen array<timestamp>",
    )
    im = IndexMapping.from_dict({
        "scoring_model": "bm25",
        "default_mapping": {"properties": {
            "text": {"fields": [{"type": "text"}]},
            "seen": {"fields": [{"type": "datetime"}]},
        }},
    })
    idx = index_with_mapping(df, ["doc_id"], im, persist=True)
    got = sorted(r["doc_id"] for r in search_df(
        idx, {"field": "seen", "start": "2021-01-01",
              "end": "2024-01-01"}, size=10
    ).collect())
    assert got == [1, 2]


def test_boolean_scalar_and_array_fields(spark):
    """Scalar boolean fields index a T/F term (field_boolean.go) and
    resolve bool_field queries through postings; boolean ARRAYS match
    via native EXISTS (any element equal)."""
    from bleve_spark.index.mapping import (
        IndexMapping,
        index_with_mapping,
    )
    from bleve_spark.search.searcher import search_df

    df = spark.createDataFrame(
        [(1, "a", True, [True, False]), (2, "b", False, [False]),
         (3, "c", True, [])],
        "doc_id int, text string, ok boolean, flags array<boolean>",
    )
    im = IndexMapping.from_dict({
        "scoring_model": "bm25",
        "default_mapping": {"properties": {
            "text": {"fields": [{"type": "text"}]},
            "ok": {"fields": [{"type": "boolean"}]},
            "flags": {"fields": [{"type": "boolean"}]},
        }},
    })
    idx = index_with_mapping(df, ["doc_id"], im, persist=True)

    def ids(q):
        return sorted(
            r["doc_id"] for r in search_df(idx, q, size=10).collect()
        )

    assert ids({"field": "ok", "bool": True}) == [1, 3]
    assert ids({"field": "ok", "bool": False}) == [2]
    assert ids({"field": "flags", "bool": True}) == [1]
    assert ids({"field": "flags", "bool": False}) == [1, 2]


def test_unix_epoch_subsecond_precision(spark):
    """unix_milli/micro/nano parsing keeps sub-second precision —
    exact decimal→timestamp_micros, no whole-second from_unixtime
    round-trip (the reference's epoch parsers are exact,
    analysis/datetime/timestamp)."""
    df = spark.createDataFrame(
        [(1, "a", 1250, 1_250_500, 1_250_500_750),
         (2, "b", 1750, 1_750_500, 1_750_500_750)],
        "doc_id long, name string, ms long, us long, ns long",
    )
    im = IndexMapping.from_dict({
        "default_mapping": {"dynamic": False, "properties": {
            "name": {"fields": [{"type": "text"}]},
            "ms": {"fields": [{"type": "datetime",
                               "date_format": "unix_milli"}]},
            "us": {"fields": [{"type": "datetime",
                               "date_format": "unix_micro"}]},
            "ns": {"fields": [{"type": "datetime",
                               "date_format": "unix_nano"}]},
        }},
        "scoring_model": "bm25",
    })
    idx = index_with_mapping(df, ["doc_id"], im, persist=False)
    rows = {r["doc_id"]: r
            for r in idx.source.select("doc_id", "ms", "us", "ns")
            .collect()}
    # 500 ms apart → distinct instants with exact sub-second parts
    assert rows[1]["ms"].microsecond == 250_000
    assert rows[2]["ms"].microsecond == 750_000
    assert rows[1]["us"].microsecond == 250_500
    # nanos truncate to micros (timestamp resolution)
    assert rows[1]["ns"].microsecond == 250_500
    assert rows[1]["ms"] != rows[2]["ms"]


def test_unix_epoch_negative_floors(spark):
    """Pre-1970 sub-microsecond epochs FLOOR toward -inf like the
    reference's integer nanosecond division (time.Unix semantics) —
    a cast('long') would truncate toward zero and round UP by 1µs.
    -1_500 ns = -2µs floored (1969-12-31T23:59:59.999998Z)."""
    import datetime as dt
    df = spark.createDataFrame(
        [(1, "a", -1_500, -2_500_001)],
        "doc_id long, name string, ns long, ns2 long",
    )
    im = IndexMapping.from_dict({
        "default_mapping": {"dynamic": False, "properties": {
            "name": {"fields": [{"type": "text"}]},
            "ns": {"fields": [{"type": "datetime",
                               "date_format": "unix_nano"}]},
            "ns2": {"fields": [{"type": "datetime",
                                "date_format": "unix_nano"}]},
        }},
        "scoring_model": "bm25",
    })
    idx = index_with_mapping(df, ["doc_id"], im, persist=False)
    row = idx.source.select("ns", "ns2").collect()[0]
    epoch = dt.datetime(1970, 1, 1)
    # floor(-1500/1000) = -2 µs; floor(-2500001/1000) = -2501 µs
    assert row["ns"] == epoch + dt.timedelta(microseconds=-2)
    assert row["ns2"] == epoch + dt.timedelta(microseconds=-2501)
