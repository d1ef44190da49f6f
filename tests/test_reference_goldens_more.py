"""Reference golden suites `facet` (3), `fosdem` (5), `geo` (10),
`alias` (3), `employee` (1) through this engine.

Conventions: doc ids come from the data file names (as the reference
integration harness does); nested fields are flattened with `_`
(manages.reports → manages_reports — dots collide with Spark column
path syntax); the employee search compares total/ids only (per-hit
location output is not part of this engine's result surface)."""

import glob
import json
import os

import pytest
from pyspark.sql import functions as F

from bleve_spark.index.build import index_table
from bleve_spark.search.searcher import compile_query, search, search_df

T = "/root/reference/test/tests"


def _docs(suite, sub="data"):
    out = []
    for f in sorted(glob.glob(f"{T}/{suite}/{sub}/*.json")):
        d = json.load(open(f))
        d.setdefault("id", os.path.basename(f)[:-5])
        out.append(d)
    return out


# ------------------------------------------------------------- facet --


@pytest.fixture(scope="module")
def facet_idx(spark):
    rows = [
        (d["id"], d["category"], d["type"], int(d["rating"]),
         d["updated"])
        for d in _docs("facet")
    ]
    df = spark.createDataFrame(
        rows, "id string, category string, type string, rating long, "
        "updated_s string",
    ).withColumn("updated", F.to_timestamp("updated_s")).drop("updated_s")
    # mapping.json is {} → default dynamic mapping (facet buckets read
    # the source columns natively, so bucket terms are exact values)
    from bleve_spark.index.mapping import IndexMapping, index_with_mapping

    return index_with_mapping(df, ["id"], IndexMapping(),
                              scoring="bm25")


FACET_SEARCHES = json.load(open(f"{T}/facet/searches.json"))


@pytest.mark.parametrize("i,case", list(enumerate(FACET_SEARCHES)),
                         ids=lambda v: str(v)[:16])
def test_reference_facet_golden(facet_idx, i, case):
    req = case["search"]
    res = search(facet_idx, req["query"], size=int(req.get("size", 0)),
                 facets=req["facets"])
    assert res["total_hits"] == case["result"]["total_hits"]
    for name, want in case["result"]["facets"].items():
        got = res["facets"][name]
        for k in ("field", "total", "missing", "other"):
            assert got[k] == want[k], (name, k, got)
        for bucket_key in ("terms", "numeric_ranges", "date_ranges"):
            if bucket_key in want:
                wmap = {b.get("term", b.get("name")): b["count"]
                        for b in want[bucket_key]}
                gmap = {b.get("term", b.get("name")): b["count"]
                        for b in got[bucket_key]}
                assert gmap == wmap, (name, bucket_key, gmap)


# ------------------------------------------------------------ fosdem --


@pytest.fixture(scope="module")
def fosdem_idx(spark):
    """Driven by the suite's OWN mapping.json through the
    IndexMapping layer: category → keyword, description → en (the
    fixture's actual analyzer), unmapped summary/url properties have
    no matching columns and plan nothing, the `_all` composite comes
    from include_in_all."""
    import json as _json

    from bleve_spark.index.mapping import IndexMapping, index_with_mapping

    rows = [(d["id"], d.get("category"), d.get("description"))
            for d in _docs("fosdem")]
    df = spark.createDataFrame(
        rows, "id string, category string, description string"
    )
    im = IndexMapping.from_dict(
        _json.load(open(f"{T}/fosdem/mapping.json"))
    )
    return index_with_mapping(df, ["id"], im, scoring="bm25")


FOSDEM_SEARCHES = json.load(open(f"{T}/fosdem/searches.json"))


@pytest.mark.parametrize("i,case", list(enumerate(FOSDEM_SEARCHES)),
                         ids=lambda v: str(v)[:16])
def test_reference_fosdem_golden(fosdem_idx, i, case):
    req = case["search"]
    assert compile_query(fosdem_idx, req["query"]).count() == \
        case["result"]["total_hits"], f"search {i} total"
    out = search_df(
        fosdem_idx, req["query"], size=int(req.get("size", 10)),
        sort=req.get("sort") or ["-_score", "_id"],
    ).collect()
    got = {r["id"] for r in out}
    want = {h["id"] for h in case["result"].get("hits", [])}
    assert got == want, f"search {i}: got {sorted(got)}"


# --------------------------------------------------------------- geo --


@pytest.fixture(scope="module")
def geo_idx(spark):
    """Driven by the suite's OWN mapping.json: type 'brewery' (the
    default_type, no _type column needed) maps name → keyword text and
    geo → geopoint; the geopoint plan flattens the {lat, lon} struct
    to the engine's geo_lat/geo_lon columns."""
    import json as _json

    from bleve_spark.index.mapping import IndexMapping, index_with_mapping

    rows = [
        (d["id"], d.get("name"),
         (float(d["geo"]["lat"]), float(d["geo"]["lon"])))
        for d in _docs("geo")
    ]
    df = spark.createDataFrame(
        rows,
        "id string, name string, geo struct<lat:double, lon:double>",
    )
    im = IndexMapping.from_dict(
        _json.load(open(f"{T}/geo/mapping.json"))
    )
    return index_with_mapping(df, ["id"], im, scoring="bm25")


GEO_SEARCHES = json.load(open(f"{T}/geo/searches.json"))


@pytest.mark.parametrize("i,case", list(enumerate(GEO_SEARCHES)),
                         ids=lambda v: str(v)[:16])
def test_reference_geo_golden(geo_idx, i, case):
    req = case["search"]
    out = search_df(
        geo_idx, req["query"], size=int(req.get("size", 10)),
        sort=req.get("sort") or ["-_score", "_id"],
    ).collect()
    got = [r["id"] for r in out]
    want = [h["id"] for h in case["result"]["hits"]]
    assert got == want, f"search {i}: got {got}"


# ------------------------------------------------------------- alias --


@pytest.fixture(scope="module")
def alias_idx(spark):
    from bleve_spark.search.alias import AliasIndex

    shards = []
    for shard_dir in sorted(glob.glob(f"{T}/alias/datasets/*")):
        docs = []
        for f in sorted(glob.glob(f"{shard_dir}/*.json")):
            d = json.load(open(f))
            d.setdefault("id", os.path.basename(f)[:-5])
            docs.append((d["id"], d["name"]))
        df = spark.createDataFrame(docs, "id string, name string")
        # mapping.json: default_analyzer "keyword" → every dynamic
        # text field (name) analyzes keyword, per shard
        from bleve_spark.index.mapping import (
            IndexMapping, index_with_mapping,
        )

        im = IndexMapping.from_dict(
            json.load(open(f"{T}/alias/mapping.json"))
        )
        shards.append(
            index_with_mapping(df, ["id"], im, scoring="bm25")
        )
    return AliasIndex(shards)


ALIAS_SEARCHES = json.load(open(f"{T}/alias/searches.json"))


@pytest.mark.parametrize("i,case", list(enumerate(ALIAS_SEARCHES)),
                         ids=lambda v: str(v)[:16])
def test_reference_alias_golden(alias_idx, i, case):
    req = case["search"]
    assert compile_query(alias_idx, req["query"]).count() == \
        case["result"]["total_hits"]
    out = search_df(
        alias_idx, req["query"], size=int(req.get("size", 10)),
        from_=int(req.get("from", 0)), sort=req.get("sort"),
        search_after=req.get("search_after"),
        search_before=req.get("search_before"),
    ).collect()
    got = [r["id"] for r in out[int(req.get("from", 0)):]]
    want = [h["id"] for h in case["result"]["hits"]]
    assert got == want, f"search {i}: got {got}"


# ----------------------------------------------------------- employee --


def test_reference_employee_golden(spark):
    """mapping.json is {} → dynamic default over the NESTED document:
    manages.reports (an array under a struct) flattens to the dotted
    field name the search request uses VERBATIM — no rename shim."""
    from bleve_spark.index.mapping import IndexMapping, index_with_mapping

    docs = _docs("employee")
    rows = [
        (d["id"], d["name"], d["dept"],
         (d.get("manages", {}).get("reports"),))
        for d in docs
    ]
    df = spark.createDataFrame(
        rows, "id string, name string, dept string, "
        "manages struct<reports: array<string>>",
    )
    idx = index_with_mapping(df, ["id"], IndexMapping(),
                             scoring="bm25")
    case = json.load(open(f"{T}/employee/searches.json"))[0]
    out = compile_query(idx, case["search"]["query"]).collect()
    assert len(out) == case["result"]["total_hits"]
    assert {r["id"] for r in out} == {
        h["id"] for h in case["result"]["hits"]
    }
