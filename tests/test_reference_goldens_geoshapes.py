"""The reference's LARGEST golden suite — geoshapes (35 searches / 9
GeoJSON shape docs: point, linestring, polygon, envelope, circle,
multipoint, multilinestring, multipolygon, geometrycollection) —
through the parts-based geoshape engine (search/geoshape.py), planar
relation semantics documented there."""

import glob
import json
import os

import pytest
from pyspark.sql import functions as F

T = "/root/reference/test/tests/geoshapes"


@pytest.fixture(scope="module")
def shapes_idx(spark):
    """Driven by the suite's OWN mapping.json through the mapping
    layer: region is a geoshape field — the GeoJSON string parses to
    the parts column once at index time (Arrow batch), the 8 parts
    bbox columns materialize for coarse pruning, and queries route
    through compile_query's geoshape branch end-to-end."""
    from bleve_spark.index.mapping import IndexMapping, index_with_mapping

    rows = []
    for f in sorted(glob.glob(f"{T}/data/*.json")):
        d = json.load(open(f))
        rows.append((
            os.path.basename(f)[:-5],
            d.get("name"),
            json.dumps(d["region"]),
        ))
    df = spark.createDataFrame(
        rows, "id string, name string, region string"
    )
    im = IndexMapping.from_dict(json.load(open(f"{T}/mapping.json")))
    return index_with_mapping(df, ["id"], im, scoring="bm25")


SEARCHES = json.load(open(f"{T}/searches.json"))


@pytest.mark.parametrize(
    "i,case", list(enumerate(SEARCHES)),
    ids=[f"{i:02d}-{c.get('comment', '')[:40]}"
         for i, c in enumerate(SEARCHES)],
)
def test_reference_geoshapes_golden(shapes_idx, i, case):
    from bleve_spark.search.searcher import compile_query

    got = {
        r["id"] for r in
        compile_query(shapes_idx, case["search"]["query"]).collect()
    }
    want = {h["id"] for h in case["result"]["hits"]}
    assert got == want, f"search {i}: got {sorted(got)}"
