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
def shapes_df(spark):
    from bleve_spark.search.geoshape import (
        PARTS_SCHEMA,
        geojson_to_parts,
    )

    rows = []
    for f in sorted(glob.glob(f"{T}/data/*.json")):
        d = json.load(open(f))
        parts = geojson_to_parts(d["region"])
        rows.append((os.path.basename(f)[:-5], parts))
    return spark.createDataFrame(
        rows, f"id string, parts {PARTS_SCHEMA}"
    ).cache()


SEARCHES = json.load(open(f"{T}/searches.json"))


@pytest.mark.parametrize(
    "i,case", list(enumerate(SEARCHES)),
    ids=[f"{i:02d}-{c.get('comment', '')[:40]}"
         for i, c in enumerate(SEARCHES)],
)
def test_reference_geoshapes_golden(shapes_df, i, case):
    from bleve_spark.search.geoshape import parts_relation_pred

    g = case["search"]["query"]["geometry"]
    pred = parts_relation_pred(
        F.col("parts"), g["shape"], g["relation"]
    )
    got = {r["id"] for r in shapes_df.where(pred).collect()}
    want = {h["id"] for h in case["result"]["hits"]}
    assert got == want, f"search {i}: got {sorted(got)}"
