"""Polygon holes (GeoJSON inner rings) in the parts geoshape engine —
the s2 polygons the reference indexes carry holes (geo/README.md);
rings c[1:] subtract from the outer ring's region on BOTH the query
side and the doc side."""

import pytest
from pyspark.sql import functions as F

from bleve_spark.search.geoshape import (
    PARTS_SCHEMA,
    geojson_to_parts,
    parts_relation_pred,
)

# query: 10×10 square with a 4×4 hole in the middle
DONUT = {
    "type": "polygon",
    "coordinates": [
        [[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0],
         [0.0, 0.0]],
        [[3.0, 3.0], [7.0, 3.0], [7.0, 7.0], [3.0, 7.0], [3.0, 3.0]],
    ],
}


def _parts_df(spark, shapes):
    rows = [(sid, geojson_to_parts(s)) for sid, s in shapes]
    return spark.createDataFrame(rows, f"id string, parts {PARTS_SCHEMA}")


def _ids(spark, df, qshape, relation):
    return sorted(
        r["id"] for r in df.where(
            parts_relation_pred(F.col("parts"), qshape, relation)
        ).collect()
    )


def test_geojson_polygon_holes_parsed():
    parts = geojson_to_parts(DONUT)
    assert len(parts) == 1
    kind, ring, radius, holes = parts[0]
    assert kind == "polygon" and len(holes) == 1
    assert holes[0][0] == holes[0][-1]          # closed


def test_point_in_hole_does_not_match_query_donut(spark):
    df = _parts_df(spark, [
        ("in_region", {"type": "point", "coordinates": [1.0, 1.0]}),
        ("in_hole", {"type": "point", "coordinates": [5.0, 5.0]}),
        ("outside", {"type": "point", "coordinates": [20.0, 20.0]}),
    ])
    assert _ids(spark, df, DONUT, "within") == ["in_region"]
    assert _ids(spark, df, DONUT, "intersects") == ["in_region"]


def test_polygon_vs_query_donut(spark):
    df = _parts_df(spark, [
        # entirely inside the ring region
        ("in_region", {"type": "polygon", "coordinates":
                       [[[1, 1], [2, 1], [2, 2], [1, 2], [1, 1]]]}),
        # entirely inside the hole
        ("in_hole", {"type": "polygon", "coordinates":
                     [[[4, 4], [6, 4], [6, 6], [4, 6], [4, 4]]]}),
        # straddles the hole boundary
        ("straddle", {"type": "polygon", "coordinates":
                      [[[2, 4], [5, 4], [5, 6], [2, 6], [2, 4]]]}),
        # fully covers the hole (and more)
        ("covers_hole", {"type": "polygon", "coordinates":
                         [[[2, 2], [8, 2], [8, 8], [2, 8], [2, 2]]]}),
        ("outside", {"type": "polygon", "coordinates":
                     [[[20, 20], [21, 20], [21, 21], [20, 21],
                       [20, 20]]]}),
    ])
    assert _ids(spark, df, DONUT, "within") == ["in_region"]
    assert _ids(spark, df, DONUT, "intersects") == [
        "covers_hole", "in_region", "straddle"
    ]


def test_doc_donut_relations(spark):
    """Doc shape carries the holes: contains/intersects must subtract
    the hole region."""
    df = _parts_df(spark, [("donut", DONUT)])
    # point query inside the hole: not contained, not intersecting
    assert _ids(spark, df,
                {"type": "point", "coordinates": [5.0, 5.0]},
                "contains") == []
    assert _ids(spark, df,
                {"type": "point", "coordinates": [1.0, 1.0]},
                "contains") == ["donut"]
    # small polygon inside the hole: no intersection with the donut
    hole_poly = {"type": "polygon", "coordinates":
                 [[[4, 4], [6, 4], [6, 6], [4, 6], [4, 4]]]}
    assert _ids(spark, df, hole_poly, "intersects") == []
    assert _ids(spark, df, hole_poly, "contains") == []
    # polygon in the region: contained
    reg_poly = {"type": "polygon", "coordinates":
                [[[1, 1], [2, 1], [2, 2], [1, 2], [1, 1]]]}
    assert _ids(spark, df, reg_poly, "contains") == ["donut"]
    # polygon covering the hole: intersects but NOT contained
    cover = {"type": "polygon", "coordinates":
             [[[2, 2], [8, 2], [8, 8], [2, 8], [2, 2]]]}
    assert _ids(spark, df, cover, "intersects") == ["donut"]
    assert _ids(spark, df, cover, "contains") == []
    # linestring through the hole only: buried, no intersection
    in_hole_ls = {"type": "linestring",
                  "coordinates": [[4.0, 5.0], [6.0, 5.0]]}
    assert _ids(spark, df, in_hole_ls, "intersects") == []
    # linestring crossing hole boundary into the region: intersects
    cross_ls = {"type": "linestring",
                "coordinates": [[1.0, 5.0], [5.0, 5.0]]}
    assert _ids(spark, df, cross_ls, "intersects") == ["donut"]


def test_multipolygon_with_holes(spark):
    shape = {
        "type": "multipolygon",
        "coordinates": [
            [[[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]],
             [[3, 3], [7, 3], [7, 7], [3, 7], [3, 3]]],
            [[[20, 20], [30, 20], [30, 30], [20, 30], [20, 20]]],
        ],
    }
    parts = geojson_to_parts(shape)
    assert [len(p[3]) for p in parts] == [1, 0]
    df = _parts_df(spark, [
        ("hole_pt", {"type": "point", "coordinates": [5.0, 5.0]}),
        ("reg_pt", {"type": "point", "coordinates": [25.0, 25.0]}),
    ])
    assert _ids(spark, df, shape, "within") == ["reg_pt"]


@pytest.mark.parametrize("relation", ["within", "intersects"])
def test_donut_query_pruned_equals_unpruned(spark, relation):
    """The bbox pre-filter must stay consistent with hole semantics
    (holes never extend the bbox)."""
    df = _parts_df(spark, [
        ("in_region", {"type": "point", "coordinates": [1.0, 1.0]}),
        ("in_hole", {"type": "point", "coordinates": [5.0, 5.0]}),
        ("outside", {"type": "point", "coordinates": [20.0, 20.0]}),
    ])
    got = sorted(r["id"] for r in df.where(
        parts_relation_pred(F.col("parts"), DONUT, relation)
    ).collect())
    want = sorted(r["id"] for r in df.where(
        parts_relation_pred(F.col("parts"), DONUT, relation,
                            prune=False)
    ).collect())
    assert got == want == ["in_region"]
