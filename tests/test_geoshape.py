"""GeoShape query known-answer tests (hand-computed planar geometry).

Parity target: /root/reference/search/query/geo_shape.go:27-108
(relations evaluated as doc-shape RELATION query-shape). The engine
uses planar lon/lat edges where the reference uses s2 geodesics —
these fixtures use shapes far from the poles/antimeridian where the
two agree on containment."""

import pytest
from pyspark.sql import functions as F

from bleve_spark.index.build import index_table
from bleve_spark.search.searcher import compile_query

# doc shapes, hand-placed against the query square (0,0)-(10,10):
#   id  kind        geometry                         within intersects
DOCS = [
    (1, "point", [[5.0, 5.0]]),           # inside
    (2, "point", [[15.0, 5.0]]),          # outside
    (3, "polygon", [[2.0, 2.0], [4.0, 2.0], [4.0, 4.0], [2.0, 4.0],
                    [2.0, 2.0]]),         # fully inside
    (4, "polygon", [[-5.0, -5.0], [15.0, -5.0], [15.0, 15.0],
                    [-5.0, 15.0], [-5.0, -5.0]]),  # fully covers query
    (5, "polygon", [[5.0, -5.0], [15.0, -5.0], [15.0, 5.0],
                    [5.0, 5.0], [5.0, -5.0]]),     # overlaps edge
    (6, "polygon", [[20.0, 20.0], [25.0, 20.0], [25.0, 25.0],
                    [20.0, 25.0], [20.0, 20.0]]),  # disjoint
    (7, "linestring", [[-5.0, 5.0], [5.0, 5.0]]),  # crosses boundary
    (8, "linestring", [[1.0, 1.0], [2.0, 2.0]]),   # fully inside
]

QUERY_SQUARE = {
    "type": "polygon",
    "coordinates": [[0.5, 0.25], [10.5, 0.25], [10.5, 10.75],
                    [0.5, 10.75]],
}
# hand-recomputed against the fractional square (0.5,0.25)-(10.5,10.75):
# 1 inside; 3 inside; 4 covers it; 5 overlaps; 7 crosses; 8 inside
WITHIN = {1, 3, 8}
INTERSECTS = {1, 3, 4, 5, 7, 8}
CONTAINS = {4}  # only the big rect contains the whole query square


@pytest.fixture(scope="module")
def shape_idx(spark):
    df = spark.createDataFrame(
        [(i, k, c) for i, k, c in DOCS],
        "doc_id int, shape_kind string, shape_coords array<array<double>>",
    )
    return index_table(
        df.withColumn("pad", F.lit("x")),
        key_cols=["doc_id"], fields={"pad": "keyword"},
    )


def _ids(idx, shape, relation):
    q = {"field": "shape", "geometry": {"shape": shape,
                                        "relation": relation}}
    return {r["doc_id"] for r in compile_query(idx, q).collect()}


def test_within(shape_idx):
    assert _ids(shape_idx, QUERY_SQUARE, "within") == WITHIN


def test_intersects(shape_idx):
    assert _ids(shape_idx, QUERY_SQUARE, "intersects") == INTERSECTS


def test_contains(shape_idx):
    assert _ids(shape_idx, QUERY_SQUARE, "contains") == CONTAINS


def test_within_subset_of_intersects(shape_idx):
    w = _ids(shape_idx, QUERY_SQUARE, "within")
    i = _ids(shape_idx, QUERY_SQUARE, "intersects")
    assert w <= i


def test_contains_point(shape_idx):
    # (3.5, 3.25) sits in doc polygons 3 and 4 only
    q = {"type": "point", "coordinates": [3.5, 3.25]}
    assert _ids(shape_idx, q, "contains") == {3, 4}


def test_envelope_equals_polygon(shape_idx):
    env = {"type": "envelope",
           "coordinates": [[0.5, 10.75], [10.5, 0.25]]}
    for rel in ("within", "intersects", "contains"):
        assert _ids(shape_idx, env, rel) == _ids(
            shape_idx, QUERY_SQUARE, rel
        )


def test_linestring_query_intersects(shape_idx):
    # path cutting through the square region: crosses doc 4's covering
    # rect boundary? (path inside it → q vertices in doc 4), crosses
    # doc 5's left edge at x=5, crosses doc 7's horizontal segment
    path = {"type": "linestring",
            "coordinates": [[-2.5, 4.75], [7.5, 4.75]]}
    got = _ids(shape_idx, path, "intersects")
    # doc3 rect (2,2)-(4,4): path at y=4.75 passes above it → no
    # doc4 (-5..15): path fully inside → vertices in doc → yes
    # doc5 (5,-5)-(15,5): crosses edge x=5 at y=4.75 → yes
    # doc7 ls (-5,5)-(5,5): parallel at y=5 vs 4.75 → no
    # doc8 ls (1,1)-(2,2): no crossing
    assert got == {4, 5}


def test_linestring_query_contains(shape_idx):
    path = {"type": "linestring",
            "coordinates": [[2.5, 2.25], [3.5, 3.75]]}
    # fully inside doc rects 3 and 4
    assert _ids(shape_idx, path, "contains") == {3, 4}


def test_multipolygon_query(shape_idx):
    mp = {"type": "multipolygon", "coordinates": [
        [[0.5, 0.25], [10.5, 0.25], [10.5, 10.75], [0.5, 10.75]],
        [[19.5, 19.25], [26.5, 19.25], [26.5, 26.75], [19.5, 26.75]],
    ]}
    # union of the query square and a square around doc 6
    assert _ids(shape_idx, mp, "intersects") == INTERSECTS | {6}
    assert _ids(shape_idx, mp, "within") == WITHIN | {6}
    # only doc 4 contains the first member, nothing contains both
    assert _ids(shape_idx, mp, "contains") == set()


def test_multilinestring_query(shape_idx):
    ml = {"type": "multilinestring", "coordinates": [
        [[-2.5, 4.75], [7.5, 4.75]],
        [[2.5, 2.25], [3.5, 3.75]],
    ]}
    got = _ids(shape_idx, ml, "intersects")
    # union of the two path results: {4,5} ∪ {3,4} (2nd path is
    # inside docs 3 and 4 → vertices-in-polygon)
    assert got == {3, 4, 5}


def test_circle_relations(shape_idx):
    # ~111 km per degree at the equator: doc1 (5,5) ≈ 785 km from
    # (0,0), doc2 (15,5) ≈ 1755 km — a 1000 km circle splits them
    circle = {"type": "circle", "coordinates": [0.0, 0.0],
              "radius": "1000km"}
    w = _ids(shape_idx, circle, "within")
    assert 1 in w and 3 in w and 8 in w
    assert 2 not in w and 6 not in w
