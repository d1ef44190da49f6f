"""Multi-member polygon-union `within` — a doc part straddling two
TOUCHING query members is within the union even though it is within
neither member alone (the member-wise approximation the round-2
review documented; reference s2 evaluates the query region as one
union, geo_shape.go relation=within over a multipolygon)."""

import pytest
from pyspark.sql import functions as F

from bleve_spark.search.geoshape import (
    PARTS_SCHEMA,
    geojson_to_parts,
    parts_relation_pred,
)

# two axis-aligned members sharing the seam x=5; union = [0,10]x[0,10]
UNION_Q = {
    "type": "multipolygon",
    "coordinates": [
        [[[0.0, 0.0], [5.0, 0.0], [5.0, 10.0], [0.0, 10.0],
          [0.0, 0.0]]],
        [[[5.0, 0.0], [10.0, 0.0], [10.0, 10.0], [5.0, 10.0],
          [5.0, 0.0]]],
    ],
}

# same two members, but the LEFT one carries a hole [1,4]x[2,6]:
# the union region excludes the hole
UNION_HOLE_Q = {
    "type": "multipolygon",
    "coordinates": [
        [[[0.0, 0.0], [5.0, 0.0], [5.0, 10.0], [0.0, 10.0],
          [0.0, 0.0]],
         [[1.0, 2.0], [4.0, 2.0], [4.0, 6.0], [1.0, 6.0],
          [1.0, 2.0]]],
        [[[5.0, 0.0], [10.0, 0.0], [10.0, 10.0], [5.0, 10.0],
          [5.0, 0.0]]],
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


def test_point_union_within(spark):
    df = _parts_df(spark, [
        ("left", {"type": "point", "coordinates": [2.0, 3.0]}),
        ("right", {"type": "point", "coordinates": [8.0, 3.0]}),
        ("out", {"type": "point", "coordinates": [12.0, 3.0]}),
    ])
    assert _ids(spark, df, UNION_Q, "within") == ["left", "right"]


def test_straddling_polygon_within_union(spark):
    """The case member-wise evaluation gets wrong: within neither
    member alone, but within their union."""
    df = _parts_df(spark, [
        ("straddle", {"type": "polygon", "coordinates":
                      [[[3, 3], [7, 3], [7, 7], [3, 7], [3, 3]]]}),
        ("in_left", {"type": "polygon", "coordinates":
                     [[[1, 1], [2, 1], [2, 2], [1, 2], [1, 1]]]}),
        # exits the union on the right
        ("leaks", {"type": "polygon", "coordinates":
                   [[[3, 3], [12, 3], [12, 7], [3, 7], [3, 3]]]}),
        ("out", {"type": "polygon", "coordinates":
                 [[[20, 20], [21, 20], [21, 21], [20, 21],
                   [20, 20]]]}),
    ])
    assert _ids(spark, df, UNION_Q, "within") == [
        "in_left", "straddle"
    ]
    # intersects keeps the member-wise (exact for intersects) path
    assert _ids(spark, df, UNION_Q, "intersects") == [
        "in_left", "leaks", "straddle"
    ]


def test_straddling_linestring_within_union(spark):
    df = _parts_df(spark, [
        ("cross_seam", {"type": "linestring",
                        "coordinates": [[2.0, 4.0], [8.0, 4.0]]}),
        ("leaks", {"type": "linestring",
                   "coordinates": [[2.0, 4.0], [14.0, 4.0]]}),
    ])
    assert _ids(spark, df, UNION_Q, "within") == ["cross_seam"]


def test_union_respects_member_holes(spark):
    """Edge passing over a member's hole leaves the union region even
    though both endpoints are inside it."""
    df = _parts_df(spark, [
        # both endpoints in left-member region, segment crosses the
        # hole interior (y=5 from x=0.5 to x=4.5 crosses [1,4]x[2,6])
        ("over_hole", {"type": "linestring",
                       "coordinates": [[0.5, 5.0], [4.5, 5.0]]}),
        # same shape but below the hole: stays in the region
        ("below_hole", {"type": "linestring",
                        "coordinates": [[0.5, 1.0], [4.5, 1.0]]}),
        # straddles the seam, away from the hole
        ("straddle", {"type": "polygon", "coordinates":
                      [[[3, 7], [7, 7], [7, 9], [3, 9], [3, 7]]]}),
        ("in_hole", {"type": "point", "coordinates": [2.0, 4.0]}),
    ])
    assert _ids(spark, df, UNION_HOLE_Q, "within") == [
        "below_hole", "straddle"
    ]


def test_circle_part_keeps_memberwise_within(spark):
    """A disc region spanning members is not vertex-decomposable —
    circles keep the member-wise test (documented approximation)."""
    df = _parts_df(spark, [
        ("disc_in_left", {"type": "circle",
                          "coordinates": [2.5, 5.0],
                          "radius": "1m"}),
    ])
    # tiny disc fully inside the left member still matches
    assert _ids(spark, df, UNION_Q, "within") == ["disc_in_left"]


def test_single_member_path_unchanged(spark):
    """len(qparts)==1 keeps the original member-wise code path."""
    single = {"type": "polygon",
              "coordinates": [[[0.0, 0.0], [10.0, 0.0], [10.0, 10.0],
                               [0.0, 10.0], [0.0, 0.0]]]}
    df = _parts_df(spark, [
        ("in", {"type": "polygon", "coordinates":
                [[[3, 3], [7, 3], [7, 7], [3, 7], [3, 3]]]}),
        ("out", {"type": "polygon", "coordinates":
                 [[[3, 3], [12, 3], [12, 7], [3, 7], [3, 3]]]}),
    ])
    assert _ids(spark, df, single, "within") == ["in"]


@pytest.mark.parametrize("relation", ["within"])
def test_union_pruned_equals_unpruned(spark, relation):
    df = _parts_df(spark, [
        ("straddle", {"type": "polygon", "coordinates":
                      [[[3, 3], [7, 3], [7, 7], [3, 7], [3, 3]]]}),
        ("out", {"type": "point", "coordinates": [40.0, 40.0]}),
    ])
    got = sorted(r["id"] for r in df.where(
        parts_relation_pred(F.col("parts"), UNION_Q, relation)
    ).collect())
    want = sorted(r["id"] for r in df.where(
        parts_relation_pred(F.col("parts"), UNION_Q, relation,
                            prune=False)
    ).collect())
    assert got == want == ["straddle"]
