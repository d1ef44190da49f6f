"""A/B equivalence: the Arrow-batch exact kernels (geoshape_np) must
return EXACTLY the same doc sets as the native Column builders they
transcribe — geo.shape_relation_pred (flat engine) and
geoshape.parts_relation_pred (parts engine) — across every relation
and query-shape family, on a corpus dense enough to exercise every
branch (points / paths / polygons / circles, holes, near-boundary
docs)."""

import pytest
from pyspark.sql import functions as F

from bleve_spark.search import geoshape_np
from bleve_spark.search.geo import shape_relation_pred
from bleve_spark.search.geoshape import PARTS_SCHEMA, parts_relation_pred


def _flat_docs(spark):
    """Deterministic flat corpus: same derivation family as the
    driver's _docs_index shapes (point / 3-vert path / closed rect by
    id % 3) over a grid that straddles the query shapes."""
    df = spark.range(0, 600).select(F.col("id").alias("doc_id"))
    bx = ((F.col("doc_id") * 13) % 141 - 70).cast("double")
    by = ((F.col("doc_id") * 7) % 121 - 60).cast("double")
    dx = (F.col("doc_id") % 4 + 1).cast("double")
    dy = (F.col("doc_id") % 3 + 1).cast("double")
    w = (F.col("doc_id") % 5 + 2).cast("double")
    h = (F.col("doc_id") % 7 + 2).cast("double")
    pt = F.array(F.array(bx, by))
    ls = F.array(
        F.array(bx, by),
        F.array(bx + dx, by + dy),
        F.array(bx + dx * 2, by - dy),
    )
    pg = F.array(
        F.array(bx, by),
        F.array(bx + w, by),
        F.array(bx + w, by + h),
        F.array(bx, by + h),
        F.array(bx, by),
    )
    m3 = F.col("doc_id") % 3
    return (
        df.withColumn(
            "kind",
            F.when(m3 == 0, F.lit("point"))
            .when(m3 == 1, F.lit("linestring"))
            .otherwise(F.lit("polygon")),
        ).withColumn(
            "coords", F.when(m3 == 0, pt).when(m3 == 1, ls).otherwise(pg)
        )
    )


QPOLY = {
    "type": "polygon",
    "coordinates": [[-20.5, -25.25], [30.5, -20.25], [25.5, 30.75],
                    [-15.5, 28.75], [-20.5, -25.25]],
}
QHOLE = {
    "type": "polygon",
    "coordinates": [
        [[-20.5, -25.25], [30.5, -20.25], [25.5, 30.75],
         [-15.5, 28.75], [-20.5, -25.25]],
        [[-5.5, -5.25], [10.5, -6.25], [11.5, 8.75], [-4.5, 9.75],
         [-5.5, -5.25]],
    ],
}
QLS = {"type": "linestring",
       "coordinates": [[-40.5, -10.25], [10.5, 15.75], [45.5, -20.25]]}
QENV = {"type": "envelope", "coordinates": [[-25.0, 20.0], [15.0, -15.0]]}
QCIRCLE = {"type": "circle", "coordinates": [5.0, 5.0],
           "radius": "1500km"}
QPOINT = {"type": "point", "coordinates": [-57.0, -39.0]}
QMULTI = {
    "type": "multipolygon",
    "coordinates": [
        [[[-30.5, -30.25], [5.5, -30.25], [5.5, 35.75], [-30.5, 35.75],
          [-30.5, -30.25]]],
        [[[5.5, -30.25], [40.5, -30.25], [40.5, 35.75], [5.5, 35.75],
          [5.5, -30.25]]],
    ],
}

_FLAT_CASES = [
    (QPOLY, ["intersects", "within", "contains"]),
    (QHOLE, ["intersects", "within", "contains"]),
    (QLS, ["intersects", "within", "contains"]),
    (QENV, ["intersects", "within", "contains"]),
    (QCIRCLE, ["intersects", "within", "contains"]),
    (QPOINT, ["intersects", "within", "contains"]),
    (QMULTI, ["intersects", "within", "contains"]),
]


@pytest.mark.parametrize(
    "shape,relations", _FLAT_CASES,
    ids=[s["type"] + "-flat" for s, _ in _FLAT_CASES],
)
def test_flat_arrow_matches_native(spark, shape, relations):
    docs = _flat_docs(spark).persist()
    try:
        for rel in relations:
            native = shape_relation_pred(
                F.col("kind"), F.col("coords"), shape, rel, prune=False
            )
            arrow = geoshape_np.flat_exact_pred(
                F.col("kind"), F.col("coords"), shape, rel
            )
            got_n = {
                r["doc_id"]
                for r in docs.where(native).select("doc_id").collect()
            }
            got_a = {
                r["doc_id"]
                for r in docs.where(arrow).select("doc_id").collect()
            }
            assert got_a == got_n, (shape["type"], rel)
    finally:
        docs.unpersist()


def _parts_docs(spark):
    """Parts corpus: every part kind incl. circles and polygons WITH
    HOLES, built from the flat corpus plus synthetic extras."""
    flat = _flat_docs(spark).withColumn(
        "parts",
        F.array(
            F.struct(
                F.col("kind").alias("kind"),
                F.col("coords").alias("ring"),
                F.lit(0.0).alias("radius"),
                F.expr(
                    "CAST(array() AS array<array<array<double>>>)"
                ).alias("holes"),
            )
        ).cast(PARTS_SCHEMA),
    ).select("doc_id", "parts")
    extras = []
    for i in range(40):
        cx = float((i * 11) % 90 - 45)
        cy = float((i * 7) % 70 - 35)
        if i % 2 == 0:
            # circle part, radius 50-500 km
            extras.append(
                (1000 + i,
                 [("circle", [[cx, cy]], float(50_000 + i * 11_000),
                   [])])
            )
        else:
            # polygon with a centered hole
            w, h = 8.0 + i % 5, 6.0 + i % 7
            ring = [[cx, cy], [cx + w, cy], [cx + w, cy + h],
                    [cx, cy + h], [cx, cy]]
            hole = [[cx + w / 4, cy + h / 4],
                    [cx + 3 * w / 4, cy + h / 4],
                    [cx + 3 * w / 4, cy + 3 * h / 4],
                    [cx + w / 4, cy + 3 * h / 4],
                    [cx + w / 4, cy + h / 4]]
            extras.append(
                (1000 + i, [("polygon", ring, 0.0, [hole])])
            )
    extra_df = spark.createDataFrame(
        extras, ["doc_id", "parts"]
    ).select(
        "doc_id", F.col("parts").cast(PARTS_SCHEMA).alias("parts")
    )
    return flat.unionByName(extra_df)


# parts engine (geojson_to_parts) takes proper GeoJSON ring nesting
QPOLY_GJ = {"type": "polygon", "coordinates": [QPOLY["coordinates"]]}

_PARTS_CASES = [
    (QPOLY_GJ, ["intersects", "within", "contains"]),
    (QHOLE, ["intersects", "within", "contains"]),
    (QLS, ["intersects", "contains"]),
    (QCIRCLE, ["intersects", "within", "contains"]),
    (QPOINT, ["intersects", "within", "contains"]),
    (QMULTI, ["intersects", "within", "contains"]),  # union-within
]


@pytest.mark.parametrize(
    "shape,relations", _PARTS_CASES,
    ids=[s["type"] + "-parts" for s, _ in _PARTS_CASES],
)
def test_parts_arrow_matches_native(spark, shape, relations):
    docs = _parts_docs(spark).persist()
    try:
        for rel in relations:
            native = parts_relation_pred(
                F.col("parts"), shape, rel, prune=False
            )
            arrow = geoshape_np.parts_exact_pred(
                F.col("parts"), shape, rel
            )
            got_n = {
                r["doc_id"]
                for r in docs.where(native).select("doc_id").collect()
            }
            got_a = {
                r["doc_id"]
                for r in docs.where(arrow).select("doc_id").collect()
            }
            assert got_a == got_n, (shape["type"], rel)
    finally:
        docs.unpersist()


def test_pruned_path_uses_arrow_stage(spark):
    """With ARROW_EXACT on (default), the pruned predicate's plan
    carries an ArrowEvalPython stage and still returns the same rows
    as the fully-native plan."""
    docs = _flat_docs(spark)
    pred = shape_relation_pred(
        F.col("kind"), F.col("coords"), QPOLY, "intersects"
    )
    plan = docs.where(pred)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan
    got = {r["doc_id"] for r in docs.where(pred).collect()}
    old = geoshape_np.ARROW_EXACT
    geoshape_np.ARROW_EXACT = False
    try:
        pred_n = shape_relation_pred(
            F.col("kind"), F.col("coords"), QPOLY, "intersects"
        )
        want = {r["doc_id"] for r in docs.where(pred_n).collect()}
    finally:
        geoshape_np.ARROW_EXACT = old
    assert got == want
