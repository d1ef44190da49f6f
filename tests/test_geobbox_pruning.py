"""Coarse spatial (bbox) pruning for shape relation queries.

Parity intent: the reference never evaluates exact geometry against
every doc — geoshape fields are pre-filtered through s2 cell terms
(/root/reference/document/field_geoshape.go). Our twin is a bbox
pre-filter (search/geobbox.py): these tests pin (a) result-identity
with the unpruned exact predicate, (b) that materialized bbox columns
reach the parquet scan as PushedFilters, and (c) that a far-away
query shape excludes every row group by min/max stats at rest."""

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from bleve_spark.search.geobbox import (
    query_shape_bbox, with_flat_shape_bbox,
)
from bleve_spark.search.geo import shape_relation_pred
from bleve_spark.search.geoshape import parts_relation_pred

# GeoJSON ring nesting (parts engine convention)
QUERY_POLY = {
    "type": "polygon",
    "coordinates": [[[-10.0, -10.0], [25.0, -12.0], [30.0, 20.0],
                     [-8.0, 18.0], [-10.0, -10.0]]],
}
# flat vertex-list convention (search/geo.py shape_relation_pred)
QUERY_POLY_FLAT = {
    "type": "polygon", "coordinates": QUERY_POLY["coordinates"][0],
}
FAR_POLY = {
    "type": "polygon",
    "coordinates": [[150.0, 70.0], [160.0, 70.0], [160.0, 80.0],
                    [150.0, 80.0], [150.0, 70.0]],
}


def _shape_df(spark, n=4000):
    df = spark.range(n).withColumnRenamed("id", "doc_id")
    bx = ((F.col("doc_id") * 13) % 141 - 70).cast("double")
    by = ((F.col("doc_id") * 7) % 121 - 60).cast("double")
    dx = (F.col("doc_id") % 4 + 1).cast("double")
    dy = (F.col("doc_id") % 3 + 1).cast("double")
    w = (F.col("doc_id") % 5 + 2).cast("double")
    h = (F.col("doc_id") % 7 + 2).cast("double")
    pt = F.array(F.array(bx, by))
    ls = F.array(F.array(bx, by), F.array(bx + dx, by + dy),
                 F.array(bx + dx * 2, by - dy))
    pg = F.array(F.array(bx, by), F.array(bx + w, by),
                 F.array(bx + w, by + h), F.array(bx, by + h),
                 F.array(bx, by))
    m3 = F.col("doc_id") % 3
    return df.withColumn(
        "shape_kind",
        F.when(m3 == 0, F.lit("point"))
        .when(m3 == 1, F.lit("linestring")).otherwise(F.lit("polygon")),
    ).withColumn(
        "shape_coords",
        F.when(m3 == 0, pt).when(m3 == 1, ls).otherwise(pg),
    )


@pytest.mark.parametrize("relation", ["intersects", "within", "contains"])
def test_flat_pruned_equals_unpruned(spark, relation):
    df = _shape_df(spark)
    qshape = (QUERY_POLY_FLAT if relation != "contains"
              else {"type": "point", "coordinates": [-35.5, -37.75]})
    kc, cc = F.col("shape_kind"), F.col("shape_coords")
    pruned = df.where(
        shape_relation_pred(kc, cc, qshape, relation)
    ).select("doc_id")
    exact = df.where(
        shape_relation_pred(kc, cc, qshape, relation, prune=False)
    ).select("doc_id")
    got = sorted(r[0] for r in pruned.collect())
    want = sorted(r[0] for r in exact.collect())
    assert got == want and len(want) > 0


@pytest.mark.parametrize("relation", ["intersects", "within", "contains"])
def test_parts_pruned_equals_unpruned(spark, relation):
    df = _shape_df(spark)
    parts = F.array(F.struct(
        F.col("shape_kind").alias("kind"),
        F.col("shape_coords").alias("ring"),
        F.lit(0.0).alias("radius"),
        F.expr("CAST(array() AS array<array<array<double>>>)")
        .alias("holes"),
    ))
    qshape = (QUERY_POLY if relation != "contains"
              else {"type": "point", "coordinates": [-35.5, -37.75]})
    got = sorted(r[0] for r in df.where(
        parts_relation_pred(parts, qshape, relation)
    ).select("doc_id").collect())
    want = sorted(r[0] for r in df.where(
        parts_relation_pred(parts, qshape, relation, prune=False)
    ).select("doc_id").collect())
    assert got == want and len(want) > 0


def test_bbox_filters_pushed_to_parquet_scan(spark, tmp_path):
    """Materialized bbox columns must reach the scan as PushedFilters,
    and a far-away query must exclude EVERY row group by min/max
    stats — the at-rest pruning the reference gets from cell terms."""
    path = str(tmp_path / "shapes")
    (
        with_flat_shape_bbox(_shape_df(spark), "shape")
        .orderBy("shape_bbox_minlon")  # cluster so stats are tight
        .coalesce(4)
        .write.option("parquet.block.size", 64 * 1024)
        .parquet(path)
    )
    df = spark.read.parquet(path)
    bbox = tuple(
        F.col(f"shape_bbox_{s}")
        for s in ("minlon", "minlat", "maxlon", "maxlat")
    )
    pred = shape_relation_pred(
        F.col("shape_kind"), F.col("shape_coords"), FAR_POLY,
        "intersects", bbox_cols=bbox,
    )
    out = df.where(pred)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "shape_bbox_minlon" in plan.split(
        "PushedFilters"
    )[1][:400], plan
    assert out.count() == 0

    # row-group stats prove at-rest pruning: no group can contain a
    # shape whose bbox overlaps the far-away query's bbox
    qb = query_shape_bbox(FAR_POLY)["out"]
    overlapping = 0
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            stats = {
                g.column(i).path_in_schema: g.column(i).statistics
                for i in range(g.num_columns)
                if g.column(i).path_in_schema.startswith("shape_bbox_")
            }
            if (stats["shape_bbox_maxlon"].max >= qb[0]
                    and stats["shape_bbox_minlon"].min <= qb[2]
                    and stats["shape_bbox_maxlat"].max >= qb[1]
                    and stats["shape_bbox_minlat"].min <= qb[3]):
                overlapping += 1
    assert overlapping == 0


def test_query_bbox_guards():
    # dateline-crossing circle → no safe bbox → pruning disabled
    assert query_shape_bbox(
        {"type": "circle", "coordinates": [179.9, 0.0],
         "radius": "100km"}
    ) is None
    # pole-adjacent circle → lon wraps → disabled
    assert query_shape_bbox(
        {"type": "circle", "coordinates": [0.0, 89.5],
         "radius": "300km"}
    ) is None
    # hemisphere-wide vertex extent → ambiguous winding → disabled
    assert query_shape_bbox(
        {"type": "linestring",
         "coordinates": [[-170.0, 0.0], [170.0, 5.0]]}
    ) is None
    qb = query_shape_bbox(QUERY_POLY)
    assert qb["in"] == (-10.0, -12.0, 30.0, 20.0)
    assert qb["out"] == (-10.0, -12.0, 30.0, 20.0)
    # circle expansion is strictly conservative
    qb = query_shape_bbox(
        {"type": "circle", "coordinates": [10.0, 45.0], "radius": "10km"}
    )
    assert qb["in"] == (10.0, 45.0, 10.0, 45.0)
    assert qb["out"][0] < 10.0 - 0.12 and qb["out"][2] > 10.0 + 0.12
    assert qb["out"][1] < 45.0 - 0.09 and qb["out"][3] > 45.0 + 0.09
