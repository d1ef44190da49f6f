"""Dynamic MapType fields AT REST: segment builds explode runtime map
keys into data-driven "<path>.<key>" postings streams with per-doc
len_ columns — and must match the in-memory dynamic-map path EXACTLY
(terms, tf, positions, float32 norms) and serve term/match queries
with identical scores. Mirrors the reference indexing
reflection-discovered dynamic fields into ordinary segment fields
(mapping/document.go:425)."""

from pyspark.sql import functions as F

from bleve_spark.index.mapping import (
    IndexMapping,
    index_with_mapping,
    index_with_mapping_at_rest,
)
from bleve_spark.search.searcher import search_df

IM = IndexMapping.from_dict({
    "scoring_model": "bm25",
    "default_mapping": {
        "dynamic": True,
        "properties": {
            "text": {"fields": [
                {"type": "text", "include_in_all": False}
            ]},
        },
    },
})


def _df(spark):
    return (
        spark.range(0, 40)
        .select(F.col("id").alias("doc_id"))
        .withColumn(
            "text",
            F.concat(F.lit("doc body number "),
                     F.col("doc_id").cast("string")),
        )
        .withColumn(
            "attrs",
            F.create_map(
                F.lit("color"),
                F.element_at(
                    F.array(F.lit("red"), F.lit("blue"),
                            F.lit("green")),
                    (F.col("doc_id") % 3 + 1).cast("int"),
                ),
                F.lit("grade"),
                F.concat(F.lit("g"),
                         (F.col("doc_id") % 5).cast("string")),
            ),
        )
    )


def _dyn_rows(postings, field):
    return sorted(
        (r["term"], r["doc_id"], r["tf"], tuple(r["positions"]),
         round(float(r["norm"]), 7))
        for r in postings.where(F.col("field") == field).collect()
    )


def test_at_rest_dynamic_map_matches_in_memory(spark, tmp_path):
    df = _df(spark)
    mem = index_with_mapping(df, ["doc_id"], IM, persist=False)
    rest = index_with_mapping_at_rest(
        df, ["doc_id"], IM, str(tmp_path / "seg"), n_segments=3,
        persist=False,
    )
    for fld in ("attrs.color", "attrs.grade"):
        assert _dyn_rows(rest.postings, fld) == \
            _dyn_rows(mem.postings, fld), fld
    # data-driven cardinality reaches the stats — at rest it is the
    # bleve-exact Σ of per-segment unique-term counts
    # (snapshot_index.go:151-161), so with 3 segments it lands in
    # [3, 9] for the 3-value color key
    assert 3 <= rest.stats.field_cardinality["attrs.color"] <= 9
    assert 5 <= rest.stats.field_cardinality["attrs.grade"] <= 15
    assert mem.stats.field_cardinality["attrs.color"] == 3


def test_dynamic_map_survives_merge(spark, tmp_path):
    """Merging segments must carry the data-driven len_ columns
    (mergeSchema read) and the dynamic_fields manifest flag — the
    merged store serves the same postings as the in-memory path."""
    from bleve_spark.index.merge import merge_to_single
    from bleve_spark.index.segments import SegmentStore

    df = _df(spark)
    mem = index_with_mapping(df, ["doc_id"], IM, persist=False)
    root = str(tmp_path / "segm")
    rest = index_with_mapping_at_rest(
        df, ["doc_id"], IM, root, n_segments=3, persist=False,
    )
    final = merge_to_single(spark, root, fanin=2)
    merged = SegmentStore(spark, final)
    assert merged._dynamic_fields_present()
    got_idx = merged.to_indexed_table(
        df, ["doc_id"], {"text": "standard"},
    )
    for fld in ("attrs.color", "attrs.grade"):
        assert _dyn_rows(got_idx.postings, fld) == \
            _dyn_rows(mem.postings, fld), fld


def test_at_rest_dynamic_map_query_score_parity(spark, tmp_path):
    df = _df(spark)
    mem = index_with_mapping(df, ["doc_id"], IM, persist=False)
    rest = index_with_mapping_at_rest(
        df, ["doc_id"], IM, str(tmp_path / "seg2"), n_segments=3,
        persist=False,
    )
    q = {"field": "attrs.color", "term": "blue"}
    got_m = [(r["doc_id"], round(r["score"], 6))
             for r in search_df(mem, q, size=50).collect()]
    got_r = [(r["doc_id"], round(r["score"], 6))
             for r in search_df(rest, q, size=50).collect()]
    assert got_m == got_r and len(got_m) > 0
    # match query against a runtime key resolves the default analyzer
    q2 = {"field": "attrs.grade", "match": "g2"}
    got_m2 = [(r["doc_id"], round(r["score"], 6))
              for r in search_df(mem, q2, size=50).collect()]
    got_r2 = [(r["doc_id"], round(r["score"], 6))
              for r in search_df(rest, q2, size=50).collect()]
    assert got_m2 == got_r2 and len(got_m2) > 0
