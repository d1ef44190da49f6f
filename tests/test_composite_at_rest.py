"""Composite `_all` AT REST: segment builds carry the composite's
merged member streams (field_composite.go Compose + the typed trie
terms of field_numeric.go:94-116), and must match the DataFrame-path
composite postings EXACTLY — terms, tf, member-local positions, and
the float32 norm over the summed length."""

from datetime import datetime

from pyspark.sql import functions as F

from bleve_spark.index.build import index_table
from bleve_spark.index.segments import SegmentStore, build_segments


def _df(spark):
    rows = [
        (1, "quick brown fox", "en", 7, True,
         datetime(2024, 1, 5, 12, 0, 0)),
        (2, "lazy dogs sleep here", "de", 3, False,
         datetime(2024, 2, 6, 8, 30, 0)),
        (3, "quick quick dogs", "en", None, None, None),
    ]
    return spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, n long, flag boolean, "
        "ts timestamp",
    )


FIELDS = {"text": "standard", "lang": "keyword"}
MEMBERS = ["text", "lang", "n", "flag", "ts"]


def _norm_rows(postings):
    out = []
    for r in postings.where(F.col("field") == "_all").collect():
        out.append((
            r["term"], r["doc_id"], r["tf"],
            tuple(r["positions"]), round(float(r["norm"]), 7),
        ))
    return sorted(out)


def test_at_rest_composite_matches_dataframe_path(spark, tmp_path):
    df = _df(spark)
    expected_idx = index_table(
        df, ["doc_id"], FIELDS,
        composite_fields={"_all": MEMBERS}, persist=False,
    )
    root = str(tmp_path / "seg")
    build_segments(
        df, ["doc_id"], FIELDS, root, n_segments=2,
        composite_fields={"_all": MEMBERS},
    )
    store = SegmentStore(spark, root)
    got_idx = store.to_indexed_table(
        df, ["doc_id"], {**FIELDS, "_all": "standard"},
    )
    exp = _norm_rows(expected_idx.postings)
    got = _norm_rows(got_idx.postings)
    assert got == exp
    # length sanity: doc1 = 3 text tokens + 1 lang + 16 n-trie
    # + 1 bool + 16 ts-trie = 37
    lens = {
        r["doc_id"]: r["len__all"]
        for r in store.doc_table().select(
            "doc_id", F.col("`len__all`")
        ).collect()
    }
    assert lens[1] == 3 + 1 + 16 + 1 + 16
    assert lens[3] == 3 + 1          # null typed members add nothing
    # plain fields still identical too
    for f in FIELDS:
        e = sorted(
            (r["term"], r["doc_id"], r["tf"])
            for r in expected_idx.postings
            .where(F.col("field") == f).collect()
        )
        g = sorted(
            (r["term"], r["doc_id"], r["tf"])
            for r in got_idx.postings
            .where(F.col("field") == f).collect()
        )
        assert g == e


def test_at_rest_default_field_search(spark, tmp_path):
    """The point of the feature: default-field (_all) searches serve
    from the segment store with bleve-exact scores."""
    from bleve_spark.search.searcher import search

    df = _df(spark)
    root = str(tmp_path / "seg2")
    # ONE segment: bleve's offline Builder merges down to a single
    # segment (builder.go:169-236) and avg_doc_len's cardinality is
    # the per-segment unique-term SUM — multi-segment stores score
    # differently by design (segmentation-dependent, like bleve)
    build_segments(
        df, ["doc_id"], FIELDS, root, n_segments=1,
        composite_fields={"_all": MEMBERS},
    )
    idx = SegmentStore(spark, root).to_indexed_table(
        df, ["doc_id"], {**FIELDS, "_all": "standard"},
    )
    ref = index_table(
        df, ["doc_id"], FIELDS,
        composite_fields={"_all": MEMBERS}, persist=False,
    )
    for q in ({"field": "_all", "term": "quick"},
              {"term": "dogs"},            # default field = _all
              {"field": "_all", "term": "en"}):
        a = [(h["id"], round(h["score"], 6))
             for h in search(idx, q, size=10)["hits"]]
        b = [(h["id"], round(h["score"], 6))
             for h in search(ref, q, size=10)["hits"]]
        assert a == b and a


def test_merge_preserves_composite(spark, tmp_path):
    """Composite rows are ordinary postings rows: a merge carries the
    _all field (and the len__all doc column) through unchanged."""
    from bleve_spark.index.merge import merge_to_single
    from bleve_spark.search.searcher import search

    df = _df(spark)
    root = str(tmp_path / "seg3")
    build_segments(
        df, ["doc_id"], FIELDS, root, n_segments=3,
        composite_fields={"_all": MEMBERS},
    )
    before = _norm_rows(
        SegmentStore(spark, root)
        .to_indexed_table(df, ["doc_id"],
                          {**FIELDS, "_all": "standard"}).postings
    )
    merged_root = merge_to_single(spark, root)
    merged = SegmentStore(spark, merged_root)
    after_idx = merged.to_indexed_table(
        df, ["doc_id"], {**FIELDS, "_all": "standard"},
    )
    after = _norm_rows(after_idx.postings)
    assert after == before
    res = search(after_idx, {"term": "quick"}, size=10)
    assert sorted(h["id"] for h in res["hits"]) == ["1", "3"]


def test_array_text_field_at_rest(spark, tmp_path):
    """array<string> fields at rest: per-element instance merge with
    strided element-local positions — byte-identical to the DataFrame
    path (_array_text_postings), standalone AND as an _all member."""
    rows = [
        (1, "quick fox", ["red tag", "blue"]),
        (2, "lazy dogs", ["green"]),
        (3, "quick panda", None),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, tags array<string>",
    )
    fields = {"text": "standard", "tags": "keyword"}
    members = ["text", "tags"]
    ref = index_table(
        df, ["doc_id"], fields,
        composite_fields={"_all": members}, persist=False,
    )
    root = str(tmp_path / "seg_arr")
    build_segments(
        df, ["doc_id"], fields, root, n_segments=2,
        composite_fields={"_all": members},
    )
    got_idx = SegmentStore(spark, root).to_indexed_table(
        df, ["doc_id"], {**fields, "_all": "standard"},
    )
    for fname in ("tags", "_all"):
        e = sorted(
            (r["term"], r["doc_id"], r["tf"], tuple(r["positions"]),
             round(float(r["norm"]), 7))
            for r in ref.postings
            .where(F.col("field") == fname).collect()
        )
        g = sorted(
            (r["term"], r["doc_id"], r["tf"], tuple(r["positions"]),
             round(float(r["norm"]), 7))
            for r in got_idx.postings
            .where(F.col("field") == fname).collect()
        )
        assert g == e, fname
