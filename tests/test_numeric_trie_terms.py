"""Prefix-coded numeric trie terms (numeric/prefix_coded.go:25-60,
document/field_numeric.go:94-116) and their effect on the composite
``_all``: 16 tokens per numeric/datetime value, 1 per boolean, all at
position 1 — the field-LENGTH contribution bleve bakes into every
`_all` norm (why sort goldens 16/17 page at 0.286889)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from bleve_spark.index.build import index_table
from bleve_spark.index.numeric_terms import (
    SHIFTS, doubles_to_sortable, float64_to_int64,
    int64_to_prefix_coded, trie_terms_batch, trie_terms_int64,
)


def _decode(term: str) -> tuple:
    """Inverse of prefix_coded.go Int64() — (shift, value)."""
    b = term.encode("ascii")
    shift = b[0] - 0x20
    s = 0
    for x in b[1:]:
        s = (s << 7) | x
    u = ((s << shift) ^ 0x8000000000000000) & 0xFFFFFFFFFFFFFFFF
    return shift, u - 2**64 if u >= 2**63 else u


def test_prefix_coded_roundtrip():
    for v in [0, 1, 65, -1, -65, 19, 2**52, -(2**52),
              1416873600000000000, -500995200000000000]:
        t = int64_to_prefix_coded(v, 0)
        shift, got = _decode(t)
        assert (shift, got) == (0, v)
        # shift-s terms drop exactly s low bits
        for s in (4, 60):
            ts = int64_to_prefix_coded(v, s)
            _, got_s = _decode(ts)
            u = ((v & 0xFFFFFFFFFFFFFFFF) ^ 0x8000000000000000)
            want_u = ((u >> s) << s) ^ 0x8000000000000000
            want = want_u - 2**64 if want_u >= 2**63 else want_u
            assert got_s == want


def test_term_shape_and_bytes():
    terms = trie_terms_int64(float64_to_int64(19.0))
    assert len(terms) == len(SHIFTS) == 16
    for s, t in zip(SHIFTS, terms):
        b = t.encode("ascii")
        assert b[0] == 0x20 + s
        assert len(b) == ((63 - s) // 7) + 1 + 1
        assert all(c <= 0x7F for c in b)


def test_float64_sortable_order():
    vals = [-1e9, -2.5, -1.0, 0.0, 0.5, 1.0, 19.0, 1e12]
    enc = [float64_to_int64(v) for v in vals]
    assert enc == sorted(enc)
    assert list(doubles_to_sortable(np.array(vals))) == enc


def test_trie_terms_batch_maps_rows():
    idx, terms = trie_terms_batch(np.array([5, 5, 7], dtype=np.int64))
    assert len(terms) == 48
    assert terms[:16] == terms[16:32] != terms[32:]
    assert list(idx) == [0] * 16 + [1] * 16 + [2] * 16


@pytest.fixture(scope="module")
def typed_idx(spark):
    df = spark.createDataFrame(
        [
            ("a", "spark scan engine", 19, "2014-11-25", True),
            ("b", "spark", 21, "2000-09-11", False),
            ("c", "engine room", None, None, None),
        ],
        "id string, text string, age long, born_s string, flag boolean",
    ).withColumn("born", F.to_timestamp("born_s")).drop("born_s")
    return index_table(
        df, key_cols=["id"], fields={"text": "standard"},
        composite_fields={"_all": ["text", "age", "born", "flag"]},
        scoring="tfidf",
    )


def test_composite_length_includes_typed_members(typed_idx):
    # doc a: 3 text + 16 age + 16 born + 1 flag = 36
    # doc b: 1 + 16 + 16 + 1 = 34;  doc c (all typed null): 2
    rows = (
        typed_idx.postings.where(
            (F.col("field") == "_all") & (F.col("term") == "spark")
        ).select("id", "norm").collect()
    )
    norms = {r["id"]: r["norm"] for r in rows}
    assert norms["a"] == pytest.approx(
        np.float32(1.0 / np.sqrt(36)), abs=0
    )
    assert norms["b"] == pytest.approx(
        np.float32(1.0 / np.sqrt(34)), abs=0
    )
    c_norm = (
        typed_idx.postings.where(
            (F.col("field") == "_all") & (F.col("id") == "c")
        ).select("norm").first()[0]
    )
    assert c_norm == pytest.approx(np.float32(1.0 / np.sqrt(2)), abs=0)


def test_composite_contains_trie_and_boolean_terms(typed_idx):
    terms = {
        r["term"]
        for r in typed_idx.postings.where(
            (F.col("field") == "_all") & (F.col("id") == "a")
        ).select("term").collect()
    }
    for t in trie_terms_int64(float64_to_int64(19.0)):
        assert t in terms
    assert "T" in terms
    # datetime → UnixNano trie terms (2014-11-25 UTC)
    nanos = 1416873600 * 10**9
    for t in trie_terms_int64(nanos):
        assert t in terms
    # 3 text + 32 trie + T = 36 distinct terms (all tf=1 here)
    assert len(terms) == 36


@pytest.fixture(scope="module")
def typed_array_idx(spark):
    df = spark.createDataFrame(
        [
            ("a", "spark engine", [19.0, 21.0], ["2014-11-25"],
             [True, True, False]),
            ("b", "spark", [5.0, 5.0], None, None),
            ("c", "spark", [], None, [False]),
        ],
        "id string, text string, nums array<double>, "
        "dts_s array<string>, flags array<boolean>",
    ).withColumn(
        "dts",
        F.transform("dts_s", lambda x: F.to_timestamp(x)),
    ).drop("dts_s")
    return index_table(
        df, key_cols=["id"], fields={"text": "standard"},
        composite_fields={"_all": ["text", "nums", "dts", "flags"]},
        scoring="tfidf",
    )


def test_composite_array_member_lengths(typed_array_idx):
    """Non-text ARRAY members in _all (r5): each element is a field
    instance (field_composite.go merges any member type) — length
    adds 16 per numeric/datetime element, 1 per boolean element."""
    # a: 2 text + 2×16 nums + 1×16 dts + 3 flags = 53
    # b: 1 text + 2×16 nums = 33
    # c: 1 text + 1 flag = 2 (empty nums array contributes nothing)
    rows = typed_array_idx.postings.where(
        (F.col("field") == "_all") & (F.col("term") == "spark")
    ).select("id", "norm").collect()
    norms = {r["id"]: r["norm"] for r in rows}
    assert norms["a"] == pytest.approx(
        np.float32(1.0 / np.sqrt(53)), abs=0
    )
    assert norms["b"] == pytest.approx(
        np.float32(1.0 / np.sqrt(33)), abs=0
    )
    assert norms["c"] == pytest.approx(
        np.float32(1.0 / np.sqrt(2)), abs=0
    )


def test_composite_array_member_terms_and_tf(typed_array_idx):
    from bleve_spark.index.numeric_terms import (
        float64_to_int64, trie_terms_int64,
    )

    post = typed_array_idx.postings.where(F.col("field") == "_all")
    # doc a: full-precision terms for BOTH elements, boolean T tf=2 F tf=1
    a_terms = {r["term"]: r["tf"] for r in post.where(
        F.col("id") == "a"
    ).select("term", "tf").collect()}
    for t in trie_terms_int64(float64_to_int64(19.0)):
        assert t in a_terms
    for t in trie_terms_int64(float64_to_int64(21.0)):
        assert t in a_terms
    for t in trie_terms_int64(1416873600 * 10**9):
        assert t in a_terms
    assert a_terms["T"] == 2 and a_terms["F"] == 1
    # doc b: [5.0, 5.0] — identical elements MERGE: tf=2 on every
    # full-precision term (TokenFrequencies merge across instances)
    b5 = trie_terms_int64(float64_to_int64(5.0))[0]
    row = post.where(
        (F.col("id") == "b") & (F.col("term") == b5)
    ).select("tf", "positions").first()
    assert row["tf"] == 2 and list(row["positions"]) == [1, 1]
