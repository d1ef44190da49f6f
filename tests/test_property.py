"""Property-based tests (hypothesis) — the reference relies on
randomized/property suites for its codecs and merge planner
(/root/reference/index/scorch/mergeplan/merge_plan_test.go, smat fuzz
in go.mod); these pin the same invariants for our NumPy codecs,
batch analyzer, and phrase path search. No Spark session needed."""

import numpy as np
from hypothesis import given, settings, strategies as st


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=2**62 - 1),
        min_size=1, max_size=300,
    )
)
def test_varint_roundtrip(values):
    from bleve_spark.index.varint import (
        varint_decode,
        varint_encode_with_ends,
    )

    v = np.array(values, dtype=np.uint64)
    buf, ends = varint_encode_with_ends(v)
    assert len(buf) == ends[-1]
    assert np.array_equal(varint_decode(buf), v)
    # every per-value byte span decodes to exactly that value
    for i in (0, len(v) // 2, len(v) - 1):
        s0 = 0 if i == 0 else ends[i - 1]
        assert np.array_equal(
            varint_decode(buf[s0:ends[i]]), v[i:i + 1]
        )


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=2**40 - 1),
        min_size=1, max_size=200, unique=True,
    )
)
def test_delta_sorted_roundtrip(values):
    from bleve_spark.index.varint import (
        delta_decode_sorted,
        delta_encode_sorted,
    )

    v = np.sort(np.array(values, dtype=np.uint64))
    assert np.array_equal(delta_decode_sorted(delta_encode_sorted(v)), v)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(
                codec="utf-8", exclude_categories=("Cs",)
            ),
            max_size=60,
        ),
        min_size=0, max_size=40,
    )
)
def test_analyze_batch_equals_per_doc(texts):
    """Vectorized batch analyzer ≡ the per-doc reference path for
    arbitrary unicode input (standard analyzer)."""
    from bleve_spark.analysis.analyzers import get_analyzer

    an = get_analyzer("standard")
    flens, doc_idx, codes, vocab, pos = an.analyze_batch(list(texts))
    got = {}
    for i in range(len(texts)):
        sel = doc_idx == i
        got[i] = (
            int(flens[i]),
            [(vocab[c], int(p)) for c, p in
             sorted(zip(codes[sel], pos[sel]), key=lambda x: x[1])],
        )
    for i, t in enumerate(texts):
        pairs = an.analyze_terms(t)
        assert got[i] == (len(pairs), [(tm, p) for tm, p in pairs]), t


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(1, 30), min_size=1, max_size=6),
        min_size=2, max_size=4,
    ),
    st.integers(0, 3),
)
def test_phrase_path_matches_bruteforce(pos_lists, slop):
    """_find_phrase_path ≡ exhaustive search over slot position picks
    (the reference's findPhrasePaths DFS, search_phrase.go:439)."""
    from itertools import product

    from bleve_spark.search.searcher import _find_phrase_path

    arrays = [sorted(set(p)) for p in pos_lists]
    gaps = [1] * (len(arrays) - 1)

    def brute():
        for pick in product(*arrays):
            budget = slop
            ok = True
            for j in range(1, len(pick)):
                if pick[j] <= pick[j - 1]:
                    ok = False
                    break
                cost = abs(pick[j] - (pick[j - 1] + gaps[j - 1]))
                budget -= cost
                if budget < 0:
                    ok = False
                    break
            if ok:
                return True
        return False

    assert _find_phrase_path(arrays, gaps, slop) == brute()


def test_connected_components_property(spark):
    """Random graphs: propagation components match a NetworkX-free
    union-find reference."""
    import random

    from bleve_spark.functions.dedup import connected_components

    rng = random.Random(11)
    for trial in range(3):
        n = 40
        edges = [(rng.randrange(n), rng.randrange(n))
                 for _ in range(30)]
        edges = [(a, b) for a, b in edges if a != b]
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        expected = {}
        nodes = {x for e in edges for x in e}
        for x in nodes:
            expected[x] = find(x)
        # canonicalize to min member per component
        comp_min = {}
        for x, r in expected.items():
            comp_min.setdefault(r, x)
            comp_min[r] = min(comp_min[r], x)
        expected = {x: comp_min[find(x)] for x in nodes}

        pairs = spark.createDataFrame(
            [(int(a), int(b)) for a, b in edges],
            "key_a long, key_b long",
        )
        got = {
            r["node"]: r["component"]
            for r in connected_components(pairs).collect()
        }
        assert got == expected, (trial, got, expected)
