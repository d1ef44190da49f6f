"""Scorer formula goldens (FIXTURES.md §3, derived from
/root/reference/search/scorer/scorer_term.go:142-157 and
scorer_term_test.go:30-120)."""

import math

import numpy as np

from bleve_spark.search.scorer import (
    idf_value,
    term_score_value,
    term_weight,
)


def test_bm25_golden():
    norm32 = float(np.float32(1.0 / math.sqrt(5)))
    assert norm32 == 0.4472135901451111  # float32 roundtrip observable
    idf = idf_value("bm25", 100, 9, 10.0)
    assert idf == 2.3638287182347644
    score = term_score_value("bm25", idf, 10.0, 1.0, 3, norm32)
    assert score == 1.9794621818916067
    # fieldLength recovered through the float32 norm
    assert abs(1.0 / (norm32 * norm32) - 5.000000119738018) < 1e-12


def test_tfidf_golden():
    # default scoring model branch: idf = 1 + ln(N/(n+1)), score = √tf·norm·idf
    idf = idf_value("tfidf", 100, 9, 0.0)
    assert idf == 1.0 + math.log(100.0 / 10.0)
    norm32 = float(np.float32(1.0 / math.sqrt(4)))
    score = term_score_value("tfidf", idf, 0.0, 1.0, 4, norm32)
    assert score == math.sqrt(4.0) * norm32 * idf


def test_query_weight_multiplies_after_score():
    norm32 = float(np.float32(1.0))
    idf = idf_value("bm25", 10, 2, 3.0)
    base = term_score_value("bm25", idf, 3.0, 1.0, 1, norm32)
    qw = 0.5
    assert term_score_value("bm25", idf, 3.0, qw, 1, norm32) == base * qw


def test_term_weight_is_squared():
    assert term_weight(2.0, 3.0) == 36.0


def test_idf_zero_docfreq_is_finite():
    assert math.isfinite(idf_value("bm25", 100, 0, 10.0))
    assert math.isfinite(idf_value("tfidf", 100, 0, 0.0))
