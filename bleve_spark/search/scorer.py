"""Scoring formulas — the reference's exact math, as native Spark columns.

BM25 (k1=1.2, b=0.75, /root/reference/search/util.go:269-276), with the
reference's non-textbook quirks (/root/reference/search/scorer/
scorer_term.go:65-77,142-157):

* ``tf = sqrt(freq)``
* ``fieldLength = 1/(norm*norm)`` where ``norm`` went through float32 at
  index time (observable in scores);
* ``avgDocLength = ceil(field_cardinality / doc_count)``;
* ``idf = ln(1 + (N - n + 0.5)/(n + 0.5))``;
* ``score = idf·(tf·k1) / (tf + k1·((1-b) + (b·fieldLength)/avgDocLen))``
  then ``× queryWeight`` when a composite set a queryNorm
  (scorer_term.go:223-225).

TF-IDF (the default scoring model when the mapping doesn't say bm25,
scorer_term.go:71-73,151-154): ``idf = 1 + ln(N/(n+1))``;
``score = sqrt(freq) · norm · idf``.

Everything here is JVM-side whole-stage-codegen arithmetic — scoring
never leaves the executor, no Python in the hot path.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, functions as F

BM25_K1 = 1.2
BM25_B = 0.75


def idf_value(scoring: str, doc_total: int, doc_term: int,
              avg_doc_len: float) -> float:
    """Driver-side per-term constant (computeIDF, scorer_term.go:65-77)."""
    if scoring == "bm25" and avg_doc_len > 0:
        return math.log(
            1 + (float(doc_total) - float(doc_term) + 0.5)
            / (float(doc_term) + 0.5)
        )
    return 1.0 + math.log(float(doc_total) / float(doc_term + 1.0))


def term_weight(boost: float, idf: float) -> float:
    """Searcher Weight() = (boost·idf)² (scorer_term.go:112-115)."""
    s = boost * idf
    return s * s


def term_score_col(
    scoring: str,
    idf: float,
    avg_doc_len: float,
    query_weight: float,
    tf_col: Column | None = None,
    norm_col: Column | None = None,
) -> Column:
    """Score expression over postings rows (columns ``tf`` int,
    ``norm`` float)."""
    tf_col = tf_col if tf_col is not None else F.col("tf")
    norm_col = norm_col if norm_col is not None else F.col("norm")
    tf = F.sqrt(tf_col.cast("double"))
    norm_d = norm_col.cast("double")
    if scoring == "bm25" and avg_doc_len > 0:
        field_length = F.lit(1.0) / (norm_d * norm_d)
        score = (
            F.lit(idf)
            * (tf * F.lit(BM25_K1))
            / (
                tf
                + F.lit(BM25_K1)
                * (
                    F.lit(1.0 - BM25_B)
                    + (F.lit(BM25_B) * field_length) / F.lit(avg_doc_len)
                )
            )
        )
    else:
        score = tf * norm_d * F.lit(idf)
    if query_weight != 1.0:
        score = score * F.lit(query_weight)
    return score


def term_score_value(
    scoring: str,
    idf: float,
    avg_doc_len: float,
    query_weight: float,
    tf: int,
    norm32: float,
) -> float:
    """Pure-Python twin of :func:`term_score_col` — the NumPy/scalar
    oracle used by golden tests (same op order, same IEEE doubles)."""
    tfv = math.sqrt(float(tf))
    norm_d = float(norm32)
    if scoring == "bm25" and avg_doc_len > 0:
        field_length = 1.0 / (norm_d * norm_d)
        score = (
            idf * (tfv * BM25_K1)
            / (tfv + BM25_K1 * ((1.0 - BM25_B)
                                + (BM25_B * field_length) / avg_doc_len))
        )
    else:
        score = tfv * norm_d * idf
    if query_weight != 1.0:
        score = score * query_weight
    return score
