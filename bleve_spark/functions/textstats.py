"""Text analysis for training-data pipelines: language-ID, quality
scoring, token counting, fingerprinting.

All formulas are deliberately expressible as native Spark SQL columns —
the same arithmetic re-runs verbatim in any ANSI engine (the correctness
oracle), and on Spark it stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from bleve_spark.analysis.stopwords import ENGLISH_STOP_WORDS

# small, fixed function-word sets for n-gram-free language ID
_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it", "for"],
    "es": ["el", "la", "de", "que", "los", "las", "una", "por", "como"],
    "fr": ["le", "la", "les", "des", "est", "dans", "une", "pour", "que"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu"],
}

_TOKEN_RE = r"[a-z0-9]+(?:'[a-z]+)?"  # BPE-ish word pieces
_WS = r"\s+"


def words_col(text_col: str) -> Column:
    return F.split(F.lower(F.col(text_col)), _WS)


def token_count(text_col: str) -> Column:
    """Whitespace token count (native)."""
    return F.size(
        F.filter(words_col(text_col), lambda w: F.length(w) > 0)
    )


def regex_token_count(text_col: str) -> Column:
    """BPE-ish regex token count (Spark regexp_count ==
    DuckDB len(regexp_extract_all))."""
    return F.regexp_count(F.lower(F.col(text_col)), F.lit(_TOKEN_RE))


def stopword_ratio(text_col: str) -> Column:
    words = words_col(text_col)
    stops = F.filter(
        words,
        lambda w: w.isin(*sorted(ENGLISH_STOP_WORDS)),
    )
    return F.size(stops).cast("double") / F.greatest(
        F.size(words).cast("double"), F.lit(1.0)
    )


def punct_ratio(text_col: str) -> Column:
    txt = F.col(text_col)
    npunct = F.length(txt) - F.length(
        F.regexp_replace(txt, r"[^\w\s]", "")
    )
    return npunct.cast("double") / F.greatest(
        F.length(txt).cast("double"), F.lit(1.0)
    )


def mean_word_len(text_col: str) -> Column:
    words = F.filter(words_col(text_col), lambda w: F.length(w) > 0)
    total = F.aggregate(
        words, F.lit(0.0), lambda acc, w: acc + F.length(w).cast("double")
    )
    return total / F.greatest(F.size(words).cast("double"), F.lit(1.0))


def quality_score(text_col: str) -> Column:
    """Heuristic [0,1] quality: rewards mid-length docs, plausible word
    lengths, some stopword mass, low punctuation noise. Deterministic,
    portable arithmetic (piecewise-linear, no exp/erf)."""
    n_tok = token_count(text_col).cast("double")
    len_score = F.least(n_tok / F.lit(20.0), F.lit(1.0)) * F.least(
        F.lit(2000.0) / F.greatest(n_tok, F.lit(1.0)), F.lit(1.0)
    )
    mwl = mean_word_len(text_col)
    wl_score = F.when((mwl >= 3.0) & (mwl <= 10.0), F.lit(1.0)).otherwise(
        F.lit(0.5)
    )
    sw = stopword_ratio(text_col)
    sw_score = F.least(sw * F.lit(4.0), F.lit(1.0))
    pr = punct_ratio(text_col)
    punct_score = F.when(pr <= 0.2, F.lit(1.0)).otherwise(
        F.greatest(F.lit(1.0) - (pr - 0.2) * 2.0, F.lit(0.0))
    )
    return (
        len_score * 0.4 + wl_score * 0.2 + sw_score * 0.2 + punct_score * 0.2
    )


def lang_id(text_col: str) -> Column:
    """Function-word-overlap language ID (n-gram heuristic analogue):
    the language whose marker set overlaps the most tokens; 'und' if no
    marker hits."""
    words = words_col(text_col)
    best_lang = F.lit("und")
    best_cnt = F.lit(0)

    def _marker_count(markers):
        return F.size(F.filter(words, lambda w: w.isin(*markers)))

    for lang, markers in _LANG_MARKERS.items():
        cnt = _marker_count(markers)
        better = cnt > best_cnt
        best_lang = F.when(better, F.lit(lang)).otherwise(best_lang)
        best_cnt = F.when(better, cnt).otherwise(best_cnt)
    return best_lang


def fingerprint(text_col: str) -> Column:
    """Locality-insensitive document fingerprint: md5 of the sorted
    distinct token set — stable under token reordering/duplication
    (the classic key-collapsing fingerprint)."""
    toks = F.array_sort(
        F.array_distinct(
            F.filter(words_col(text_col), lambda w: F.length(w) > 0)
        )
    )
    return F.md5(F.concat_ws(" ", toks))


def text_profile(df: DataFrame, text_col: str, key_col: str) -> DataFrame:
    """One row per doc with the full stats bundle."""
    from bleve_spark.functions.dedup import ensure_parallelism

    df = ensure_parallelism(df)
    return df.select(
        F.col(key_col).alias("key"),
        token_count(text_col).cast("long").alias("n_tokens"),
        regex_token_count(text_col).cast("long").alias("n_regex_tokens"),
        F.round(stopword_ratio(text_col), 6).alias("stopword_ratio"),
        F.round(mean_word_len(text_col), 6).alias("mean_word_len"),
        F.round(punct_ratio(text_col), 6).alias("punct_ratio"),
        F.round(quality_score(text_col), 6).alias("quality"),
        lang_id(text_col).alias("lang_pred"),
        fingerprint(text_col).alias("fingerprint"),
    )
