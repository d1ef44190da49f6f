"""Goldens for the remaining tokenizers/filters (extras module)."""

from bleve_spark.analysis.analyzers import Analyzer, get_analyzer
from bleve_spark.analysis.extras import (
    CharacterTokenizer,
    DictCompoundFilter,
    ExceptionTokenizer,
    HierarchyFilter,
    KeywordMarkerFilter,
    UnicodeNormFilter,
    ZeroWidthNonJoinerCharFilter,
)
from bleve_spark.analysis.filters import PorterFilter
from bleve_spark.analysis.tokenizers import UnicodeTokenizer


def test_character_tokenizer():
    t = CharacterTokenizer()
    assert t.terms("Hello, wor9ld!") == ["Hello", "wor", "ld"]
    toks = t.tokenize("ab 12 cd")
    assert [(x.term, x.pos) for x in toks] == [("ab", 1), ("cd", 2)]


def test_exception_tokenizer_passes_patterns_whole():
    # the reference ships this for URLs/twitter handles: matched spans
    # bypass the child tokenizer (exception.go:51-100)
    t = ExceptionTokenizer(
        [r"https?://\S+", r"@\w+"], UnicodeTokenizer()
    )
    assert t.terms("see https://x.io/a?b=1 from @dev now") == [
        "see", "https://x.io/a?b=1", "from", "@dev", "now",
    ]


def test_unicodenorm_filter():
    f = UnicodeNormFilter("NFKC")
    assert f.apply_terms(["ﬁle", "ｆｕｌｌ"]) == ["file", "full"]


def test_keyword_marker_protects_from_stemming():
    f = KeywordMarkerFilter(frozenset({"running"}), PorterFilter())
    assert f.apply_terms(["running", "jumping"]) == ["running", "jump"]


def test_dict_compound():
    f = DictCompoundFilter(
        frozenset({"soft", "ball", "team"}), min_word_size=5,
        min_sub_size=2, max_sub_size=15,
    )
    # dict.go: original token first, then each dictionary subword
    assert f.apply_terms(["softballteam", "ball"]) == [
        "softballteam", "soft", "ball", "team", "ball",
    ]


def test_hierarchy_filter():
    f = HierarchyFilter("/")
    assert f.apply_terms(["a/b/c"]) == ["a", "a/b", "a/b/c"]
    f2 = HierarchyFilter("/", max_levels=2)
    assert f2.apply_terms(["a/b/c"]) == ["a", "a/b"]


def test_hierarchy_in_analyzer_stream():
    an = Analyzer("path", UnicodeTokenizer(), [HierarchyFilter(".")])
    # UAX#29 keeps dotted hosts whole; hierarchy then expands them
    assert [t for t, _ in an.analyze_terms("spark.apache.org")] == [
        "spark", "spark.apache", "spark.apache.org",
    ]


def test_zwnj_char_filter():
    cf = ZeroWidthNonJoinerCharFilter()
    assert cf.apply("می‌خواهم") == "می خواهم"


def test_standard_analyzer_unaffected():
    an = get_analyzer("standard")
    assert [t for t, _ in an.analyze_terms("The quick fox")] == [
        "quick", "fox",
    ]
