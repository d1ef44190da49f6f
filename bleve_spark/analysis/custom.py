"""Config-driven custom analysis — the reference's ``analysis``
mapping section (mapping/analysis.go customAnalysis + the registry
constructors under analysis/char, analysis/tokenizer, analysis/token,
analysis/tokenmap): users define char filters, tokenizers, token maps,
token filters, and analyzers as JSON and reference them by name from
field mappings.

:func:`build_custom_analysis` compiles one such section into Analyzer
objects from this package's components, using the reference's
registered type names and config keys verbatim (e.g. a token filter
``{"type": "edge_ngram", "min": 2, "max": 4}``, an analyzer
``{"type": "custom", "tokenizer": "unicode", "token_filters":
["to_lower", "my_stop"]}``). Build order resolves custom components
before built-ins so a section can shadow a built-in name, matching the
registry's cache precedence.
"""

from __future__ import annotations

from bleve_spark.analysis.analyzers import (
    Analyzer,
    HTMLCharFilter,
    RegexpCharFilter,
    get_analyzer,
)
from bleve_spark.analysis.extras import (
    DictCompoundFilter,
    ExceptionTokenizer,
    KeywordMarkerFilter,
    UnicodeNormFilter,
    ZeroWidthNonJoinerCharFilter,
)
from bleve_spark.analysis.filters import (
    ApostropheFilter,
    AsciiFoldingFilter,
    CamelCaseFilter,
    EdgeNgramFilter,
    LengthFilter,
    LowercaseFilter,
    NgramFilter,
    PorterFilter,
    PossessiveEnFilter,
    ReverseFilter,
    ShingleFilter,
    StopFilter,
    TruncateFilter,
    UniqueFilter,
)
from bleve_spark.analysis.lang import ElisionFilter, SnowballStemmerFilter
from bleve_spark.analysis.stopwords import ENGLISH_STOP_WORDS
from bleve_spark.analysis.tokenizers import (
    LetterTokenizer,
    RegexpTokenizer,
    SingleTokenTokenizer,
    UnicodeTokenizer,
    WebTokenizer,
    WhitespaceTokenizer,
)

_TOKENIZERS = {
    "unicode": UnicodeTokenizer,
    "letter": LetterTokenizer,
    "whitespace": WhitespaceTokenizer,
    "single": SingleTokenTokenizer,
    "web": WebTokenizer,
}

_SNOWBALL_LANGS = {
    "danish": "da", "dutch": "nl", "finnish": "fi",
    "norwegian": "no", "russian": "ru", "swedish": "sv",
    "hungarian": "hu", "romanian": "ro", "turkish": "tr",
    "german": "de", "spanish": "es", "italian": "it",
    "french": "fr",
    # snowballstem's "english" is porter2 (snowball.py stem_en) —
    # distinct from the porter1 filter the `en` analyzer wires
    "english": "en",
}


def _mk_char_filter(cfg: dict):
    t = cfg.get("type")
    if t == "regexp":
        # char/regexp/regexp.go:44-57
        return RegexpCharFilter(cfg["regexp"], cfg.get("replace", " "))
    if t == "html":
        return HTMLCharFilter()
    if t == "zero_width_spaces":
        return ZeroWidthNonJoinerCharFilter()
    if t == "asciifolding":
        # folding before tokenization == folding each token here
        raise ValueError(
            "asciifolding as a CHAR filter is unsupported; use the "
            "asciifolding TOKEN filter"
        )
    raise ValueError(f"unknown char filter type: {t!r}")


def _mk_tokenizer(cfg: dict, tokenizers: dict):
    t = cfg.get("type")
    if t == "regexp":
        # tokenizer/regexp/regexp.go:60-66
        return RegexpTokenizer(cfg["regexp"])
    if t == "exception":
        # tokenizer/exception/exception.go:106-135: exception patterns
        # pass through whole, the named tokenizer splits the rest
        inner = tokenizers.get(cfg["tokenizer"])
        if inner is None:
            inner = _TOKENIZERS[cfg["tokenizer"]]()
        return ExceptionTokenizer(list(cfg["exceptions"]), inner)
    if t in _TOKENIZERS:
        return _TOKENIZERS[t]()
    raise ValueError(f"unknown tokenizer type: {t!r}")


def _token_map(cfg: dict) -> frozenset:
    # tokenmap/custom.go:41-55 (filename loading is a filesystem
    # concern the caller resolves; inline tokens are the JSON path)
    if "tokens" not in cfg:
        raise ValueError("token_map requires inline 'tokens'")
    return frozenset(cfg["tokens"])


def _mk_token_filter(cfg: dict, token_maps: dict):
    t = cfg.get("type")
    if t == "to_lower":
        return LowercaseFilter()
    if t == "stop_tokens":
        # token/stop/stop.go:57-66
        name = cfg.get("stop_token_map")
        stopset = (
            token_maps[name] if name is not None
            else frozenset(ENGLISH_STOP_WORDS)
        )
        return StopFilter(stopset)
    if t == "length":
        return LengthFilter(int(cfg.get("min", 3)),
                            int(cfg.get("max", 255)))
    if t == "truncate_token":
        return TruncateFilter(int(cfg["length"]))
    if t == "ngram":
        return NgramFilter(int(cfg["min"]), int(cfg["max"]))
    if t == "edge_ngram":
        return EdgeNgramFilter(int(cfg["min"]), int(cfg["max"]),
                               back=bool(cfg.get("back", False)))
    if t == "shingle":
        if cfg.get("output_original") or cfg.get("filler"):
            raise ValueError(
                "shingle output_original/filler unsupported"
            )
        return ShingleFilter(int(cfg["min"]), int(cfg["max"]),
                             cfg.get("separator", " "))
    if t == "stemmer_porter":
        return PorterFilter()
    if t == "stemmer_snowball":
        # token/snowball/snowball.go:50-56
        from bleve_spark.analysis import snowball as sb

        lang = _SNOWBALL_LANGS.get(str(cfg["language"]).lower())
        if lang is None:
            raise ValueError(
                f"snowball language {cfg['language']!r} not ported"
            )
        return SnowballStemmerFilter(getattr(sb, f"stem_{lang}"))
    if t == "elision":
        return ElisionFilter(token_maps[cfg["articles_token_map"]])
    if t == "keyword_marker":
        # wraps nothing here: KeywordMarkerFilter protects tokens from
        # the NEXT filter in the chain, so it is applied by composing
        # at analyzer build time (see _mk_analyzer)
        return ("keyword_marker", token_maps[cfg["keywords_token_map"]])
    if t == "dict_compound":
        return DictCompoundFilter(
            token_maps[cfg["dict_token_map"]],
            min_word_size=int(cfg.get("min_word_size", 5)),
            min_sub_size=int(cfg.get("min_subword_size", 2)),
            max_sub_size=int(cfg.get("max_subword_size", 15)),
            only_longest=bool(cfg.get("only_longest_match", False)),
        )
    if t == "normalize_unicode":
        return UnicodeNormFilter(str(cfg["form"]).upper())
    if t == "apostrophe":
        return ApostropheFilter()
    if t == "possessive_en":
        return PossessiveEnFilter()
    if t == "unique":
        return UniqueFilter()
    if t == "reverse":
        return ReverseFilter()
    if t == "camelCase":
        return CamelCaseFilter()
    if t == "asciifolding":
        return AsciiFoldingFilter()
    if t == "hierarchy":
        # token/hierarchy/hierarchy.go:68-76 config keys
        from bleve_spark.analysis.extras import HierarchyFilter

        return HierarchyFilter(
            cfg["delimiter"],
            int(cfg.get("max_levels", 1 << 30)),
            bool(cfg.get("split_input", True)),
        )
    f = builtin_token_filter(t)
    if f is not None:
        return f
    raise ValueError(f"unknown token filter type: {t!r}")


def builtin_token_filter(name: str):
    """Resolve a reference-registered token-filter NAME (the fixed
    components a mapping references without config: stop_xx language
    lists, stemmer_xx, normalize_xx, elision_xx, cjk_bigram/width,
    hierarchy, ...) to a component instance; None if unknown.

    Name inventory from the reference registry (`const ...Name =` in
    analysis/**): tests/test_registry_parity.py asserts this covers
    ALL of the reference's public token-filter names (its exclusion
    list is empty — the de/es/fr/it snowball variants and
    stemmer_fr_min resolve here too)."""
    from bleve_spark.analysis import lang as L
    from bleve_spark.analysis import lang_data as LD
    from bleve_spark.analysis import lang_more as LM
    from bleve_spark.analysis import lang_tables as T
    from bleve_spark.analysis import snowball as sb
    from bleve_spark.analysis import stopwords as sw
    from bleve_spark.analysis.extras import EnglishPluralStemmerFilter
    from bleve_spark.analysis.filters import StopFilter as SF

    if name.startswith("stop_"):
        code = name[5:].upper()
        for mod, attr in ((T, f"STOP_WORDS_{code}"),
                          (LD, _LANG_LONG.get(code, "")),
                          (sw, _LANG_LONG.get(code, ""))):
            if attr and hasattr(mod, attr):
                return SF(getattr(mod, attr))
        return None
    if name == "stemmer_porter":
        return PorterFilter()
    if name == "stemmer_en_plural":
        return EnglishPluralStemmerFilter()
    if name == "stemmer_en_snowball":
        return SnowballStemmerFilter(sb.stem_en)
    if name == "stemmer_de_snowball":
        return SnowballStemmerFilter(sb.stem_de)
    if name == "stemmer_es_snowball":
        return SnowballStemmerFilter(sb.stem_es)
    if name == "stemmer_it_snowball":
        return SnowballStemmerFilter(sb.stem_it)
    if name == "stemmer_fr_snowball":
        return SnowballStemmerFilter(sb.stem_fr)
    m = _SNOWBALL_NAME.match(name)
    if m and hasattr(sb, f"stem_{m.group(1)}"):
        return SnowballStemmerFilter(getattr(sb, f"stem_{m.group(1)}"))
    light = {
        "stemmer_es_light": L.SpanishLightStemmerFilter,
        "stemmer_fr_light": L.FrenchLightStemmerFilter,
        "stemmer_fr_min": L.FrenchMinimalStemmerFilter,
        "stemmer_de_light": L.GermanLightStemmerFilter,
        "stemmer_it_light": L.ItalianLightStemmerFilter,
        "stemmer_pt_light": L.PortugueseLightStemmerFilter,
        "stemmer_ar": L.ArabicStemmerFilter,
        "stemmer_hi": LM.HindiStemmerFilter,
        "stemmer_ckb": LM.SoraniStemmerFilter,
        "stemmer_hr": LM.CroatianStemmerFilter,
        "normalize_ar": L.ArabicNormalizeFilter,
        "normalize_de": L.GermanNormalizeFilter,
        "normalize_es": L.SpanishNormalizeFilter,
        "normalize_fa": LM.PersianNormalizeFilter,
        "normalize_hi": LM.HindiNormalizeFilter,
        "normalize_in": LM.IndicNormalizeFilter,
        "normalize_ckb": LM.SoraniNormalizeFilter,
        "hr_suffix_transformation_filter":
            LM.CroatianSuffixTransformFilter,
        "cjk_width": L.CJKWidthFilter,
        "cjk_bigram": L.CJKBigramFilter,
        # hierarchy is config-typed (needs a delimiter), resolved in
        # _mk_token_filter
    }
    if name in light:
        return light[name]()
    if name == "stemmer_pl":
        from bleve_spark.analysis.stempel import stem_pl

        return SnowballStemmerFilter(stem_pl)
    if name.startswith("elision_"):
        arts = _ARTICLES.get(name[8:])
        if arts is not None:
            return ElisionFilter(arts)
    return None


import re as _re

_SNOWBALL_NAME = _re.compile(r"^stemmer_(\w\w)_snowball$")
_LANG_LONG = {
    "EN": "ENGLISH_STOP_WORDS", "AR": "ARABIC_STOP_WORDS",
    "FR": "FRENCH_STOP_WORDS",
    "ES": "SPANISH_STOP_WORDS", "DE": "GERMAN_STOP_WORDS",
    "IT": "ITALIAN_STOP_WORDS", "PT": "PORTUGUESE_STOP_WORDS",
    "RU": "RUSSIAN_STOP_WORDS", "NL": "DUTCH_STOP_WORDS",
    "SV": "SWEDISH_STOP_WORDS", "DA": "DANISH_STOP_WORDS",
    "NO": "NORWEGIAN_STOP_WORDS", "FI": "FINNISH_STOP_WORDS",
}


def _articles():
    from bleve_spark.analysis import lang as L

    out = {}
    for code, attr in (("fr", "FRENCH_ARTICLES"),
                       ("it", "ITALIAN_ARTICLES"),
                       ("ca", "CATALAN_ARTICLES"),
                       ("ga", "IRISH_ARTICLES")):
        for mod in (L,):
            if hasattr(mod, attr):
                out[code] = getattr(mod, attr)
    try:
        from bleve_spark.analysis import lang_tables as T

        for code, attr in (("ca", "ARTICLES_CA"), ("ga", "ARTICLES_GA"),
                           ("fr", "ARTICLES_FR"), ("it", "ARTICLES_IT")):
            if code not in out and hasattr(T, attr):
                out[code] = getattr(T, attr)
    except ImportError:
        pass
    return out


_ARTICLES = _articles()


def _mk_analyzer(name: str, cfg: dict, char_filters: dict,
                 tokenizers: dict, token_filters: dict) -> Analyzer:
    if cfg.get("type") != "custom":
        raise ValueError(
            f"analyzer {name!r}: only type 'custom' is configurable "
            f"(got {cfg.get('type')!r}); non-custom analyzers are "
            "referenced by name"
        )

    def cf(n):
        if n in char_filters:
            return char_filters[n]
        if n == "html":
            return HTMLCharFilter()
        if n == "zero_width_spaces":
            return ZeroWidthNonJoinerCharFilter()
        raise ValueError(f"unknown char filter: {n!r}")

    tok_name = cfg["tokenizer"]
    tok = tokenizers.get(tok_name)
    if tok is None:
        tok = _TOKENIZERS[tok_name]()

    filters = []
    pending_keywords = None
    for n in cfg.get("token_filters", []):
        f = token_filters.get(n)
        if f is None:
            f = _mk_token_filter({"type": n}, {})
        if isinstance(f, tuple) and f[0] == "keyword_marker":
            pending_keywords = f[1]
            continue
        if pending_keywords is not None:
            f = KeywordMarkerFilter(pending_keywords, f)
            pending_keywords = None
        filters.append(f)

    return Analyzer(
        name=name,
        tokenizer=tok,
        token_filters=filters,
        char_filters=[cf(n) for n in cfg.get("char_filters", [])],
    )


def build_custom_analysis(analysis_cfg: dict) -> dict[str, Analyzer]:
    """Compile a mapping's ``analysis`` section into named Analyzer
    objects (mapping/analysis.go customAnalysis registration order:
    char filters → tokenizers → token maps → token filters →
    analyzers)."""
    if not analysis_cfg:
        return {}
    char_filters = {
        n: _mk_char_filter(c)
        for n, c in (analysis_cfg.get("char_filters") or {}).items()
    }
    tokenizers = {}
    for n, c in (analysis_cfg.get("tokenizers") or {}).items():
        tokenizers[n] = _mk_tokenizer(c, tokenizers)
    token_maps = {
        n: _token_map(c)
        for n, c in (analysis_cfg.get("token_maps") or {}).items()
    }
    token_filters = {
        n: _mk_token_filter(c, token_maps)
        for n, c in (analysis_cfg.get("token_filters") or {}).items()
    }
    analyzers = {}
    for n, c in (analysis_cfg.get("analyzers") or {}).items():
        analyzers[n] = _mk_analyzer(
            n, c, char_filters, tokenizers, token_filters
        )
    return analyzers


def resolve_analyzer(name: str, custom: dict[str, Analyzer]):
    """Custom analyzers shadow built-ins, like the registry cache."""
    if name in custom:
        return custom[name]
    return get_analyzer(name)


# ---- date_time_parsers (analysis/datetime/*) ------------------------

# Go reference-time tokens → Spark (java.time) datetime pattern tokens,
# longest-first (analysis/datetime/flexible/flexible.go parses with Go
# layouts; Spark parses natively with DateTimeFormatter patterns)
_GO_TO_JAVA = [
    ("2006", "yyyy"), ("01", "MM"), ("02", "dd"), ("15", "HH"),
    ("04", "mm"), ("05", "ss"), (".999999999", ".SSSSSSSSS"),
    (".999999", ".SSSSSS"), (".999", ".SSS"), (".000000000",
    ".SSSSSSSSS"), (".000000", ".SSSSSS"), (".000", ".SSS"),
    ("-07:00", "XXX"), ("-0700", "XX"), ("Z07:00", "XXX"),
    ("Z0700", "XX"), ("MST", "zz"), ("January", "MMMM"),
    ("Jan", "MMM"), ("Monday", "EEEE"), ("Mon", "EEE"), ("PM", "a"),
    ("03", "hh"), ("06", "yy"), ("_2", "d"),
]

_PERCENT_TO_JAVA = {
    "%Y": "yyyy", "%y": "yy", "%m": "MM", "%d": "dd", "%H": "HH",
    "%I": "hh", "%M": "mm", "%S": "ss", "%f": "SSSSSS", "%z": "XX",
    "%Z": "zz", "%b": "MMM", "%B": "MMMM", "%a": "EEE", "%A": "EEEE",
    "%p": "a", "%j": "DDD", "%%": "%",
}


def go_layout_to_spark(layout: str) -> str:
    out = layout
    for go, java in _GO_TO_JAVA:
        out = out.replace(go, java)
    return out


def percent_layout_to_spark(layout: str) -> str:
    out = []
    i = 0
    while i < len(layout):
        if layout[i] == "%" and i + 1 < len(layout):
            tok = layout[i : i + 2]
            out.append(_PERCENT_TO_JAVA.get(tok, tok))
            i += 2
        else:
            out.append(layout[i])
            i += 1
    return "".join(out)


def build_date_time_parsers(analysis_cfg: dict) -> dict[str, list[str]]:
    """Compile the `date_time_parsers` section to named lists of Spark
    datetime patterns, cascaded at parse time like the reference tries
    each layout in order (flexible.go ParseDateTime). Types:
    flexiblego / sanitizedgo (Go reference-time layouts) and
    percentstyle (strptime-style)."""
    out: dict[str, list[str]] = {}
    for name, cfg in (
        (analysis_cfg or {}).get("date_time_parsers") or {}
    ).items():
        t = cfg.get("type")
        layouts = list(cfg.get("layouts") or [])
        if not layouts:
            raise ValueError(f"date parser {name!r}: layouts required")
        if t in ("flexiblego", "sanitizedgo"):
            out[name] = [go_layout_to_spark(la) for la in layouts]
        elif t == "percentstyle":
            out[name] = [percent_layout_to_spark(la) for la in layouts]
        elif t == "isostyle":
            # analysis/datetime/iso: layouts ARE java
            # DateTimeFormatter patterns — Spark's native dialect,
            # passed through verbatim
            out[name] = list(layouts)
        else:
            raise ValueError(
                f"date parser {name!r}: unknown type {t!r}"
            )
    return out
