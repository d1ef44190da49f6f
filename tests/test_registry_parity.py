"""Registry name parity vs the reference.

The reference registers every analysis component under a public name
(`const ...Name = "..."` across analysis/**, datetime/**, highlight/**).
These tests freeze that inventory and assert the repo resolves each
name — analyzers via the analyzer REGISTRY, token filters via
custom.builtin_token_filter / the config-typed factory, tokenizers and
char filters via the custom-analysis factories — minus the documented
exclusions listed per test.
"""

import pytest

from bleve_spark.analysis.analyzers import get_analyzer
from bleve_spark.analysis.custom import (
    _mk_char_filter,
    _mk_token_filter,
    _mk_tokenizer,
    builtin_token_filter,
)

# analysis/lang/*/analyzer_*.go + analyzer/{standard,simple,keyword,web}
REF_ANALYZERS = (
    "standard simple keyword web en ar bg ca cjk ckb cs da de el es eu "
    "fa fi fr ga gl hi hr hu hy id it nl no pl pt ro ru sv tr".split()
)

# fixed-name token filters (registered without config)
REF_NAMED_TOKEN_FILTERS = (
    "stop_ar stop_bg stop_ca stop_ckb stop_cs stop_da stop_de stop_el "
    "stop_en stop_es stop_eu stop_fa stop_fi stop_fr stop_ga stop_gl "
    "stop_hi stop_hr stop_hu stop_hy stop_id stop_it stop_nl stop_no "
    "stop_pl stop_pt stop_ro stop_ru stop_sv stop_tr "
    "stemmer_ar stemmer_ckb stemmer_hi stemmer_hr stemmer_pl "
    "stemmer_porter stemmer_en_plural "
    "stemmer_da_snowball stemmer_de_snowball stemmer_en_snowball "
    "stemmer_es_snowball stemmer_fi_snowball stemmer_fr_snowball "
    "stemmer_it_snowball "
    "stemmer_hu_snowball stemmer_nl_snowball stemmer_no_snowball "
    "stemmer_ro_snowball stemmer_ru_snowball stemmer_sv_snowball "
    "stemmer_tr_snowball "
    "stemmer_de_light stemmer_es_light stemmer_fr_light "
    "stemmer_fr_min "
    "stemmer_it_light stemmer_pt_light "
    "cjk_width cjk_bigram "
    "normalize_ar normalize_ckb normalize_de normalize_es normalize_fa "
    "normalize_hi normalize_in hr_suffix_transformation_filter "
    "elision_ca elision_fr elision_ga elision_it".split()
)

# no exclusions remain: every reference-registered component name
# resolves (all snowball variants ported r4; cjk_width/cjk_bigram
# available standalone as well as composed into the cjk analyzer)
REF_EXCLUDED: list = []

# config-typed token filter types
REF_CONFIG_TOKEN_FILTERS = [
    {"type": "to_lower"},
    {"type": "apostrophe"},
    {"type": "camelCase"},
    {"type": "unique"},
    {"type": "reverse"},
    {"type": "possessive_en"},
    {"type": "asciifolding"},
    {"type": "stop_tokens"},
    {"type": "length", "min": 2, "max": 10},
    {"type": "truncate_token", "length": 5},
    {"type": "ngram", "min": 2, "max": 3},
    {"type": "edge_ngram", "min": 2, "max": 3},
    {"type": "shingle", "min": 2, "max": 2},
    {"type": "normalize_unicode", "form": "nfc"},
    {"type": "hierarchy", "delimiter": "/"},
    {"type": "stemmer_snowball", "language": "russian"},
]

REF_TOKENIZERS = ["unicode", "letter", "whitespace", "single", "web",
                  {"type": "regexp", "regexp": r"\w+"},
                  {"type": "exception", "exceptions": [r"\d+"],
                   "tokenizer": "unicode"}]

REF_CHAR_FILTERS = [{"type": "html"},
                    {"type": "regexp", "regexp": "x", "replace": "y"},
                    {"type": "zero_width_spaces"}]


@pytest.mark.parametrize("name", REF_ANALYZERS)
def test_reference_analyzer_names_resolve(name):
    assert get_analyzer(name) is not None


@pytest.mark.parametrize("name", REF_NAMED_TOKEN_FILTERS)
def test_reference_named_token_filters_resolve(name):
    assert builtin_token_filter(name) is not None, name


@pytest.mark.parametrize("cfg", REF_CONFIG_TOKEN_FILTERS,
                         ids=lambda c: c["type"])
def test_reference_config_token_filters_resolve(cfg):
    assert _mk_token_filter(dict(cfg), {}) is not None


@pytest.mark.parametrize("cfg", REF_TOKENIZERS,
                         ids=lambda c: c if isinstance(c, str)
                         else c["type"])
def test_reference_tokenizers_resolve(cfg):
    if isinstance(cfg, str):
        cfg = {"type": cfg}
    assert _mk_tokenizer(dict(cfg), {}) is not None


@pytest.mark.parametrize("cfg", REF_CHAR_FILTERS,
                         ids=lambda c: c["type"])
def test_reference_char_filters_resolve(cfg):
    assert _mk_char_filter(dict(cfg)) is not None


def test_exclusions_actually_unresolved():
    """The exclusion list stays honest: if one of these becomes
    resolvable, move it out of REF_EXCLUDED."""
    for name in REF_EXCLUDED:
        assert builtin_token_filter(name) is None, (
            f"{name} now resolves — remove it from REF_EXCLUDED"
        )


def test_named_filters_produce_tokens():
    """Spot-check semantics, not just construction."""
    f = builtin_token_filter("stemmer_en_plural")
    assert f.apply_terms(["dresses", "spies"]) == ["dress", "spy"]
    f = builtin_token_filter("stop_en")
    assert f.apply_terms(["the", "dog"]) == ["dog"]
    f = builtin_token_filter("stemmer_ru_snowball")
    assert f.apply_terms(["книги"]) == ["книг"]
    f = builtin_token_filter("elision_fr")
    assert f.apply_terms(["l'avion"]) == ["avion"]


def test_porter2_english_snowball_vectors():
    """stemmer_en_snowball = snowball "english" (porter2), distinct
    from the porter1 filter the en analyzer wires."""
    from bleve_spark.analysis.snowball import stem_en

    for w, e in [("caresses", "caress"), ("ponies", "poni"),
                 ("ties", "tie"), ("agreed", "agre"),
                 ("conflated", "conflat"), ("troubled", "troubl"),
                 ("hopping", "hop"), ("filing", "file"),
                 ("happy", "happi"), ("dying", "die"),
                 ("early", "earli"), ("generate", "generat"),
                 ("relational", "relat"), ("vietnamization", "vietnam"),
                 ("decisiveness", "decis"), ("electrical", "electr"),
                 ("adjustable", "adjust"), ("replacement", "replac"),
                 ("adoption", "adopt"), ("knightly", "knight"),
                 ("differently", "differ"), ("formative", "format")]:
        assert stem_en(w) == e, (w, stem_en(w), e)


def test_german_snowball_vectors():
    """stemmer_de_snowball (the registered full-snowball variant; the
    de analyzer itself wires the light stemmer)."""
    from bleve_spark.analysis.snowball import stem_de

    for w, e in [("aufeinander", "aufeinand"),
                 ("kategorien", "kategori"),
                 ("verwendungen", "verwend"),
                 ("möglichkeiten", "moglich"),
                 ("verständlich", "verstand"),
                 ("bezeichnungen", "bezeichn"),
                 ("lebhaftigkeit", "lebhaft"), ("kindern", "kind"),
                 ("schönes", "schon"), ("hauses", "haus"),
                 ("aber", "aber")]:
        assert stem_de(w) == e, (w, stem_de(w), e)


def test_spanish_italian_snowball_vectors():
    """stemmer_es_snowball / stemmer_it_snowball (registered
    full-snowball variants; the es/it analyzers wire light
    stemmers)."""
    from bleve_spark.analysis.snowball import stem_es, stem_it

    for w, e in [("haciéndola", "hac"), ("cantándolas", "cant"),
                 ("comunicarse", "comunic"), ("canciones", "cancion"),
                 ("cantaría", "cant"), ("biología", "biolog"),
                 ("rápidamente", "rapid"), ("relatividad", "relat"),
                 ("nacionalismo", "nacional"), ("chequeo", "cheque")]:
        assert stem_es(w) == e, (w, stem_es(w), e)
    for w, e in [("abbandonata", "abbandon"), ("abbandonò", "abbandon"),
                 ("dormiremo", "dorm"), ("crederono", "cred"),
                 ("biologia", "biolog"), ("comunicazione", "comun"),
                 ("guardandogli", "guard"), ("nazionale", "nazional"),
                 ("felicità", "felic"), ("generosità", "generos")]:
        assert stem_it(w) == e, (w, stem_it(w), e)


def test_french_minimal_stemmer_vectors():
    """minimal_stemmer_fr.go rules (aux→al, one each of s/r/e/é,
    undouble)."""
    from bleve_spark.analysis.lang import stem_fr_minimal

    for w, e in [("chevaux", "cheval"), ("hiboux", "hibou"),
                 ("chantés", "chant"), ("chanter", "chant"),
                 ("chante", "chant"), ("baronnes", "baron"),
                 ("barons", "baron"), ("baron", "baron"),
                 ("chat", "chat")]:
        assert stem_fr_minimal(w) == e


def test_french_snowball_vectors():
    """stemmer_fr_snowball — the reference's own
    stemmer_fr_snowball_test.go vectors plus spec-traced cases."""
    from bleve_spark.analysis.snowball import stem_fr

    for w, e in [("antagoniste", "antagon"),
                 ("barbouillait", "barbouill"),
                 ("calculateur", "calcul"), ("majestueux", "majestu"),
                 ("chevaux", "cheval"), ("châteaux", "château"),
                 ("nationalité", "national"),
                 ("communication", "commun"),
                 ("évidemment", "évident"), ("rapidement", "rapid"),
                 ("chantaient", "chant"), ("chanter", "chant"),
                 ("finissait", "fin"), ("continua", "continu")]:
        assert stem_fr(w) == e, (w, stem_fr(w), e)


def test_cjk_standalone_filters():
    from bleve_spark.analysis.custom import builtin_token_filter

    w = builtin_token_filter("cjk_width")
    assert w.apply_terms(["ｶﾀｶﾅ", "Ｔｅｓｔ"]) == ["カタカナ", "Test"]
    b = builtin_token_filter("cjk_bigram")
    assert b.apply_terms(["数", "据", "系", "统"]) == ["数据", "据系", "系统"]
    assert b.apply_terms(["数", "spark", "据"]) == ["数", "spark", "据"]


def test_reference_datetime_parser_names():
    """analysis/datetime/*: flexiblego / sanitizedgo / percentstyle /
    isostyle compile through build_date_time_parsers; dateTimeOptional
    is the default; unix_sec/milli/micro/nano are built-in
    date_format names in the mapping layer."""
    from bleve_spark.analysis.custom import build_date_time_parsers
    from bleve_spark.index.mapping import _UNIX_PARSERS

    out = build_date_time_parsers({"date_time_parsers": {
        "a": {"type": "flexiblego", "layouts": ["2006-01-02"]},
        "b": {"type": "sanitizedgo", "layouts": ["2006/01/02"]},
        "c": {"type": "percentstyle", "layouts": ["%Y-%m-%d"]},
        "d": {"type": "isostyle", "layouts": ["yyyy-MM-dd HH:mm"]},
    }})
    assert out["a"] == ["yyyy-MM-dd"]
    assert out["c"] == ["yyyy-MM-dd"]
    assert out["d"] == ["yyyy-MM-dd HH:mm"]
    assert set(_UNIX_PARSERS) == {
        "unix_sec", "unix_milli", "unix_micro", "unix_nano",
    }


def test_unix_timestamp_date_format(spark):
    from bleve_spark.index.mapping import (
        IndexMapping,
        index_with_mapping,
    )
    from bleve_spark.search.searcher import search_df

    df = spark.createDataFrame(
        [(1, "a", 1700000000), (2, "b", 1800000000)],
        "doc_id int, text string, ts long",
    )
    im = IndexMapping.from_dict({"default_mapping": {"properties": {
        "text": {"fields": [{"type": "text"}]},
        "ts": {"fields": [{"type": "datetime",
                           "date_format": "unix_sec"}]},
    }}})
    idx = index_with_mapping(df, ["doc_id"], im, persist=True)
    got = [r["doc_id"] for r in search_df(
        idx, {"field": "ts", "start": "2023-01-01",
              "end": "2024-06-01"}, size=10
    ).collect()]
    assert got == [1]
