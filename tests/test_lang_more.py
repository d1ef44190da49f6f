"""Tranche-2 language goldens — vectors transcribed from the
reference's own suites (analyzer_{fi,ar,fa,hi,ckb,hr}_test.go and the
filter-level sorani/hindi/persian/indic normalize + stemmer tests), so
every port is pinned to the reference's observable behavior."""

import pytest

from bleve_spark.analysis.analyzers import get_analyzer
import bleve_spark.analysis.lang_more as LM
from bleve_spark.analysis.snowball import stem_fi


FI_STEM = [
    ("edeltäjiinsä", "edeltäj"), ("edeltäjistään", "edeltäj"),
    # hand-traced rule coverage: possessive+case chains, step-6 tidy
    ("kirjan", "kirj"), ("taloissa", "talo"), ("taloissakin", "talo"),
    ("tyttöjen", "tyttöj"),
]

AR_ANALYZER = [
    ("كبير", ["كبير"]), ("كبيرة", ["كبير"]), ("مشروب", ["مشروب"]),
    ("مشروبات", ["مشروب"]), ("أمريكيين", ["امريك"]),
    ("امريكي", ["امريك"]), ("كتاب", ["كتاب"]), ("الكتاب", ["كتاب"]),
    ("ما ملكت أيمانكم", ["ملكت", "ايمانكم"]),
    ("الذين ملكت أيمانكم", ["ملكت", "ايمانكم"]),
    ("ﺍﻟﺴﻼﻢ", ["سلام"]),   # presentation forms via NFKC
]

FA_NORMALIZE = [
    ("های", "هاي"), ("هاے", "هاي"), ("کشاندن", "كشاندن"),
    ("كتابۀ", "كتابه"), ("كتابهٔ", "كتابه"), ("زادہ", "زاده"),
]

HI_ANALYZER = [
    ("हिन्दी", ["हिंद"]), ("हिंदी", ["हिंद"]),
]

HI_NORMALIZE = [
    ("अँगरेज़ी", "अंगरेजि"), ("अँग्रेज़ी", "अंगरेजि"),
    ("क़िताब", "किताब"), ("फ़र्ज़", "फरज"),
    ("ऱऴख़ग़ड़ढ़य़", "रळखगडढय"),
    ("शार्‍मा", "शारमा"), ("शार्‌मा", "शारमा"),
    ("ॅॆॉॊऍऎऑऒॲ", "ेेोोएएओओअ"),
    ("आईऊॠॡऐऔीूॄॣैौ", "अइउऋऌएओिुृॢेो"),
]

HI_STEM = [
    ("लडका", "लडक"), ("लडके", "लडक"), ("लडकों", "लडक"),
    ("गुरु", "गुर"), ("गुरुओं", "गुर"), ("दोस्त", "दोस्त"),
    ("दोस्तों", "दोस्त"), ("लडकियों", "लडक"),
    ("किताबें", "किताब"), ("आध्यापीकाओं", "आध्यापीक"),
    ("खाना", "खा"), ("कठिनाइयां", "कठिन"), ("खा", "खा"),
]

CKB_NORMALIZE = [
    ("ي", "ی"), ("ى", "ی"), ("ی", "ی"),
    ("ك", "ک"), ("ک", "ک"),
    ("ه‌", "ە"), ("ه‌ک", "ەک"),
    ("ھ", "ه"), ("ة", "ە"),
    ("ههه", "ههە"),
    ("ڒ", "ڕ"), ("ررر", "ڕرر"),
    ("ـ", ""), ("َ", ""), ("ّ", ""), ("‌", ""),
]

INDIC_NORMALIZE = [
    ("अाॅअाॅ", "ऑऑ"), ("अाॆअाॆ", "ऒऒ"), ("अाेअाे", "ओओ"),
    ("अाैअाै", "औऔ"), ("अाअा", "आआ"), ("अाैर", "और"),
    ("ত্‍", "ৎ"),
]


@pytest.mark.parametrize("inp,out", FI_STEM)
def test_fi_snowball(inp, out):
    assert stem_fi(inp) == out


def test_fi_analyzer():
    an = get_analyzer("fi")
    assert [t for t, _ in an.analyze_terms("edeltäjistään")] == ["edeltäj"]
    assert [t for t, _ in an.analyze_terms("olla")] == []


@pytest.mark.parametrize("inp,out", AR_ANALYZER)
def test_ar_analyzer(inp, out):
    an = get_analyzer("ar")
    assert [t for t, _ in an.analyze_terms(inp)] == out


@pytest.mark.parametrize("inp,out", FA_NORMALIZE)
def test_fa_normalize(inp, out):
    assert inp.translate(LM.PersianNormalizeFilter._TRANS) == out


@pytest.mark.parametrize("inp,out", HI_ANALYZER)
def test_hi_analyzer(inp, out):
    an = get_analyzer("hi")
    assert [t for t, _ in an.analyze_terms(inp)] == out


@pytest.mark.parametrize("inp,out", HI_NORMALIZE)
def test_hi_normalize(inp, out):
    assert LM._hi_normalize(inp) == out


@pytest.mark.parametrize("inp,out", HI_STEM)
def test_hi_stem(inp, out):
    assert LM.stem_hi(inp) == out


@pytest.mark.parametrize("inp,out", CKB_NORMALIZE)
def test_ckb_normalize(inp, out):
    assert LM._ckb_normalize(inp) == out


@pytest.mark.parametrize("inp,out", INDIC_NORMALIZE)
def test_indic_normalize(inp, out):
    assert LM._indic_normalize(inp) == out


def test_hr_analyzer_reference_vectors():
    """All cases from analyzer_hr_test.go."""
    import re
    import pathlib

    txt = pathlib.Path(
        "/root/reference/analysis/lang/hr/analyzer_hr_test.go"
    ).read_text()
    an = get_analyzer("hr")
    n = 0
    for c in re.split(r"\{\s*input:", txt)[1:]:
        m = re.search(r'\[\]byte\("([^"]*)"\)', c)
        outs = re.findall(r'Term:\s+\[\]byte\("([^"]*)"\)', c)
        got = [t for t, _ in an.analyze_terms(m.group(1))]
        assert got == outs, (m.group(1), got, outs)
        n += 1
    assert n >= 5


def test_stop_only_analyzers():
    """bg/cs/el/eu/gl/hy/id get lower+stop; ca/ga add elision."""
    assert [t for t, _ in get_analyzer("el").analyze_terms("και σπίτι")] \
        == ["σπίτι"]
    assert [t for t, _ in get_analyzer("cs").analyze_terms("k domu")] \
        == ["domu"]
    assert [t for t, _ in get_analyzer("ca").analyze_terms("l'home")] \
        == ["home"]
    assert [t for t, _ in get_analyzer("ga").analyze_terms("b'fhearr")] \
        == ["fhearr"]


def test_tokenizer_absorbs_combining_marks():
    """UAX#29 Extend: matras/viramas/harakat must not split tokens."""
    from bleve_spark.analysis.tokenizers import UnicodeTokenizer

    t = UnicodeTokenizer()
    assert t.terms("हिन्दी") == ["हिन्दी"]
    assert t.terms("कुछ हिन्दी शब्द") == ["कुछ", "हिन्दी", "शब्द"]


PL_ANALYZER = [
    ("śmiało", ["śmieć"]), ("przypadku", ["przypadek"]),
    ("według", []), ("text 1000", ["text", "1000"]),
    ("Ale ta wiedza była utrzymywana w tajemnicy",
     ["wiedza", "utrzymywać", "tajemnik"]),
]


@pytest.mark.parametrize("inp,out", PL_ANALYZER)
def test_pl_analyzer(inp, out):
    an = get_analyzer("pl")
    assert [t for t, _ in an.analyze_terms(inp)] == out


def test_pl_stempel_stemmer_vectors():
    """stemmer_pl_test.go + analyzer sentence vocabulary — the trained
    multi-trie must patch exactly like the reference."""
    from bleve_spark.analysis.stempel import stem_pl

    for w, e in [
        ("utrzymywana", "utrzymywać"), ("tajemnicy", "tajemnik"),
        ("badawczego", "badawczy"), ("opracowanie", "opracować"),
        ("kryptografii", "kryptografia"), ("kwantowej", "kwantowy"),
        ("informacji", "informacja"), ("zakresu", "zakres"),
    ]:
        assert stem_pl(w) == e, (w, stem_pl(w), e)


def test_tr_full_pipeline():
    """Turkish: apostrophe truncation before lowercase, Turkish stop
    list, Go per-rune İ→i lowering, and the snowball stemmer
    (analyzer_tr.go; stemmer vectors from stemmer_tr_test.go)."""
    an = get_analyzer("tr")
    assert [t for t, _ in an.analyze_terms("Kıbrıs'ta")] == ["kıbrıs"]
    assert [t for t, _ in an.analyze_terms("dolayı")] == []
    assert [t for t, _ in an.analyze_terms("İSTANBUL")] == ["istanbul"]
    assert [t for t, _ in an.analyze_terms("kitaplar")] == ["kitap"]


def test_tr_snowball_reference_vectors():
    """stemmer_tr_test.go — the reference's full vector set."""
    from bleve_spark.analysis.snowball import stem_tr

    for w, e in [("kimsesizler", "kimsesiz"), ("kitaplar", "kitap"),
                 ("arabanın", "araba"), ("bardaklar", "bardak"),
                 ("kediye", "kedi"), ("yazdım", "yaz")]:
        assert stem_tr(w) == e, (w, stem_tr(w), e)


def test_hu_ro_snowball_pipelines():
    """analyzer_hu_test.go (babakocsi/babakocsijáért -> babakocs,
    által stopped) and analyzer_ro_test.go (absenţa/absenţi ->
    absenţ, îl stopped)."""
    hu = get_analyzer("hu")
    assert [t for t, _ in hu.analyze_terms(
        "által babakocsi")] == ["babakocs"]
    assert [t for t, _ in hu.analyze_terms(
        "babakocsijáért")] == ["babakocs"]
    ro = get_analyzer("ro")
    assert [t for t, _ in ro.analyze_terms(
        "îl absenţa")] == ["absenţ"]
    assert [t for t, _ in ro.analyze_terms("absenţi")] == ["absenţ"]


def test_hu_ro_snowball_hand_traced():
    """Hand-traced rule cases for the reconstructed suffix tables."""
    from bleve_spark.analysis.snowball import stem_hu, stem_ro

    for w, e in [("ablakok", "ablak"), ("ablakokat", "ablak"),
                 ("házak", "ház"), ("házát", "ház"),
                 ("gépért", "gép"), ("tollal", "tol")]:
        assert stem_hu(w) == e, (w, stem_hu(w), e)
    for w, e in [("lucrează", "lucr"), ("copiii", "copii"),
                 ("frumoasă", "frumoas"), ("acţiune", "acţiun"),
                 ("cărţile", "cărţ")]:
        assert stem_ro(w) == e, (w, stem_ro(w), e)


def test_lowercase_matches_go_per_rune():
    """lowercase.go:38-43 — İ (U+0130) must lower to a single 'i',
    not Python's full-casing 'i' + combining dot."""
    from bleve_spark.analysis.filters import LowercaseFilter

    f = LowercaseFilter()
    assert f.apply_terms(["İSTANBUL"]) == ["istanbul"]
    assert len(f.apply_terms(["İ"])[0]) == 1
