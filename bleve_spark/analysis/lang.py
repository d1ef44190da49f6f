"""Language analyzers: es / fr / de / cjk.

Faithful restatements of the reference's per-language pipelines
(/root/reference/analysis/lang/{es,fr,de,cjk}) — Lucene-style LIGHT
stemmers (Savoy), accent normalizers, French elision, and CJK bigrams,
each as a 1:1 map filter that slots into the vectorized batch path
(analyzers.analyze_batch applies map filters once per unique term).

Pipelines (same filter ORDER as the reference analyzers):
* es — unicode, lowercase, stop_es, normalize_es, light_stemmer_es
  (analyzer_es.go:49-57)
* fr — unicode, lowercase, elision(articles_fr), stop_fr,
  light_stemmer_fr (analyzer_fr.go:48-53)
* de — unicode, lowercase, stop_de, normalize_de(umlaut state
  machine), light_stemmer_de (analyzer_de.go:48-56)
* cjk — width-fold + bigram tokenizer, lowercase
  (analyzer_cjk.go:41-48; bigrams of adjacent ideographs, isolated
  ideographs as unigrams — cjk_bigram.go)
"""

from __future__ import annotations

import unicodedata

from bleve_spark.analysis.filters import (
    LowercaseFilter,
    StopFilter,
    TokenFilter,
)
from bleve_spark.analysis.lang_data import (
    DANISH_STOP_WORDS,
    DUTCH_STOP_WORDS,
    FRENCH_ARTICLES,
    FRENCH_STOP_WORDS,
    GERMAN_STOP_WORDS,
    ITALIAN_ARTICLES,
    ITALIAN_STOP_WORDS,
    NORWEGIAN_STOP_WORDS,
    PORTUGUESE_STOP_WORDS,
    RUSSIAN_STOP_WORDS,
    SPANISH_STOP_WORDS,
    SWEDISH_STOP_WORDS,
)
from bleve_spark.analysis.tokenizers import UnicodeTokenizer


class ArabicNormalizeFilter(TokenFilter):
    """lang/ar/arabic_normalize.go:60-76 — fold alef variants to alef,
    dotless yeh to yeh, teh marbuta to heh; strip tatweel, harakat
    (fatha/damma/kasra ±tanwin), shadda, sukun."""

    _MAP = {
        "آ": "ا", "أ": "ا", "إ": "ا",
        "ى": "ي", "ة": "ه",
        "ـ": "", "ً": "", "ٌ": "", "ٍ": "",
        "َ": "", "ُ": "", "ِ": "", "ّ": "",
        "ْ": "",
    }
    _TRANS = str.maketrans(_MAP)

    def apply_terms(self, terms):
        return [t.translate(self._TRANS) for t in terms]

    def _one(self, term):
        return (term.translate(self._TRANS),)


_AR_PREFIXES = ["ال", "وال", "بال", "كال", "فال", "لل", "و"]
_AR_SUFFIXES = ["ها", "ان", "ات", "ون", "ين", "يه", "ية", "ه", "ة",
                "ي"]


def stem_ar(word: str) -> str:
    """lang/ar/stemmer_ar.go:100-116 (Lucene ArabicStemmer): strip ONE
    prefix (wa- needs len>=4, others leave >=2), then strip suffixes in
    listed order, each requiring >=2 remaining chars."""
    for p in _AR_PREFIXES:
        if len(p) == 1 and len(word) < 4:
            continue
        if len(word) - len(p) >= 2 and word.startswith(p):
            word = word[len(p):]
            break
    for s in _AR_SUFFIXES:
        if len(word) - len(s) >= 2 and word.endswith(s):
            word = word[: -len(s)]
    return word


class ArabicStemmerFilter(TokenFilter):
    def apply_terms(self, terms):
        return [stem_ar(t) for t in terms]

    def _one(self, term):
        return (stem_ar(term),)


class SnowballStemmerFilter(TokenFilter):
    """True snowball stemmer filter — wraps a pure-python port of the
    published snowball algorithm (analysis/snowball.py), matching the
    reference's snowballstem-backed filters
    (e.g. lang/ru/stemmer_ru.go:31-44, lang/nl/stemmer_nl.go)."""

    def __init__(self, stem):
        self._stem = stem

    def apply_terms(self, terms):
        return [self._stem(t) for t in terms]

    def _one(self, term):
        return (self._stem(term),)


# ------------------------------------------------------------ Spanish --


class SpanishNormalizeFilter(TokenFilter):
    """lang/es/spanish_normalize.go:40-58."""

    _MAP = str.maketrans(
        "àáâäòóôöèéêëùúûüìíîï",
        "aaaaoooo" + "eeee" + "uuuu" + "iiii",
    )

    def apply_terms(self, terms):
        return [t.translate(self._MAP) for t in terms]

    def _one(self, term):
        return (term.translate(self._MAP),)


def stem_es_light(t: str) -> str:
    """lang/es/light_stemmer_es.go:42-64 (Savoy light stemmer)."""
    l = len(t)
    if l < 5:
        return t
    last = t[-1]
    if last in "oae":
        return t[:-1]
    if last == "s":
        if t[-2] == "e" and t[-3] == "s" and t[-4] == "e":
            return t[:-2]
        if t[-2] == "e" and t[-3] == "c":
            return t[:-3] + "z"
        if t[-2] in "oae":
            return t[:-2]
    return t


class SpanishLightStemmerFilter(TokenFilter):
    def apply_terms(self, terms):
        return [stem_es_light(t) for t in terms]

    def _one(self, term):
        return (stem_es_light(term),)


# ------------------------------------------------------------- French --


class ElisionFilter(TokenFilter):
    """Strip an article prefix before an apostrophe (l'avion → avion):
    analysis/token/elision/elision.go:40-57 with articles_fr.go."""

    def __init__(self, articles=FRENCH_ARTICLES):
        self.articles = articles

    def _strip(self, term: str) -> str:
        for i, ch in enumerate(term):
            if ch in ("'", "’"):
                if term[:i] in self.articles:
                    return term[i + 1:]
        return term

    def apply_terms(self, terms):
        return [self._strip(t) for t in terms]

    def _one(self, term):
        return (self._strip(term),)


def _ends(r: list, suf: str) -> bool:
    return len(r) >= len(suf) and "".join(r[-len(suf):]) == suf


_FR_ACCENTS = {"à": "a", "á": "a", "â": "a", "ô": "o", "è": "e",
               "é": "e", "ê": "e", "ù": "u", "û": "u", "î": "i",
               "ç": "c"}


def _fr_norm(r: list) -> list:
    """lang/fr/light_stemmer_fr.go norm() — including the reference's
    quirk of re-running the adjacent-duplicate collapse after EVERY
    accent-mapped character (the Go inner loop shadows the outer
    index; the behavior is part of the spec being reproduced)."""
    if len(r) > 4:
        i = 0
        while i < len(r):
            r[i] = _FR_ACCENTS.get(r[i], r[i])
            ch = r[0]
            j = 1
            while j < len(r):
                if r[j] == ch and ch.isalpha():
                    del r[j]
                else:
                    ch = r[j]
                    j += 1
            i += 1
    if len(r) > 4 and _ends(r, "ie"):
        r = r[:-2]
    if len(r) > 4:
        if r[-1] == "r":
            r = r[:-1]
        if r[-1] == "e":
            r = r[:-1]
        if r[-1] == "e":
            r = r[:-1]
        if len(r) >= 2 and r[-1] == r[-2] and r[-1].isalpha():
            r = r[:-1]
    return r


def stem_fr_light(term: str) -> str:
    """lang/fr/light_stemmer_fr.go stem() — suffix rewrite cascade;
    rules and length guards ported 1:1 (conditions re-check length
    after each mutation, exactly as the Go does)."""
    r = list(term)
    if len(r) > 5 and r[-1] == "x":
        if r[-3] == "a" and r[-2] == "u" and r[-4] != "e":
            r[-2] = "l"
        r = r[:-1]
    if len(r) > 3 and r[-1] == "x":
        r = r[:-1]
    if len(r) > 3 and r[-1] == "s":
        r = r[:-1]
    if len(r) > 9 and _ends(r, "issement"):
        r = r[:-6]
        r[-1] = "r"
        return "".join(_fr_norm(r))
    if len(r) > 8 and _ends(r, "issant"):
        r = r[:-4]
        r[-1] = "r"
        return "".join(_fr_norm(r))
    if len(r) > 6 and _ends(r, "ement"):
        r = r[:-4]
        if len(r) > 3 and _ends(r, "ive"):
            r = r[:-1]
            r[-1] = "f"
        return "".join(_fr_norm(r))
    if len(r) > 11 and _ends(r, "ficatrice"):
        r = r[:-5]
        r[-2] = "e"
        r[-1] = "r"
        return "".join(_fr_norm(r))
    if len(r) > 10 and _ends(r, "ficateur"):
        r = r[:-4]
        r[-2] = "e"
        r[-1] = "r"
        return "".join(_fr_norm(r))
    if len(r) > 9 and _ends(r, "catrice"):
        r = r[:-3]
        r[-4] = "q"
        r[-3] = "u"
        r[-2] = "e"
        return "".join(_fr_norm(r))
    if len(r) > 8 and _ends(r, "cateur"):
        r = r[:-2]
        r[-4] = "q"
        r[-3] = "u"
        r[-2] = "e"
        r[-1] = "r"
        return "".join(_fr_norm(r))
    if len(r) > 8 and _ends(r, "atrice"):
        r = r[:-4]
        r[-2] = "e"
        r[-1] = "r"
        return "".join(_fr_norm(r))
    if len(r) > 7 and _ends(r, "ateur"):
        r = r[:-3]
        r[-2] = "e"
        r[-1] = "r"
        return "".join(_fr_norm(r))
    if len(r) > 6 and _ends(r, "trice"):
        r = r[:-1]
        r[-3] = "e"
        r[-2] = "u"
        r[-1] = "r"
    if len(r) > 5 and _ends(r, "ième"):
        return "".join(_fr_norm(r[:-4]))
    if len(r) > 7 and _ends(r, "teuse"):
        r = r[:-2]
        r[-1] = "r"
        return "".join(_fr_norm(r))
    if len(r) > 6 and _ends(r, "teur"):
        r = r[:-1]
        r[-1] = "r"
        return "".join(_fr_norm(r))
    if len(r) > 5 and _ends(r, "euse"):
        return "".join(_fr_norm(r[:-2]))
    if len(r) > 8 and _ends(r, "ère"):
        r = r[:-1]
        r[-2] = "e"
        return "".join(_fr_norm(r))
    if len(r) > 7 and _ends(r, "ive"):
        r = r[:-1]
        r[-1] = "f"
        return "".join(_fr_norm(r))
    if len(r) > 4 and (_ends(r, "folle") or _ends(r, "molle")):
        r = r[:-2]
        r[-1] = "u"
        return "".join(_fr_norm(r))
    if len(r) > 9 and _ends(r, "nnelle"):
        return "".join(_fr_norm(r[:-5]))
    if len(r) > 9 and _ends(r, "nnel"):
        return "".join(_fr_norm(r[:-3]))
    if len(r) > 4 and _ends(r, "ète"):
        r = r[:-1]
        r[-2] = "e"
    if len(r) > 8 and _ends(r, "ique"):
        r = r[:-4]
    if len(r) > 8 and _ends(r, "esse"):
        return "".join(_fr_norm(r[:-3]))
    if len(r) > 7 and _ends(r, "inage"):
        return "".join(_fr_norm(r[:-3]))
    if len(r) > 9 and _ends(r, "isation"):
        r = r[:-7]
        if len(r) > 5 and _ends(r, "ual"):
            r[-2] = "e"
        return "".join(_fr_norm(r))
    if len(r) > 9 and _ends(r, "isateur"):
        return "".join(_fr_norm(r[:-7]))
    if len(r) > 8 and _ends(r, "ation"):
        return "".join(_fr_norm(r[:-5]))
    if len(r) > 8 and _ends(r, "ition"):
        return "".join(_fr_norm(r[:-5]))
    return "".join(_fr_norm(r))


class FrenchLightStemmerFilter(TokenFilter):
    def apply_terms(self, terms):
        return [stem_fr_light(t) for t in terms]

    def _one(self, term):
        return (stem_fr_light(term),)


# ------------------------------------------------------------- German --


def _de_normalize(term: str) -> str:
    """lang/de/german_normalize.go:46-84 — umlaut-state machine:
    ä/ö/ü fold, ß → ss, and 'e' deleted when it follows the
    umlaut-eligible state (so 'ae'-digraph spellings match folded
    umlauts)."""
    N, V, U = 0, 1, 2
    state = N
    r = list(term)
    i = 0
    while i < len(r):
        ch = r[i]
        if ch in ("a", "o"):
            state = U
        elif ch == "u":
            state = U if state == N else V
        elif ch == "e":
            if state == U:
                del r[i]
                i -= 1
            state = V
        elif ch in ("i", "q", "y"):
            state = V
        elif ch == "ä":
            r[i] = "a"
            state = V
        elif ch == "ö":
            r[i] = "o"
            state = V
        elif ch == "ü":
            r[i] = "u"
            state = V
        elif ch == "ß":
            r[i] = "s"
            r.insert(i + 1, "s")
            i += 1
            state = N
        else:
            state = N
        i += 1
    return "".join(r)


class GermanNormalizeFilter(TokenFilter):
    def apply_terms(self, terms):
        return [_de_normalize(t) for t in terms]

    def _one(self, term):
        return (_de_normalize(term),)


_DE_ACCENTS = str.maketrans("äàáâöòóôïìíîüùúû",
                            "aaaa" + "oooo" + "iiii" + "uuuu")

_ST_ENDING = set("bdfghklmnt")


def stem_de_light(term: str) -> str:
    """lang/de/light_stemmer_de.go:42-101."""
    s = list(term.translate(_DE_ACCENTS))

    l = len(s)  # step1
    if l > 5 and s[-3] == "e" and s[-2] == "r" and s[-1] == "n":
        s = s[:-3]
    elif l > 4 and s[-2] == "e" and s[-1] in ("m", "n", "r", "s"):
        s = s[:-2]
    elif l > 3 and s[-1] == "e":
        s = s[:-1]
    elif l > 3 and s[-1] == "s" and s[-2] in _ST_ENDING:
        s = s[:-1]

    l = len(s)  # step2
    if l > 5 and s[-3] == "e" and s[-2] == "s" and s[-1] == "t":
        s = s[:-3]
    elif l > 4 and s[-2] == "e" and s[-1] in ("r", "n"):
        s = s[:-2]
    elif l > 4 and s[-2] == "s" and s[-1] == "t" and s[-3] in _ST_ENDING:
        s = s[:-2]
    return "".join(s)


class GermanLightStemmerFilter(TokenFilter):
    def apply_terms(self, terms):
        return [stem_de_light(t) for t in terms]

    def _one(self, term):
        return (stem_de_light(term),)


# ------------------------------------------------------------ Italian --


_IT_ACCENTS = str.maketrans(
    "àáâäòóôöèéêëùúûüìíîï",
    "aaaaoooo" + "eeee" + "uuuu" + "iiii",
)


def stem_it_light(term: str) -> str:
    """lang/it/light_stemmer_it.go:42-93 (accents folded, then final
    vowel with i/h-digraph handling)."""
    if len(term) < 6:
        return term
    t = term.translate(_IT_ACCENTS)
    last, prev = t[-1], t[-2]
    if last == "e":
        return t[:-2] if prev in ("i", "h") else t[:-1]
    if last == "i":
        return t[:-2] if prev in ("h", "i") else t[:-1]
    if last in ("a", "o"):
        return t[:-2] if prev == "i" else t[:-1]
    return t


class ItalianLightStemmerFilter(TokenFilter):
    def apply_terms(self, terms):
        return [stem_it_light(t) for t in terms]

    def _one(self, term):
        return (stem_it_light(term),)


# --------------------------------------------------------- Portuguese --


_PT_ACCENTS = str.maketrans(
    "àáâäãòóôöõèéêëùúûüìíîïç",
    "aaaaa" + "ooooo" + "eeee" + "uuuu" + "iiii" + "c",
)


def _pt_remove_suffix(r: list) -> list:
    """lang/pt/light_stemmer_pt.go removeSuffix()."""
    l = len(r)
    if l > 4 and _ends(r, "es") and r[-3] in "rslz":
        return r[:-2]
    if l > 3 and _ends(r, "ns"):
        r[-2] = "m"
        return r[:-1]
    if l > 4 and (_ends(r, "eis") or _ends(r, "éis")):
        r[-3] = "e"
        r[-2] = "l"
        return r[:-1]
    if l > 4 and _ends(r, "ais"):
        r[-2] = "l"
        return r[:-1]
    if l > 4 and _ends(r, "óis"):
        r[-3] = "o"
        r[-2] = "l"
        return r[:-1]
    if l > 4 and _ends(r, "is"):
        r[-1] = "l"
        return r
    if l > 3 and (_ends(r, "ões") or _ends(r, "ães")):
        r = r[:-1]
        r[-2] = "ã"
        r[-1] = "o"
        return r
    if l > 6 and _ends(r, "mente"):
        return r[:-5]
    if l > 3 and r[-1] == "s":
        return r[:-1]
    return r


def _pt_norm_feminine(r: list) -> list:
    """lang/pt/light_stemmer_pt.go normFeminine()."""
    l = len(r)
    if l > 7 and (_ends(r, "inha") or _ends(r, "iaca")
                  or _ends(r, "eira")):
        r[-1] = "o"
        return r
    if l > 6:
        if (_ends(r, "osa") or _ends(r, "ica") or _ends(r, "ida")
                or _ends(r, "ada") or _ends(r, "iva")
                or _ends(r, "ama")):
            r[-1] = "o"
            return r
        if _ends(r, "ona"):
            r[-3] = "ã"
            r[-2] = "o"
            return r[:-1]
        if _ends(r, "ora"):
            return r[:-1]
        if _ends(r, "esa"):
            r[-3] = "ê"
            return r[:-1]
        if _ends(r, "na"):
            r[-1] = "o"
            return r
    return r


def stem_pt_light(term: str) -> str:
    """lang/pt/light_stemmer_pt.go:42-84 (suffix removal, feminine
    normalization, final-vowel drop, then accent fold)."""
    r = list(term)
    if len(r) < 4:
        return term
    r = _pt_remove_suffix(r)
    if len(r) > 3 and r[-1] == "a":
        r = _pt_norm_feminine(r)
    if len(r) > 4 and r[-1] in ("e", "a", "o"):
        r = r[:-1]
    return "".join(r).translate(_PT_ACCENTS)


class PortugueseLightStemmerFilter(TokenFilter):
    def apply_terms(self, terms):
        return [stem_pt_light(t) for t in terms]

    def _one(self, term):
        return (stem_pt_light(term),)


# --------------------------------------------------------------- CJK --


def _is_ideo(ch: str) -> bool:
    cp = ord(ch)
    return (
        0x4E00 <= cp <= 0x9FFF       # CJK unified
        or 0x3400 <= cp <= 0x4DBF    # ext A
        or 0x3040 <= cp <= 0x30FF    # hiragana + katakana
        or 0xAC00 <= cp <= 0xD7AF    # hangul syllables
        or 0xF900 <= cp <= 0xFAFF    # compat ideographs
    )


class CJKBigramTokenizer(UnicodeTokenizer):
    """UAX#29 words, with runs of ideographs re-emitted as overlapping
    BIGRAMS (isolated ideographs as unigrams) — the cjk analyzer's
    tokenizer+bigram-filter composition (analyzer_cjk.go:41-48,
    cjk_bigram.go:38-137). Width folding (full-width forms → ASCII,
    half-width katakana → katakana) applied first via NFKC over the
    Halfwidth/Fullwidth block (the width filter,
    analysis/token/unicodenorm + width semantics)."""

    @staticmethod
    def _fold_width(text: str) -> str:
        return "".join(
            unicodedata.normalize("NFKC", ch)
            if 0xFF00 <= ord(ch) <= 0xFFEF else ch
            for ch in text
        )

    @staticmethod
    def _flush(run: str, out: list) -> None:
        if not run:
            return
        if len(run) == 1:
            out.append(run)
        else:
            out.extend(run[i:i + 2] for i in range(len(run) - 1))

    def terms(self, text: str) -> list[str]:
        # the UAX#29 tokenizer emits each ideograph as its own token;
        # consecutive ideograph tokens form a run → overlapping
        # bigrams, exactly the reference's ring-buffer pairing
        # (cjk_bigram.go:38-137)
        out: list[str] = []
        run = ""
        for tok in super().terms(self._fold_width(text)):
            if all(_is_ideo(c) for c in tok):
                run += tok
            else:
                self._flush(run, out)
                run = ""
                out.append(tok)
        self._flush(run, out)
        return out

    def tokenize(self, text: str):
        from bleve_spark.analysis.tokenizers import Token

        # offsets are approximate for the bigram path (debug surface)
        return [
            Token(t, i + 1, 0, 0)
            for i, t in enumerate(self.terms(text))
        ]


def register_language_analyzers() -> None:
    from bleve_spark.analysis.analyzers import (
        Analyzer,
        REGISTRY,
    )

    lower = LowercaseFilter()
    REGISTRY.setdefault(
        "es",
        Analyzer(
            "es", UnicodeTokenizer(),
            [lower, StopFilter(SPANISH_STOP_WORDS),
             SpanishNormalizeFilter(), SpanishLightStemmerFilter()],
        ),
    )
    REGISTRY.setdefault(
        "fr",
        Analyzer(
            "fr", UnicodeTokenizer(),
            [lower, ElisionFilter(), StopFilter(FRENCH_STOP_WORDS),
             FrenchLightStemmerFilter()],
        ),
    )
    REGISTRY.setdefault(
        "de",
        Analyzer(
            "de", UnicodeTokenizer(),
            [lower, StopFilter(GERMAN_STOP_WORDS),
             GermanNormalizeFilter(), GermanLightStemmerFilter()],
        ),
    )
    # it: toLower, elision(articles_it), stop_it, light stemmer
    # (analyzer_it.go:52-57); pt: toLower, stop_pt, light stemmer
    # (analyzer_pt.go:48-53)
    REGISTRY.setdefault(
        "it",
        Analyzer(
            "it", UnicodeTokenizer(),
            [lower, ElisionFilter(ITALIAN_ARTICLES),
             StopFilter(ITALIAN_STOP_WORDS),
             ItalianLightStemmerFilter()],
        ),
    )
    REGISTRY.setdefault(
        "pt",
        Analyzer(
            "pt", UnicodeTokenizer(),
            [lower, StopFilter(PORTUGUESE_STOP_WORDS),
             PortugueseLightStemmerFilter()],
        ),
    )
    REGISTRY.setdefault(
        "cjk", Analyzer("cjk", CJKBigramTokenizer(), [lower])
    )
    # True snowball pipelines — toLower, stop_XX, snowball stemmer,
    # matching analyzer_{ru,nl,sv,da,no}.go exactly (same filter order).
    from bleve_spark.analysis.lang_data import FINNISH_STOP_WORDS
    from bleve_spark.analysis.snowball import (
        stem_da, stem_fi, stem_nl, stem_no, stem_ru, stem_sv,
    )
    for code, stops, stem in (
        ("ru", RUSSIAN_STOP_WORDS, stem_ru),
        ("nl", DUTCH_STOP_WORDS, stem_nl),
        ("sv", SWEDISH_STOP_WORDS, stem_sv),
        ("da", DANISH_STOP_WORDS, stem_da),
        ("no", NORWEGIAN_STOP_WORDS, stem_no),
        ("fi", FINNISH_STOP_WORDS, stem_fi),
    ):
        REGISTRY.setdefault(
            code,
            Analyzer(
                code, UnicodeTokenizer(),
                [lower, StopFilter(stops), SnowballStemmerFilter(stem)],
            ),
        )
    # ar: toLower, NFKC, stop_ar (unnormalized list), arabic normalize,
    # arabic light stemmer — analyzer_ar.go:49-57 filter order.
    from bleve_spark.analysis.extras import UnicodeNormFilter
    from bleve_spark.analysis.lang_data import ARABIC_STOP_WORDS

    REGISTRY.setdefault(
        "ar",
        Analyzer(
            "ar", UnicodeTokenizer(),
            [lower, UnicodeNormFilter("NFKC"),
             StopFilter(ARABIC_STOP_WORDS),
             ArabicNormalizeFilter(), ArabicStemmerFilter()],
        ),
    )


register_language_analyzers()


def stem_fr_minimal(term: str) -> str:
    """French MINIMAL stemmer — analysis/lang/fr/minimal_stemmer_fr.go
    ("stemmer_fr_min", Savoy's minimal rules): words ≥ 6 runes drop a
    final x (aux → al), then one each of s, r, e, é, and a doubled
    final letter."""
    if len(term) < 6:
        return term
    if term.endswith("x"):
        if term[-3] == "a" and term[-2] == "u":
            term = term[:-3] + "al"
            return term
        return term[:-1]
    if term.endswith("s"):
        term = term[:-1]
    if term.endswith("r"):
        term = term[:-1]
    if term.endswith("e"):
        term = term[:-1]
    if term.endswith("é"):
        term = term[:-1]
    if len(term) >= 2 and term[-1] == term[-2]:
        term = term[:-1]
    return term


class FrenchMinimalStemmerFilter(TokenFilter):
    def apply_terms(self, terms):
        return [stem_fr_minimal(t) for t in terms]

    def _one(self, term):
        return (stem_fr_minimal(term),)


class CJKWidthFilter(TokenFilter):
    """Standalone cjk_width token filter (token/cjk/cjk_width.go):
    fold full-width forms to ASCII and half-width katakana to
    katakana (NFKC over the Halfwidth/Fullwidth block)."""

    def apply_terms(self, terms):
        return [CJKBigramTokenizer._fold_width(t) for t in terms]

    def _one(self, term):
        return (CJKBigramTokenizer._fold_width(term),)


class CJKBigramFilter(TokenFilter):
    """Standalone cjk_bigram token filter (token/cjk/cjk_bigram.go):
    runs of consecutive single-ideograph tokens re-emit as overlapping
    bigrams (isolated ideographs stay unigrams); non-ideograph tokens
    flush the run and pass through. WHOLE-STREAM semantics, like the
    reference's ring buffer."""

    WHOLE_STREAM = True

    def apply_terms(self, terms):
        out: list[str] = []
        run = ""
        for tok in terms:
            if tok and all(_is_ideo(c) for c in tok):
                run += tok
            else:
                CJKBigramTokenizer._flush(run, out)
                run = ""
                out.append(tok)
        CJKBigramTokenizer._flush(run, out)
        return out
