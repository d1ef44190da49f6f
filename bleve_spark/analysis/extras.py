"""Remaining reference tokenizers/filters: character & exception
tokenizers, dict-compound, unicodenorm, hierarchy, keyword-marker
protection, and the ZWNJ char filter.

Parity targets:
* character tokenizer — runs of runes satisfying a predicate
  (/root/reference/analysis/tokenizer/character/character.go)
* exception tokenizer — regexp-matched spans pass through whole, the
  rest goes to a child tokenizer
  (/root/reference/analysis/tokenizer/exception/exception.go:51-100)
* dict_compound — emit the original token plus every dictionary
  subword of rune-length [min_sub, max_sub] in words ≥ min_word
  (/root/reference/analysis/token/compound/dict.go:27-110)
* unicodenorm — NFC/NFD/NFKC/NFKD
  (/root/reference/analysis/token/unicodenorm/unicodenorm.go)
* hierarchy — progressive delimiter-joined paths, all at position 1
  (/root/reference/analysis/token/hierarchy/hierarchy.go:28-66)
* keyword_marker — protect terms from downstream stemming
  (/root/reference/analysis/token/keyword/keyword.go: sets KeyWord;
  stemmers skip keywords — restated here as a protective wrapper)
* zero_width_non_joiner char filter — U+200C → space
  (/root/reference/analysis/char/zerowidthnonjoiner)
"""

from __future__ import annotations

import re
import unicodedata

from bleve_spark.analysis.analyzers import RegexpCharFilter
from bleve_spark.analysis.filters import TokenFilter
from bleve_spark.analysis.tokenizers import Token


class CharacterTokenizer:
    """Runs of characters satisfying ``pred`` (default: letters)."""

    def __init__(self, pred=str.isalpha):
        self.pred = pred

    def terms(self, text: str) -> list[str]:
        out, cur = [], []
        for ch in text:
            if self.pred(ch):
                cur.append(ch)
            elif cur:
                out.append("".join(cur))
                cur = []
        if cur:
            out.append("".join(cur))
        return out

    def tokenize(self, text: str) -> list[Token]:
        toks, pos = [], 0
        i = 0
        n = len(text)
        while i < n:
            if self.pred(text[i]):
                j = i
                while j < n and self.pred(text[j]):
                    j += 1
                pos += 1
                toks.append(Token(text[i:j], pos, i, j))
                i = j
            else:
                i += 1
        return toks


class ExceptionTokenizer:
    """Spans matching ``patterns`` become single tokens; everything
    between them is tokenized by ``remaining`` (positions run through
    the combined stream, exception.go:51-100)."""

    def __init__(self, patterns: list[str], remaining):
        self.re = re.compile("|".join(f"(?:{p})" for p in patterns))
        self.remaining = remaining

    def terms(self, text: str) -> list[str]:
        out = []
        cur = 0
        for m in self.re.finditer(text):
            if m.start() > cur:
                out.extend(self.remaining.terms(text[cur:m.start()]))
            out.append(m.group(0))
            cur = m.end()
        if cur < len(text):
            out.extend(self.remaining.terms(text[cur:]))
        return out

    def tokenize(self, text: str) -> list[Token]:
        return [
            Token(t, i + 1, 0, 0) for i, t in enumerate(self.terms(text))
        ]


class UnicodeNormFilter(TokenFilter):
    """NFC/NFD/NFKC/NFKD normalization (1:1 map — batch-path safe)."""

    def __init__(self, form: str = "NFKC"):
        if form not in ("NFC", "NFD", "NFKC", "NFKD"):
            raise ValueError(f"unknown normalization form: {form!r}")
        self.form = form

    def apply_terms(self, terms):
        return [unicodedata.normalize(self.form, t) for t in terms]

    def _one(self, term):
        return (unicodedata.normalize(self.form, term),)


class KeywordMarkerFilter(TokenFilter):
    """Protects ``keywords`` from a downstream map filter (the
    reference marks tokens KeyWord=true and stemmers skip them;
    composition expresses the same contract)."""

    def __init__(self, keywords: frozenset[str], inner: TokenFilter):
        self.keywords = frozenset(keywords)
        self.inner = inner

    def _map(self, t: str) -> str:
        if t in self.keywords:
            return t
        out = self.inner.apply_terms([t])
        return out[0] if out else t

    def apply_terms(self, terms):
        return [self._map(t) for t in terms]

    def _one(self, term):
        return (self._map(term),)


class DictCompoundFilter(TokenFilter):
    """dict.go:51-110: original token first, then every dictionary
    subword (per-term 1:k — analyze_terms assigns subwords the
    original token's position, matching the reference)."""

    def __init__(self, words: frozenset[str], min_word_size: int = 5,
                 min_sub_size: int = 2, max_sub_size: int = 15,
                 only_longest: bool = False):
        self.words = frozenset(words)
        self.min_word = min_word_size
        self.min_sub = min_sub_size
        self.max_sub = max_sub_size
        self.only_longest = only_longest

    def _decompose(self, term: str) -> list[str]:
        out = [term]
        if len(term) < self.min_word:
            return out
        n = len(term)
        for i in range(0, n - self.min_sub + 1):
            longest = None
            for j in range(self.min_sub, self.max_sub + 1):
                if i + j > n:
                    break
                sub = term[i:i + j]
                if sub in self.words:
                    if self.only_longest:
                        if longest is None or len(longest) < j:
                            longest = sub
                    else:
                        out.append(sub)
            if self.only_longest and longest is not None:
                out.append(longest)
        return out

    def apply_terms(self, terms):
        out = []
        for t in terms:
            out.extend(self._decompose(t))
        return out

    def _one(self, term):
        return tuple(self._decompose(term))


class HierarchyFilter(TokenFilter):
    """hierarchy.go:28-66: progressive paths a, a/b, a/b/c (all at
    position 1). Operates on the WHOLE token stream."""

    WHOLE_STREAM = True

    def __init__(self, delimiter: str, max_levels: int = 1 << 30,
                 split_input: bool = True):
        self.delimiter = delimiter
        self.max_levels = max_levels
        self.split_input = split_input

    def apply_terms(self, terms):
        so_far: list[str] = []
        out: list[str] = []
        parts = []
        for t in terms:
            parts.extend(
                t.split(self.delimiter) if self.split_input else [t]
            )
        for p in parts:
            so_far.append(p)
            out.append(self.delimiter.join(so_far))
            if len(so_far) >= self.max_levels:
                break
        return out

    def apply(self, tokens):
        terms = self.apply_terms([t.term for t in tokens])
        return [Token(t, 1, 0, len(t)) for t in terms]


class ZeroWidthNonJoinerCharFilter(RegexpCharFilter):
    """U+200C → space (analysis/char/zerowidthnonjoiner)."""

    def __init__(self):
        super().__init__("‌", " ")


# English s-stemmer — analysis/lang/en/plural_stemmer.go ("stemmer_en_
# plural"): strips plural s/es/ies with the Go port's exception lists.
_OES_KEEP_E = ("shoes", "canoes", "oboes")
_CHES_KEEP_E = ("cliches", "avalanches", "mustaches", "moustaches",
                "quiches", "headaches", "heartaches", "porsches",
                "tranches", "caches")


def stem_en_plural(word: str) -> str:
    w = word.lower()
    n = len(w)
    if n < 3 or w[-1] != "s":
        return w
    c = w[-2]
    if c in "us":
        return w
    if c == "e":
        if n > 4 and w[-3] == "i":          # spies -> spy, but pies -> pie
            return w[:-3] + "y"
        if n > 3:
            if n > 4 and w[-3] == "x":      # boxes -> box, axes -> axe
                return w[:-2]
            if w[-3] == "o":                # foes -> fo; shoes -> shoe
                return w[:-1] if w.endswith(_OES_KEEP_E) else w[:-2]
            if n > 4 and w[-4] == "s" and w[-3] in "hs":
                return w[:-2]               # dishes/dresses
            if n > 4 and w[-4] == "c" and w[-3] == "h":
                return (w[:-1] if w.endswith(_CHES_KEEP_E)
                        else w[:-2])        # snitches; cliches -> cliche
    return w[:-1]


class EnglishPluralStemmerFilter(TokenFilter):
    def apply_terms(self, terms):
        return [stem_en_plural(t) for t in terms]

    def _one(self, term):
        return (stem_en_plural(term),)
