"""Token filters.

Each filter maps ``list[Token] -> list[Token]`` (rich path) and
``list[str] -> list[str]`` on bare term lists (fast path; positions are
carried alongside by the caller). Parity targets in the reference:

* lowercase — unicode-aware per-rune lower
  (/root/reference/analysis/token/lowercase/lowercase.go:38-43);
* stop — delete tokens whose term is in the set, keep positions of the
  survivors untouched (/root/reference/analysis/token/stop/stop.go:43-54);
* apostrophe — truncate at first apostrophe
  (/root/reference/analysis/token/apostrophe);
* possessive_en — strip trailing 's / 'S
  (/root/reference/analysis/lang/en/possessive_filter_en.go);
* porter — Porter stemmer (/root/reference/analysis/token/porter);
* shingle / ngram / edge_ngram / length / truncate / unique / reverse /
  camelcase — analysis/token/* counterparts used by the training-data
  pipeline functions (dedup shingling etc.).
"""

from __future__ import annotations

from collections.abc import Iterable

from bleve_spark.analysis import porter
from bleve_spark.analysis.tokenizers import Token


class TokenFilter:
    # True → apply_terms consumes the WHOLE token stream (e.g.
    # hierarchy); positions are reassigned 1..n by the analyzer
    WHOLE_STREAM = False

    def apply_terms(self, terms: list[str]) -> list[str]:
        raise NotImplementedError

    def apply(self, tokens: list[Token]) -> list[Token]:
        """Default rich-path: term-wise transform preserving metadata;
        filters that drop/merge tokens override this."""
        out = []
        for t in tokens:
            for nt in self._one(t.term):
                out.append(Token(nt, t.pos, t.start, t.end))
        return out

    def _one(self, term: str) -> Iterable[str]:
        raise NotImplementedError


class LowercaseFilter(TokenFilter):
    """Per-rune unicode lowering — the reference's filter maps each
    rune through unicode.ToLower (lowercase.go:38-43), so Turkish
    İ (U+0130) lowers to plain 'i'.  Python's str.lower() applies the
    full SpecialCasing rule İ → 'i' + U+0307 (combining dot) instead;
    pre-folding İ keeps us rune-for-rune identical with Go."""

    _PRE = str.maketrans({"İ": "i"})

    def apply_terms(self, terms):
        return [t.translate(self._PRE).lower() for t in terms]

    def _one(self, term):
        return (term.translate(self._PRE).lower(),)


class StopFilter(TokenFilter):
    def __init__(self, stopset: frozenset[str]):
        self.stopset = stopset

    def apply_terms(self, terms):
        ss = self.stopset
        return [t for t in terms if t not in ss]

    def apply(self, tokens):
        ss = self.stopset
        return [t for t in tokens if t.term not in ss]


class BooleanTFFilter(TokenFilter):
    """Boolean field encoding: one token "T"/"F" — the reference indexes
    booleans as a single T/F term (/root/reference/document/
    field_boolean.go). Accepts Spark's boolean→string cast output."""

    _TRUE = frozenset({"true", "t", "1", "T", "True", "TRUE"})

    def apply_terms(self, terms):
        return ["T" if t in self._TRUE else "F" for t in terms]

    def _one(self, term):
        return ("T" if term in self._TRUE else "F",)


class AsciiFoldingFilter(TokenFilter):
    """Fold accented characters to ASCII (reference:
    analysis/char/asciifolding — applied here as a 1:1 token map so the
    vectorized batch path can dictionary-encode it)."""

    def apply_terms(self, terms):
        return [self._fold(t) for t in terms]

    def _one(self, term):
        return (self._fold(term),)

    @staticmethod
    def _fold(term: str) -> str:
        import unicodedata

        nfkd = unicodedata.normalize("NFKD", term)
        return "".join(c for c in nfkd if not unicodedata.combining(c))


class ApostropheFilter(TokenFilter):
    def apply_terms(self, terms):
        return [t.split("'", 1)[0].split("’", 1)[0] for t in terms]

    def _one(self, term):
        return (term.split("'", 1)[0].split("’", 1)[0],)


class PossessiveEnFilter(TokenFilter):
    @staticmethod
    def _strip(term: str) -> str:
        if len(term) >= 2 and term[-1] in "sS" and term[-2] in "'’＇":
            return term[:-2]
        return term

    def apply_terms(self, terms):
        return [self._strip(t) for t in terms]

    def _one(self, term):
        return (self._strip(term),)


class PorterFilter(TokenFilter):
    def apply_terms(self, terms):
        return [porter.stem(t) for t in terms]

    def _one(self, term):
        return (porter.stem(term),)


class LengthFilter(TokenFilter):
    def __init__(self, min_len: int = 1, max_len: int = 10**9):
        self.min_len, self.max_len = min_len, max_len

    def apply_terms(self, terms):
        return [t for t in terms if self.min_len <= len(t) <= self.max_len]

    def apply(self, tokens):
        return [
            t for t in tokens if self.min_len <= len(t.term) <= self.max_len
        ]


class TruncateFilter(TokenFilter):
    def __init__(self, length: int):
        self.length = length

    def apply_terms(self, terms):
        return [t[: self.length] for t in terms]

    def _one(self, term):
        return (term[: self.length],)


class UniqueFilter(TokenFilter):
    """Keep first occurrence of each term."""

    STREAM_WISE = True

    def apply_terms(self, terms):
        seen: set[str] = set()
        out = []
        for t in terms:
            if t not in seen:
                seen.add(t)
                out.append(t)
        return out

    def apply(self, tokens):
        seen: set[str] = set()
        out = []
        for t in tokens:
            if t.term not in seen:
                seen.add(t.term)
                out.append(t)
        return out


class ReverseFilter(TokenFilter):
    def apply_terms(self, terms):
        return [t[::-1] for t in terms]

    def _one(self, term):
        return (term[::-1],)


class NgramFilter(TokenFilter):
    def __init__(self, min_n: int, max_n: int):
        self.min_n, self.max_n = min_n, max_n

    def _grams(self, term: str):
        for n in range(self.min_n, self.max_n + 1):
            for i in range(0, max(0, len(term) - n + 1)):
                yield term[i : i + n]

    def apply_terms(self, terms):
        return [g for t in terms for g in self._grams(t)]

    def _one(self, term):
        return self._grams(term)


class EdgeNgramFilter(TokenFilter):
    def __init__(self, min_n: int, max_n: int, back: bool = False):
        self.min_n, self.max_n, self.back = min_n, max_n, back

    def _grams(self, term: str):
        for n in range(self.min_n, min(self.max_n, len(term)) + 1):
            yield term[-n:] if self.back else term[:n]

    def apply_terms(self, terms):
        return [g for t in terms for g in self._grams(t)]

    def _one(self, term):
        return self._grams(term)


class ShingleFilter(TokenFilter):
    """Word shingles joined by a separator (reference:
    analysis/token/shingle; used by MinHash dedup)."""

    STREAM_WISE = True

    def __init__(self, min_n: int, max_n: int, sep: str = " "):
        self.min_n, self.max_n, self.sep = min_n, max_n, sep

    def apply_terms(self, terms):
        out = []
        for n in range(self.min_n, self.max_n + 1):
            for i in range(0, max(0, len(terms) - n + 1)):
                out.append(self.sep.join(terms[i : i + n]))
        return out

    def apply(self, tokens):
        terms = [t.term for t in tokens]
        out = []
        for n in range(self.min_n, self.max_n + 1):
            for i in range(0, max(0, len(terms) - n + 1)):
                first, last = tokens[i], tokens[i + n - 1]
                out.append(
                    Token(
                        self.sep.join(terms[i : i + n]),
                        first.pos,
                        first.start,
                        last.end,
                    )
                )
        return out


class CamelCaseFilter(TokenFilter):
    """Split camelCase terms (reference: analysis/token/camelcase)."""

    import re as _re

    _SPLIT = _re.compile(
        r"[A-Z]+(?=[A-Z][a-z])|[A-Z]?[a-z]+|[A-Z]+|\d+|[^A-Za-z\d]+"
    )

    def apply_terms(self, terms):
        return [p for t in terms for p in self._SPLIT.findall(t)]

    def _one(self, term):
        return self._SPLIT.findall(term)
