"""Analyzers: char-filters → tokenizer → token-filters, plus a registry.

Mirrors the reference's pipeline contract
(/root/reference/analysis/type.go:79-98) and its registry extension point
(/root/reference/registry/registry.go): a plain dict name→Analyzer that
callers may extend with custom configurations.

Built-ins (parity targets):
* standard — unicode tokenizer + lowercase + stop_en, NO stemming
  (/root/reference/analysis/analyzer/standard/standard.go:27-48)
* simple   — letter tokenizer + lowercase
* keyword  — whole value is one token
* web      — web tokenizer (URLs/emails whole) + lowercase + stop_en
* en       — unicode + possessive_en + lowercase + stop_en + porter
  (/root/reference/analysis/lang/en/analyzer_en.go:20-45)
* whitespace — whitespace tokenizer + lowercase (handy for the synthetic
  documents corpus whose text is pre-normalized)
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from bleve_spark.analysis.filters import (
    LowercaseFilter,
    PorterFilter,
    PossessiveEnFilter,
    StopFilter,
    TokenFilter,
)
from bleve_spark.analysis.stopwords import ENGLISH_STOP_WORDS
from bleve_spark.analysis.tokenizers import (
    LetterTokenizer,
    SingleTokenTokenizer,
    Token,
    UnicodeTokenizer,
    WebTokenizer,
    WhitespaceTokenizer,
)


class CharFilter:
    def apply(self, text: str) -> str:
        raise NotImplementedError


class RegexpCharFilter(CharFilter):
    """Reference: analysis/char/regexp."""

    def __init__(self, pattern: str, replacement: str = " "):
        self.re = re.compile(pattern)
        self.replacement = replacement

    def apply(self, text: str) -> str:
        return self.re.sub(self.replacement, text)


class HTMLCharFilter(RegexpCharFilter):
    """Strip tags (reference: analysis/char/html)."""

    def __init__(self):
        super().__init__(r"</?[!\w][^>]*>", " ")


@dataclass
class Analyzer:
    name: str
    tokenizer: object
    token_filters: list[TokenFilter] = field(default_factory=list)
    char_filters: list[CharFilter] = field(default_factory=list)

    def analyze_terms(self, text: str) -> list[tuple[str, int]]:
        """Fast path: [(term, 1-based position)] after all filters.

        Positions are assigned by the tokenizer BEFORE drop-filters run,
        so stopword removal leaves gaps — exactly the reference's
        TokenStream behavior.
        """
        if text is None:
            return []
        for cf in self.char_filters:
            text = cf.apply(text)
        terms = self.tokenizer.terms(text)
        pairs = list(zip(terms, range(1, len(terms) + 1)))
        for f in self.token_filters:
            if isinstance(f, StopFilter):
                ss = f.stopset
                pairs = [(t, p) for (t, p) in pairs if t not in ss]
            else:
                # positional metadata is preserved 1:1 for map-style filters
                new_pairs = []
                for t, p in pairs:
                    mapped = f.apply_terms([t])
                    for nt in mapped:
                        new_pairs.append((nt, p))
                pairs = new_pairs
        return pairs

    def analyze(self, text: str) -> list[Token]:
        """Rich path with byte offsets (goldens / highlighting)."""
        if text is None:
            return []
        for cf in self.char_filters:
            text = cf.apply(text)
        tokens = self.tokenizer.tokenize(text)
        for f in self.token_filters:
            tokens = f.apply(tokens)
        return tokens


def _builtin() -> dict[str, Analyzer]:
    lower = LowercaseFilter()
    stop_en = StopFilter(ENGLISH_STOP_WORDS)
    return {
        "standard": Analyzer(
            "standard", UnicodeTokenizer(), [lower, stop_en]
        ),
        "simple": Analyzer("simple", LetterTokenizer(), [lower]),
        "keyword": Analyzer("keyword", SingleTokenTokenizer(), []),
        "web": Analyzer("web", WebTokenizer(), [lower, stop_en]),
        "en": Analyzer(
            "en",
            UnicodeTokenizer(),
            [PossessiveEnFilter(), lower, stop_en, PorterFilter()],
        ),
        "whitespace": Analyzer("whitespace", WhitespaceTokenizer(), [lower]),
    }


REGISTRY: dict[str, Analyzer] = _builtin()


def get_analyzer(name_or_analyzer) -> Analyzer:
    if isinstance(name_or_analyzer, Analyzer):
        return name_or_analyzer
    try:
        return REGISTRY[name_or_analyzer]
    except KeyError:
        raise KeyError(
            f"unknown analyzer {name_or_analyzer!r}; "
            f"registered: {sorted(REGISTRY)}"
        ) from None


def register_analyzer(analyzer: Analyzer) -> None:
    REGISTRY[analyzer.name] = analyzer
