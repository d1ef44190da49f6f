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
    BooleanTFFilter,
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
            elif getattr(f, "WHOLE_STREAM", False):
                terms2 = f.apply_terms([t for t, _ in pairs])
                pairs = list(zip(terms2, range(1, len(terms2) + 1)))
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

    def analyze_batch(self, texts: list):
        """Vectorized batch path for segment builds: analyze many docs
        at once, returning flat arrays instead of per-doc lists.

        Returns ``(flens, doc_idx, codes, vocab, pos)`` where ``flens``
        is the post-filter token count per doc (the reference's
        fieldLength, /root/reference/document/field_text.go:82-106),
        ``doc_idx``/``pos`` locate each surviving token (pos is the
        1-based PRE-filter tokenizer position — drop-filters leave
        gaps, /root/reference/analysis/type.go:42-62), ``codes`` are
        int32 ranks into the lexicographically sorted ``vocab``.

        Tokenization is one C-regex pass per doc; filters run
        vectorized over the flat token stream (Arrow utf8_lower /
        is_in); map-filters such as porter run once per UNIQUE term
        via dictionary encoding, not once per token.
        """
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        n = len(texts)
        if any(
            getattr(f, "WHOLE_STREAM", False)
            or getattr(f, "STREAM_WISE", False)
            for f in self.token_filters
        ):
            # stream-wise filters (shingle/unique/hierarchy) need the
            # whole token sequence per doc — generic per-doc path,
            # same flat-array contract
            flens = np.zeros(n, dtype=np.int64)
            di: list[int] = []
            terms_l: list[str] = []
            pos_l: list[int] = []
            for i, t in enumerate(texts):
                pairs = self.analyze_terms(t)
                flens[i] = len(pairs)
                for term, p in pairs:
                    di.append(i)
                    terms_l.append(term)
                    pos_l.append(p)
            enc = pa.array(terms_l, type=pa.string()).dictionary_encode()
            codes_raw = np.asarray(enc.indices, dtype=np.int32)
            vocab_raw = np.asarray(
                enc.dictionary.to_pylist(), dtype=object
            )
            order = np.argsort(vocab_raw, kind="stable")
            rank = np.empty(len(order), dtype=np.int32)
            rank[order] = np.arange(len(order), dtype=np.int32)
            codes = rank[codes_raw] if len(codes_raw) else codes_raw
            return (
                flens,
                np.asarray(di, dtype=np.int32),
                codes,
                vocab_raw[order],
                np.asarray(pos_l, dtype=np.int32),
            )
        tokenize = self.tokenizer.terms
        cfs = self.char_filters
        tok_lists = []
        for t in texts:
            if t is None:
                tok_lists.append(())
                continue
            s = str(t)
            for cf in cfs:
                s = cf.apply(s)
            tok_lists.append(tokenize(s))

        counts = np.fromiter(
            (len(x) for x in tok_lists), dtype=np.int64, count=n
        )
        total = int(counts.sum())
        # int32 throughout: these N-sized arrays dominate the build's
        # memory traffic, and the box saturates bandwidth before cores
        doc_idx = np.repeat(np.arange(n, dtype=np.int32), counts)
        # 1-based position within each doc: arange minus each doc's start
        starts = np.repeat(
            (np.cumsum(counts) - counts).astype(np.int32), counts
        )
        pos = np.arange(total, dtype=np.int32) - starts + 1

        flat: list[str] = []
        for x in tok_lists:
            flat.extend(x)
        arr = pa.array(flat, type=pa.string())

        for f in self.token_filters:
            if isinstance(f, LowercaseFilter):
                arr = pc.utf8_lower(arr)
            elif isinstance(f, StopFilter):
                drop = pc.is_in(
                    arr, value_set=pa.array(sorted(f.stopset))
                )
                keep = pc.invert(drop)
                arr = arr.filter(keep)
                km = np.asarray(keep)
                doc_idx = doc_idx[km]
                pos = pos[km]
            else:
                # term-local filters, applied once per UNIQUE term via
                # dictionary encoding. 1:1 (porter, possessive, …) is
                # a plain take; 1:N (ngram/edge_ngram/camelCase/
                # compound) and droppers (length) expand/contract the
                # stream — mapped tokens inherit the source token's
                # position, exactly like analyze_terms
                enc = arr.dictionary_encode()
                vocab = enc.dictionary.to_pylist()
                mapped = [list(f.apply_terms([u])) for u in vocab]
                lens = np.fromiter(
                    (len(m) for m in mapped), dtype=np.int64,
                    count=len(mapped),
                )
                if len(lens) and (lens == 1).all():
                    arr = pc.take(
                        pa.array([m[0] for m in mapped],
                                 type=pa.string()),
                        enc.indices,
                    )
                else:
                    idxs = np.asarray(enc.indices, dtype=np.int64)
                    reps = (
                        lens[idxs] if len(idxs)
                        else np.array([], dtype=np.int64)
                    )
                    pool = pa.array(
                        [s for m in mapped for s in m],
                        type=pa.string(),
                    )
                    off = np.concatenate(
                        ([0], np.cumsum(lens))
                    ).astype(np.int64)
                    tot = int(reps.sum())
                    intra = np.arange(tot, dtype=np.int64) - np.repeat(
                        np.cumsum(reps) - reps, reps
                    )
                    gather = np.repeat(off[idxs], reps) + intra
                    arr = pc.take(pool, pa.array(gather))
                    doc_idx = np.repeat(doc_idx, reps)
                    pos = np.repeat(pos, reps)

        flens = np.bincount(doc_idx, minlength=n).astype(np.int64)

        enc = arr.dictionary_encode()
        codes_raw = np.asarray(enc.indices, dtype=np.int32)
        vocab_raw = np.asarray(enc.dictionary.to_pylist(), dtype=object)
        order = np.argsort(vocab_raw, kind="stable")
        rank = np.empty(len(order), dtype=np.int32)
        rank[order] = np.arange(len(order), dtype=np.int32)
        codes = rank[codes_raw] if len(codes_raw) else codes_raw
        vocab = vocab_raw[order]
        return flens, doc_idx, codes, vocab, pos


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
        # boolean field encoding: whole value → one "T"/"F" token
        # (/root/reference/document/field_boolean.go)
        "boolean": Analyzer(
            "boolean", SingleTokenTokenizer(), [BooleanTFFilter()]
        ),
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


# language analyzers (es/fr/de/cjk) self-register on import
from bleve_spark.analysis import lang as _lang  # noqa: E402,F401
from bleve_spark.analysis import lang_more as _lang_more  # noqa: E402,F401
