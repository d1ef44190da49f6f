"""Tokenizers.

The workhorse is :class:`UnicodeTokenizer`, a UAX#29-word-boundary
tokenizer with the same observable behavior as the reference's unicode
tokenizer (/root/reference/analysis/tokenizer/unicode/unicode.go:33-100,
which wraps blevesearch/segment, a UAX#29 implementation):

* tokens are the segments whose type is letter/number/ideographic — i.e.
  punctuation/whitespace segments are dropped but still advance offsets;
* positions are 1-based and count EMITTED tokens (the downstream stop
  filter deletes tokens without renumbering, so position gaps survive —
  /root/reference/analysis/type.go:42-62);
* offsets are BYTE offsets into the UTF-8 encoding (Go slices bytes);
* ``steven's`` is one token (UAX#29 WB5-7: MidLetter/MidNumLet/single
  quote join letter runs), ``3.14`` and ``1,000`` are one token (WB11/12),
  ``marker_017`` is one token (underscore is ExtendNumLet, WB13a/b);
* Han and Hiragana ideographs are one token PER CHARACTER, Katakana runs
  stay together (verified against
  /root/reference/analysis/tokenizer/unicode/unicode_test.go:60-110).

Known deliberate divergence (documented): ZWNJ/Extend format chars are
not transparent mid-word; Persian/Indic pipelines should apply the
ZeroWidthNonJoinerCharFilter (analysis/extras.py) — the reference
ships the same char filter for the same reason. The MidLetter /
MidNum / MidNumLet sets carry the full UAX#29 tables.
"""

from __future__ import annotations

import re
from typing import NamedTuple


class Token(NamedTuple):
    term: str
    pos: int  # 1-based position in the token stream
    start: int  # byte offset (UTF-8), inclusive
    end: int  # byte offset (UTF-8), exclusive


# --- UAX#29-style word pattern -------------------------------------------
_AL = r"[^\W\d_]"  # unicode letter
_NU = r"\d"
_ALNUM = r"[\w]"  # letters + digits + underscore (ExtendNumLet)


def _mark_class() -> str:
    """Character class of combining marks (categories Mn/Mc/Me) — the
    UAX#29 Extend set, absorbed into words (WB4) so Indic matras,
    viramas, Arabic harakat etc. don't split tokens. Python's \\w
    excludes them. BMP-only: supplementary-plane marks are vanishingly
    rare in text and would cost a 17× longer import scan."""
    import unicodedata

    ranges = []
    start = prev = None
    for cp in range(0x10000):
        if unicodedata.category(chr(cp)).startswith("M"):
            if start is None:
                start = prev = cp
            elif cp == prev + 1:
                prev = cp
            else:
                ranges.append((start, prev))
                start = prev = cp
    if start is not None:
        ranges.append((start, prev))
    return "[" + "".join(
        re.escape(chr(a)) if a == b
        else re.escape(chr(a)) + "-" + re.escape(chr(b))
        for a, b in ranges
    ) + "]"


_EXT = _mark_class()
# a word "letter" = word char plus any trailing combining marks
_WCH = rf"(?:{_ALNUM}{_EXT}*)"
# MidLetter ∪ MidNumLet ∪ single-quote, valid when followed by a
# letter — full UAX#29 MidLetter table (: · ‧ ״ ﹕ ︓ ： ' ’) plus
# MidNumLet (. ' ‘ ’ ． ＇)
_MID_L = "[:.·‧״﹕︓：'’‘．＇]"
# MidNum ∪ MidNumLet, valid when followed by a digit — MidNum table
# (, ; ； ︐ ︔ ﹐ ﹔ ， ٬ ، ٫ ；) plus MidNumLet
_MID_N = "[.,;'’‘．＇；︐︔﹐﹔，٬،٫]"

_WORD = rf"{_WCH}+(?:(?:{_MID_L}(?={_AL})|{_MID_N}(?={_NU})){_WCH}+)*"

_KATAKANA = r"[ァ-ヺー-ヿㇰ-ㇿｦ-ﾟ]+"
_IDEO_ONE = (
    r"[ぁ-ゖゝ-ゟ"  # hiragana
    r"㐀-䶿一-鿿豈-﫿]"  # han
)

_WORD_RE = re.compile(rf"{_KATAKANA}|{_IDEO_ONE}|{_WORD}", re.UNICODE)

# Web tokenizer: keep URLs / emails / @handles whole, else standard words
# (reference: /root/reference/analysis/tokenizer/web/web.go).
_URL = r"(?:https?|ftp)://[^\s<>\"']+"
_EMAIL = r"[\w.%+-]+@[\w.-]+\.[A-Za-z]{2,}"
_HANDLE = r"@\w+"
_WEB_RE = re.compile(
    rf"{_URL}|{_EMAIL}|{_HANDLE}|{_KATAKANA}|{_IDEO_ONE}|{_WORD}", re.UNICODE
)

_LETTER_RE = re.compile(rf"{_AL}+", re.UNICODE)
_WHITESPACE_RE = re.compile(r"\S+")


def _byte_len(s: str) -> int:
    return len(s.encode("utf-8"))


class _RegexTokenizer:
    """Shared machinery: emit one token per regex match."""

    pattern: re.Pattern

    def __init__(self, pattern: re.Pattern | None = None):
        if pattern is not None:
            self.pattern = pattern

    def terms(self, text: str) -> list[str]:
        """Fast path for index builds: terms only, in order (positions are
        implicit 1..n). Avoids offset bookkeeping."""
        return self.pattern.findall(text)

    def tokenize(self, text: str) -> list[Token]:
        """Rich path (goldens, highlighting): byte offsets + positions."""
        out: list[Token] = []
        pos = 0
        byte_off = 0
        char_off = 0
        for m in self.pattern.finditer(text):
            # advance byte offset from last seen char position
            byte_off += _byte_len(text[char_off : m.start()])
            char_off = m.start()
            term = m.group(0)
            blen = _byte_len(term)
            pos += 1
            out.append(Token(term, pos, byte_off, byte_off + blen))
            byte_off += blen
            char_off = m.end()
        return out


class UnicodeTokenizer(_RegexTokenizer):
    pattern = _WORD_RE


class WebTokenizer(_RegexTokenizer):
    pattern = _WEB_RE


class LetterTokenizer(_RegexTokenizer):
    """Runs of unicode letters (reference: analysis/tokenizer/letter)."""

    pattern = _LETTER_RE


class WhitespaceTokenizer(_RegexTokenizer):
    pattern = _WHITESPACE_RE


class RegexpTokenizer(_RegexTokenizer):
    """User-supplied pattern (reference: analysis/tokenizer/regexp)."""

    def __init__(self, pattern: str):
        super().__init__(re.compile(pattern))


class SingleTokenTokenizer:
    """Whole input = one token (reference: analysis/tokenizer/single)."""

    def terms(self, text: str) -> list[str]:
        return [text] if text else []

    def tokenize(self, text: str) -> list[Token]:
        if not text:
            return []
        return [Token(text, 1, 0, _byte_len(text))]
