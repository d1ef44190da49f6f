"""Prefix-coded numeric trie terms, bleve-compatible.

The reference indexes every numeric/datetime field value as 16 terms:
the full-precision sortable int64 at shift 0 plus one term per
precision step (DefaultPrecisionStep=4 → shifts 4, 8, …, 60), each a
byte string of [0x20+shift] followed by big-endian 7-bit groups
(/root/reference/numeric/prefix_coded.go:25-60,
/root/reference/document/field_numeric.go:94-116). Values are
float64 → sortable int64 (/root/reference/numeric/float.go:11-17);
datetimes are UnixNano (/root/reference/document/field_datetime.go).

These terms land in the composite ``_all`` field, which is why they
matter even though range queries here compile to native column
predicates: they change ``_all``'s per-doc field LENGTH (norm) and
term cardinality, both observable in scores. All bytes are ≤ 0x7f —
valid single-byte UTF-8, so the terms live in ordinary Spark string
columns and survive parquet round-trips."""

from __future__ import annotations

import numpy as np

PRECISION_STEP = 4  # document/field_numeric.go:23 DefaultPrecisionStep
SHIFT_START = 0x20  # numeric/prefix_coded.go ShiftStartInt64
SHIFTS = tuple(range(0, 64, PRECISION_STEP))  # 0,4,...,60 → 16 terms
_SIGN = np.uint64(0x8000000000000000)


def float64_to_int64(f: float) -> int:
    """numeric/float.go Float64ToInt64: IEEE bits, negatives flipped
    so the int64 order matches the float order."""
    bits = int(np.float64(f).view(np.int64))
    if bits < 0:
        bits ^= 0x7FFFFFFFFFFFFFFF
    return bits


def int64_to_prefix_coded(v: int, shift: int) -> str:
    """One prefix-coded term (prefix_coded.go:29-58) as an ASCII-safe
    str."""
    n_chars = ((63 - shift) // 7) + 1
    out = bytearray(n_chars + 1)
    out[0] = SHIFT_START + shift
    sortable = (v & 0xFFFFFFFFFFFFFFFF) ^ 0x8000000000000000
    sortable >>= shift
    for i in range(n_chars, 0, -1):
        out[i] = sortable & 0x7F
        sortable >>= 7
    return out.decode("ascii")


def trie_terms_int64(v: int) -> list[str]:
    """All 16 terms for one sortable int64 (field_numeric.go:94-113:
    shift 0 full-precision token + shifts 4..60)."""
    return [int64_to_prefix_coded(v, s) for s in SHIFTS]


def trie_terms_batch(values: np.ndarray) -> tuple:
    """Vectorized: int64 values (n,) → (doc_idx (16·u,), terms list)
    where terms are generated for UNIQUE values and doc_idx maps each
    emitted term row back to its input row. Returns
    (row_idx, terms) both of length 16·n, ordered per row."""
    values = np.asarray(values, dtype=np.int64)
    n = len(values)
    if n == 0:
        return np.empty(0, dtype=np.int64), []
    uniq, inv = np.unique(values, return_inverse=True)
    per_uniq = [trie_terms_int64(int(v)) for v in uniq]
    terms: list = []
    for i in range(n):
        terms.extend(per_uniq[inv[i]])
    row_idx = np.repeat(np.arange(n, dtype=np.int64), len(SHIFTS))
    return row_idx, terms


def doubles_to_sortable(values: np.ndarray) -> np.ndarray:
    """Vectorized Float64ToInt64."""
    bits = np.asarray(values, dtype=np.float64).view(np.int64).copy()
    neg = bits < 0
    bits[neg] ^= 0x7FFFFFFFFFFFFFFF
    return bits
