"""Delta + varint codecs for posting lists (NumPy-vectorized).

The at-rest posting layout mirrors what the reference's zapx segments
store per term — sorted doc ids as deltas, freqs, and position deltas
(/root/reference/index/scorch/README.md:48-97) — encoded as LEB128
varints. Encode/decode are vectorized: no per-byte Python loops; the
encoder emits all bytes with NumPy shifts/masks, the decoder
reconstructs values with cumulative byte-group arithmetic.
"""

from __future__ import annotations

import numpy as np


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-encode a uint64 array."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    # byte length per value: ceil(bits/7), min 1
    nbits = np.zeros(v.shape, dtype=np.int64)
    nz = v > 0
    # bit_length via log2 would lose precision at 2^53; use a loop over
    # the (≤10) byte positions instead — vectorized across values
    lengths = np.ones(v.shape, dtype=np.int64)
    tmp = v >> np.uint64(7)
    while tmp.any():
        lengths += (tmp > 0).astype(np.int64)
        tmp >>= np.uint64(7)
    del nbits, nz

    total = int(lengths.sum())
    out = np.empty(total, dtype=np.uint8)
    ends = np.cumsum(lengths)
    starts = ends - lengths
    maxlen = int(lengths.max())
    for b in range(maxlen):
        mask = lengths > b
        idx = starts[mask] + b
        chunk = (v[mask] >> np.uint64(7 * b)) & np.uint64(0x7F)
        cont = (lengths[mask] > b + 1).astype(np.uint8) << 7
        out[idx] = chunk.astype(np.uint8) | cont
    return out.tobytes()


def varint_decode(buf: bytes) -> np.ndarray:
    """Decode LEB128 bytes → uint64 array."""
    if not buf:
        return np.empty(0, dtype=np.uint64)
    raw = np.frombuffer(buf, dtype=np.uint8)
    cont = (raw & 0x80) > 0
    # value boundaries: a value ends where cont bit is 0
    ends = np.flatnonzero(~cont)
    starts = np.concatenate(([0], ends[:-1] + 1))
    lengths = ends - starts + 1
    payload = (raw & 0x7F).astype(np.uint64)
    out = np.zeros(ends.shape[0], dtype=np.uint64)
    # ≤10 vectorized passes (one per byte position) instead of add.at
    maxlen = int(lengths.max())
    for b in range(maxlen):
        sel = lengths > b
        out[sel] |= payload[starts[sel] + b] << np.uint64(7 * b)
    return out


def delta_encode_sorted(values: np.ndarray) -> bytes:
    """Sorted uint64s → first value + gaps, varint-coded."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    deltas = np.empty_like(v)
    deltas[0] = v[0]
    deltas[1:] = v[1:] - v[:-1]
    return varint_encode(deltas)


def delta_decode_sorted(buf: bytes) -> np.ndarray:
    deltas = varint_decode(buf)
    if deltas.size == 0:
        return deltas
    return np.cumsum(deltas, dtype=np.uint64)


def encode_positions(pos_lists: list[np.ndarray]) -> bytes:
    """Per-doc position lists → [len, delta-positions...] stream."""
    parts = []
    for ps in pos_lists:
        ps = np.asarray(ps, dtype=np.uint64)
        arr = np.empty(ps.size + 1, dtype=np.uint64)
        arr[0] = ps.size
        if ps.size:
            arr[1] = ps[0]
            arr[2:] = ps[1:] - ps[:-1]
        parts.append(arr)
    if not parts:
        return b""
    return varint_encode(np.concatenate(parts))


def decode_positions(buf: bytes, n_docs: int) -> list[np.ndarray]:
    flat = varint_decode(buf)
    out = []
    i = 0
    for _ in range(n_docs):
        ln = int(flat[i])
        i += 1
        deltas = flat[i : i + ln]
        out.append(np.cumsum(deltas, dtype=np.uint64))
        i += ln
    return out
