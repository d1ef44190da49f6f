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


def varint_encode_with_ends(
    values: np.ndarray,
) -> tuple[bytes, np.ndarray]:
    """LEB128-encode a uint64 array; also return the cumulative byte
    END offset of every value (``ends[i]`` = bytes written after value
    i) so callers can slice sub-ranges of the stream without
    re-encoding — the segment builder encodes a whole field's postings
    in ONE call and cuts per-chunk blobs out of the result."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b"", np.empty(0, dtype=np.int64)

    big_idx = np.flatnonzero(v >= np.uint64(128))
    if big_idx.size == 0:
        # all 1-byte (the common case for delta streams): zero-copy-ish
        out = v.astype(np.uint8)
        return out.tobytes(), np.arange(1, v.size + 1, dtype=np.int64)

    # byte length per value — computed only for the multi-byte subset
    # (bit_length via log2 would lose precision at 2^53; loop over the
    # ≤10 byte positions instead, vectorized across the subset)
    bv = v[big_idx]
    bl = np.ones(bv.shape, dtype=np.int64)
    tmp = bv >> np.uint64(7)
    while tmp.any():
        bl += (tmp > 0).astype(np.int64)
        tmp >>= np.uint64(7)

    lengths = np.ones(v.shape, dtype=np.int64)
    lengths[big_idx] = bl
    ends = np.cumsum(lengths)
    starts = ends - lengths
    total = int(ends[-1])
    out = np.empty(total, dtype=np.uint8)
    # byte 0 of EVERY value in one sequential scatter
    b0 = (v & np.uint64(0x7F)).astype(np.uint8)
    b0[big_idx] |= np.uint8(0x80)
    out[starts] = b0
    # remaining bytes only for the multi-byte subset
    bstarts = starts[big_idx]
    maxlen = int(bl.max())
    for b in range(1, maxlen):
        sel = bl > b
        idx = bstarts[sel] + b
        chunk = (bv[sel] >> np.uint64(7 * b)) & np.uint64(0x7F)
        cont = (bl[sel] > b + 1).astype(np.uint8) << 7
        out[idx] = chunk.astype(np.uint8) | cont
    return out.tobytes(), ends


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-encode a uint64 array."""
    return varint_encode_with_ends(values)[0]


def varint_decode(buf) -> np.ndarray:
    """Decode LEB128 bytes → uint64 array. Accepts ``bytes`` or a
    uint8 ndarray view (LEB128 streams concatenate cleanly, so a
    batch decoder can pass one zero-copy view over many blobs)."""
    if isinstance(buf, np.ndarray):
        if buf.size == 0:
            return np.empty(0, dtype=np.uint64)
        raw = buf
        return _varint_decode_raw(raw)
    if not buf:
        return np.empty(0, dtype=np.uint64)
    raw = np.frombuffer(buf, dtype=np.uint8)
    return _varint_decode_raw(raw)


def _varint_decode_raw(raw: np.ndarray) -> np.ndarray:
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
