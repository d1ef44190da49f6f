"""Deterministic synthetic multi-turn transcript corpus.

Schema per BASELINE.json ``input_hint``:
``conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
ts:timestamp``.

Every row is a pure function of ``(seed, conv index, turn index)`` —
generation is distributed with ``mapInPandas`` over a range of conv
indices, and the output is byte-identical no matter how the range is
partitioned (the FIXTURES.md per-turn-text-equality invariant). The same
row function backs :func:`transcripts_pandas`, which the single-process
NumPy oracle uses, so engine and oracle see the same corpus by
construction.

Content knobs (FIXTURES.md §1): Zipfian vocabulary, rare
``marker_000..marker_099`` terms for exact-hit tests, mixed case,
punctuation, apostrophes, numbers, CJK to exercise UAX#29 + lowercase
parity, and a skewed ``tool`` column (80% of mass on two names) to
exercise skew-aware merging.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

SEED = 42
_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)

# ---------------------------------------------------------------- vocab --
_COMMON = (
    "the quick brown fox jumps over lazy dogs and runs with a small cat "
    "user wants to search for data in spark index query term match score "
    "please run this tool on that file then check the output for errors "
    "model answers question about code test build merge join filter sort "
    "agent calls function returns result status done error retry timeout "
    "can't fox's o'clock don't it's 3.14 1,000 v2 x86 int64 utf8 "
    "東京 日本 カタカナ 検索 assistant response context token stream"
).split()

_TOOLS16 = [
    "grep", "bash", "read", "write", "edit", "glob", "search", "fetch",
    "run", "test", "lint", "diff", "patch", "list", "view", "exec",
]


def _build_vocab(size: int = 5000) -> list[str]:
    vocab = list(_COMMON)
    i = 0
    while len(vocab) < size:
        vocab.append(f"w{i:04d}")
        i += 1
    return vocab


VOCAB = _build_vocab()
_V = len(VOCAB)
_VOCAB_ARR = np.array(VOCAB, dtype=object)


def _mix(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — cheap, high-quality, vectorized."""
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & _MASK
    x = ((x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & _MASK
    x = ((x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & _MASK
    return x ^ (x >> np.uint64(31))


def _h(*parts: np.ndarray | int) -> np.ndarray:
    acc = np.uint64(SEED)
    for p in parts:
        p = np.asarray(p, dtype=np.uint64)
        acc = _mix((acc * np.uint64(1000003) + p) & _MASK)
    return acc


def _uniform(h: np.ndarray) -> np.ndarray:
    return (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def turns_per_conv(conv_idx: np.ndarray) -> np.ndarray:
    return 1 + (_h(conv_idx, 7) % np.uint64(32)).astype(np.int64)


_ROLES = np.array(["user", "assistant", "system", "tool"], dtype=object)
_EPOCH_2026 = np.datetime64("2026-01-01T00:00:00")


def _gen_conv_rows(conv_idx: np.ndarray) -> pd.DataFrame:
    """All turns for the given conv indices (pure function of index)."""
    nturns = turns_per_conv(conv_idx)
    c = np.repeat(conv_idx, nturns)
    t = np.concatenate([np.arange(n) for n in nturns]) if len(c) else (
        np.empty(0, dtype=np.int64)
    )

    n = len(c)
    conv_id = np.array([f"conv{int(i):08d}" for i in c], dtype=object)

    role = _ROLES[(t + (_h(c, 11) % np.uint64(4)).astype(np.int64)) % 4]

    # tool column: 60% null; of the rest, 80% mass on two names (skew)
    htool = _h(c, t, 13)
    u = _uniform(htool)
    tool = np.where(
        u < 0.6,
        None,
        np.where(
            u < 0.6 + 0.4 * 0.8,
            np.where(u < 0.6 + 0.4 * 0.4, "grep", "bash"),
            np.array(_TOOLS16, dtype=object)[
                (htool % np.uint64(16)).astype(np.int64)
            ],
        ),
    )

    ts = (
        _EPOCH_2026
        + (_h(c, 17) % np.uint64(1000)).astype("timedelta64[h]")
        + (t * 30).astype("timedelta64[s]")
    )

    # ---- text ----
    nwords = (5 + (_h(c, t, 19) % np.uint64(40)).astype(np.int64))
    total = int(nwords.sum())
    row_of_word = np.repeat(np.arange(n), nwords)
    j = np.concatenate([np.arange(k) for k in nwords]) if n else (
        np.empty(0, dtype=np.int64)
    )
    hw = _h(c[row_of_word], t[row_of_word], j, 23)
    # Zipf-ish: u^3 concentrates mass on low vocab indices
    widx = np.minimum(
        (_uniform(hw) ** 3 * _V).astype(np.int64), _V - 1
    )
    words = _VOCAB_ARR[widx]

    # stylistic variation, deterministic: capitalize some, punctuate some
    style = hw % np.uint64(100)
    texts: list[str] = []
    wpos = 0
    for i in range(n):
        k = int(nwords[i])
        ws = words[wpos : wpos + k].tolist()
        st = style[wpos : wpos + k]
        for q in range(k):
            s = int(st[q])
            if s < 6:
                ws[q] = ws[q].capitalize()
            elif s < 9:
                ws[q] = ws[q] + ","
            elif s < 12:
                ws[q] = ws[q] + "."
        # rare marker terms for exact-hit tests
        if (int(c[i]) * 31 + int(t[i])) % 37 == 3:
            ws.append(f"marker_{(int(c[i]) + int(t[i])) % 100:03d}")
        texts.append(" ".join(ws))
        wpos += k

    return pd.DataFrame(
        {
            "conv_id": conv_id,
            "turn_idx": t.astype(np.int32),
            "role": role,
            "text": np.array(texts, dtype=object),
            "tool": tool,
            "ts": pd.Series(ts),
        }
    )


TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


def transcripts_pandas(n_convs: int) -> pd.DataFrame:
    """Single-process corpus for the NumPy oracle and unit tests."""
    return _gen_conv_rows(np.arange(n_convs, dtype=np.int64))


def transcripts_df(spark, n_convs: int, parts: int | None = None):
    """Distributed corpus: one task generates a contiguous conv range.

    Partition-count independent: rows depend only on conv index.
    """
    rng = spark.range(n_convs)
    if parts:
        rng = rng.repartition(parts)

    def gen(batches):
        for pdf in batches:
            if len(pdf):
                yield _gen_conv_rows(pdf["id"].values.astype(np.int64))

    return rng.mapInPandas(gen, schema=TRANSCRIPT_SCHEMA)
