"""Stempel — the Egothor statistical stemmer used by the reference for
Polish (analysis/lang/pl/stempel/*; blevesearch/stempel, itself a port
of Lucene's stempel).  The stemmer is a trained MULTI-TRIE of patch
commands: walking the (reversed) word through each trie yields a diff
program (`-a`, `Rx`, `Dx`, `Ix` pairs) applied right-to-left to the
word (diff.go).  The trained table `stemmer_20000.tbl` is Lucene's
Apache-2.0 artifact (data, not code), bundled verbatim under
``data/`` — it is read with Java DataInput semantics
(big-endian ints, 2-byte chars, modified UTF-8 strings).

Reference semantics restated from trie.go / multi_trie.go / diff.go /
strenum.go / stemmer_pl.go (file:line cited per function).
"""

from __future__ import annotations

import gzip
import os
import struct

_DATA = os.path.join(os.path.dirname(__file__), "data")
_DEFAULT_TBL = os.path.join(_DATA, "stemmer_20000.tbl")


class _JavaDataReader:
    """Java DataInput: readBoolean / readInt / readChar / readUTF
    (modified UTF-8) over big-endian bytes."""

    def __init__(self, data: bytes):
        self._b = data
        self._i = 0

    def read_bool(self) -> bool:
        v = self._b[self._i]
        self._i += 1
        return v != 0

    def read_int32(self) -> int:
        v = struct.unpack_from(">i", self._b, self._i)[0]
        self._i += 4
        return v

    def read_char(self) -> str:
        v = struct.unpack_from(">H", self._b, self._i)[0]
        self._i += 2
        return chr(v)

    def read_utf(self) -> str:
        n = struct.unpack_from(">H", self._b, self._i)[0]
        self._i += 2
        b = self._b[self._i: self._i + n]
        self._i += n
        units = []
        i = 0
        while i < n:
            a = b[i]
            if a & 0x80 == 0:
                units.append(a)
                i += 1
            elif a & 0xE0 == 0xC0:
                units.append(((a & 0x1F) << 6) | (b[i + 1] & 0x3F))
                i += 2
            elif a & 0xF0 == 0xE0:
                units.append(
                    ((a & 0x0F) << 12)
                    | ((b[i + 1] & 0x3F) << 6)
                    | (b[i + 2] & 0x3F)
                )
                i += 3
            else:
                raise ValueError("bad modified-UTF8 byte")
        # combine surrogate pairs (Java chars are UTF-16 code units)
        out = []
        j = 0
        while j < len(units):
            u = units[j]
            if 0xD800 <= u <= 0xDBFF and j + 1 < len(units) \
                    and 0xDC00 <= units[j + 1] <= 0xDFFF:
                out.append(chr(0x10000 + ((u - 0xD800) << 10)
                               + (units[j + 1] - 0xDC00)))
                j += 2
            else:
                out.append(chr(u))
                j += 1
        return "".join(out)


class _Trie:
    """trie.go:12-100 — rows of char → (cmd index, next-row ref);
    the walk notes the last command seen on the path."""

    def __init__(self, r: _JavaDataReader):
        self.forward = r.read_bool()
        self.root = r.read_int32()
        self.cmds = [r.read_utf() for _ in range(r.read_int32())]
        self.rows = []
        for _ in range(r.read_int32()):
            cells = {}
            for _ in range(r.read_int32()):
                ch = r.read_char()
                cmd = r.read_int32()
                r.read_int32()              # cnt (unused)
                ref = r.read_int32()
                r.read_int32()              # skip (unused)
                cells[ch] = (cmd, ref)
            self.rows.append(cells)

    def get_last_on_path(self, key: str) -> str:
        """trie.go GetLastOnPath: walk key (reversed when backward),
        remembering the most recent command."""
        now = self.rows[self.root] if 0 <= self.root < len(self.rows) \
            else None
        last = ""
        seq = key if self.forward else key[::-1]
        if now is None or not seq:
            return last
        for i in range(len(key) - 1):
            ch = seq[i]
            c = now.get(ch)
            if c is not None and c[0] >= 0:
                last = self.cmds[c[0]]
            if c is not None and c[1] >= 0:
                nxt = c[1]
                if 0 <= nxt < len(self.rows):
                    now = self.rows[nxt]
                else:
                    return last
            else:
                return last
        c = now.get(seq[len(key) - 1])
        if c is not None and c[0] >= 0:
            return self.cmds[c[0]]
        return last


def _length_pp(cmd: str) -> int:
    """multi_trie.go lengthPP — how many key chars a patch consumes."""
    rv = 0
    i = 0
    while i < len(cmd):
        c = cmd[i]
        if c in ("-", "D"):
            i += 1
            rv += ord(cmd[i]) - ord("a") + 1
        elif c == "R":
            i += 1
            rv += 1
        # 'I' consumes nothing
        i += 1
    return rv


class _MultiTrie:
    """multi_trie.go:36-96 — each sub-trie contributes a command
    fragment; '-' fragments skip consumed key chars before the next
    trie sees the key."""

    EOM = "*"

    def __init__(self, r: _JavaDataReader):
        self.forward = r.read_bool()
        self.by = r.read_int32()
        self.tries = [_Trie(r) for _ in range(r.read_int32())]

    def _skip(self, key: str, count: int) -> str | None:
        if count > len(key):
            return None
        return key[count:] if self.forward else key[: len(key) - count]

    def get_last_on_path(self, key: str) -> str:
        rv = ""
        last_key = key
        prev = None
        last_r = " "
        for t in self.tries:
            r = t.get_last_on_path(last_key)
            if not r or (len(r) == 1 and r[0] == self.EOM):
                return rv
            # cannotFollow: '-' or 'D' cannot repeat back-to-back
            if last_r in ("-", "D") and last_r == r[0]:
                return rv
            last_r = r[-2]
            if r[0] == "-":
                if prev is not None:
                    key2 = self._skip(key, _length_pp(prev))
                    if key2 is None:
                        return rv
                    key = key2
                key2 = self._skip(key, _length_pp(r))
                if key2 is None:
                    return rv
                key = key2
            prev = r
            rv += r
            if key:
                last_key = key
        return rv


def diff_apply(dest: str, diff: str) -> str:
    """diff.go Diff — apply (cmd, param) pairs right-to-left."""
    if not diff:
        return dest
    chars = list(dest)
    pos = len(chars) - 1
    if pos < 0:
        return dest
    for i in range(len(diff) // 2):
        cmd = diff[2 * i]
        param = diff[2 * i + 1]
        par_num = ord(param) - ord("a") + 1
        if cmd == "-":
            pos = pos - par_num + 1
        elif cmd == "R":
            if pos < 0 or pos >= len(chars):
                return "".join(chars)
            chars[pos] = param
        elif cmd == "D":
            o = pos
            pos -= par_num - 1
            if pos < 0 or pos >= len(chars):
                return "".join(chars)
            del chars[pos: o + 1]
        elif cmd == "I":
            pos += 1
            if pos < 0 or pos > len(chars):
                return "".join(chars)
            chars.insert(pos, param)
        pos -= 1
    return "".join(chars)


_TRIE = None


def load_trie(path: str = _DEFAULT_TBL):
    """file.go buildTrieFromReader: a leading UTF string names the
    method; containing 'M' selects the multi-trie."""
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rb") as f:
        r = _JavaDataReader(f.read())
    method = r.read_utf()
    return _MultiTrie(r) if "M" in method else _Trie(r)


def stem_pl(term: str) -> str:
    """stemmer_pl.go Filter: trie walk → diff program → patched term.
    (Lucene additionally guards len>=3 and non-empty result in its
    TokenFilter; the reference's filter applies the diff unguarded —
    match the reference.)"""
    global _TRIE
    if _TRIE is None:
        _TRIE = load_trie()
    diff = _TRIE.get_last_on_path(term)
    return diff_apply(term, diff)
