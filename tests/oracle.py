"""Single-process NumPy/pure-Python oracle for rank-identity tests.

An INDEPENDENT implementation of the reference's scoring semantics
(/root/reference/search/scorer/scorer_term.go:142-157 and the composite
scorers) over a pandas corpus. Test strategy mirrors the reference's
cross-engine "versus" oracle (/root/reference/test/versus_score_test.go:31-46):
the Spark engine and this oracle must produce identical top-k IDs and
scores (1e-9 rel) — two codebases, one spec.
"""

from __future__ import annotations

import math
import re

import numpy as np

from bleve_spark.analysis.analyzers import get_analyzer

BM25_K1 = 1.2
BM25_B = 0.75


class PyIndex:
    def __init__(self, rows, key_fn, fields: dict[str, str],
                 scoring: str = "bm25"):
        """rows: iterable of dict-like; key_fn(row) -> hashable sortable key."""
        self.scoring = scoring
        self.fields = fields
        self.rows = list(rows)
        self.keys = [key_fn(r) for r in self.rows]
        order = sorted(range(len(self.rows)), key=lambda i: self.keys[i])
        self.doc_order = {self.keys[i]: rank for rank, i in enumerate(order)}
        # postings[field][term] = {key: (tf, positions, norm32)}
        self.postings: dict[str, dict[str, dict]] = {f: {} for f in fields}
        self.doc_count = len(self.rows)
        for r, key in zip(self.rows, self.keys):
            for f, an in fields.items():
                text = r.get(f)
                if text is None:
                    continue
                pairs = get_analyzer(an).analyze_terms(str(text))
                if not pairs:
                    continue
                norm = float(np.float32(1.0 / math.sqrt(len(pairs))))
                agg: dict[str, list[int]] = {}
                for t, p in pairs:
                    agg.setdefault(t, []).append(p)
                for t, ps in agg.items():
                    self.postings[f].setdefault(t, {})[key] = (
                        len(ps), ps, norm
                    )
        self.field_card = {
            f: len(self.postings[f]) for f in fields
        }
        self.avg_doc_len = {
            f: (math.ceil(c / self.doc_count) if self.doc_count else 0.0)
            for f, c in self.field_card.items()
        }

    # -- scoring -----------------------------------------------------

    def idf(self, field, term_doc_freq):
        if self.scoring == "bm25" and self.avg_doc_len.get(field, 0) > 0:
            n = float(term_doc_freq)
            return math.log(
                1 + (float(self.doc_count) - n + 0.5) / (n + 0.5)
            )
        return 1.0 + math.log(
            float(self.doc_count) / float(term_doc_freq + 1.0)
        )

    def term_scores(self, field, term, boost=1.0, qn=1.0,
                    boost_mult=1.0):
        """-> {key: score}; queryWeight applied when qn != 1."""
        post = self.postings.get(field, {}).get(term, {})
        n = len(post)
        if n == 0:
            return {}
        idf = self.idf(field, n)
        b = boost * boost_mult
        qw = b * idf * qn if qn != 1.0 else 1.0
        avg = self.avg_doc_len.get(field, 0)
        out = {}
        for key, (tf, _ps, norm) in post.items():
            tfv = math.sqrt(float(tf))
            if self.scoring == "bm25" and avg > 0:
                fl = 1.0 / (norm * norm)
                sc = (
                    idf * (tfv * BM25_K1)
                    / (tfv + BM25_K1 * ((1.0 - BM25_B)
                                        + (BM25_B * fl) / avg))
                )
            else:
                sc = tfv * norm * idf
            if qw != 1.0:
                sc = sc * qw
            out[key] = sc
        return out

    def term_weight(self, field, term, boost=1.0, boost_mult=1.0):
        post = self.postings.get(field, {}).get(term, {})
        idf = self.idf(field, len(post)) if post else self.idf(field, 0)
        s = boost * boost_mult * idf
        return s * s

    # -- evaluation of a normalized query dict -----------------------
    # supported: {"type":"term"|"conj"|"disj"|"bool"|"phrase"|"const"...}

    def eval(self, node, qn=1.0):
        t = node["type"]
        if t == "term":
            return self.term_scores(
                node["field"], node["term"], node.get("boost", 1.0), qn,
                node.get("boost_mult", 1.0),
            )
        if t == "conj":
            children = [self.eval(c, qn) for c in node["children"]]
            if not children:
                return {}
            keys = set(children[0])
            for c in children[1:]:
                keys &= set(c)
            return {k: sum(c[k] for c in children) for k in keys}
        if t == "disj":
            children = [self.eval(c, qn) for c in node["children"]]
            total = len(children)
            min_req = max(node.get("min", 0), 1)
            acc: dict = {}
            cnt: dict = {}
            for c in children:
                for k, v in c.items():
                    acc[k] = acc.get(k, 0.0) + v
                    cnt[k] = cnt.get(k, 0) + 1
            return {
                k: acc[k] * cnt[k] / total
                for k in acc
                if cnt[k] >= min_req
            }
        if t == "bool":
            must = node.get("must")
            should = node.get("should")
            m = self.eval(must, qn) if must else None
            s = self.eval(should, qn) if should else None
            if m is not None and s is not None:
                smin = max(should.get("min", 0), 1) if should else 1
                if should.get("min", 0) > 0:
                    res = {
                        k: m[k] + s[k] for k in m if k in s
                    }
                else:
                    res = {
                        k: m[k] + s.get(k, 0.0) for k in m
                    }
            elif m is not None:
                res = dict(m)
            elif s is not None:
                res = dict(s)
            else:
                res = {}
            mn = node.get("must_not")
            if mn:
                excl = set(self.eval(mn, 1.0))
                res = {k: v for k, v in res.items() if k not in excl}
            flt = node.get("filter")
            if flt:
                keep = set(self.eval(flt, 1.0))
                res = {k: v for k, v in res.items() if k in keep}
            return res
        if t == "phrase":
            return self._phrase(node, qn)
        if t == "const":
            keys = node["keys"]
            b = node.get("boost", 1.0)
            sc = b * qn if qn != 1.0 else b
            return {k: sc for k in keys}
        raise ValueError(t)

    def _phrase(self, node, qn):
        field = node["field"]
        slots = node["slots"]  # [(pos, [terms])]
        per_slot = []
        for _, alts in slots:
            merged: dict = {}
            cnt: dict = {}
            posmap: dict = {}
            for t in alts:
                sc = self.term_scores(field, t, node.get("boost", 1.0), qn)
                post = self.postings.get(field, {}).get(t, {})
                for k, v in sc.items():
                    merged[k] = merged.get(k, 0.0) + v
                    cnt[k] = cnt.get(k, 0) + 1
                    posmap.setdefault(k, []).extend(post[k][1])
            total = len(alts)
            if total > 1:
                merged = {
                    k: merged[k] * cnt[k] / total for k in merged
                }
            per_slot.append((merged, posmap))
        keys = set(per_slot[0][0])
        for m, _ in per_slot[1:]:
            keys &= set(m)
        out = {}
        for k in keys:
            chain = set(per_slot[0][1][k])
            ok = bool(chain)
            for i in range(1, len(slots)):
                gap = slots[i][0] - slots[i - 1][0]
                nxt = set(per_slot[i][1][k])
                chain = {p + gap for p in chain} & nxt
                if not chain:
                    ok = False
                    break
            if ok:
                out[k] = sum(m[k] for m, _ in per_slot)
        return out

    def weight(self, node):
        t = node["type"]
        if t == "term":
            return self.term_weight(
                node["field"], node["term"], node.get("boost", 1.0),
                node.get("boost_mult", 1.0),
            )
        if t in ("conj", "disj"):
            return sum(self.weight(c) for c in node["children"])
        if t == "bool":
            w = 0.0
            if node.get("must"):
                w += self.weight(node["must"])
            if node.get("should"):
                w += self.weight(node["should"])
            return w
        if t == "phrase":
            return sum(
                self.term_weight(node["field"], t2, node.get("boost", 1.0))
                for _, alts in node["slots"]
                for t2 in alts
            )
        if t == "const":
            b = node.get("boost", 1.0)
            return b * b
        raise ValueError(t)

    def search(self, node, size=10):
        """Top-k [(key, score)] with root queryNorm semantics."""
        qn = 1.0
        if node["type"] in ("conj", "disj", "bool", "phrase"):
            w = self.weight(node)
            qn = 1.0 / math.sqrt(w) if w > 0 else 1.0
        scores = self.eval(node, qn)
        ranked = sorted(
            scores.items(), key=lambda kv: (-kv[1], self.doc_order[kv[0]])
        )
        return ranked[:size]

    # helpers to build nodes -----------------------------------------

    def expand_prefix(self, field, prefix):
        return sorted(
            t for t in self.postings.get(field, {}) if t.startswith(prefix)
        )

    def expand_regexp(self, field, rx):
        pat = re.compile(f"^(?:{rx})$")
        return sorted(
            t for t in self.postings.get(field, {}) if pat.match(t)
        )

    def expand_fuzzy(self, field, term, d, prefix_len=0):
        out = []
        for t in sorted(self.postings.get(field, {})):
            if prefix_len and not t.startswith(term[:prefix_len]):
                continue
            dist = _lev(term, t)
            if dist <= d:
                out.append((t, dist))
        return out


def _lev(a, b):
    if a == b:
        return 0
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i] + [0] * len(b)
        for j, cb in enumerate(b, 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
        prev = cur
    return prev[len(b)]


def term(field, t, boost=1.0, boost_mult=1.0):
    return {"type": "term", "field": field, "term": t, "boost": boost,
            "boost_mult": boost_mult}


def conj(children):
    return {"type": "conj", "children": children}


def disj(children, min=0):
    return {"type": "disj", "children": children, "min": min}
