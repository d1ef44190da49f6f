"""Score explanation trees — the reference's Explain mode.

Parity targets: /root/reference/search/explanation.go (tree of
{value, message, children}) and the term scorer's explanation
construction (/root/reference/search/scorer/scorer_term.go:159-197:
fieldWeight = product of tf × idf × fieldNorm, wrapped in a
queryWeight product when a composite set a queryNorm); composites
explain as "sum of:" / coord products
(scorer_conjunction.go, scorer_disjunction.go:46-83).

Explanations are a debug surface over the FINAL top-k rows only: one
tiny postings lookup for the query's leaf terms × explained docs, then
pure-Python recursion over the compiled searcher tree re-deriving each
node's value with the exact same scalar formulas
(:func:`bleve_spark.search.scorer.term_score_value`) — so the root
explanation value equals the engine's score bit-for-bit.
"""

from __future__ import annotations

import math
from functools import reduce
from operator import and_, or_

from pyspark.sql import functions as F

from bleve_spark.index.build import IndexedTable
from bleve_spark.search import query as Q
from bleve_spark.search.scorer import term_score_value
from bleve_spark.search.searcher import (
    Compiler,
    SBool,
    SConj,
    SConst,
    SDictDisj,
    SDisj,
    SNone,
    SPhrase,
    STerm,
    _COMPOSITE,
    _Ctx,
    _find_phrase_path,
)


def _collect_terms(node, out: list):
    if isinstance(node, STerm):
        out.append(node)
    elif isinstance(node, SPhrase):
        for _, alts in node.slots:
            out.extend(alts)
    elif isinstance(node, SConj):
        for c in node.children:
            _collect_terms(c, out)
    elif isinstance(node, SDisj):
        for c in node.children:
            _collect_terms(c, out)
    elif isinstance(node, SBool):
        for c in (node.must, node.should):
            if c is not None:
                _collect_terms(c, out)


class _Explainer:
    def __init__(self, idx: IndexedTable, node, keys: list[tuple]):
        self.idx = idx
        self.node = node
        self.keys = keys
        self.ctx = _Ctx(idx)
        if isinstance(node, _COMPOSITE):
            w = node.weight(self.ctx)
            self.ctx.qn = 1.0 / math.sqrt(w) if w > 0 else 1.0
        self._docsets: dict[int, set] = {}
        self._lookup = self._fetch_postings()

    # -- one scan for every (leaf term × explained doc) ---------------
    def _fetch_postings(self) -> dict:
        terms: list[STerm] = []
        _collect_terms(self.node, terms)
        if not terms or not self.keys:
            return {}
        kc = self.idx.key_cols
        tpred = reduce(or_, [
            (F.col("field") == t.field) & (F.col("term") == t.term)
            for t in {(t.field, t.term): t for t in terms}.values()
        ])
        kpred = reduce(or_, [
            reduce(and_, [
                F.col(k) == v for k, v in zip(kc, key)
            ])
            for key in self.keys
        ])
        rows = (
            self.idx.prune_postings(tpred).where(kpred)
            .select("field", "term", *kc, "tf", "norm", "positions")
            .collect()
        )
        return {
            (r["field"], r["term"], tuple(r[k] for k in kc)):
                (int(r["tf"]), float(r["norm"]), list(r["positions"]))
            for r in rows
        }

    def _in_docs(self, node, key: tuple) -> bool:
        ds = self._docsets.get(id(node))
        if ds is None:
            kc = self.idx.key_cols
            kpred = reduce(or_, [
                reduce(and_, [F.col(k) == v for k, v in zip(kc, k2)])
                for k2 in self.keys
            ])
            rows = node.docs(self.ctx).where(kpred).collect()
            ds = {tuple(r[k] for k in kc) for r in rows}
            self._docsets[id(node)] = ds
        return key in ds

    # -- per-node explanation ------------------------------------------
    def explain(self, key: tuple) -> dict | None:
        return self._node(self.node, key)

    def _node(self, node, key):
        if node is None or isinstance(node, SNone):
            return None
        if isinstance(node, STerm):
            return self._term(node, key)
        if isinstance(node, SConst):
            return self._const(node, key)
        if isinstance(node, SConj):
            return self._conj(node, key)
        if isinstance(node, SDisj):
            return self._disj(node, key)
        if isinstance(node, SBool):
            return self._bool(node, key)
        if isinstance(node, SPhrase):
            return self._phrase(node, key)
        if isinstance(node, SDictDisj):
            return self._dictdisj(node, key)
        raise NotImplementedError(type(node).__name__)

    def _dict_rows(self, node: "SDictDisj") -> dict:
        """Per explained doc: the dictionary-expanded terms it matches
        (one bounded join: explained-doc postings × expansion)."""
        cached = self._docsets.get(("dict", id(node)))
        if cached is not None:
            return cached
        kc = self.idx.key_cols
        kpred = reduce(or_, [
            reduce(and_, [F.col(k) == v for k, v in zip(kc, key)])
            for key in self.keys
        ])
        rows = (
            self.idx.prune_postings(F.col("field") == node.field)
            .where(kpred)
            .join(node.expansion, "term")
            .select("term", "doc_freq", "mult", *kc, "tf", "norm")
            .collect()
        )
        out: dict = {}
        for r in rows:
            key = tuple(r[k] for k in kc)
            out.setdefault(key, []).append(
                (r["term"], int(r["doc_freq"]), float(r["mult"]),
                 int(r["tf"]), float(r["norm"]))
            )
        self._docsets[("dict", id(node))] = out
        return out

    def _dictdisj(self, node: "SDictDisj", key):
        hits = self._dict_rows(node).get(key)
        if not hits:
            return None
        total, _ = node._agg(self.ctx)
        kids = []
        for term, dfq, mult, tf, norm in sorted(hits):
            t = STerm(node.field, term, node.boost, dfq,
                      boost_multiplier=mult)
            self._lookup[(node.field, term, key)] = (tf, norm, [])
            kids.append(self._term(t, key))
        s = sum(k["value"] for k in kids)
        coord = len(hits) / float(total)
        return {
            "value": s * coord,
            "message": "product of:",
            "children": [
                {"value": s, "message": "sum of:", "children": kids},
                {
                    "value": coord,
                    "message": f"coord({len(hits)}/{total})",
                },
            ],
        }

    def _term(self, node: STerm, key):
        hit = self._lookup.get((node.field, node.term, key))
        if hit is None:
            return None
        tf, norm, _ = hit
        ctx = self.ctx
        idf = node._idf(ctx)
        scoring = ctx.scoring
        avg = (
            self.idx.stats.avg_len(node.field)
            if scoring == "bm25" else 0.0
        )
        qw = node._boost() * idf * ctx.qn if ctx.qn != 1.0 else 1.0
        value = term_score_value(scoring, idf, avg, qw, tf, norm)
        doc_id = ":".join(str(v) for v in key)
        field_weight = {
            # scorer_term.go:159-197 structure
            "value": term_score_value(scoring, idf, avg, 1.0, tf, norm),
            "message": (
                f"fieldWeight({node.field}:{node.term} in {doc_id}), "
                "product of:"
            ),
            "children": [
                {
                    "value": math.sqrt(float(tf)),
                    "message": (
                        f"tf(termFreq({node.field}:{node.term})={tf})"
                    ),
                },
                {
                    "value": idf,
                    "message": (
                        f"idf(docFreq={node.doc_freq}, "
                        f"maxDocs={self.idx.stats.doc_count})"
                    ),
                },
                {
                    "value": norm,
                    "message": (
                        f"fieldNorm(field={node.field}, doc={doc_id})"
                    ),
                },
            ],
        }
        if qw == 1.0:
            return field_weight
        return {
            "value": value,
            "message": (
                f"weight({node.field}:{node.term}^{node._boost()} "
                f"in {doc_id}), product of:"
            ),
            "children": [
                {
                    "value": qw,
                    "message": (
                        f"queryWeight({node.field}:{node.term}), "
                        "product of boost, idf, queryNorm:"
                    ),
                    "children": [
                        {"value": node._boost(), "message": "boost"},
                        {"value": idf, "message": "idf"},
                        {"value": ctx.qn, "message": "queryNorm"},
                    ],
                },
                field_weight,
            ],
        }

    def _const(self, node: SConst, key):
        if not self._in_docs(node, key):
            return None
        value = node.boost * self.ctx.qn \
            if self.ctx.qn != 1.0 else node.boost
        return {
            "value": value,
            "message": f"ConstantScore(boost={node.boost})",
        }

    def _conj(self, node: SConj, key):
        kids = [self._node(c, key) for c in node.children]
        if not kids or any(k is None for k in kids):
            return None
        return {
            "value": sum(k["value"] for k in kids),
            "message": "sum of:",
            "children": kids,
        }

    def _disj(self, node: SDisj, key):
        kids = [self._node(c, key) for c in node.children]
        matched = [k for k in kids if k is not None]
        total = len(node.children)
        if len(matched) < max(int(node.min), 1):
            return None
        s = sum(k["value"] for k in matched)
        coord = len(matched) / float(total)
        return {
            "value": s * coord,
            "message": "product of:",
            "children": [
                {"value": s, "message": "sum of:", "children": matched},
                {
                    "value": coord,
                    "message": f"coord({len(matched)}/{total})",
                },
            ],
        }

    def _bool(self, node: SBool, key):
        if node.must_not is not None and not isinstance(
            node.must_not, SNone
        ) and self._in_docs(node.must_not, key):
            return None
        if node.filter is not None and not self._in_docs(
            node.filter, key
        ):
            return None
        parts = []
        if node.must is not None:
            m = self._node(node.must, key)
            if m is None:
                return None
            parts.append(m)
        if node.should is not None:
            s = self._node(node.should, key)
            if s is None and int(node.should.min) > 0:
                return None
            if s is not None:
                parts.append(s)
        if not parts:
            return None
        return {
            "value": sum(p["value"] for p in parts),
            "message": "sum of:",
            "children": parts,
        }

    def _phrase(self, node: SPhrase, key):
        slot_expls = []
        pos_arrays = []
        for _, alts in node.slots:
            present = [
                (t, self._lookup[(t.field, t.term, key)])
                for t in alts
                if (t.field, t.term, key) in self._lookup
            ]
            if not present:
                return None
            kids = [self._term(t, key) for t, _ in present]
            s = sum(k["value"] for k in kids)
            if len(alts) > 1:
                coord = len(present) / float(len(alts))
                slot_expls.append({
                    "value": s * coord,
                    "message": f"slot coord({len(present)}/{len(alts)})",
                    "children": kids,
                })
            else:
                slot_expls.append(kids[0])
            pos = sorted({p for _, (_, _, ps) in present for p in ps})
            pos_arrays.append(pos)

        gaps = [
            node.slots[i][0] - node.slots[i - 1][0]
            for i in range(1, len(node.slots))
        ]
        if not _find_phrase_path(pos_arrays, gaps, node.slop):
            return None
        return {
            "value": sum(s["value"] for s in slot_expls),
            "message": f"phrase match (slop={node.slop}), sum of:",
            "children": slot_expls,
        }


def explain_hits(
    idx: IndexedTable, q: Q.Query | dict, keys: list[tuple]
) -> list[dict | None]:
    """Explanation tree (or None for non-matches) per key tuple."""
    if isinstance(q, dict):
        q = Q.parse_query(q)
    node = Compiler(idx).resolve(q)
    ex = _Explainer(idx, node, keys)
    return [ex.explain(k) for k in keys]
