"""Highlighting — post-top-k, driver-sized (k rows only).

Reference: simple fragmenter with 200-byte windows
(/root/reference/search/highlight/fragmenter/simple/simple.go:26),
simple highlighter picking best fragments by term-location score
(/root/reference/search/highlight/highlighter/simple/highlighter_simple.go:77),
HTML formatter wrapping matches in <mark>.

Because only the final k hits are highlighted, this runs driver-side
over collected rows — exactly how the reference defers highlighting to
the end (index_impl.go:996-1011)."""

from __future__ import annotations

from bleve_spark.analysis.analyzers import get_analyzer
from bleve_spark.index.build import IndexedTable
from bleve_spark.search import query as Q

FRAGMENT_SIZE = 200


def _query_terms(idx: IndexedTable, q: Q.Query, field: str) -> set[str]:
    """Collect leaf terms targeting ``field`` (best-effort walk)."""
    terms: set[str] = set()

    def walk(node):
        if node is None:
            return
        if isinstance(node, Q.TermQuery):
            terms.add(node.term)
        elif isinstance(node, Q.MatchQuery):
            a = get_analyzer(
                node.analyzer or idx.field_analyzers.get(field, "standard")
            )
            terms.update(t for t, _ in a.analyze_terms(node.match))
        elif isinstance(node, (Q.MatchPhraseQuery,)):
            a = get_analyzer(
                node.analyzer or idx.field_analyzers.get(field, "standard")
            )
            terms.update(t for t, _ in a.analyze_terms(node.match_phrase))
        elif isinstance(node, Q.PhraseQuery):
            terms.update(node.terms)
        elif isinstance(node, Q.MultiPhraseQuery):
            for alts in node.terms:
                terms.update(alts)
        elif isinstance(node, Q.BooleanQuery):
            walk(node.must)
            walk(node.should)
        elif isinstance(node, Q.ConjunctionQuery):
            for c in node.conjuncts:
                walk(c)
        elif isinstance(node, Q.DisjunctionQuery):
            for c in node.disjuncts:
                walk(c)

    walk(q)
    return terms


# formatter presets (reference: search/highlight/format/{html,ansi})
FORMATTERS = {
    "html": ("<mark>", "</mark>"),
    "ansi": ("\x1b[43m", "\x1b[0m"),  # bg_yellow ... reset
    # search/highlight/format registered names: "plain" emits the
    # fragment with no markup; "simple" is the default highlighter
    # (simple fragmenter + html formatter)
    "plain": ("", ""),
    "simple": ("<mark>", "</mark>"),
}


def highlight_text(
    text: str,
    terms: set[str],
    analyzer_name: str = "standard",
    pre: str = "<mark>",
    post: str = "</mark>",
    max_fragments: int = 1,
    formatter: str | None = None,
) -> list[str]:
    """Best fragments of ≤200 bytes with matched terms wrapped."""
    if formatter is not None:
        pre, post = FORMATTERS[formatter]
    analyzer = get_analyzer(analyzer_name)
    toks = [t for t in analyzer.analyze(text) if t.term in terms]
    if not toks:
        return []
    raw = text.encode("utf-8")
    # fragments anchored at each match, scored by #matches inside
    frags = []
    for anchor in toks:
        start = max(0, anchor.start - FRAGMENT_SIZE // 2)
        end = min(len(raw), start + FRAGMENT_SIZE)
        inside = [t for t in toks if t.start >= start and t.end <= end]
        frags.append((len(inside), start, end, inside))
    frags.sort(key=lambda f: (-f[0], f[1]))
    out = []
    used: list[tuple[int, int]] = []
    for _, start, end, inside in frags:
        if any(not (end <= s or start >= e) for s, e in used):
            continue
        piece = raw[start:end]
        # splice highlights back-to-front
        for t in sorted(inside, key=lambda t: -t.start):
            s, e = t.start - start, t.end - start
            piece = piece[:s] + pre.encode() + piece[s:e] + post.encode() + piece[e:]
        out.append(piece.decode("utf-8", errors="ignore"))
        used.append((start, end))
        if len(out) >= max_fragments:
            break
    return out


def highlight_hits(
    idx: IndexedTable, q: Q.Query | dict, hits: list[dict], field: str
) -> list[dict]:
    if isinstance(q, dict):
        q = Q.parse_query(q)
    terms = _query_terms(idx, q, field)
    if not terms:
        return hits
    from bleve_spark.index.build import qcol

    ids = [h["id"] for h in hits]
    rows = (
        idx.source.where(idx.doc_id_col().isin(ids))
        .select(idx.doc_id_col().alias("_id"), qcol(field).alias("_v"))
        .collect()
    )
    text_by_id = {r["_id"]: r["_v"] for r in rows}
    analyzer_name = idx.field_analyzers.get(field, "standard")
    for h in hits:
        text = text_by_id.get(h["id"])
        if isinstance(text, str) and text:
            frags = highlight_text(text, terms, analyzer_name)
            if frags:
                h.setdefault("fragments", {})[field] = frags
    return hits
