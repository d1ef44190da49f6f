"""Query-string mini-language parser.

Faithful to the reference grammar
(/root/reference/search/query/query_string.y:24-336,
query_string_parser.go:36-80):

* ``+clause`` → must, ``-clause`` → must_not, bare → should (boolean
  query with should min=0);
* ``field:value``; quoted ``"phrase"`` → match_phrase; ``value~N`` →
  match with fuzziness N; ``/regex/`` → regexp query; value containing
  ``*``/``?`` → wildcard query; plain value → match query;
* bare numbers → disjunction(match(str), numeric_range [v,v] both
  inclusive) — the grammar's tNUMBER rule;
* ``field:>N  >=N  <N  <=N`` numeric ranges; with a quoted phrase
  operand → date ranges;
* ``^boost`` suffix on any clause.
"""

from __future__ import annotations

import re

from bleve_spark.search import query as Q

_CLAUSE_RE = re.compile(
    r"""
    (?P<mod>[+-])?
    (?:(?P<field>[\w.]+|"[^"]*"):)?
    (?P<body>
        "(?:[^"\\]|\\.)*"          # quoted phrase
      | /(?:[^/\\]|\\.)*/          # regexp
      | (?:>=|<=|>|<)(?:"[^"]*"|[^\s^]+)   # range op + operand
      | [^\s^]+                    # bare string / number
    )
    (?:\^(?P<boost>[0-9.]+))?
    """,
    re.VERBOSE,
)

_NUM_RE = re.compile(r"^-?\d+(?:\.\d+)?$")


def _is_number(s: str) -> bool:
    return bool(_NUM_RE.match(s))


def _strip_quotes(s: str) -> str:
    if len(s) >= 2 and s[0] == '"' and s[-1] == '"':
        return s[1:-1]
    return s


def _value_query(field: str | None, body: str) -> Q.Query:
    if body.startswith('"') and body.endswith('"') and len(body) >= 2:
        return Q.MatchPhraseQuery(1.0, field, _strip_quotes(body))
    if body.startswith("/") and body.endswith("/") and len(body) >= 2:
        return Q.RegexpQuery(1.0, field, body[1:-1])

    # range operators
    m = re.match(r"^(>=|<=|>|<)(.+)$", body)
    if m:
        op, operand = m.group(1), m.group(2)
        if operand.startswith('"'):
            val = _strip_quotes(operand)
            inc = op in (">=", "<=")
            if op.startswith(">"):
                return Q.DateRangeQuery(
                    1.0, field, start=val, inclusive_start=inc
                )
            return Q.DateRangeQuery(1.0, field, end=val, inclusive_end=inc)
        val = float(operand)
        inc = op in (">=", "<=")
        if op.startswith(">"):
            return Q.NumericRangeQuery(
                1.0, field, min=val, inclusive_min=inc
            )
        return Q.NumericRangeQuery(1.0, field, max=val, inclusive_max=inc)

    # fuzzy suffix term~N
    m = re.match(r"^(.*)~(\d+)$", body)
    if m:
        mq = Q.MatchQuery(1.0, field, m.group(1))
        mq.fuzziness = int(m.group(2))
        return mq

    if _is_number(body):
        v = float(body)
        return Q.DisjunctionQuery(
            1.0,
            field,
            [
                Q.MatchQuery(1.0, field, body),
                Q.NumericRangeQuery(
                    1.0, field, min=v, max=v,
                    inclusive_min=True, inclusive_max=True,
                ),
            ],
            min=0,
        )
    if "*" in body or "?" in body:
        return Q.WildcardQuery(1.0, field, body)
    return Q.MatchQuery(1.0, field, body)


def parse_query_string(s: str) -> Q.Query:
    musts: list[Q.Query] = []
    must_nots: list[Q.Query] = []
    shoulds: list[Q.Query] = []
    for m in _CLAUSE_RE.finditer(s):
        body = m.group("body")
        if not body:
            continue
        field = m.group("field")
        if field:
            field = _strip_quotes(field)
        q = _value_query(field, body)
        if m.group("boost"):
            q.boost = float(m.group("boost"))
        mod = m.group("mod")
        if mod == "+":
            musts.append(q)
        elif mod == "-":
            must_nots.append(q)
        else:
            shoulds.append(q)

    if not (musts or must_nots or shoulds):
        return Q.MatchNoneQuery()
    # single bare should clause with nothing else → the clause itself
    if not musts and not must_nots and len(shoulds) == 1:
        return shoulds[0]
    return Q.BooleanQuery(
        1.0,
        None,
        must=Q.ConjunctionQuery(1.0, None, musts) if musts else None,
        should=(
            Q.DisjunctionQuery(1.0, None, shoulds, min=0)
            if shoulds
            else None
        ),
        must_not=(
            Q.DisjunctionQuery(1.0, None, must_nots, min=0)
            if must_nots
            else None
        ),
    )
