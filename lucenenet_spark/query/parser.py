"""Minimal query-string parser -> Query AST.

Covers the subset of the reference's classic QueryParser grammar
(src/Lucene.Net.QueryParser/Classic/QueryParserBase.cs:188) needed by the
reference-style query sets: bare terms, AND/OR/NOT, +/- prefixes, quoted
phrases (with ~slop), trailing-* prefix terms, term~N fuzzy, [a TO b] ranges,
and ^boost. Terms pass through the same analyzer as indexing.
"""

from __future__ import annotations

import re

from ..analysis import StandardAnalyzer
from .ast import (
    BooleanClause,
    BooleanQuery,
    FuzzyQuery,
    MultiPhraseQuery,
    Occur,
    PhraseQuery,
    PrefixQuery,
    Query,
    TermQuery,
    TermRangeQuery,
    rewrite,
)

_TOKEN_RX = re.compile(
    r"""
    \s*(
        "(?P<phrase>[^"]*)"(~(?P<slop>\d+))?
      | \[(?P<lo>\S+)\s+TO\s+(?P<hi>\S+)\]
      | (?P<op>AND|OR|NOT)
      | (?P<mod>[+-])
      | (?P<word>[^\s^~]+)(~(?P<edits>\d+)?)?
    )(\^(?P<boost>[0-9.]+))?
    """,
    re.VERBOSE,
)


def parse_query(
    s: str, analyzer: StandardAnalyzer | None = None, default_operator: str = "OR"
) -> Query:
    analyzer = analyzer or StandardAnalyzer()
    pos = 0
    clauses: list[BooleanClause] = []
    pending_occur: Occur | None = None
    pending_op: str | None = None

    def push(q: Query):
        nonlocal pending_occur, pending_op
        occur = pending_occur
        if occur is None:
            if pending_op == "AND" and clauses:
                # retroactively promote the previous clause to MUST
                prev = clauses[-1]
                if prev.occur is Occur.SHOULD:
                    clauses[-1] = BooleanClause(prev.query, Occur.MUST)
                occur = Occur.MUST
            elif default_operator == "AND":
                occur = Occur.MUST
            else:
                occur = Occur.SHOULD
        clauses.append(BooleanClause(q, occur))
        pending_occur = None
        pending_op = None

    while pos < len(s):
        m = _TOKEN_RX.match(s, pos)
        if not m or m.end() == pos:
            break
        pos = m.end()
        boost = float(m.group("boost")) if m.group("boost") else 1.0
        if m.group("phrase") is not None:
            raw = m.group("phrase")
            slop = int(m.group("slop") or 0)
            if "|" in raw:
                # MultiPhraseQuery alternatives (MultiPhraseQuery.cs:72):
                # "app|application store" — '|' separates per-slot terms
                slots = []
                for word in raw.split():
                    alts = []
                    for alt in word.split("|"):
                        alts.extend(analyzer.analyze_query(alt))
                    if alts:
                        slots.append(tuple(dict.fromkeys(alts)))
                if len(slots) == 1 and len(slots[0]) == 1:
                    push(TermQuery(slots[0][0], boost))
                elif slots:
                    push(MultiPhraseQuery(tuple(slots), slop, boost))
            else:
                terms = analyzer.analyze_query(raw)
                if len(terms) == 1:
                    push(TermQuery(terms[0], boost))
                elif terms:
                    push(PhraseQuery(tuple(terms), slop, boost))
        elif m.group("lo") is not None:
            lo = None if m.group("lo") == "*" else m.group("lo").lower()
            hi = None if m.group("hi") == "*" else m.group("hi").lower()
            push(TermRangeQuery(lo, hi, boost=boost))
        elif m.group("op"):
            op = m.group("op")
            if op == "NOT":
                pending_occur = Occur.MUST_NOT
            else:
                pending_op = op
        elif m.group("mod"):
            pending_occur = Occur.MUST if m.group("mod") == "+" else Occur.MUST_NOT
        elif m.group("word") is not None:
            w = m.group("word")
            # field-qualified clause (QueryParserBase.cs:188 grammar):
            # "lang:en", "lang:e*". Non-text fields are keyword fields
            # (StringField) — the value is NOT analyzed (exact match),
            # matching the reference's per-field analyzer convention.
            fm = re.match(r"^([A-Za-z_][A-Za-z0-9_]*):(.+)$", w)
            if fm and fm.group(1) == "text":
                w = fm.group(2)  # explicit default field: analyze as usual
                fm = None
            if fm:
                fld, rest = fm.group(1), fm.group(2)
                if rest.endswith("*") and len(rest) > 1:
                    push(PrefixQuery(rest[:-1], boost, field=fld))
                else:
                    push(TermQuery(rest, boost, field=fld))
            elif w.endswith("*") and len(w) > 1:
                push(PrefixQuery(w[:-1].lower(), boost))
            elif m.group("edits") is not None or ("~" in s[m.start(): m.end()] and m.group("word")):
                edits = int(m.group("edits")) if m.group("edits") else 2
                terms = analyzer.analyze_query(w)
                if terms:
                    push(FuzzyQuery(terms[0], max_edits=edits, boost=boost))
            else:
                terms = analyzer.analyze_query(w)
                if len(terms) == 1:
                    push(TermQuery(terms[0], boost))
                elif len(terms) > 1:
                    push(PhraseQuery(tuple(terms), 0, boost))
                # fully-stopworded term: drop clause (StopFilter behavior)

    if not clauses:
        return BooleanQuery(())
    return rewrite(BooleanQuery(tuple(clauses)))
