r"""SimpleQueryParser -> Query AST.

Covers the reference's SimpleQueryParser
(src/Lucene.Net.QueryParser/Simple/SimpleQueryParser.cs:46): the
human-facing grammar whose defining property is that it NEVER throws —
any malformed operator syntax degrades to literal text.

Operators (each maps to the reference's flag):

- whitespace between atoms combines with the DEFAULT operator
  (``default_operator``, "OR" unless set — the reference's
  ``defaultOperator``);
- ``+`` AND, ``|`` OR — left-associative, no precedence between them
  (SimpleQueryParser.cs parses strictly left-to-right, unlike the classic
  parser);
- ``-`` prefix NOT on the next atom;
- ``"..."`` phrase, with ``"..."~N`` slop (NEAR_OPERATOR);
- trailing ``*`` prefix query (PREFIX_OPERATOR);
- ``term~N`` fuzzy (FUZZY_OPERATOR);
- ``( ... )`` grouping (PRECEDENCE_OPERATORS);
- ``\x`` escapes any operator character to a literal.

Never-throw contract (SimpleQueryParser.cs class doc: "this parser is
designed to never throw"): an unterminated quote runs the phrase to end
of input, an unmatched ``)`` is ignored, an unmatched ``(`` groups to end
of input, a dangling operator is dropped. Terms run through the same
analyzer as indexing; a fully-stopworded atom drops its clause
(StopFilter convention). ``-`` acts as NOT only at an atom boundary — a
mid-word hyphen (``first-class``) stays text for the analyzer, a
documented divergence from the reference's character-level scan that
keeps hyphenated words useful.
"""

from __future__ import annotations

import dataclasses
import re

from ..analysis import StandardAnalyzer
from .ast import (
    BooleanClause,
    BooleanQuery,
    FuzzyQuery,
    Occur,
    PhraseQuery,
    PrefixQuery,
    Query,
    TermQuery,
    rewrite,
)

_FUZZY_RX = re.compile(r"^(.*?[^\\])~(\d+)$")


def _unescape(w: str) -> str:
    return re.sub(r"\\(.)", r"\1", w)


class _SimpleParser:
    def __init__(self, s: str, analyzer: StandardAnalyzer, default_op: str):
        self.s = s
        self.analyzer = analyzer
        self.default_op = default_op
        self.pos = 0

    def parse(self, depth: int = 0) -> BooleanQuery:
        clauses: list[BooleanClause] = []
        pending_op: str | None = None  # "AND" | "OR" | None (default)
        negate = False

        def push(q: Query | None):
            nonlocal pending_op, negate
            if q is not None:
                if negate:
                    occur = Occur.MUST_NOT
                elif pending_op == "AND" or (
                    pending_op is None and self.default_op == "AND"
                    and clauses
                ):
                    if clauses and clauses[-1].occur is Occur.SHOULD:
                        clauses[-1] = BooleanClause(
                            clauses[-1].query, Occur.MUST
                        )
                    occur = Occur.MUST
                else:
                    occur = Occur.SHOULD
                clauses.append(BooleanClause(q, occur))
            pending_op = None
            negate = False

        while self.pos < len(self.s):
            c = self.s[self.pos]
            if c.isspace():
                self.pos += 1
            elif c == "+":
                self.pos += 1
                if clauses:  # dangling '+' before any atom: drop
                    pending_op = "AND"
            elif c == "|":
                self.pos += 1
                if clauses:
                    pending_op = "OR"
            elif c == "-":
                self.pos += 1
                negate = True
            elif c == "(":
                self.pos += 1
                sub = self.parse(depth + 1)
                push(sub if sub.clauses else None)
            elif c == ")":
                self.pos += 1
                if depth > 0:
                    return BooleanQuery(tuple(clauses))
                # unmatched ')' at top level: ignored (never-throw)
            elif c == '"':
                self.pos += 1
                end = self.s.find('"', self.pos)
                if end < 0:
                    raw, self.pos = self.s[self.pos:], len(self.s)
                else:
                    raw, self.pos = self.s[self.pos:end], end + 1
                slop = 0
                m = re.match(r"~(\d+)", self.s[self.pos:])
                if m:
                    slop = int(m.group(1))
                    self.pos += m.end()
                push(self._phrase(raw, slop))
            else:
                start = self.pos
                while self.pos < len(self.s):
                    ch = self.s[self.pos]
                    if ch == "\\" and self.pos + 1 < len(self.s):
                        self.pos += 2
                        continue
                    if ch.isspace() or ch in '+|()"':
                        break
                    self.pos += 1
                push(self._atom(self.s[start: self.pos]))

        return BooleanQuery(tuple(clauses))

    def _phrase(self, raw: str, slop: int) -> Query | None:
        terms = self.analyzer.analyze_query(_unescape(raw))
        if not terms:
            return None
        if len(terms) == 1:
            return TermQuery(terms[0])
        return PhraseQuery(tuple(terms), slop)

    def _atom(self, w: str) -> Query | None:
        if not w:
            return None
        m = _FUZZY_RX.match(w)
        if m:
            terms = self.analyzer.analyze_query(_unescape(m.group(1)))
            if not terms:
                return None
            return FuzzyQuery(terms[0], max_edits=min(int(m.group(2)), 2))
        if w.endswith("*") and not w.endswith("\\*") and len(w) > 1:
            return PrefixQuery(_unescape(w[:-1]).lower())
        return self._phrase(w, 0)  # analyzer may split the word


def parse_simple(
    s: str,
    analyzer: StandardAnalyzer | None = None,
    default_operator: str = "OR",
) -> Query:
    """Parse a SimpleQueryParser string -> Query AST (module docstring for
    grammar). Never raises on malformed input; an empty / fully-stopworded
    query returns an empty BooleanQuery."""
    p = _SimpleParser(s, analyzer or StandardAnalyzer(), default_operator)
    q = p.parse()
    # a query of only MUST_NOT clauses matches nothing (BooleanQuery
    # semantics; the reference returns MatchNoDocsQuery for it)
    if q.clauses and all(c.occur is Occur.MUST_NOT for c in q.clauses):
        return BooleanQuery(())
    if not q.clauses:
        return BooleanQuery(())
    return rewrite(q)
