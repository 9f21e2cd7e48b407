r"""Surround query-language parser -> Query AST.

Covers the reference's Surround parser
(src/Lucene.Net.QueryParser/Surround/Parser/QueryParser.jj, lowered
through Surround/Query/DistanceQuery.cs:30 + SrndQuery trees): the
proximity dialect whose distance operators compile straight to the Spans
module —

- ``nW`` / ``W``: ordered within-n (DistanceQuery opDistance=n,
  ordered=true) -> :class:`SpanNearQuery` slop = n-1, in_order=True
  (``W`` alone is adjacency, n=1);
- ``nN`` / ``N``: unordered within-n -> SpanNearQuery slop = n-1,
  in_order=False;
- infix form ``a 3w b`` and prefix form ``3w(a, b, c)`` both accepted,
  operators case-insensitive (the .jj grammar's two productions);
- ``AND`` / ``OR`` / ``NOT`` boolean operators (infix, and prefix
  ``and(a,b)`` / ``or(a,b)``) -> BooleanQuery MUST / SHOULD / MUST_NOT;
- precedence, loosest to tightest: OR < AND < NOT < N < W (the .jj
  grammar's production nesting), parentheses group;
- ``*`` / ``?`` wildcards in terms (SrndPrefixQuery / SrndTruncQuery):
  in a DISTANCE operand they lower to :class:`SpanMultiTermWrapper`
  (dictionary-expanded at search time), standalone to Prefix/Wildcard
  queries;
- ``^boost`` suffix on any operand or parenthesized group;
- inside a distance operator only span-expressible operands are legal:
  terms, wildcards, OR-of-terms (-> alternative tuple / SpanOrQuery
  semantics), and nested distance operators. AND / NOT raise ValueError
  — the reference throws "distance subquery not allowed" for exactly
  these (DistanceQuery.cs DistanceSubQueryNotAllowed).

Divergence (documented): the reference's Surround parser matches raw
terms against an unanalyzed field; this engine has ONE analyzed text
field, so term operands run through the same analyzer as indexing
(the classic-parser convention used by every dialect here). A term that
analyzes to multiple tokens becomes an adjacency SpanNear in distance
position / a PhraseQuery in boolean position; a fully-stopworded term is
unmatchable inside a distance op (the operator can never align all its
clauses) and drops the clause in boolean position (StopFilter
convention).

Max distance is 99 (the .jj token allows 2 digits); 0 raises.
"""

from __future__ import annotations

import dataclasses
import re

from ..analysis import StandardAnalyzer
from .ast import (
    BooleanClause,
    BooleanQuery,
    Occur,
    PhraseQuery,
    PrefixQuery,
    Query,
    SpanMultiTermWrapper,
    SpanNearQuery,
    TermQuery,
    WildcardQuery,
    rewrite,
)

_TOK_RX = re.compile(
    r"""
    \s*(
        (?P<lparen>\()
      | (?P<rparen>\))
      | (?P<comma>,)
      | (?P<word>[^\s(),^]+)
    )(\^(?P<boost>[0-9.]+))?
    """,
    re.VERBOSE,
)

_DIST_RX = re.compile(r"^(\d{0,2})([wn])$", re.IGNORECASE)
_WILD_RX = re.compile(r"[*?]")


class _Tok:
    __slots__ = ("kind", "text", "boost")

    def __init__(self, kind: str, text: str, boost: float):
        self.kind = kind
        self.text = text
        self.boost = boost


def _lex(s: str) -> list[_Tok]:
    out: list[_Tok] = []
    pos = 0
    while pos < len(s):
        m = _TOK_RX.match(s, pos)
        if not m or m.end() == pos:
            break
        pos = m.end()
        boost = float(m.group("boost")) if m.group("boost") else 1.0
        if m.group("lparen"):
            out.append(_Tok("(", "(", boost))
        elif m.group("rparen"):
            out.append(_Tok(")", ")", boost))
        elif m.group("comma"):
            out.append(_Tok(",", ",", boost))
        else:
            w = m.group("word")
            u = w.upper()
            if u in ("AND", "OR", "NOT"):
                out.append(_Tok("bool", u, boost))
            elif _DIST_RX.match(w):
                out.append(_Tok("dist", w, boost))
            else:
                out.append(_Tok("term", w, boost))
    return out


# ----- internal tree: ("or"|"and", [children]) / ("not", a, b) /
# ----- ("dist", n, ordered, [children]) / ("term", word), each + boost
class _Node:
    __slots__ = ("kind", "kids", "n", "ordered", "word", "boost")

    def __init__(self, kind, kids=(), n=1, ordered=True, word="", boost=1.0):
        self.kind = kind
        self.kids = list(kids)
        self.n = n
        self.ordered = ordered
        self.word = word
        self.boost = boost


def _dist_params(text: str) -> tuple[int, bool]:
    m = _DIST_RX.match(text)
    n = int(m.group(1)) if m.group(1) else 1
    if n < 1:
        raise ValueError(f"surround distance operator {text!r}: distance >= 1")
    return n, m.group(2).lower() == "w"


class _SurroundParser:
    def __init__(self, toks: list[_Tok]):
        self.toks = toks
        self.i = 0

    def _peek(self) -> _Tok | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def _eat(self) -> _Tok:
        t = self.toks[self.i]
        self.i += 1
        return t

    # precedence ladder (QueryParser.jj production nesting)
    def parse_or(self) -> _Node:
        kids = [self.parse_and()]
        while (t := self._peek()) and t.kind == "bool" and t.text == "OR":
            self._eat()
            kids.append(self.parse_and())
        return kids[0] if len(kids) == 1 else _Node("or", kids)

    def parse_and(self) -> _Node:
        kids = [self.parse_not()]
        while (t := self._peek()) and t.kind == "bool" and t.text == "AND":
            self._eat()
            kids.append(self.parse_not())
        return kids[0] if len(kids) == 1 else _Node("and", kids)

    def parse_not(self) -> _Node:
        node = self.parse_n()
        while (t := self._peek()) and t.kind == "bool" and t.text == "NOT":
            self._eat()
            node = _Node("not", [node, self.parse_n()])
        return node

    def parse_n(self) -> _Node:
        return self._parse_dist_level(False, self.parse_w)

    def parse_w(self) -> _Node:
        return self._parse_dist_level(True, self.parse_primary)

    def _parse_dist_level(self, want_ordered: bool, below) -> _Node:
        node = below()
        while (t := self._peek()) and t.kind == "dist":
            n, ordered = _dist_params(t.text)
            if ordered != want_ordered:
                break  # the other level consumes it
            self._eat()
            rhs = below()
            if node.kind == "dist" and node.n == n and node.ordered == ordered \
                    and node.boost == 1.0:
                node.kids.append(rhs)  # a 3w b 3w c: one 3-clause operator
            else:
                node = _Node("dist", [node, rhs], n=n, ordered=ordered)
        return node

    def parse_primary(self) -> _Node:
        t = self._peek()
        if t is None:
            raise ValueError("surround query: unexpected end of input")
        if t.kind in ("bool", "dist"):
            # prefix form: OP ( a , b , ... )
            nxt = self.toks[self.i + 1] if self.i + 1 < len(self.toks) else None
            if nxt is not None and nxt.kind == "(":
                self._eat()
                self._eat()  # '('
                kids = [self.parse_or()]
                while (p := self._peek()) and p.kind == ",":
                    self._eat()
                    kids.append(self.parse_or())
                close = self._peek()
                if close is None or close.kind != ")":
                    raise ValueError(
                        f"surround prefix operator {t.text!r}: missing ')'"
                    )
                self._eat()
                node = self._prefix_node(t.text, kids)
                node.boost = close.boost * t.boost
                return node
            if t.kind == "dist":
                # a bare w/n word with no '(' is a plain term (the .jj
                # grammar reserves the operator only in operator position)
                self._eat()
                return _Node("term", word=t.text, boost=t.boost)
            raise ValueError(
                f"surround query: operator {t.text!r} in operand position"
            )
        if t.kind == "(":
            self._eat()
            node = self.parse_or()
            close = self._peek()
            if close is None or close.kind != ")":
                raise ValueError("surround query: missing ')'")
            self._eat()
            if close.boost != 1.0:
                node.boost *= close.boost
            return node
        if t.kind == "term":
            self._eat()
            return _Node("term", word=t.text, boost=t.boost)
        raise ValueError(f"surround query: unexpected token {t.text!r}")

    @staticmethod
    def _prefix_node(op: str, kids: list[_Node]) -> _Node:
        u = op.upper()
        if u == "AND":
            return _Node("and", kids)
        if u == "OR":
            return _Node("or", kids)
        if u == "NOT":
            if len(kids) != 2:
                raise ValueError("surround NOT(a, b) takes exactly 2 operands")
            return _Node("not", kids)
        n, ordered = _dist_params(op)
        if len(kids) < 2:
            raise ValueError(f"surround {op}(...) needs >= 2 operands")
        return _Node("dist", kids, n=n, ordered=ordered)


# --------------------------------------------------------------------------- #
# lowering
# --------------------------------------------------------------------------- #


def _boost(q: Query, b: float) -> Query:
    return q if b == 1.0 else dataclasses.replace(q, boost=q.boost * b)


class _Lowerer:
    def __init__(self, analyzer: StandardAnalyzer):
        self.analyzer = analyzer

    # -- span position (inside a distance operator) --
    def span_clause(self, node: _Node):
        """-> str | tuple[str, ...] | SpanMultiTermWrapper | SpanNearQuery,
        or None when the operand is unmatchable (fully stopworded)."""
        if node.kind == "term":
            if _WILD_RX.search(node.word):
                return SpanMultiTermWrapper(self._wild_query(node.word))
            toks = self.analyzer.analyze_query(node.word)
            if not toks:
                return None
            if len(toks) == 1:
                return toks[0]
            return SpanNearQuery(tuple(toks), 0, True)  # adjacency chain
        if node.kind == "or":
            alts: list[str] = []
            for k in node.kids:
                if k.kind != "term" or _WILD_RX.search(k.word):
                    raise ValueError(
                        "surround: OR inside a distance operator takes "
                        "plain term alternatives"
                    )
                alts.extend(self.analyzer.analyze_query(k.word))
            if not alts:
                return None
            return tuple(dict.fromkeys(alts))
        if node.kind == "dist":
            return self.dist_query(node)
        raise ValueError(
            f"surround: {node.kind.upper()} is not allowed as a distance "
            "subquery (DistanceQuery.cs DistanceSubQueryNotAllowed)"
        )

    def dist_query(self, node: _Node) -> Query | None:
        clauses = []
        for k in node.kids:
            c = self.span_clause(k)
            if c is None:
                return None  # one unmatchable clause -> whole op unmatchable
            clauses.append(c)
        return _boost(
            SpanNearQuery(tuple(clauses), node.n - 1, node.ordered),
            node.boost,
        )

    # -- boolean position --
    def _wild_query(self, w: str) -> Query:
        w = w.lower()
        if w.endswith("*") and len(w) > 1 and not _WILD_RX.search(w[:-1]):
            return PrefixQuery(w[:-1])
        return WildcardQuery(w)

    def query(self, node: _Node) -> Query | None:
        if node.kind == "term":
            if _WILD_RX.search(node.word):
                return _boost(self._wild_query(node.word), node.boost)
            toks = self.analyzer.analyze_query(node.word)
            if not toks:
                return None
            if len(toks) == 1:
                return _boost(TermQuery(toks[0]), node.boost)
            return _boost(PhraseQuery(tuple(toks), 0), node.boost)
        if node.kind == "dist":
            q = self.dist_query(node)
            return None if q is None else q
        if node.kind in ("or", "and"):
            occur = Occur.SHOULD if node.kind == "or" else Occur.MUST
            clauses = []
            for k in node.kids:
                q = self.query(k)
                if q is None:
                    if node.kind == "and":
                        # an unmatchable MUST clause -> empty result
                        return BooleanQuery(())
                    continue
                clauses.append(BooleanClause(q, occur))
            if not clauses and node.kind == "or":
                return None
            return _boost(BooleanQuery(tuple(clauses)), node.boost)
        if node.kind == "not":
            pos = self.query(node.kids[0])
            neg = self.query(node.kids[1])
            if pos is None:
                return None
            if neg is None:  # excluding nothing
                return _boost(pos, node.boost)
            return _boost(
                BooleanQuery((
                    BooleanClause(pos, Occur.MUST),
                    BooleanClause(neg, Occur.MUST_NOT),
                )),
                node.boost,
            )
        raise AssertionError(node.kind)


def parse_surround(s: str, analyzer: StandardAnalyzer | None = None) -> Query:
    """Parse a Surround query string -> Query AST (see module docstring
    for grammar + lowering). An empty / fully-stopworded query returns an
    empty BooleanQuery (matches nothing)."""
    toks = _lex(s)
    if not toks:
        return BooleanQuery(())
    p = _SurroundParser(toks)
    tree = p.parse_or()
    if p.i != len(p.toks):
        left = " ".join(t.text for t in p.toks[p.i: p.i + 3])
        raise ValueError(f"surround query: unparsed trailing input {left!r}")
    q = _Lowerer(analyzer or StandardAnalyzer()).query(tree)
    if q is None:
        return BooleanQuery(())
    return rewrite(q)
