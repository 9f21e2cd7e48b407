r"""Query-string parser -> Query AST (recursive descent).

Covers the subset of the reference's classic QueryParser grammar
(src/Lucene.Net.QueryParser/Classic/QueryParserBase.cs:188,
Classic/QueryParser.cs) needed by the reference-style query sets:

- bare terms, AND/OR/NOT, +/- prefixes, ^boost
- quoted phrases (with ~slop) and '|'-alternative multi-phrases
- trailing-* prefix terms, mid-pattern */? wildcards (te?t, te*t ->
  WildcardQuery), term~N fuzzy
- backslash escaping (QueryParserBase.Escape / discardEscapeChar):
  ``\+literal`` parses as a term instead of a MUST modifier, ``te\*t``
  keeps a literal ``*`` through parsing (the ANALYZER then runs as
  always — on the text field it splits on '*' exactly as indexing did;
  keyword-field values stay verbatim, so ``lang:a\*b`` matches a literal
  star). Scope: escapes apply within a word (no escaped whitespace), and
  ``~`` is not escapable mid-word.
- [a TO b] ranges (term ranges on text; NumericRange on any other field —
  the doc-values path, so ``warc_ts:[2020-01-01 TO 2020-06-01]`` compiles
  to a pushed-down timestamp range)
- parentheses grouping: ``(a OR b) AND c`` nests a BooleanQuery clause
- field-qualified clauses: ``lang:en``, ``lang:e*``, ``lang:en~1``,
  ``lang:"north korea"`` (keyword fields take the quoted value as ONE
  unanalyzed term — the StringField contract), ``text:"a b"~2``

Terms pass through the same analyzer as indexing.
"""

from __future__ import annotations

import re

from ..analysis import StandardAnalyzer
from .ast import (
    BooleanClause,
    BooleanQuery,
    FuzzyQuery,
    MultiPhraseQuery,
    NumericRangeQuery,
    Occur,
    PhraseQuery,
    PrefixQuery,
    Query,
    SpanMultiTermWrapper,
    SpanNearQuery,
    TermQuery,
    TermRangeQuery,
    WildcardQuery,
    rewrite,
)

_TOKEN_RX = re.compile(
    r"""
    \s*(
        (?P<lparen>\()
      | (?P<rparen>\))
      | ((?P<field>[A-Za-z_][A-Za-z0-9_]*):(?=["\[]))?  # field:"..." / field:[..]
        (
          "(?P<phrase>[^"]*)"(~(?P<slop>\d+))?
        | \[(?P<lo>\S+)\s+TO\s+(?P<hi>\S+)\]
        )
      | (?P<op>AND|OR|NOT)(?=[\s()]|$)
      | (?P<mod>[+-])
      | (?P<word>[^\s^~()]+)(~(?P<edits>\d+)?)?
    )(\^(?P<boost>[0-9.]+))?
    """,
    re.VERBOSE,
)

_FIELD_WORD_RX = re.compile(r"^([A-Za-z_][A-Za-z0-9_]*):(.+)$")

_WILD_RX = re.compile(r"(?<!\\)[*?]")  # unescaped wildcard metachars


def _unescape(w: str) -> str:
    """discardEscapeChar (QueryParserBase.cs): '\\x' -> 'x'."""
    return re.sub(r"\\(.)", r"\1", w)


def _wildcard_pattern(w: str) -> str:
    """Raw word -> WildcardQuery pattern: unescaped */? stay wildcards,
    escaped chars become literals ([] classes express literal */?[])."""
    out: list[str] = []
    i = 0
    while i < len(w):
        c = w[i]
        if c == "\\" and i + 1 < len(w):
            nxt = w[i + 1]
            out.append(f"[{nxt}]" if nxt in "*?" else nxt)
            i += 2
        elif c == "[":
            out.append("[[]")
            i += 1
        elif c == "]":
            out.append("[]]")
            i += 1
        else:
            out.append(c)
            i += 1
    return "".join(out)


_ISO_TS_RX = re.compile(
    r"^(\d{4})-(\d{2})-(\d{2})([T ](\d{2}):(\d{2})(:(\d{2}))?)?$"
)


def _range_value(v: str):
    """Range endpoint for a non-text field: int/float if numeric; ISO
    date/datetime values become tz-AWARE UTC datetimes (a naive string
    bound would be cast against a timestamp column in the SESSION timezone
    — the same query would select different windows on differently
    configured sessions); anything else stays a raw string."""
    try:
        return int(v)
    except ValueError:
        pass
    try:
        return float(v)
    except ValueError:
        pass
    m = _ISO_TS_RX.match(v)
    if m:
        import datetime as _dt

        return _dt.datetime(
            int(m.group(1)), int(m.group(2)), int(m.group(3)),
            int(m.group(5) or 0), int(m.group(6) or 0), int(m.group(8) or 0),
            tzinfo=_dt.timezone.utc,
        )
    return v


class _Parser:
    def __init__(
        self,
        s: str,
        analyzer: StandardAnalyzer,
        default_operator: str,
        text_fields: frozenset = frozenset(),
        complex_phrases: bool = False,
    ):
        self.s = s
        self.analyzer = analyzer
        self.default_operator = default_operator
        #: ComplexPhraseQueryParser dialect (ComplexPhraseQueryParser.cs:48):
        #: wildcards / fuzzies / (grouped alternatives) INSIDE a quoted
        #: phrase lower to a SpanNear tree instead of being analyzed away
        self.complex_phrases = complex_phrases
        #: fields declared ANALYZED (IndexConfig.text_fields): a
        #: field-qualified clause on one of these analyzes its value —
        #: the reference QueryParser's per-field analyzer convention —
        #: instead of the keyword exact-match treatment
        self.text_fields = text_fields
        self.pos = 0

    def parse(self, depth: int = 0) -> BooleanQuery:
        """One clause sequence; recurses on '(' and returns at ')' (which the
        caller consumes) or end of input."""
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
                elif self.default_operator == "AND":
                    occur = Occur.MUST
                else:
                    occur = Occur.SHOULD
            clauses.append(BooleanClause(q, occur))
            pending_occur = None
            pending_op = None

        while self.pos < len(self.s):
            m = _TOKEN_RX.match(self.s, self.pos)
            if not m or m.end() == self.pos:
                break
            try:  # "^." matches the boost class but is not a number
                boost = float(m.group("boost")) if m.group("boost") else 1.0
            except ValueError:
                boost = 1.0
            if m.group("rparen"):
                if depth == 0:
                    self.pos = m.end()  # stray ')': skip it
                    continue
                break  # leave ')' for the caller to consume
            self.pos = m.end()
            if m.group("lparen"):
                sub = self.parse(depth + 1)
                # consume the matching ')' (+ optional ^boost on the group)
                rm = re.match(r'\s*\)(\^(?P<boost>[0-9.]+))?', self.s[self.pos:])
                gboost = 1.0
                if rm:
                    self.pos += rm.end()
                    if rm.group("boost"):
                        gboost = float(rm.group("boost"))
                if sub.clauses:
                    if gboost != 1.0:
                        sub = BooleanQuery(
                            sub.clauses, sub.minimum_should_match, gboost
                        )
                    push(sub)
            elif m.group("phrase") is not None:
                self._push_phrase(
                    push, m.group("field"), m.group("phrase"),
                    int(m.group("slop") or 0), boost,
                )
            elif m.group("lo") is not None:
                lo = None if m.group("lo") == "*" else m.group("lo")
                hi = None if m.group("hi") == "*" else m.group("hi")
                fld = m.group("field")
                if fld and fld != "text":
                    # non-text field range -> doc-values NumericRangeQuery
                    # (pushed-down docmap predicate; ISO date/datetime
                    # bounds become tz-aware UTC instants)
                    push(NumericRangeQuery(
                        fld,
                        None if lo is None else _range_value(lo),
                        None if hi is None else _range_value(hi),
                        boost=boost,
                    ))
                else:
                    push(TermRangeQuery(
                        None if lo is None else lo.lower(),
                        None if hi is None else hi.lower(),
                        boost=boost,
                    ))
            elif m.group("op"):
                if m.group("op") == "NOT":
                    pending_occur = Occur.MUST_NOT
                else:
                    pending_op = m.group("op")
            elif m.group("mod"):
                pending_occur = Occur.MUST if m.group("mod") == "+" else Occur.MUST_NOT
            elif m.group("word") is not None:
                self._push_word(push, m, boost)

        return BooleanQuery(tuple(clauses))

    _COMPLEX_TOK_RX = re.compile(r"\(([^)]*)\)|(\S+)")
    _COMPLEX_FUZZY_RX = re.compile(r"^(.*?[^\\])~(\d*)$")

    def _push_phrase_complex(self, push, raw, slop, boost) -> bool:
        """ComplexPhraseQueryParser.cs:48 lowering — a quoted phrase whose
        words carry wildcard / fuzzy / (grouped alternative) syntax becomes
        an ORDERED SpanNear tree (the parser's default inOrder=true):
        plain words are unit term clauses, ``(a b)`` groups are
        alternative-term tuples (SpanOr), ``wo?d*`` / ``word~N`` become
        SpanMultiTermWrapper clauses expanded against the term dictionary
        at search time. Returns False when the phrase has no complex
        syntax — the classic PhraseQuery path then applies unchanged.
        Scope: the default analyzed text field (the reference parser's
        primary use); a fully-stopworded group/word drops the phrase (it
        can never match every clause)."""
        if not ("*" in raw or "?" in raw or "~" in raw or "(" in raw):
            return False
        clauses: list = []
        for grp, word in self._COMPLEX_TOK_RX.findall(raw):
            if grp or (grp == "" and not word):
                alts: list[str] = []
                for alt in grp.split():
                    alts.extend(self.analyzer.analyze_query(_unescape(alt)))
                if not alts:
                    return True  # unmatchable clause: drop the phrase
                clauses.append(tuple(dict.fromkeys(alts)))
                continue
            fm = self._COMPLEX_FUZZY_RX.match(word)
            if fm:
                terms = self.analyzer.analyze_query(_unescape(fm.group(1)))
                if not terms:
                    return True
                edits = int(fm.group(2)) if fm.group(2) else 2
                clauses.append(
                    SpanMultiTermWrapper(FuzzyQuery(terms[0], max_edits=edits))
                )
            elif _WILD_RX.search(word):
                w = word.lower()
                if (
                    w.endswith("*") and len(w) > 1 and "\\" not in w
                    and not _WILD_RX.search(w[:-1])
                ):
                    clauses.append(SpanMultiTermWrapper(PrefixQuery(w[:-1])))
                else:
                    clauses.append(
                        SpanMultiTermWrapper(WildcardQuery(_wildcard_pattern(w)))
                    )
            else:
                toks = self.analyzer.analyze_query(_unescape(word))
                if not toks:
                    return True
                clauses.extend(toks)  # multi-token words: adjacent clauses
        if len(clauses) == 1:
            c = clauses[0]
            if isinstance(c, str):
                push(TermQuery(c, boost))
                return True
            if isinstance(c, SpanMultiTermWrapper):
                import dataclasses

                push(dataclasses.replace(c.query, boost=boost))
                return True
        if clauses:
            push(SpanNearQuery(tuple(clauses), slop, True, boost))
        return True

    def _push_phrase(self, push, fld, raw, slop, boost):
        if (
            self.complex_phrases
            and (not fld or fld == "text")
            and self._push_phrase_complex(push, raw, slop, boost)
        ):
            return
        if fld and fld != "text" and fld in self.text_fields:
            # ANALYZED extra field: a quoted value is a per-field PHRASE
            # (MultiFieldQueryParser semantics), scored with the field's
            # own norms/avgdl
            terms = self.analyzer.analyze_query(raw)
            if len(terms) == 1:
                push(TermQuery(terms[0], boost, field=fld))
            elif terms:
                push(PhraseQuery(tuple(terms), slop, boost, field=fld))
            return
        if fld and fld != "text":
            # keyword-field quoted value: ONE unanalyzed term (StringField
            # values are indexed verbatim, spaces included)
            push(TermQuery(raw, boost, field=fld))
            return
        if "|" in raw:
            # MultiPhraseQuery alternatives (MultiPhraseQuery.cs:72):
            # "app|application store" — '|' separates per-slot terms
            slots = []
            for word in raw.split():
                alts = []
                for alt in word.split("|"):
                    alts.extend(self.analyzer.analyze_query(alt))
                if alts:
                    slots.append(tuple(dict.fromkeys(alts)))
            if len(slots) == 1 and len(slots[0]) == 1:
                push(TermQuery(slots[0][0], boost))
            elif slots:
                push(MultiPhraseQuery(tuple(slots), slop, boost))
            return
        terms = self.analyzer.analyze_query(raw)
        if len(terms) == 1:
            push(TermQuery(terms[0], boost))
        elif terms:
            push(PhraseQuery(tuple(terms), slop, boost))

    def _push_word(self, push, m, boost):
        w = m.group("word")
        # field-qualified clause (QueryParserBase.cs:188 grammar):
        # "lang:en", "lang:e*", "lang:en~1". Non-text fields are keyword
        # fields (StringField) — the value is NOT analyzed (exact match),
        # matching the reference's per-field analyzer convention.
        fm = _FIELD_WORD_RX.match(w)
        if fm and fm.group(1) == "text":
            w = fm.group(2)  # explicit default field: analyze as usual
            fm = None
        has_fuzzy = m.group("edits") is not None or "~" in self.s[m.start(): m.end()]
        if fm:
            fld, rest = fm.group(1), fm.group(2)
            analyzed_field = fld in self.text_fields
            if analyzed_field and not _WILD_RX.search(rest) and not has_fuzzy:
                # ANALYZED extra field: run the chain on the value (the
                # per-field analyzer convention); multi-token values become
                # a per-field phrase
                terms = self.analyzer.analyze_query(_unescape(rest))
                if len(terms) == 1:
                    push(TermQuery(terms[0], boost, field=fld))
                elif terms:
                    push(PhraseQuery(tuple(terms), 0, boost, field=fld))
                return
            if analyzed_field:
                # text terms are indexed lowercase: lower the pattern /
                # fuzzy source like the default-field path does
                rest = rest.lower()
            if _WILD_RX.search(rest):
                # trailing-*-only keeps the PrefixQuery shape (the classic
                # parser's GetWildcardQuery prefix optimization); anything
                # else — mid-pattern * or ? — is a WildcardQuery
                if (
                    rest.endswith("*")
                    and len(rest) > 1
                    and "\\" not in rest
                    and not _WILD_RX.search(rest[:-1])
                ):
                    push(PrefixQuery(rest[:-1], boost, field=fld))
                else:
                    push(WildcardQuery(_wildcard_pattern(rest), boost, field=fld))
            elif has_fuzzy:
                edits = int(m.group("edits")) if m.group("edits") else 2
                push(FuzzyQuery(
                    _unescape(rest), max_edits=edits, boost=boost, field=fld
                ))
            else:
                push(TermQuery(_unescape(rest), boost, field=fld))
        elif _WILD_RX.search(w):
            if (
                w.endswith("*")
                and len(w) > 1
                and "\\" not in w
                and not _WILD_RX.search(w[:-1])
            ):
                push(PrefixQuery(w[:-1].lower(), boost))
            else:
                # text terms are indexed lowercase; lowering the pattern
                # (incl. [] literal classes) preserves its semantics
                push(WildcardQuery(_wildcard_pattern(w).lower(), boost))
        elif has_fuzzy:
            edits = int(m.group("edits")) if m.group("edits") else 2
            terms = self.analyzer.analyze_query(_unescape(w))
            if terms:
                push(FuzzyQuery(terms[0], max_edits=edits, boost=boost))
        else:
            terms = self.analyzer.analyze_query(_unescape(w))
            if len(terms) == 1:
                push(TermQuery(terms[0], boost))
            elif len(terms) > 1:
                push(PhraseQuery(tuple(terms), 0, boost))
            # fully-stopworded term: drop clause (StopFilter behavior)


def parse_query(
    s: str,
    analyzer: StandardAnalyzer | None = None,
    default_operator: str = "OR",
    text_fields: "frozenset[str] | tuple[str, ...]" = frozenset(),
    dialect: str = "classic",
) -> Query:
    """``text_fields`` declares which extra fields are ANALYZED
    (IndexConfig.text_fields): a field-qualified clause on one of them
    analyzes its value (quoted values become per-field phrases, the
    MultiFieldQueryParser convention) instead of the keyword exact-match
    treatment. Pass ``searcher.text_fields`` to match the index.

    ``dialect``: "classic" (default) or "complex_phrase"
    (ComplexPhraseQueryParser.cs:48) — identical grammar outside quotes;
    inside a quoted phrase, wildcards (``wo?d*``), fuzzies (``word~1``)
    and grouped alternatives (``(a b)``) lower to an ordered SpanNear
    tree over SpanMultiTermWrapper / alternative-tuple clauses."""
    if dialect not in ("classic", "complex_phrase"):
        raise ValueError(f"unknown parser dialect {dialect!r}")
    p = _Parser(
        s, analyzer or StandardAnalyzer(), default_operator,
        frozenset(text_fields),
        complex_phrases=(dialect == "complex_phrase"),
    )
    q = p.parse()
    if not q.clauses:
        return BooleanQuery(())
    return rewrite(q)
