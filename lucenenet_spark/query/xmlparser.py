r"""XML query parser -> Query AST.

Covers the useful subset of the reference's XML query syntax
(src/Lucene.Net.QueryParser/Xml/CoreParser.cs:38 and its builder
registry under Xml/Builders/): queries arrive as an XML tree whose
element names select query types and whose attributes carry options.
Parsed with the stdlib ElementTree (the reference uses its platform DOM
parser); text content is analyzed with the same chain as indexing.

Supported elements (reference builder in parens):

- ``<TermQuery fieldName boost>word</TermQuery>`` (TermQueryBuilder) —
  the analyzed text field by default; a non-text ``fieldName`` is the
  keyword-field exact match, matching the classic parser's convention;
- ``<PhraseQuery slop boost>some words</PhraseQuery>`` — analyzer-built
  positional phrase (the reference reserves this shape for its
  UserInputQueryBuilder/SpanOrTermsBuilder pair; same semantics);
- ``<BooleanQuery minimumNumberShouldMatch boost>`` with
  ``<Clause occurs="must|should|mustNot|filter">`` children
  (BooleanQueryBuilder; ``filter`` lowers to a ConstantScore MUST — the
  reference's FilteredQuery arm);
- ``<MatchAllDocsQuery/>`` (MatchAllDocsQueryBuilder);
- ``<ConstantScoreQuery boost>`` wrapping one query child
  (ConstantScoreQueryBuilder);
- ``<DisjunctionMaxQuery tieBreaker boost>`` over query children
  (DisjunctionMaxQueryBuilder);
- ``<TermRangeQuery lowerTerm upperTerm includeLower includeUpper>``
  (TermRangeQueryBuilder), ``<NumericRangeQuery fieldName lowerTerm
  upperTerm includeLower includeUpper>`` — doc-values pushdown
  (the reference's LegacyNumericRangeQueryBuilder);
- spans (SpanQueryBuilderFactory): ``<SpanTerm>``, ``<SpanOr>``,
  ``<SpanNear slop inOrder>``, ``<SpanFirst end>``,
  ``<SpanNot pre post>`` with ``<Include>``/``<Exclude>`` children —
  lowered onto the engine's span algebra (nested SpanNear supported);
- ``<FuzzyQuery maxEdits>word</FuzzyQuery>``,
  ``<PrefixQuery>pre</PrefixQuery>``, ``<WildcardQuery>pa*tern</>``.

Unknown elements raise ValueError naming the element — the reference's
ParserException convention. A fully-stopworded term/phrase drops its
clause inside BooleanQuery (StopFilter convention) and raises inside
span/dismax positions where a hole would change semantics.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

from ..analysis import StandardAnalyzer
from .ast import (
    BooleanClause,
    BooleanQuery,
    ConstantScoreQuery,
    DisjunctionMaxQuery,
    FuzzyQuery,
    MatchAllDocsQuery,
    NumericRangeQuery,
    Occur,
    PhraseQuery,
    PrefixQuery,
    Query,
    SpanFirstQuery,
    SpanNearQuery,
    SpanNotQuery,
    SpanOrQuery,
    TermQuery,
    TermRangeQuery,
    WildcardQuery,
    rewrite,
)

_OCCURS = {
    "must": Occur.MUST,
    "should": Occur.SHOULD,
    "mustnot": Occur.MUST_NOT,
    "filter": Occur.MUST,
}


class _XmlLowerer:
    def __init__(self, analyzer: StandardAnalyzer, text_fields: frozenset):
        self.analyzer = analyzer
        self.text_fields = text_fields

    # ---- helpers ----
    def _boost(self, el: ET.Element, q: Query) -> Query:
        b = float(el.get("boost", "1.0"))
        if b == 1.0 or q is None:
            return q
        import dataclasses

        return dataclasses.replace(q, boost=q.boost * b)

    def _field(self, el: ET.Element) -> str:
        return el.get("fieldName", "text")

    def _terms(self, el: ET.Element, fld: str) -> list[str]:
        raw = (el.text or "").strip()
        if fld == "text" or fld in self.text_fields:
            return self.analyzer.analyze_query(raw)
        return [raw]  # keyword field: verbatim single term

    # ---- dispatch ----
    def query(self, el: ET.Element) -> Query | None:
        tag = el.tag
        fn = getattr(self, f"_q_{tag.lower()}", None)
        if fn is None:
            raise ValueError(f"XML query parser: unknown element <{tag}>")
        return self._boost(el, fn(el))

    def _children(self, el: ET.Element) -> list[Query]:
        out = []
        for c in el:
            q = self.query(c)
            if q is None:
                raise ValueError(
                    f"XML query parser: fully-stopworded <{c.tag}> in a "
                    "position that cannot drop clauses"
                )
            out.append(q)
        return out

    # ---- builders ----
    def _q_termquery(self, el):
        fld = self._field(el)
        terms = self._terms(el, fld)
        if not terms:
            return None
        if len(terms) == 1:
            return TermQuery(terms[0], field=fld)
        return PhraseQuery(tuple(terms), 0, field=fld)

    def _q_phrasequery(self, el):
        fld = self._field(el)
        terms = self._terms(el, fld)
        if not terms:
            return None
        slop = int(el.get("slop", "0"))
        if len(terms) == 1:
            return TermQuery(terms[0], field=fld)
        return PhraseQuery(tuple(terms), slop, field=fld)

    def _q_booleanquery(self, el):
        clauses = []
        for c in el:
            if c.tag != "Clause":
                raise ValueError(
                    "XML query parser: <BooleanQuery> children must be "
                    f"<Clause>, got <{c.tag}>"
                )
            occurs = c.get("occurs", "should")
            occur = _OCCURS.get(occurs.lower())
            if occur is None:
                raise ValueError(
                    f"XML query parser: unknown occurs={occurs!r}"
                )
            kids = list(c)
            if len(kids) != 1:
                raise ValueError(
                    "XML query parser: <Clause> takes exactly one query child"
                )
            q = self.query(kids[0])
            if q is None:
                continue  # stopworded clause drops
            if occurs.lower() == "filter":
                q = ConstantScoreQuery(q, boost=0.0)
            clauses.append(BooleanClause(q, occur))
        msm = int(el.get("minimumNumberShouldMatch", "0"))
        return BooleanQuery(tuple(clauses), minimum_should_match=msm)

    def _q_matchalldocsquery(self, el):
        return MatchAllDocsQuery()

    def _q_constantscorequery(self, el):
        kids = self._children(el)
        if len(kids) != 1:
            raise ValueError(
                "XML query parser: <ConstantScoreQuery> takes one child"
            )
        return ConstantScoreQuery(kids[0])

    def _q_disjunctionmaxquery(self, el):
        kids = self._children(el)
        tie = float(el.get("tieBreaker", "0.0"))
        return DisjunctionMaxQuery(tuple(kids), tie_breaker=tie)

    def _q_termrangequery(self, el):
        lo = el.get("lowerTerm")
        hi = el.get("upperTerm")
        return TermRangeQuery(
            None if lo is None else lo.lower(),
            None if hi is None else hi.lower(),
            include_lower=el.get("includeLower", "true").lower() == "true",
            include_upper=el.get("includeUpper", "true").lower() == "true",
        )

    def _q_numericrangequery(self, el):
        fld = el.get("fieldName")
        if not fld:
            raise ValueError(
                "XML query parser: <NumericRangeQuery> needs fieldName"
            )

        def _num(v):
            if v is None:
                return None
            try:
                return int(v)
            except ValueError:
                return float(v)

        return NumericRangeQuery(
            fld, _num(el.get("lowerTerm")), _num(el.get("upperTerm")),
            include_lower=el.get("includeLower", "true").lower() == "true",
            include_upper=el.get("includeUpper", "true").lower() == "true",
        )

    def _q_fuzzyquery(self, el):
        terms = self._terms(el, self._field(el))
        if not terms:
            return None
        return FuzzyQuery(terms[0], max_edits=int(el.get("maxEdits", "2")))

    def _q_prefixquery(self, el):
        raw = (el.text or "").strip().lower()
        if not raw:
            return None
        return PrefixQuery(raw, field=self._field(el))

    def _q_wildcardquery(self, el):
        raw = (el.text or "").strip().lower()
        if not raw:
            return None
        return WildcardQuery(raw, field=self._field(el))

    # ---- spans ----
    def _span_clause(self, el: ET.Element):
        tag = el.tag.lower()
        if tag == "spanterm":
            terms = self._terms(el, "text")
            if len(terms) != 1:
                raise ValueError(
                    "XML query parser: <SpanTerm> must analyze to one term"
                )
            return terms[0]
        if tag == "spanor":
            alts: list[str] = []
            for c in el:
                if c.tag.lower() != "spanterm":
                    raise ValueError(
                        "XML query parser: <SpanOr> takes <SpanTerm> children"
                    )
                alts.extend(self._terms(c, "text"))
            if not alts:
                raise ValueError("XML query parser: empty <SpanOr>")
            return tuple(dict.fromkeys(alts))
        if tag == "spannear":
            return self._q_spannear(el)
        raise ValueError(
            f"XML query parser: <{el.tag}> is not a span clause"
        )

    def _q_spannear(self, el):
        clauses = tuple(self._span_clause(c) for c in el)
        if len(clauses) < 2:
            raise ValueError("XML query parser: <SpanNear> needs >= 2 clauses")
        return SpanNearQuery(
            clauses,
            slop=int(el.get("slop", "0")),
            in_order=el.get("inOrder", "true").lower() == "true",
        )

    def _q_spanor(self, el):
        alts = self._span_clause(el)
        return SpanOrQuery(alts)

    def _q_spanterm(self, el):
        terms = self._terms(el, "text")
        if not terms:
            return None
        return SpanOrQuery((terms[0],))

    def _q_spanfirst(self, el):
        kids = list(el)
        if len(kids) != 1 or kids[0].tag.lower() != "spanterm":
            raise ValueError(
                "XML query parser: <SpanFirst> takes one <SpanTerm> child"
            )
        terms = self._terms(kids[0], "text")
        if len(terms) != 1:
            raise ValueError(
                "XML query parser: <SpanFirst> term must analyze to one term"
            )
        return SpanFirstQuery(terms[0], end=int(el.get("end", "1")))

    def _q_spannot(self, el):
        inc = exc = None
        for c in el:
            if c.tag == "Include":
                inc = self._span_clause(list(c)[0])
            elif c.tag == "Exclude":
                exc = self._span_clause(list(c)[0])
        if not isinstance(inc, str) or not isinstance(exc, str):
            raise ValueError(
                "XML query parser: <SpanNot> takes <Include>/<Exclude> "
                "with single <SpanTerm> children"
            )
        return SpanNotQuery(
            inc, exc, pre=int(el.get("pre", "0")), post=int(el.get("post", "0"))
        )


def parse_xml_query(
    s: str,
    analyzer: StandardAnalyzer | None = None,
    text_fields: "frozenset[str] | tuple[str, ...]" = frozenset(),
) -> Query:
    """Parse an XML query string -> Query AST (module docstring for the
    element registry). Raises ValueError on malformed XML or unknown
    elements (the reference's ParserException convention)."""
    try:
        root = ET.fromstring(s)
    except ET.ParseError as e:
        raise ValueError(f"XML query parser: malformed XML: {e}") from None
    q = _XmlLowerer(
        analyzer or StandardAnalyzer(), frozenset(text_fields)
    ).query(root)
    if q is None:
        return BooleanQuery(())
    return rewrite(q)
