"""Query AST — the logical plan of the search engine.

Mirrors the reference's Query class hierarchy (src/Lucene.Net/Search/*.cs)
as plain dataclasses; the physical translation to DataFrame compositions
lives in :mod:`lucenenet_spark.query.engine`.

Reference parity:
- TermQuery        -> TermQuery.cs
- BooleanQuery     -> BooleanQuery.cs:152-173 (minimumShouldMatch), Occur
- PhraseQuery      -> PhraseQuery.cs:67 (slop=0 exact phrase v0)
- PrefixQuery      -> PrefixQuery.cs:37
- WildcardQuery    -> WildcardQuery.cs:46
- RegexpQuery      -> RegexpQuery.cs:52
- FuzzyQuery       -> FuzzyQuery.cs:56-63 (maxEdits<=2)
- TermRangeQuery   -> TermRangeQuery.cs:45
- MatchAllDocsQuery-> MatchAllDocsQuery.cs:33
- ConstantScoreQuery -> ConstantScoreQuery.cs:37
- DisjunctionMaxQuery -> DisjunctionMaxQuery.cs:59
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum


class Query:
    """Marker base class."""


class Occur(Enum):
    MUST = "MUST"
    SHOULD = "SHOULD"
    MUST_NOT = "MUST_NOT"


@dataclass(frozen=True)
class TermQuery(Query):
    """``field``: "text" scores BM25 against the analyzed text field; any
    other name targets a keyword field (StringField.cs:43 analogue) stored
    under the namespaced term key "<field>:<term>" and scored with norms
    omitted (score = idf, since keyword tf == 1)."""

    term: str
    boost: float = 1.0
    field: str = "text"


@dataclass(frozen=True)
class BooleanClause:
    query: Query
    occur: Occur


@dataclass(frozen=True)
class BooleanQuery(Query):
    clauses: tuple[BooleanClause, ...]
    minimum_should_match: int = 0
    boost: float = 1.0

    @staticmethod
    def build(
        must: list[Query] | None = None,
        should: list[Query] | None = None,
        must_not: list[Query] | None = None,
        minimum_should_match: int = 0,
    ) -> "BooleanQuery":
        clauses: list[BooleanClause] = []
        for q in must or []:
            clauses.append(BooleanClause(q, Occur.MUST))
        for q in should or []:
            clauses.append(BooleanClause(q, Occur.SHOULD))
        for q in must_not or []:
            clauses.append(BooleanClause(q, Occur.MUST_NOT))
        return BooleanQuery(tuple(clauses), minimum_should_match)

    def parts(self) -> tuple[list[Query], list[Query], list[Query]]:
        must = [c.query for c in self.clauses if c.occur is Occur.MUST]
        should = [c.query for c in self.clauses if c.occur is Occur.SHOULD]
        must_not = [c.query for c in self.clauses if c.occur is Occur.MUST_NOT]
        return must, should, must_not


@dataclass(frozen=True)
class PhraseQuery(Query):
    """``field`` may name an extra ANALYZED field (IndexConfig.text_fields):
    the phrase then runs over that field's namespaced positional postings
    and scores with the field's own norms/avgdl.

    slop > 0 scores per the reference's SloppyPhraseScorer: each match
    contributes sloppyFreq(matchLength) = 1/(1+matchLength) to freq
    (BM25Similarity.cs:74), matchLength = size of the adjusted-position
    window (0 for an exact occurrence), match iff matchLength <= slop.
    Match enumeration is anchor-based (one candidate combination per
    slot-0 position, each later slot choosing its nearest adjusted
    position) — a deterministic convention; the reference's PhraseQueue
    enumeration is itself order-dependent and approximate
    (SloppyPhraseScorer.cs PhraseFreq doc comment)."""

    terms: tuple[str, ...]
    slop: int = 0
    boost: float = 1.0
    field: str = "text"


@dataclass(frozen=True)
class PrefixQuery(Query):
    prefix: str
    boost: float = 1.0
    field: str = "text"
    #: MultiTermQuery.cs:65,95 rewrite mode: "constant_score" (semi-join,
    #: every match scores boost*1), "scoring_boolean" (BM25 disjunction over
    #: every expanded term, ScoringRewrite), or "top_terms_scoring"
    #: (TopTermsRewrite.cs: keep only the best N expanded terms, then score)
    rewrite_method: str = "constant_score"
    max_expansions: int = 50


@dataclass(frozen=True)
class WildcardQuery(Query):
    pattern: str  # '*' any run, '?' single char
    boost: float = 1.0
    field: str = "text"
    #: MultiTermQuery.cs:65,95 rewrite mode: "constant_score" (semi-join,
    #: every match scores boost*1), "scoring_boolean" (BM25 disjunction over
    #: every expanded term, ScoringRewrite), or "top_terms_scoring"
    #: (TopTermsRewrite.cs: keep only the best N expanded terms, then score)
    rewrite_method: str = "constant_score"


@dataclass(frozen=True)
class RegexpQuery(Query):
    pattern: str
    boost: float = 1.0
    field: str = "text"
    #: MultiTermQuery.cs:65,95 rewrite mode: "constant_score" (semi-join,
    #: every match scores boost*1), "scoring_boolean" (BM25 disjunction over
    #: every expanded term, ScoringRewrite), or "top_terms_scoring"
    #: (TopTermsRewrite.cs: keep only the best N expanded terms, then score)
    rewrite_method: str = "constant_score"


@dataclass(frozen=True)
class FuzzyQuery(Query):
    term: str
    max_edits: int = 2
    prefix_length: int = 0
    boost: float = 1.0
    field: str = "text"
    #: MultiTermQuery.cs:65,95 rewrite mode: "constant_score" (semi-join,
    #: every match scores boost*1), "scoring_boolean" (BM25 disjunction over
    #: every expanded term, ScoringRewrite), or "top_terms_scoring"
    #: (TopTermsRewrite.cs: keep only the best N expanded terms, then score)
    rewrite_method: str = "constant_score"
    #: top_terms_scoring only: how many best terms to keep (TopTermsRewrite
    #: "size"; FuzzyQuery.cs defaultMaxExpansions analogue)
    max_expansions: int = 50


@dataclass(frozen=True)
class TermRangeQuery(Query):
    lower: str | None
    upper: str | None
    include_lower: bool = True
    include_upper: bool = True
    boost: float = 1.0
    field: str = "text"
    #: MultiTermQuery.cs:65,95 rewrite mode: "constant_score" (semi-join,
    #: every match scores boost*1), "scoring_boolean" (BM25 disjunction over
    #: every expanded term, ScoringRewrite), or "top_terms_scoring"
    #: (TopTermsRewrite.cs: keep only the best N expanded terms, then score)
    rewrite_method: str = "constant_score"


@dataclass(frozen=True)
class MultiPhraseQuery(Query):
    """MultiPhraseQuery.cs:72 — phrase where each position admits
    alternative terms, e.g. slots (("app","application"), ("store",)) for
    \"app|application store\". Scored as a pseudo-term whose idf is the sum
    over ALL member terms (the reference builds its similarity weight from
    every term's stats) and whose freq counts distinct first-slot positions
    that complete a match."""

    slots: tuple[tuple[str, ...], ...]
    slop: int = 0
    boost: float = 1.0


@dataclass(frozen=True)
class NumericRangeQuery(Query):
    """NumericRangeQuery.cs:522-620 analogue over a numeric docmap column
    (doclen, docid, or any stored numeric metadata): constant-score match
    of docs whose value lies in the range. The reference's trie-encoded
    term ranges are replaced by a pushdownable Parquet predicate on the
    docmap scan — min/max pruning gives the same skip behavior natively."""

    column: str
    lower: float | None = None
    upper: float | None = None
    include_lower: bool = True
    include_upper: bool = True
    boost: float = 1.0


@dataclass(frozen=True)
class FilteredQuery(Query):
    """FilteredQuery.cs:41: a scored query constrained by a non-scoring
    filter — the filter restricts the match set but contributes no score
    (semi-join in the physical plan). ``filter`` is any Query; pair with
    NumericRangeQuery for the classic scored-text ∧ metadata-range shape."""

    query: Query
    filter: Query
    boost: float = 1.0


@dataclass(frozen=True)
class CachingWrapperFilter(Query):
    """CachingWrapperFilter.cs:42 analogue: wraps a non-scoring filter so
    its DocIdSet is computed ONCE per Searcher and reused across queries.
    Where the reference caches a FixedBitSet per segment reader keyed by
    the filter instance, here the filter's docid DataFrame is persisted
    (memory-and-disk, i.e. it spills like any Spark cache) keyed by the
    wrapped filter's canonical frozen-dataclass form, so two structurally
    equal filters share one cache entry. Use inside FilteredQuery for the
    classic repeated-filter shape (the same tenant/date-range filter ANDed
    onto every query of a session)."""

    filter: Query


@dataclass(frozen=True)
class TermsFilter(Query):
    """TermsFilter (Lucene.Net.Queries/TermsFilter.cs:37 analogue): a
    non-scoring filter matching docs that contain ANY of a set of
    (field, term) pairs — the classic category/tenant whitelist. Lowered
    to the union of the terms' posting docid sets (ONE dictionary
    semi-join over the sorted term storage); pair with FilteredQuery and
    CachingWrapperFilter for the repeated-whitelist shape."""

    terms: tuple[tuple[str, str], ...]  # (field, term) pairs


@dataclass(frozen=True)
class DuplicateFilter(Query):
    """DuplicateFilter (Lucene.Net.Sandbox/Queries/DuplicateFilter.cs:33
    analogue): keeps only ONE document per distinct value of ``column``
    (a docmap / doc-values column) — KM_USE_FIRST_OCCURRENCE keeps the
    lowest docid, KM_USE_LAST_OCCURRENCE the highest. A query-time dedup
    filter: the match set is restricted to each value's surviving doc."""

    column: str
    keep: str = "first"  # "first" | "last"


@dataclass(frozen=True)
class MatchAllDocsQuery(Query):
    boost: float = 1.0


@dataclass(frozen=True)
class ConstantScoreQuery(Query):
    query: Query
    boost: float = 1.0


@dataclass(frozen=True)
class DisjunctionMaxQuery(Query):
    disjuncts: tuple[Query, ...]
    tie_breaker: float = 0.0
    boost: float = 1.0


@dataclass(frozen=True)
class SpanNearQuery(Query):
    """Span proximity over unit-length term spans (Spans module analogue:
    SpanNearQuery.cs:38-66, NearSpansOrdered.cs:42-89,
    NearSpansUnordered.cs:36-60).

    A token at 0-based position ``p`` is the unit span [p, p+1); for a
    candidate match the reference's slop-in-match is
    ``width - n`` where width is the covering window in positions and n
    the clause count. ``in_order=True`` additionally requires the spans to
    appear in clause order, non-overlapping (NearSpansOrdered's
    DocSpansOrdered invariant).

    Scope (documented): a clause is a plain term (SpanTermQuery child), a
    tuple of alternative terms, a :class:`SpanOrQuery` — the reference's
    ``SpanNear(SpanOr(syn1, syn2), term)`` synonym idiom — or (r4) a
    nested :class:`SpanNearQuery`, the reference's composable span
    algebra (SpanNearQuery.cs clauses are arbitrary SpanQuery trees). A
    nested clause contributes its enumerated MATCH spans (one per inner
    clause-0 anchor, start = anchor start, end = greedy-chain end), and
    the outer ordered chain then applies Lucene's NearSpansOrdered rule
    over variable-length spans: clause spans in order, non-overlapping
    (next start >= previous end), total gap sum = (last end - first
    start) - sum(chosen span lengths) <= slop; for unit spans this
    reduces to the flat rule below. Nesting composes with BOTH outer
    modes (r5 adds unordered-outer: true SpansCell length bookkeeping,
    NearSpansUnordered.cs:36); nested clauses themselves may be
    ordered or unordered. A union clause's
    spans are the union of its members' unit spans (SpanOrQuery.cs:36-58);
    members missing from the index simply contribute no spans (a clause
    whose EVERY member is missing can never match). Unordered supports any
    clause count (r4; r5 generalizes to variable-length nested clause
    spans): per anchor span, every other clause contributes the span with
    the nearest start (tie -> earlier); the joint window [min start,
    max end] must satisfy NearSpansUnordered's matchLength - totalLength
    <= slop rule (totalLength = sum of chosen span lengths) — the
    anchor-based re-expression of the reference's SpansCell queue
    (NearSpansUnordered.cs:36; exact for n=2, nearest-choice convention
    for n>2; reduces to max-min <= slop + n - 1 for all-unit clauses).
    Scoring follows the
    reference's SpanScorer (SpanScorer.cs SetFreqCurrentDoc): each
    enumerated span match contributes sloppyFreq(matchLength) =
    1/(1+matchLength) to freq, matchLength = End - Start of the covering
    window (n unit spans packed adjacently give matchLength = n); idf =
    sum over every indexed member term of every clause (the
    all-member-stats SpanWeight). Enumeration convention: one span per
    clause-0 anchor position — ordered takes the greedy minimal chain,
    unordered the nearest clause-1 span; the reference's own enumeration
    is likewise order-dependent and approximate (SloppyPhraseScorer.cs
    PhraseFreq doc comment)."""

    terms: tuple["str | tuple[str, ...] | SpanOrQuery | SpanNearQuery", ...]
    slop: int = 0
    in_order: bool = True
    boost: float = 1.0
    #: extra ANALYZED field (IndexConfig.text_fields): clause spans seek
    #: the namespaced "<field>:<term>" postings and score with the
    #: field's own norms/avgdl (same contract as PhraseQuery.field)
    field: str = "text"

    def clauses_norm(
        self,
    ) -> tuple["tuple[str, ...] | SpanNearQuery | SpanMultiTermWrapper", ...]:
        """Normalize clauses: alternative-term tuples for unit clauses,
        the subquery itself for nested SpanNearQuery clauses, the wrapper
        itself for multi-term clauses (expanded at search time)."""
        out: list = []
        for c in self.terms:
            if isinstance(c, str):
                out.append((c,))
            elif isinstance(c, (SpanNearQuery, SpanMultiTermWrapper)):
                out.append(c)
            elif isinstance(c, SpanOrQuery):
                out.append(tuple(c.terms))
            elif isinstance(c, (tuple, list)):
                out.append(tuple(c))
            else:
                raise TypeError(
                    f"unsupported span clause type {type(c).__name__}: a "
                    "clause is a term, a tuple of alternative terms, a "
                    "SpanOrQuery, a SpanMultiTermWrapper, or a nested "
                    "SpanNearQuery"
                )
        return tuple(out)

    def clause_alts(self) -> tuple[tuple[str, ...], ...]:
        """Normalize clauses to per-slot alternative-term tuples (flat
        span shapes only; nested/multi-term clauses raise — callers that
        support them use :meth:`clauses_norm`)."""
        out = []
        for c in self.clauses_norm():
            if isinstance(c, (SpanNearQuery, SpanMultiTermWrapper)):
                raise TypeError(
                    "clause_alts() on a nested/multi-term span clause — "
                    "use clauses_norm()"
                )
            out.append(c)
        return tuple(out)

    def member_terms(self) -> tuple[str, ...]:
        """Every STATICALLY-KNOWN member term of every clause, recursively
        (the all-member-stats SpanWeight extraction). SpanMultiTermWrapper
        clauses contribute nothing here — their expansion happens against
        the term dictionary at search time and the engine merges the
        expanded terms' stats then."""
        out: list[str] = []
        for c in self.clauses_norm():
            if isinstance(c, SpanNearQuery):
                out.extend(c.member_terms())
            elif isinstance(c, SpanMultiTermWrapper):
                continue
            else:
                out.extend(c)
        return tuple(out)

    def has_nested(self) -> bool:
        return any(isinstance(c, SpanNearQuery) for c in self.clauses_norm())


@dataclass(frozen=True)
class SpanMultiTermWrapper(Query):
    """SpanMultiTermQueryWrapper.cs:44 analogue: lifts a MultiTermQuery
    (Prefix/Wildcard/Regexp/Fuzzy/TermRange) into span position — the
    clause's spans are the union of ALL dictionary terms matching the
    wrapped query (each term a unit span stream), exactly the reference's
    SpanRewriteMethod which rewrites to a SpanOr over the matching terms.
    Expansion happens at search time against the term dictionary, capped
    at 1024 terms (the BooleanQuery.maxClauseCount analogue — the
    reference throws TooManyClauses past it, so do we). idf = sum over
    every EXPANDED indexed term (all-member-stats SpanWeight). This is
    the lowering target for ComplexPhraseQueryParser's in-phrase
    wildcards/fuzzies (ComplexPhraseQueryParser.cs:48)."""

    query: Query
    boost: float = 1.0


@dataclass(frozen=True)
class SpanOrQuery(Query):
    """SpanOrQuery.cs:36-58 over term clauses: the union of the terms'
    spans scored through SpanScorer — every member's unit span contributes
    sloppyFreq(1) = 1/2 to freq (deduped per position: two members at one
    position are one match site); idf = sum over member terms, the same
    all-member-stats weight the reference's SpanWeight builds. With
    unit-length term spans this is a single-clause SpanNearQuery (the
    slot-union of positions), so :func:`rewrite` lowers it to one — the
    engine and oracle never see the class itself."""

    terms: tuple[str, ...]
    boost: float = 1.0
    field: str = "text"


@dataclass(frozen=True)
class SpanNotQuery(Query):
    """SpanNotQuery.cs:38-61 over term clauses: occurrences of ``include``
    with no ``exclude`` occurrence in the surrounding window [p-pre,
    p+post] (the reference's pre/post expansion of the include span before
    overlap testing; pre=post=0 is pure same-position overlap, which
    distinct terms never produce). freq = surviving include positions; the
    weight uses the include term's idf only (documented divergence: the
    reference folds every extracted term's stats into SpanWeight, but an
    exclusion is not relevance evidence)."""

    include: str
    exclude: str
    pre: int = 0
    post: int = 0
    boost: float = 1.0
    field: str = "text"


@dataclass(frozen=True)
class SpanFirstQuery(Query):
    """SpanFirstQuery.cs:33-49: matches spans that end within the first
    ``end`` positions. For a unit term span at 0-based position p that is
    p + 1 <= end; freq = number of such positions, scored as an ordinary
    BM25 term whose tf is truncated to the prefix window."""

    term: str
    end: int
    boost: float = 1.0
    field: str = "text"


def rewrite(q: Query) -> Query:
    """Logical rewrites, mirroring the reference's fixed-point rewrite loop
    (IndexSearcher.cs:650-657). v0 rules:

    - 1-clause BooleanQuery unwrap (BooleanQuery.cs:535-560): a BooleanQuery
      with a single MUST/SHOULD clause and no minShouldMatch constraint
      rewrites to its inner query.
    - SpanOrQuery over unit term spans lowers to a single-clause
      SpanNearQuery (identical span-union + all-member-idf semantics, and
      the SpanScorer sloppyFreq damping applies: matchLength 1 per unit
      span -> 1/2 per match site; a MultiPhraseQuery lowering would score
      the phrase convention, slop factor 1).
    - recursion into nested boolean clauses.
    """
    if isinstance(q, SpanOrQuery):
        return SpanNearQuery((tuple(q.terms),), 0, True, q.boost, q.field)
    if isinstance(q, BooleanQuery):
        clauses = tuple(BooleanClause(rewrite(c.query), c.occur) for c in q.clauses)
        q = BooleanQuery(clauses, q.minimum_should_match, q.boost)
        scoring = [c for c in q.clauses if c.occur is not Occur.MUST_NOT]
        if (
            len(q.clauses) == 1
            and len(scoring) == 1
            and q.minimum_should_match <= 1
        ):
            inner = scoring[0].query
            if q.boost != 1.0:
                # the group boost folds into the unwrapped clause
                # (BooleanQuery.cs:541-546: clone.Boost *= Boost) — but only
                # into query types that carry a boost field; constant-score
                # filters (TermsFilter, DuplicateFilter, CachingWrapper-
                # Filter) have none, so the wrapper is kept for them
                import dataclasses

                if any(f.name == "boost" for f in dataclasses.fields(inner)):
                    inner = dataclasses.replace(
                        inner, boost=inner.boost * q.boost
                    )
                else:
                    return q
            return inner
    if isinstance(q, ConstantScoreQuery):
        return ConstantScoreQuery(rewrite(q.query), q.boost)
    if isinstance(q, FilteredQuery):
        return FilteredQuery(rewrite(q.query), rewrite(q.filter), q.boost)
    if isinstance(q, CachingWrapperFilter):
        return CachingWrapperFilter(rewrite(q.filter))
    if isinstance(q, DisjunctionMaxQuery):
        return DisjunctionMaxQuery(tuple(rewrite(d) for d in q.disjuncts), q.tie_breaker, q.boost)
    return q
