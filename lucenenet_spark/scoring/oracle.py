"""Pure-Python/numpy reference search engine — the golden oracle.

A slow, obviously-correct, single-process implementation of the full index +
query semantics. Every distributed result is asserted equal to this oracle in
tests, mirroring how the reference pins exact float scores in
TestSimilarityBase.CorrectnessTestCore
(src/Lucene.Net.Tests/Search/Similarities/TestSimilarityBase.cs:578-585).

Scoring contract (SURVEY.md §4.4):
- per-term scores are float32-exact replicas of BM25Similarity;
- multi-term scores accumulate in float64 and cast to float32 once, matching
  DisjunctionSumScorer (DisjunctionSumScorer.cs:82-85 sums double, casts).
  The reference's ConjunctionScorer sums float32 in cost order
  (ConjunctionScorer.cs:120-128) — we deliberately use the disjunction
  convention for ALL boolean shapes so the semantics are order-independent
  and therefore implementable as a distributed hash aggregation;
- sloppy phrase / span freq follows the reference's damping
  (BM25Similarity.cs:74 SloppyFreq = 1/(1+distance), applied per match in
  SloppyPhraseScorer.PhraseFreq and SpanScorer.SetFreqCurrentDoc): each
  match contributes 1/(1+matchLength); the factors accumulate in float64 in
  anchor order and cast to float32 once (the reference accumulates the freq
  itself in float32 — the same documented double-accumulate convention as
  the boolean sums above). Match ENUMERATION is anchor-based (one
  combination per slot-0/clause-0 position; see PhraseQuery/SpanNearQuery
  docstrings) — a deterministic convention mirroring the reference's own
  order-dependent approximate PhraseQueue enumeration;
- tie-break: score desc, then docid asc (HitQueue.cs:77-87).
"""

from __future__ import annotations

import fnmatch
import re
from collections import Counter, defaultdict

import numpy as np

from ..analysis import StandardAnalyzer
from ..query.ast import (
    BooleanQuery,
    ConstantScoreQuery,
    DisjunctionMaxQuery,
    FuzzyQuery,
    MatchAllDocsQuery,
    MultiPhraseQuery,
    PhraseQuery,
    PrefixQuery,
    Query,
    RegexpQuery,
    SpanFirstQuery,
    SpanNearQuery,
    SpanNotQuery,
    SpanMultiTermWrapper,
    SpanOrQuery,
    TermQuery,
    TermRangeQuery,
    WildcardQuery,
    rewrite,
)
from .bm25 import BM25, CollectionStats
from .smallfloat import doclen_to_norm_byte


def levenshtein(a: str, b: str) -> int:
    if a == b:
        return 0
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


class OracleIndex:
    """In-memory inverted index over (docid, text) pairs."""

    def __init__(
        self,
        docs: list[tuple[int, str]],
        analyzer: StandardAnalyzer | None = None,
        k1: float = 1.2,
        b: float = 0.75,
        stats: "CollectionStats | None" = None,
    ):
        """``stats``: override the collection statistics (maxdoc/sum_ttf)
        with externally-computed GLOBAL values. Lets the oracle score a
        term-filtered SUBSET of a corpus exactly: pull only the docs
        containing the query's terms (their tf/positions/df are complete by
        construction) while idf/avgdl use the full-corpus stats — bounded
        memory instead of a whole-corpus materialization."""
        self.analyzer = analyzer or StandardAnalyzer()
        self.bm25 = BM25(k1, b)
        # postings: term -> {docid: (freq, positions)}
        self.postings: dict[str, dict[int, tuple[int, list[int]]]] = defaultdict(dict)
        self.doclen: dict[int, int] = {}
        self.docids: list[int] = []
        for docid, text in docs:
            toks, poss = self.analyzer.analyze(text)
            self.docids.append(docid)
            self.doclen[docid] = len(toks)
            pos_by_term: dict[str, list[int]] = defaultdict(list)
            for t, p in zip(toks, poss):
                pos_by_term[t].append(p)
            for t, plist in pos_by_term.items():
                self.postings[t][docid] = (len(plist), plist)
        self.stats = stats or CollectionStats(
            maxdoc=len(self.docids), sum_ttf=sum(self.doclen.values())
        )
        self.norm_byte = {
            d: int(doclen_to_norm_byte(l)[0]) for d, l in self.doclen.items()
        }
        self._cache = self.bm25.norm_cache(self.stats.avgdl)

    # ---- per-term scoring -------------------------------------------------
    def term_scores(self, term: str, boost: float = 1.0) -> dict[int, np.float32]:
        plist = self.postings.get(term, {})
        if not plist:
            return {}
        idf = self.bm25.idf(len(plist), self.stats.maxdoc)[0]
        out: dict[int, np.float32] = {}
        for docid, (freq, _pos) in plist.items():
            s = self.bm25.score(
                np.array([freq]), np.array([self.norm_byte[docid]]), idf, self._cache
            )[0]
            out[docid] = np.float32(np.float32(boost) * s)
        return out

    # ---- query evaluation -> {docid: float64 accumulated score} ----------
    def _eval(self, q: Query) -> dict[int, float]:
        if isinstance(q, TermQuery):
            return {d: float(s) for d, s in self.term_scores(q.term, q.boost).items()}
        if isinstance(q, MatchAllDocsQuery):
            return {d: float(np.float32(q.boost)) for d in self.docids}
        if isinstance(q, ConstantScoreQuery):
            return {d: float(np.float32(q.boost)) for d in self._eval(q.query)}
        if isinstance(q, PhraseQuery):
            return self._eval_phrase(q)
        if isinstance(q, MultiPhraseQuery):
            return self._eval_multiphrase(q)
        if isinstance(q, SpanNearQuery):
            return self._eval_span_near(q)
        if isinstance(q, SpanOrQuery):
            return self._eval(rewrite(q))
        if isinstance(q, SpanFirstQuery):
            return self._eval_span_first(q)
        if isinstance(q, SpanNotQuery):
            return self._eval_span_not(q)
        if isinstance(q, (PrefixQuery, WildcardQuery, RegexpQuery, FuzzyQuery, TermRangeQuery)):
            return self._eval_multiterm(q)
        if isinstance(q, DisjunctionMaxQuery):
            per = [self._eval(d) for d in q.disjuncts]
            docs: set[int] = set().union(*[p.keys() for p in per]) if per else set()
            out = {}
            for d in docs:
                ss = [p[d] for p in per if d in p]
                out[d] = max(ss) + q.tie_breaker * (sum(ss) - max(ss))
            return out
        if isinstance(q, BooleanQuery):
            return self._eval_boolean(q)
        raise TypeError(f"unsupported query: {q!r}")

    def _expand(self, q: Query) -> list[str]:
        """MultiTermQuery rewrite: scan the term dictionary
        (MultiTermQuery.cs:65,95 — expansion to a term disjunction)."""
        terms = sorted(self.postings.keys())
        if isinstance(q, PrefixQuery):
            return [t for t in terms if t.startswith(q.prefix)]
        if isinstance(q, WildcardQuery):
            rx = re.compile(fnmatch.translate(q.pattern))
            return [t for t in terms if rx.match(t)]
        if isinstance(q, RegexpQuery):
            rx = re.compile(q.pattern)
            return [t for t in terms if rx.fullmatch(t)]
        if isinstance(q, FuzzyQuery):
            pl = q.prefix_length
            return [
                t
                for t in terms
                if t.startswith(q.term[:pl])
                and abs(len(t) - len(q.term)) <= q.max_edits
                and levenshtein(t, q.term) <= q.max_edits
            ]
        if isinstance(q, TermRangeQuery):
            out = []
            for t in terms:
                if q.lower is not None and (t < q.lower or (t == q.lower and not q.include_lower)):
                    continue
                if q.upper is not None and (t > q.upper or (t == q.upper and not q.include_upper)):
                    continue
                out.append(t)
            return out
        raise TypeError(q)

    def _eval_multiterm(self, q: Query) -> dict[int, float]:
        # CONSTANT_SCORE_AUTO default: constant score 1*boost per matching doc
        # (MultiTermQuery.cs:95 ConstantScoreAutoRewrite).
        boost = float(np.float32(getattr(q, "boost", 1.0)))
        docs: set[int] = set()
        for t in self._expand(q):
            docs.update(self.postings[t].keys())
        return {d: boost for d in docs}

    def _eval_phrase(self, q: PhraseQuery) -> dict[int, float]:
        """Exact/sloppy phrase. Scored like a term with freq = number of
        phrase occurrences (ExactPhraseScorer.cs:26-99); idf = sum of the
        constituent term idfs (PhraseWeight sums TermStatistics idfs,
        BM25Similarity.cs:208-216 IdfExplain over term array)."""
        per_term = [self.postings.get(t, {}) for t in q.terms]
        if any(not p for p in per_term):
            return {}
        idf = np.float32(
            sum(
                float(self.bm25.idf(len(p), self.stats.maxdoc)[0])
                for p in per_term
            )
        )
        common = set(per_term[0].keys())
        for p in per_term[1:]:
            common &= p.keys()
        out: dict[int, float] = {}
        for d in sorted(common):
            base = np.asarray(per_term[0][d][1])
            if q.slop == 0:
                match = np.ones(len(base), dtype=bool)
                for i, p in enumerate(per_term[1:], 1):
                    match &= np.isin(base + i, np.asarray(p[d][1]))
                freq = int(match.sum())
            else:
                freq = self._sloppy_freq(d, per_term, q.slop)
            if freq > 0:
                s = self.bm25.score(
                    np.array([freq]), np.array([self.norm_byte[d]]), idf, self._cache
                )[0]
                out[d] = float(np.float32(np.float32(q.boost) * s))
        return out

    def _eval_multiphrase(self, q: MultiPhraseQuery) -> dict[int, float]:
        """MultiPhraseQuery.cs:72: per slot, union the alternative terms'
        positions per doc (UnionDocsAndPositionsEnum), then run the
        ordinary exact/sloppy phrase logic on the merged streams. idf sums
        over every member term present in the index."""
        per_slot = []
        idf_total = 0.0
        for slot in q.slots:
            alts = [t for t in slot if t in self.postings]
            if not alts:
                return {}
            merged: dict[int, list[int]] = defaultdict(list)
            for t in alts:
                idf_total += float(
                    self.bm25.idf(len(self.postings[t]), self.stats.maxdoc)[0]
                )
                for d, (_f, pl) in self.postings[t].items():
                    merged[d].extend(pl)
            per_slot.append(
                {d: (len(set(pl)), sorted(set(pl))) for d, pl in merged.items()}
            )
        idf = np.float32(idf_total)
        common = set(per_slot[0].keys())
        for p in per_slot[1:]:
            common &= p.keys()
        out: dict[int, float] = {}
        for d in sorted(common):
            base = np.asarray(per_slot[0][d][1])
            if q.slop == 0:
                match = np.ones(len(base), dtype=bool)
                for i, p in enumerate(per_slot[1:], 1):
                    match &= np.isin(base + i, np.asarray(p[d][1]))
                freq = int(match.sum())
            else:
                freq = self._sloppy_freq(d, per_slot, q.slop)
            if freq > 0:
                s = self.bm25.score(
                    np.array([freq]), np.array([self.norm_byte[d]]), idf, self._cache
                )[0]
                out[d] = float(np.float32(np.float32(q.boost) * s))
        return out

    def _eval_span_not(self, q: SpanNotQuery) -> dict[int, float]:
        """SpanNotQuery.cs:38-61: include positions with no exclude in
        [p-pre, p+post]; idf from the include term only (see the dataclass
        docstring for the documented divergence). Each surviving unit span
        contributes sloppyFreq(1) = 1/2 (SpanScorer.cs SetFreqCurrentDoc)."""
        plist = self.postings.get(q.include, {})
        if not plist:
            return {}
        exc = self.postings.get(q.exclude, {})
        idf = self.bm25.idf(len(plist), self.stats.maxdoc)[0]
        out: dict[int, float] = {}
        for d, (_f, poss) in plist.items():
            expos = exc.get(d, (0, []))[1]
            freq = 0.5 * sum(
                1
                for p in poss
                if not any(p - q.pre <= e <= p + q.post for e in expos)
            )
            if freq > 0:
                s = self.bm25.score(
                    np.array([freq]), np.array([self.norm_byte[d]]), idf, self._cache
                )[0]
                out[d] = float(np.float32(np.float32(q.boost) * s))
        return out

    def _enum_span_near(
        self, q: SpanNearQuery
    ) -> "tuple[dict[int, list[tuple[int, int]]] | None, list[float]]":
        """Enumerate a span query's matches per doc as RAW per-anchor
        (start, end) span lists (one per clause-0 anchor span, in anchor
        order), plus the idf of every indexed member term, recursively
        (the all-member-stats SpanWeight). A nested clause's stream is its
        own enumeration sorted by (start, end) and deduped — identical
        covering spans from different anchors are one match site (the
        SpanOr position-dedup convention); the TOP level keeps raw anchor
        spans because freq counts per anchor. Returns (None, []) when a
        clause has no indexed member."""
        streams: list[dict[int, list[tuple[int, int]]]] = []
        idf_terms: list[float] = []
        for c in q.clauses_norm():
            if isinstance(c, SpanNearQuery):
                raw, sub_idfs = self._enum_span_near(c)
                if raw is None:
                    return None, []
                idf_terms.extend(sub_idfs)
                streams.append({d: sorted(set(sp)) for d, sp in raw.items()})
                continue
            if isinstance(c, SpanMultiTermWrapper):
                # SpanMultiTermQueryWrapper.cs:44: dictionary expansion ->
                # position union over every matching term (SpanRewriteMethod)
                members = [self.postings[t] for t in self._expand(c.query)]
            else:
                members = [self.postings[t] for t in c if t in self.postings]
            if not members:
                return None, []
            merged: dict[int, set[int]] = {}
            for plist in members:
                idf_terms.append(float(self.bm25.idf(len(plist), self.stats.maxdoc)[0]))
                for d, (_f, poss) in plist.items():
                    merged.setdefault(d, set()).update(poss)
            streams.append(
                {d: [(p, p + 1) for p in sorted(ps)] for d, ps in merged.items()}
            )
        common = set(streams[0].keys())
        for p in streams[1:]:
            common &= p.keys()
        out: dict[int, list[tuple[int, int]]] = {}
        for d in sorted(common):
            spans: list[tuple[int, int]] = []
            for s0, e0 in streams[0][d]:
                if q.in_order:
                    # NearSpansOrdered: clause spans in order,
                    # non-overlapping (next start >= current end), greedy
                    # minimal chain; match iff the gap sum = covering
                    # window - sum of chosen lengths <= slop
                    cur_end, sum_len, ok = e0, e0 - s0, True
                    for st in streams[1:]:
                        nxt = [(s, e) for (s, e) in st[d] if s >= cur_end]
                        if not nxt:
                            ok = False
                            break
                        s, e = nxt[0]
                        sum_len += e - s
                        cur_end = e
                    if ok and (cur_end - s0 - sum_len) <= q.slop:
                        spans.append((s0, cur_end))
                else:
                    # unordered n-clause window (r5: generalized to
                    # variable-length nested clause spans): every other
                    # clause contributes the span with the NEAREST start
                    # (tie -> earlier); joint window = [min start, max end]
                    # over the chosen spans incl. the anchor, match iff
                    # NearSpansUnordered's matchLength - totalLength <=
                    # slop (SpansCell length bookkeeping,
                    # NearSpansUnordered.cs:36) — which reduces to
                    # range <= slop + n - 1 for all-unit clauses
                    s_min, e_max = s0, e0
                    total = e0 - s0
                    for st in streams[1:]:
                        cs, ce = min(
                            st[d],
                            key=lambda se: (abs(se[0] - s0), se[0] - s0),
                        )
                        s_min = min(s_min, cs)
                        e_max = max(e_max, ce)
                        total += ce - cs
                    if (e_max - s_min) - total <= q.slop:
                        spans.append((s_min, e_max))
            if spans:
                out[d] = spans
        return out, idf_terms

    def _eval_span_near(self, q: SpanNearQuery) -> dict[int, float]:
        """SpanNearQuery (SpanNearQuery.cs:38-66), including nested span
        clauses — deliberately a different algorithm than the engine's
        flat-key kernel (plain per-anchor python loops) so the two
        implementations cross-check each other. Same freq/idf convention
        as _eval_phrase: SpanScorer.cs SetFreqCurrentDoc freq +=
        1/(1+matchLength) per enumerated span, matchLength = End - Start
        of the covering window."""
        raw, idf_terms = self._enum_span_near(q)
        if raw is None:
            return {}
        idf = np.float32(sum(idf_terms))
        out: dict[int, float] = {}
        for d, spans in raw.items():
            freq = sum(1.0 / (1.0 + (e - s)) for s, e in spans)
            if freq > 0:
                s = self.bm25.score(
                    np.array([freq]), np.array([self.norm_byte[d]]), idf, self._cache
                )[0]
                out[d] = float(np.float32(np.float32(q.boost) * s))
        return out

    def _eval_span_first(self, q: SpanFirstQuery) -> dict[int, float]:
        """SpanFirstQuery.cs:33-49: unit span at 0-based position p has
        end() == p+1; it matches when p+1 <= end, i.e. the token sits among
        the first ``end`` positions. tf is truncated to that prefix."""
        plist = self.postings.get(q.term, {})
        if not plist:
            return {}
        idf = self.bm25.idf(len(plist), self.stats.maxdoc)[0]
        out: dict[int, float] = {}
        for d, (_f, poss) in plist.items():
            # each qualifying unit span contributes sloppyFreq(1) = 1/2
            freq = 0.5 * sum(1 for p in poss if p < q.end)
            if freq > 0:
                s = self.bm25.score(
                    np.array([freq]), np.array([self.norm_byte[d]]), idf, self._cache
                )[0]
                out[d] = float(np.float32(np.float32(q.boost) * s))
        return out

    def _sloppy_freq(self, d: int, per_term, slop: int) -> float:
        """SloppyPhraseScorer.cs PhraseFreq convention: per slot-0 anchor,
        every later slot contributes its NEAREST adjusted position (adj =
        pos - slot; tie -> earlier); matchLength = max - min over the
        chosen adjusted positions incl. the anchor; match iff every slot
        has a candidate within +-slop AND matchLength <= slop; freq +=
        1/(1+matchLength) per match (BM25Similarity.cs:74 SloppyFreq)."""
        positions = [np.asarray(p[d][1]) for p in per_term]
        freq = 0.0
        for p0 in positions[0]:
            ok = True
            maxc = minc = 0
            for i, pos in enumerate(positions[1:], 1):
                diffs = (pos - i) - p0
                j = int(np.argmin(np.abs(diffs)))  # ties: first = earlier
                c = int(diffs[j])
                if abs(c) > slop:
                    ok = False
                    break
                maxc = max(maxc, c)
                minc = min(minc, c)
            if ok and maxc - minc <= slop:
                freq += 1.0 / (1.0 + (maxc - minc))
        return freq

    def _eval_boolean(self, q: BooleanQuery) -> dict[int, float]:
        must, should, must_not = q.parts()
        must_evals = [self._eval(m) for m in must]
        should_evals = [self._eval(s) for s in should]
        excluded: set[int] = set()
        for mn in must_not:
            excluded.update(self._eval(mn).keys())

        if must_evals:
            docs = set(must_evals[0].keys())
            for m in must_evals[1:]:
                docs &= m.keys()
        elif should_evals:
            docs = set().union(*[s.keys() for s in should_evals])
        else:
            docs = set()
        docs -= excluded

        msm = q.minimum_should_match
        out: dict[int, float] = {}
        for d in docs:
            n_should = sum(1 for s in should_evals if d in s)
            if should_evals and msm > 0 and n_should < msm:
                continue
            # pure-SHOULD query with no matching clause can't happen (union);
            # MUST+SHOULD: optional adds if aligned (ReqOptSumScorer.cs:73-90)
            total = sum(m[d] for m in must_evals) + sum(
                s[d] for s in should_evals if d in s
            )
            out[d] = total
        return out

    # ---- top-k ------------------------------------------------------------
    def search(self, q: Query, k: int = 10) -> list[tuple[int, np.float32]]:
        """Top-k (docid, float32 score), tie-break score desc then docid asc."""
        scores = self._eval(rewrite(q))
        items = [(d, np.float32(s)) for d, s in scores.items()]
        items.sort(key=lambda x: (-float(x[1]), x[0]))
        return items[:k]

    def count(self, q: Query) -> int:
        """TotalHitCountCollector analogue."""
        return len(self._eval(rewrite(q)))
