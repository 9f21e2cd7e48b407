"""Non-language analysis modules: Shingle, CommonGrams, Reverse,
Pattern, PathHierarchy.

Original implementations of the documented public semantics of five
reference analysis modules that are language-independent:

- **ShingleFilter** (Analysis/Shingle/ShingleFilter.cs:58): word
  n-grams over the token stream. Default shape implemented: maxShingleSize
  = 2, outputUnigrams = true, separator ``" "`` — stream ``[the quick
  fox]`` emits ``the, "the quick", quick, "quick fox", fox``. The
  reference emits each shingle at its first token's position (posIncr 0);
  our engine's position convention is the emitted-stream index (the CJK
  pack note), which callers of shingled fields use for matching, not
  phrase offsets — documented divergence.
- **CommonGramsFilter** (Analysis/CommonGrams/CommonGramsFilter.cs:44):
  like shingles but a bigram is emitted ONLY when either member is a
  common word, joined with ``"_"`` — the classic stopword-phrase
  indexing trick ("the_quick" stays searchable even where stopwords are
  dropped).
- **ReverseStringFilter** (Analysis/Reverse/ReverseStringFilter.cs:32):
  every term reversed; its documented purpose is LEADING-wildcard
  support — index the reversed field, rewrite ``*suffix`` as a prefix
  seek over ``reverse(suffix)``. A pure per-unique-term rewrite, so the
  chain keeps the Arrow fast path.
- **PatternAnalyzer** (Analysis/Miscellaneous/PatternAnalyzer.cs:45):
  lowercase + split on a configurable regex (the reference's
  non-grouping split semantics). Registered as ``"pattern:<regex>"`` so
  the split pattern rides the one-string analyzer fingerprint that the
  index stats commit already persists.
- **PathHierarchyTokenizer** (Analysis/Path/PathHierarchyTokenizer.cs:38):
  the whole input is ONE path; it emits every ancestor prefix —
  ``a/b/c -> a, a/b, a/b/c`` — which is what makes "everything under
  a/b" a single term seek.

Scale note: shingles/common-grams/path consume stream ADJACENCY or the
whole row, so those chains declare ``arrow_fast_path = False`` and run
per row inside the builder's distributed batches (the CJK pack
contract); reverse is 1:1 per unique term and stays on the Arrow path.
"""

from __future__ import annotations

import re

import numpy as np

from .analyzer import ENGLISH_STOP_WORDS, StandardAnalyzer

# CommonGramsFilter's default common set = the English stop set
# (CommonGramsFilter.cs docs); callers can pass their own.
DEFAULT_COMMON_WORDS: frozenset[str] = ENGLISH_STOP_WORDS


def shingle_stream(tokens: list[str]) -> list[str]:
    """ShingleFilter default shape: unigrams + space-joined bigrams,
    interleaved in stream order (rules in the module docstring)."""
    out: list[str] = []
    n = len(tokens)
    for i, t in enumerate(tokens):
        out.append(t)
        if i + 1 < n:
            out.append(t + " " + tokens[i + 1])
    return out


def common_grams_stream(
    tokens: list[str], common: frozenset[str]
) -> list[str]:
    """CommonGramsFilter: unigrams + '_'-joined bigrams where either
    member is a common word."""
    out: list[str] = []
    n = len(tokens)
    for i, t in enumerate(tokens):
        out.append(t)
        if i + 1 < n and (t in common or tokens[i + 1] in common):
            out.append(t + "_" + tokens[i + 1])
    return out


class ShingleAnalyzer(StandardAnalyzer):
    """StandardTokenizer -> LowerCase -> ShingleFilter(2, unigrams) ->
    StopFilter (inherited analyze(); a stopped unigram's shingles
    survive, the reference's stop-then-shingle composition inverted and
    documented)."""

    arrow_fast_path = False  # shingling consumes stream adjacency

    def tokenize(self, text: str) -> list[str]:
        return shingle_stream(super().tokenize(text))


class CommonGramsAnalyzer(StandardAnalyzer):
    """StandardTokenizer -> LowerCase -> CommonGramsFilter(common set);
    bigrams are emitted only at common-word boundaries."""

    arrow_fast_path = False  # bigramming consumes stream adjacency

    def __init__(self, *args, common: frozenset[str] | None = None, **kw):
        super().__init__(*args, **kw)
        self.common = DEFAULT_COMMON_WORDS if common is None else common

    def tokenize(self, text: str) -> list[str]:
        return common_grams_stream(super().tokenize(text), self.common)


class ReverseAnalyzer(StandardAnalyzer):
    """StandardTokenizer -> LowerCase -> StopFilter ->
    ReverseStringFilter: every term stored reversed. Query side: a
    leading wildcard ``*suffix`` becomes PrefixQuery(reverse(suffix))
    against this index. 1:1 per unique term -> Arrow fast path kept."""

    def term_filter_unique(self, uniques: np.ndarray) -> np.ndarray:
        out = np.empty(len(uniques), dtype=object)
        for i, t in enumerate(uniques):
            out[i] = t if ":" in t else t[::-1]
        return out

    def analyze(self, text: str):
        from .analyzer import Analyzed

        a = super().analyze(text)
        return Analyzed([t[::-1] for t in a.tokens], a.positions)


class PatternAnalyzer(StandardAnalyzer):
    """Lowercase + regex-split tokenizer (PatternAnalyzer.cs:45); the
    split regex is the part after ``"pattern:"`` in the chain name."""

    arrow_fast_path = False  # custom split; not the shared re2 pipeline

    def __init__(self, pattern: str, *args, **kw):
        super().__init__(*args, **kw)
        self.pattern = pattern
        self._split_re = re.compile(pattern)
        # a capturing group would make re.split LEAK the separators into
        # the token stream (PatternAnalyzer.cs splits non-capturing
        # always) — reject with the clear-error convention
        if self._split_re.groups:
            raise ValueError(
                f"pattern {pattern!r} has a capturing group, which would "
                "emit separators as tokens — use (?:...) instead"
            )

    def tokenize(self, text: str) -> list[str]:
        if not text:
            return []
        return [
            t for t in self._split_re.split(text.lower())
            if t and len(t) <= self.max_token_length
        ]


def parse_synonym_spec(spec: str) -> dict[str, str]:
    """Parse a ``alias>canonical`` comma list (the chain-name payload of
    ``"synonyms:<spec>"``) into an alias -> canonical map. Whitespace is
    not allowed (the name is a config fingerprint); raises on malformed
    pairs or transitive chains (an alias whose canonical is itself an
    alias), which the reference resolves at SynonymMap build time."""
    m: dict[str, str] = {}
    for pair in spec.split(","):
        if not pair:
            continue
        alias, sep, canon = pair.partition(">")
        if not sep or not alias or not canon:
            raise ValueError(f"malformed synonym pair {pair!r}")
        if any(ch.isspace() for ch in pair):
            raise ValueError(f"whitespace in synonym pair {pair!r}")
        if pair != pair.lower():
            raise ValueError(
                f"uppercase in synonym pair {pair!r}: the chain matches "
                "LOWERCASED tokens, so an uppercase entry can never fire"
            )
        m[alias] = canon
    for alias, canon in m.items():
        if canon in m:
            raise ValueError(
                f"transitive synonym chain {alias!r} -> {canon!r} -> "
                f"{m[canon]!r}: resolve to the final canonical first"
            )
    return m


class SynonymAnalyzer(StandardAnalyzer):
    """SynonymFilter analogue (Analysis/Synonym/SynonymFilter.cs:33,
    SynonymMap.cs), index-time COLLAPSE form: every alias term rewrites
    to its canonical, so one postings list serves the whole synonym
    group and a TermQuery on the canonical matches every variant. The
    reference's default is 1:many injection (alias AND canonical both
    emitted at posIncr 0); the collapse form is its equivalence-class
    dual — group recall identical, index smaller — and the 1:many
    direction is already served query-side by SpanOrQuery synonym
    clauses and MultiPhraseQuery. Documented divergence.

    The map rides the chain NAME (``"synonyms:line>row,rows>row"``), so
    the index stats commit fingerprints it and the Searcher rebuilds the
    identical query-side chain — the PerFieldAnalyzerWrapper contract.
    1:1 per unique term -> Arrow fast path kept."""

    def __init__(self, spec: str, *args, **kw):
        super().__init__(*args, **kw)
        self.spec = spec
        self.synonyms = parse_synonym_spec(spec)

    def term_filter_unique(self, uniques: np.ndarray) -> np.ndarray:
        syn = self.synonyms
        out = np.empty(len(uniques), dtype=object)
        for i, t in enumerate(uniques):
            out[i] = t if ":" in t else syn.get(t, t)
        return out

    def analyze(self, text: str):
        from .analyzer import Analyzed

        a = super().analyze(text)
        syn = self.synonyms
        return Analyzed([syn.get(t, t) for t in a.tokens], a.positions)


class EdgeNGramAnalyzer(StandardAnalyzer):
    """EdgeNGramTokenFilter analogue (Analysis/NGram/
    EdgeNGramTokenFilter.cs:40, Side.FRONT): each token emits its
    prefixes of length minGram..maxGram (fixed 2..5 here — the
    autocomplete-index shape); tokens shorter than minGram emit
    nothing, exactly the reference's gram-window semantics. 1:many per
    token -> generic row path."""

    arrow_fast_path = False
    min_gram, max_gram = 2, 5

    def tokenize(self, text: str) -> list[str]:
        out: list[str] = []
        lo, hi = self.min_gram, self.max_gram
        for t in super().tokenize(text):
            out.extend(t[:k] for k in range(lo, min(hi, len(t)) + 1))
        return out


class NGramAnalyzer(StandardAnalyzer):
    """NGramTokenFilter analogue (Analysis/NGram/NGramTokenFilter.cs:38):
    each token emits ALL its substrings of length n (fixed trigrams
    here — the substring-match / fuzzy-recall index shape); tokens
    shorter than n emit nothing. 1:many per token -> generic row path."""

    arrow_fast_path = False
    n = 3

    def tokenize(self, text: str) -> list[str]:
        out: list[str] = []
        n = self.n
        for t in super().tokenize(text):
            out.extend(t[i:i + n] for i in range(len(t) - n + 1))
        return out


class PathHierarchyAnalyzer(StandardAnalyzer):
    """The whole (lowercased, trimmed) input is one '/'-delimited path;
    emit every ancestor prefix (PathHierarchyTokenizer.cs:38)."""

    arrow_fast_path = False  # whole-row token; not the shared split

    def tokenize(self, text: str) -> list[str]:
        if not text:
            return []
        parts = [p for p in text.strip().lower().split("/") if p]
        return ["/".join(parts[: i + 1]) for i in range(len(parts))]
