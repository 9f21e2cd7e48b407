"""The default analysis chain: tokenize -> lowercase -> stop-filter.

Modeled on the reference's StandardAnalyzer pipeline
(src/Lucene.Net.Analysis.Common/Analysis/Standard/StandardAnalyzer.cs:102-108
= StandardTokenizer -> StandardFilter(no-op) -> LowerCaseFilter -> StopFilter)
but defined from scratch for cross-engine parity:

- **Tokens** are maximal runs of Unicode letters/digits (underscore excluded)
  of the lowercased text. This matches the reference tokenizer on
  alphanumeric ASCII text (its UAX#29 ALPHANUM class); we intentionally
  express it as ONE regex that has identical semantics in Python ``re``
  (``[^\\W_]+``), Java regex used by Spark (``[\\p{L}\\p{N}]+``) and RE2 used
  by DuckDB (``[\\pL\\pN]+``) so the Spark plan, the pandas kernel and the SQL
  oracle all tokenize identically.
- Tokens longer than 255 chars are dropped (StandardAnalyzer.cs:52
  DEFAULT_MAX_TOKEN_LENGTH; the reference truncates the stream at maxlen by
  discarding over-long tokens).
- The 33-word English stop set is the reference's
  (Analysis/Core/StopAnalyzer.cs:52-58), applied after lowercasing.
- Positions: the StopFilter preserves position increments
  (Analysis/Core/StopFilter.cs:38), so surviving tokens keep their
  pre-stop-filter position. Field length for norms is the POST-stop token
  count (DocInverterPerField.cs:160,197 with no 0-increment tokens in this
  chain — SURVEY.md §2.1).

Everything is vectorized over pandas Series — these functions run inside
``mapInPandas`` on Arrow batches, never per-row Python UDFs.
"""

from __future__ import annotations

import re
from typing import NamedTuple

import numpy as np
import pandas as pd

MAX_TOKEN_LENGTH = 255

# One tokenizer, three dialects (identical semantics on letter/digit runs):
TOKEN_RE_PYTHON = r"[^\W_]+"          # Python re, with re.UNICODE
TOKEN_RE_SQL = r"[\p{L}\p{N}]+"       # Java (Spark) and RE2 (DuckDB)

_TOKEN_PATTERN = re.compile(TOKEN_RE_PYTHON, re.UNICODE)

# Reference stop set: StopAnalyzer.cs:52-58 (33 words).
ENGLISH_STOP_WORDS = frozenset(
    """a an and are as at be but by for if in into is it no not of on or such
    that the their then there these they this to was will with""".split()
)


class Analyzed(NamedTuple):
    tokens: list[str]
    positions: list[int]  # pre-stop-filter positions (gaps where stopwords were)


class StandardAnalyzer:
    def __init__(
        self,
        stop_words: frozenset[str] = ENGLISH_STOP_WORDS,
        max_token_length: int = MAX_TOKEN_LENGTH,
    ):
        self.stop_words = stop_words
        self.max_token_length = max_token_length

    def tokenize(self, text: str) -> list[str]:
        """Lowercase + split into letter/digit runs; drop over-long tokens.
        No stop filtering (the StringField/keyword analogue of raw terms)."""
        if not text:
            return []
        toks = _TOKEN_PATTERN.findall(text.lower())
        ml = self.max_token_length
        return [t for t in toks if len(t) <= ml]

    def analyze(self, text: str) -> Analyzed:
        """Full chain with positions. Position = index in the pre-stop token
        stream, so phrase matching sees the same gaps the reference does."""
        toks = self.tokenize(text)
        sw = self.stop_words
        out_t: list[str] = []
        out_p: list[int] = []
        for pos, t in enumerate(toks):
            if t not in sw:
                out_t.append(t)
                out_p.append(pos)
        return Analyzed(out_t, out_p)

    def analyze_query(self, text: str) -> list[str]:
        """Query-side analysis (same chain, positions unneeded)."""
        return self.analyze(text).tokens


_DEFAULT = StandardAnalyzer()


def tokenize_series(texts: pd.Series, analyzer: StandardAnalyzer = _DEFAULT) -> pd.Series:
    """Vectorized tokenize (no stop filter) -> Series of list[str]."""
    return texts.fillna("").map(analyzer.tokenize)


def analyze_flat(
    texts: pd.Series, analyzer: StandardAnalyzer = _DEFAULT
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized full chain over a batch, FLAT output (the shape the
    inversion kernel wants):

    returns ``(tokens, doc_idx, positions, doclens)`` where tokens/doc_idx/
    positions are aligned flat arrays over all surviving tokens of the batch
    (doc_idx = 0-based row index into ``texts``; positions = pre-stop-filter
    token index within the doc, matching :meth:`StandardAnalyzer.analyze`)
    and doclens[i] = post-stop token count of row i (0 for empty docs).

    Semantics are identical to ``analyze()`` row-by-row (asserted by
    tests/test_analyzer.py); the difference is that every per-token step —
    explode, position numbering, stop/length filtering — runs inside
    pandas/numpy C loops instead of per-row Python. This is the indexing
    hot path (DocInverterPerField analogue, DocInverterPerField.cs:150-197).
    """
    n = len(texts)
    s = texts.fillna("").str.lower()
    s.index = pd.RangeIndex(n)
    tok_lists = s.str.findall(_TOKEN_PATTERN)
    flat = tok_lists.explode().dropna()
    if len(flat) == 0:
        empty_o = np.array([], dtype=object)
        empty_i = np.array([], dtype=np.int64)
        return empty_o, empty_i, empty_i, np.zeros(n, dtype=np.int64)
    # 255-char cap first (tokenize() drops overlong tokens before numbering)
    flat = flat[flat.str.len() <= analyzer.max_token_length]
    doc_idx_all = flat.index.to_numpy(np.int64)
    # pre-stop position = rank within doc after the cap filter
    pos_all = flat.groupby(level=0).cumcount().to_numpy(np.int64)
    keep = ~flat.isin(analyzer.stop_words).to_numpy()
    tokens = flat.to_numpy(dtype=object)[keep]
    doc_idx = doc_idx_all[keep]
    positions = pos_all[keep]
    doclens = np.zeros(n, dtype=np.int64)
    if len(doc_idx):
        uniq, cnt = np.unique(doc_idx, return_counts=True)
        doclens[uniq] = cnt
    return tokens, doc_idx, positions, doclens


def analyze_series(
    texts: pd.Series, analyzer: StandardAnalyzer = _DEFAULT
) -> tuple[pd.Series, pd.Series, np.ndarray]:
    """Vectorized full chain -> (tokens, positions, field_len) aligned Series.

    field_len is the post-stop token count used for the norm byte.
    """
    analyzed = texts.fillna("").map(analyzer.analyze)
    tokens = analyzed.map(lambda a: a.tokens)
    positions = analyzed.map(lambda a: a.positions)
    lengths = np.fromiter((len(a.tokens) for a in analyzed), dtype=np.int64, count=len(analyzed))
    return tokens, positions, lengths
