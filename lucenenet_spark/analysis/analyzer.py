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

# Unicode tokenizer, UAX#29-style word classes (StandardTokenizer.cs:54-105):
# - IDEOGRAPHIC/HIRAGANA (StandardTokenizer.cs:84-102): each Han or Hiragana
#   character is its OWN single-char token
# - KATAKANA: maximal Katakana runs are one token, and a run never joins an
#   adjacent Latin/digit run
# - everything else: maximal letter/digit runs (ALPHANUM/NUM/HANGUL classes;
#   underscore excluded)
# The same semantics are expressed twice: one Python regex (findall), and a
# two-step Arrow pipeline (space-pad the CJK classes, then split on
# non-letter/digit) — asserted identical by tests/test_analyzer.py.
_IDEO_RANGES = "\u3040-\u309f\u3400-\u4dbf\u4e00-\u9fff\uf900-\ufaff"  # Hiragana + Han
_KATAKANA = "\u30a0-\u30ff"


def _mark_ranges_class() -> str:
    """Regex character-class body covering every BMP combining mark
    (general category M*). UAX#29 WordBreak treats marks as Extend \u2014
    they continue the word they follow (StandardTokenizer.cs keeps
    Devanagari matras, Arabic harakat, Hebrew points inside tokens).
    Python's ``\\w`` excludes them, so the class is generated from
    unicodedata once at import and appended to the word-run production;
    the RE2/Java forms use ``\\p{M}`` natively (identical over the BMP,
    asserted by tests/test_analyzer.py's Python-vs-Arrow parity)."""
    import unicodedata

    ranges: list[tuple[int, int]] = []
    for cp in range(0x10000):
        if unicodedata.category(chr(cp)).startswith("M"):
            if ranges and ranges[-1][1] == cp - 1:
                ranges[-1] = (ranges[-1][0], cp)
            else:
                ranges.append((cp, cp))
    return "".join(
        chr(a) if a == b else f"{chr(a)}-{chr(b)}" for a, b in ranges
    )


_MARKS = _mark_ranges_class()
TOKEN_RE_PYTHON = (
    rf"[{_IDEO_RANGES}]|[{_KATAKANA}]+"
    rf"|(?:(?![{_IDEO_RANGES}{_KATAKANA}])(?:[^\W_]|[{_MARKS}]))+"
)
# RE2 (pyarrow) pre-pad pattern: isolate each ideograph / katakana run with
# spaces so the plain letter/digit split then yields the same tokens
CJK_PAD_RE2 = f"([{_IDEO_RANGES}]|[{_KATAKANA}]+)"
TOKEN_RE_SQL = r"[\p{L}\p{M}\p{N}]+"   # Java (Spark) and RE2 (DuckDB) run form
SPLIT_RE_RE2 = r"[^\p{L}\p{M}\p{N}]+"  # RE2 split form (pyarrow compute)

# ASCII-restricted variant: maximal [a-z0-9] runs of the LOWERCASED text.
# Identical in every engine's regex dialect (no Unicode classes involved) —
# used when the index must agree bit-for-bit with an external SQL oracle
# whose tokenizer is the plain split ``[^a-z0-9]+`` (__spark_entry__.py).
# On pure-ASCII alphanumeric text it equals the Unicode tokenizer.
TOKEN_RE_PYTHON_ASCII = r"[a-z0-9]+"
SPLIT_RE_RE2_ASCII = r"[^a-z0-9]+"

_TOKEN_PATTERN = re.compile(TOKEN_RE_PYTHON, re.UNICODE)
_TOKEN_PATTERN_ASCII = re.compile(TOKEN_RE_PYTHON_ASCII)

# Reference stop set: StopAnalyzer.cs:52-58 (33 words).
ENGLISH_STOP_WORDS = frozenset(
    """a an and are as at be but by for if in into is it no not of on or such
    that the their then there these they this to was will with""".split()
)


class Analyzed(NamedTuple):
    tokens: list[str]
    positions: list[int]  # pre-stop-filter positions (gaps where stopwords were)


class StandardAnalyzer:
    #: chains whose tokenize/stop semantics are expressible as ONE re2
    #: split (split_re_re2 + optional CJK pad) ride the Arrow C++ kernel in
    #: analyze_flat_arrow; others drop to the row-at-a-time fallback.
    #: This is the CAPABILITY flag, honored for subclasses too: a custom
    #: chain that only overrides term_filter_unique (the stemmer/pack hook)
    #: inherits the fast path. The effective gate is arrow_fast_path_for():
    #: a subclass that overrides tokenize() is AUTO-detected and dropped to
    #: the generic row path (its semantics aren't the re2 split); set this
    #: False explicitly for chains that diverge in other ways.
    arrow_fast_path = True
    #: pad CJK classes before the split (UAX#29 single-char ideograph
    #: tokens) — letter-run analyzers (Simple/Stop) switch this off
    cjk_pad = True

    def __init__(
        self,
        stop_words: frozenset[str] = ENGLISH_STOP_WORDS,
        max_token_length: int = MAX_TOKEN_LENGTH,
        ascii_only: bool = False,
    ):
        self.stop_words = stop_words
        self.max_token_length = max_token_length
        self.ascii_only = ascii_only
        self._pattern = _TOKEN_PATTERN_ASCII if ascii_only else _TOKEN_PATTERN
        self.split_re_re2 = SPLIT_RE_RE2_ASCII if ascii_only else SPLIT_RE_RE2

    def term_filter_unique(self, uniques: np.ndarray) -> np.ndarray | None:
        """Vectorized-over-VOCABULARY term rewrite hook (TokenFilter
        analogue for filters that map token -> token, e.g. a stemmer).
        Called with the batch's UNIQUE terms after dictionary encoding, so
        per-term Python cost amortizes over term frequency. None = no
        rewrite (the default chain)."""
        return None

    def tokenize(self, text: str) -> list[str]:
        """Lowercase + split into letter/digit runs; drop over-long tokens.
        No stop filtering (the StringField/keyword analogue of raw terms)."""
        if not text:
            return []
        toks = self._pattern.findall(text.lower())
        ml = self.max_token_length
        return [t for t in toks if len(t) <= ml]

    def tokenize_arrow(self, texts):
        """Arrow-native tokenization of a whole string column -> ListArray
        of RAW tokens (empty-string artifacts and over-long tokens are
        dropped downstream by analyze_flat_arrow's shared filter). The
        default is the one-re2-split equivalent of :meth:`tokenize`;
        shipped chains with different split semantics (Whitespace, Keyword)
        override it with their own Arrow expression — an override DECLARES
        Arrow/Python tokenize equivalence, which the suite asserts."""
        import pyarrow.compute as pc

        low = pc.utf8_lower(texts)
        if not self.ascii_only and self.cjk_pad:
            # UAX#29 CJK classes: isolate ideographs / katakana runs so the
            # letter/digit split emits them as their own tokens (identical
            # to the TOKEN_RE_PYTHON alternation)
            low = pc.replace_substring_regex(
                low, pattern=CJK_PAD_RE2, replacement=" \\1 "
            )
        return pc.split_pattern_regex(low, self.split_re_re2)

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


class EnglishAnalyzer(StandardAnalyzer):
    """EnglishAnalyzer (Analysis/En/EnglishAnalyzer.cs chain minus the
    possessive filter): StandardTokenizer -> LowerCase -> StopFilter ->
    PorterStemFilter (Analysis/En/PorterStemFilter.cs). Divergence note:
    the reference's UAX#29 tokenizer keeps "dog's" as one token for the
    possessive filter to strip; our tokenizer already splits on the
    apostrophe ("dog", "s"), so no possessive filter exists or is needed.

    Indexing stays on the Arrow fast path: tokenize/lower/stop run in C++
    and the stemmer applies per UNIQUE term at dictionary-encode time
    (term_filter_unique), so Python cost is per vocabulary entry per
    segment, not per token."""

    def term_filter_unique(self, uniques: np.ndarray) -> np.ndarray:
        from .porter import stem_unique

        return stem_unique(uniques)

    def analyze(self, text: str) -> Analyzed:
        from .porter import porter_stem

        a = super().analyze(text)
        return Analyzed(
            [
                porter_stem(t) if t.isascii() and t.isalpha() else t
                for t in a.tokens
            ],
            a.positions,
        )


class FrenchLightAnalyzer(StandardAnalyzer):
    """FrenchAnalyzer (Analysis/Fr/FrenchAnalyzer.cs:187-212 chain):
    StandardTokenizer -> Elision -> LowerCase -> StopFilter(French) ->
    FrenchLightStemFilter (the UniNE light stemmer, Savoy SAC 2006 —
    Analysis/Fr/FrenchLightStemmer.cs:69-350). Divergence note: the
    reference's ElisionFilter strips "l'" from "l'avion" inside one UAX#29
    token; our tokenizer already splits on the apostrophe, so elision is
    realized by including the article tokens (l, d, qu, ...) in the stop
    set (analysis/french.py FRENCH_STOP_WORDS) — same pattern as
    EnglishAnalyzer's possessive note.

    Indexing stays on the Arrow fast path: the stem applies per UNIQUE
    term at dictionary-encode time (term_filter_unique)."""

    def term_filter_unique(self, uniques: np.ndarray) -> np.ndarray:
        from .french import stem_unique

        return stem_unique(uniques)

    def analyze(self, text: str) -> Analyzed:
        from .french import french_light_stem

        a = super().analyze(text)
        return Analyzed([french_light_stem(t) for t in a.tokens], a.positions)


class GermanLightAnalyzer(StandardAnalyzer):
    """GermanAnalyzer (Analysis/De/GermanAnalyzer.cs:171-180 chain):
    StandardTokenizer -> LowerCase -> StopFilter(German) ->
    GermanNormalizationFilter -> GermanLightStemFilter (the UniNE light
    stemmer, Savoy SAC 2006). Normalization folds umlauts / expands
    eszett / deletes the digraph 'e' (mueller == m-umlaut-ller), then the
    light stemmer strips plural/declension suffixes. Both run per UNIQUE
    term at dictionary-encode time (Arrow fast path stays hot)."""

    def term_filter_unique(self, uniques: np.ndarray) -> np.ndarray:
        from .german import stem_unique

        return stem_unique(uniques)

    def analyze(self, text: str) -> Analyzed:
        from .german import german_term

        a = super().analyze(text)
        return Analyzed([german_term(t) for t in a.tokens], a.positions)


class PortugueseLightAnalyzer(StandardAnalyzer):
    """PortugueseAnalyzer (Analysis/Pt/PortugueseAnalyzer.cs:119-133
    chain): StandardTokenizer -> LowerCase -> StopFilter(Portuguese) ->
    PortugueseLightStemFilter (the UniNE/RSLP light rules — published in
    Orengo & Huyck SPIRE 2001 + Savoy SAC 2006; see analysis/portuguese.py).
    Runs per UNIQUE term at dictionary-encode time (Arrow fast path
    stays hot)."""

    def term_filter_unique(self, uniques: np.ndarray) -> np.ndarray:
        from .portuguese import stem_unique

        return stem_unique(uniques)

    def analyze(self, text: str) -> Analyzed:
        from .portuguese import portuguese_light_stem

        a = super().analyze(text)
        return Analyzed([portuguese_light_stem(t) for t in a.tokens], a.positions)


class DutchSnowballAnalyzer(StandardAnalyzer):
    """DutchAnalyzer (Analysis/Nl/DutchAnalyzer.cs:47 chain):
    StandardTokenizer -> LowerCase -> StopFilter(Dutch) -> Snowball Dutch
    stemmer (original implementation of the PUBLISHED algorithm,
    snowballstem.org — see analysis/dutch.py; the reference runs the
    tartarus DutchStemmer, the same algorithm). Runs per UNIQUE term at
    dictionary-encode time (Arrow fast path stays hot). The reference's
    stem-override dictionary (DutchAnalyzer stemdict: fiets/ei exceptions)
    is omitted — documented divergence."""

    def term_filter_unique(self, uniques: np.ndarray) -> np.ndarray:
        from .dutch import stem_unique

        return stem_unique(uniques)

    def analyze(self, text: str) -> Analyzed:
        from .dutch import dutch_stem

        a = super().analyze(text)
        return Analyzed([dutch_stem(t) for t in a.tokens], a.positions)


class SpanishLightAnalyzer(StandardAnalyzer):
    """SpanishAnalyzer (Analysis/Es/SpanishAnalyzer.cs:120-140 chain):
    StandardTokenizer -> LowerCase -> StopFilter(Spanish) ->
    SpanishLightStemFilter (the UniNE light stemmer, Savoy SAC 2006 —
    Analysis/Es/SpanishLightStemmer.cs:63-100): accent fold, then one
    final-vowel / plural-s suffix strip (-ces -> -z for -z-noun plurals).
    Runs per UNIQUE term at dictionary-encode time (Arrow fast path
    stays hot)."""

    def term_filter_unique(self, uniques: np.ndarray) -> np.ndarray:
        from .spanish import stem_unique

        return stem_unique(uniques)

    def analyze(self, text: str) -> Analyzed:
        from .spanish import spanish_light_stem

        a = super().analyze(text)
        return Analyzed([spanish_light_stem(t) for t in a.tokens], a.positions)


class ItalianLightAnalyzer(StandardAnalyzer):
    """ItalianAnalyzer (Analysis/It/ItalianAnalyzer.cs:130-155 chain):
    StandardTokenizer -> Elision -> LowerCase -> StopFilter(Italian) ->
    ItalianLightStemFilter (the UniNE light stemmer —
    Analysis/It/ItalianLightStemmer.cs:63-110): accent fold, then one
    final-vowel strip with the -he/-hi/-ie hard-consonant plural rules.
    Elision is realized by stopping the split article tokens (same note
    as the French pack). Runs per UNIQUE term at dictionary-encode time
    (Arrow fast path stays hot)."""

    def term_filter_unique(self, uniques: np.ndarray) -> np.ndarray:
        from .italian import stem_unique

        return stem_unique(uniques)

    def analyze(self, text: str) -> Analyzed:
        from .italian import italian_light_stem

        a = super().analyze(text)
        return Analyzed([italian_light_stem(t) for t in a.tokens], a.positions)


class RussianLightAnalyzer(StandardAnalyzer):
    """RussianAnalyzer (Analysis/Ru/RussianAnalyzer.cs:48 chain):
    StandardTokenizer -> LowerCase -> StopFilter(Russian) ->
    RussianLightStemFilter (UniNE-family light stemmer over the published
    Snowball case-ending inventories — see analysis/russian.py). Only
    Cyrillic terms are rewritten; Latin tokens in a mixed corpus pass
    through. Runs per UNIQUE term at dictionary-encode time (Arrow fast
    path stays hot)."""

    def term_filter_unique(self, uniques: np.ndarray) -> np.ndarray:
        from .russian import stem_unique

        return stem_unique(uniques)

    def analyze(self, text: str) -> Analyzed:
        from .russian import russian_light_stem

        a = super().analyze(text)
        return Analyzed([russian_light_stem(t) for t in a.tokens], a.positions)


class SwedishLightAnalyzer(StandardAnalyzer):
    """SwedishAnalyzer (Analysis/Sv/SwedishAnalyzer.cs:120 chain):
    StandardTokenizer -> LowerCase -> StopFilter(Swedish) ->
    SwedishLightStemFilter (UniNE-family light stemmer — see
    analysis/swedish.py: -ar/-er/-or declensions, definite forms, the
    -het family, -are/-ast, -ande/-else). Runs per UNIQUE term at
    dictionary-encode time (Arrow fast path stays hot)."""

    def term_filter_unique(self, uniques: np.ndarray) -> np.ndarray:
        from .swedish import stem_unique

        return stem_unique(uniques)

    def analyze(self, text: str) -> Analyzed:
        from .swedish import swedish_light_stem

        a = super().analyze(text)
        return Analyzed([swedish_light_stem(t) for t in a.tokens], a.positions)


class ArabicLightAnalyzer(StandardAnalyzer):
    """ArabicAnalyzer (Analysis/Ar/ArabicAnalyzer.cs:43 chain):
    StandardTokenizer -> LowerCase -> StopFilter(Arabic) ->
    ArabicNormalizationFilter -> ArabicStemFilter (the PUBLISHED light10
    stemmer, Larkey et al. SIGIR 2002 — see analysis/arabic.py). Only
    Arabic-script terms are rewritten. Runs per UNIQUE term at
    dictionary-encode time (Arrow fast path stays hot)."""

    def term_filter_unique(self, uniques: np.ndarray) -> np.ndarray:
        from .arabic import stem_unique

        return stem_unique(uniques)

    def analyze(self, text: str) -> Analyzed:
        from .arabic import arabic_light_stem

        a = super().analyze(text)
        return Analyzed([arabic_light_stem(t) for t in a.tokens], a.positions)


class IndonesianAnalyzer(StandardAnalyzer):
    """IndonesianAnalyzer (Analysis/Id/IndonesianAnalyzer.cs:43 chain):
    StandardTokenizer -> LowerCase -> StopFilter(Indonesian) ->
    IndonesianStemFilter (the PUBLISHED Tala 2003 algorithm, light form —
    see analysis/indonesian.py; prefix recoding omitted, documented).
    Runs per UNIQUE term at dictionary-encode time (Arrow fast path
    stays hot)."""

    def term_filter_unique(self, uniques: np.ndarray) -> np.ndarray:
        from .indonesian import stem_unique

        return stem_unique(uniques)

    def analyze(self, text: str) -> Analyzed:
        from .indonesian import indonesian_stem

        a = super().analyze(text)
        return Analyzed([indonesian_stem(t) for t in a.tokens], a.positions)


class FinnishLightAnalyzer(StandardAnalyzer):
    """FinnishAnalyzer (Analysis/Fi/FinnishAnalyzer.cs:120 chain):
    StandardTokenizer -> LowerCase -> StopFilter(Finnish) ->
    FinnishLightStemFilter (UniNE-family light stemmer over the frequent
    case/number endings — see analysis/finnish.py). Runs per UNIQUE term
    at dictionary-encode time (Arrow fast path stays hot)."""

    def term_filter_unique(self, uniques: np.ndarray) -> np.ndarray:
        from .finnish import stem_unique

        return stem_unique(uniques)

    def analyze(self, text: str) -> Analyzed:
        from .finnish import finnish_light_stem

        a = super().analyze(text)
        return Analyzed([finnish_light_stem(t) for t in a.tokens], a.positions)


class HungarianLightAnalyzer(StandardAnalyzer):
    """HungarianAnalyzer (Analysis/Hu/HungarianAnalyzer.cs:120 chain):
    StandardTokenizer -> LowerCase -> StopFilter(Hungarian) ->
    HungarianLightStemFilter (UniNE-family light stemmer over the
    vowel-harmony case endings + plural — see analysis/hungarian.py).
    Runs per UNIQUE term at dictionary-encode time (Arrow fast path
    stays hot)."""

    def term_filter_unique(self, uniques: np.ndarray) -> np.ndarray:
        from .hungarian import stem_unique

        return stem_unique(uniques)

    def analyze(self, text: str) -> Analyzed:
        from .hungarian import hungarian_light_stem

        a = super().analyze(text)
        return Analyzed([hungarian_light_stem(t) for t in a.tokens], a.positions)


class NorwegianLightAnalyzer(StandardAnalyzer):
    """NorwegianAnalyzer (Analysis/No/NorwegianAnalyzer.cs:120 chain):
    StandardTokenizer -> LowerCase -> StopFilter(Norwegian) ->
    NorwegianLightStemFilter (Nordic-light stemmer: declensions, -het
    family, participles — see analysis/norwegian.py). Runs per UNIQUE
    term at dictionary-encode time (Arrow fast path stays hot)."""

    def term_filter_unique(self, uniques: np.ndarray) -> np.ndarray:
        from .norwegian import stem_unique

        return stem_unique(uniques)

    def analyze(self, text: str) -> Analyzed:
        from .norwegian import norwegian_light_stem

        a = super().analyze(text)
        return Analyzed([norwegian_light_stem(t) for t in a.tokens], a.positions)


class DanishLightAnalyzer(StandardAnalyzer):
    """DanishAnalyzer (Analysis/Da/DanishAnalyzer.cs:120 chain, Snowball
    stemmer replaced by the documented light variant): StandardTokenizer
    -> LowerCase -> StopFilter(Danish) -> DanishLightStemFilter
    (declensions, -hed family, participles, final-consonant undoubling —
    see analysis/danish.py). Runs per UNIQUE term at dictionary-encode
    time (Arrow fast path stays hot)."""

    def term_filter_unique(self, uniques: np.ndarray) -> np.ndarray:
        from .danish import stem_unique

        return stem_unique(uniques)

    def analyze(self, text: str) -> Analyzed:
        from .danish import danish_light_stem

        a = super().analyze(text)
        return Analyzed([danish_light_stem(t) for t in a.tokens], a.positions)


class CzechLightAnalyzer(StandardAnalyzer):
    """CzechAnalyzer (Analysis/Cz/CzechAnalyzer.cs:60 chain):
    StandardTokenizer -> LowerCase -> StopFilter(Czech) -> CzechStemFilter
    (the PUBLISHED Dolamic & Savoy light stemmer: case endings,
    possessives, palatalization normalization — see analysis/czech.py).
    Runs per UNIQUE term at dictionary-encode time (Arrow fast path
    stays hot)."""

    def term_filter_unique(self, uniques: np.ndarray) -> np.ndarray:
        from .czech import stem_unique

        return stem_unique(uniques)

    def analyze(self, text: str) -> Analyzed:
        from .czech import czech_light_stem

        a = super().analyze(text)
        return Analyzed([czech_light_stem(t) for t in a.tokens], a.positions)


class BulgarianLightAnalyzer(StandardAnalyzer):
    """BulgarianAnalyzer (Analysis/Bg/BulgarianAnalyzer.cs:55 chain):
    StandardTokenizer -> LowerCase -> StopFilter(Bulgarian) ->
    BulgarianStemFilter (the PUBLISHED BulStem-family light rules:
    definite article, plural, link vowel — see analysis/bulgarian.py).
    Only Cyrillic terms are rewritten. Runs per UNIQUE term at
    dictionary-encode time (Arrow fast path stays hot)."""

    def term_filter_unique(self, uniques: np.ndarray) -> np.ndarray:
        from .bulgarian import stem_unique

        return stem_unique(uniques)

    def analyze(self, text: str) -> Analyzed:
        from .bulgarian import bulgarian_light_stem

        a = super().analyze(text)
        return Analyzed([bulgarian_light_stem(t) for t in a.tokens], a.positions)


class PersianAnalyzer(StandardAnalyzer):
    """PersianAnalyzer (Analysis/Fa/PersianAnalyzer.cs:48 chain):
    StandardTokenizer -> LowerCase -> Arabic+Persian normalization ->
    StopFilter(Persian) — NO stemmer, matching the reference (see
    analysis/persian.py). Only Arabic-script terms are touched. Runs per
    UNIQUE term at dictionary-encode time (Arrow fast path stays hot).

    Note: the stop list is matched AFTER normalization here (entries are
    stored normalized), whereas the reference normalizes before its stop
    filter too — same observable behavior."""

    def term_filter_unique(self, uniques: np.ndarray) -> np.ndarray:
        from .persian import stem_unique

        return stem_unique(uniques)

    def analyze(self, text: str) -> Analyzed:
        from .persian import persian_normalize

        a = super().analyze(text)
        return Analyzed([persian_normalize(t) for t in a.tokens], a.positions)


class HindiAnalyzer(StandardAnalyzer):
    """HindiAnalyzer (Analysis/Hi/HindiAnalyzer.cs:47 chain):
    StandardTokenizer -> LowerCase -> Indic/Hindi normalization ->
    StopFilter(Hindi) -> HindiStemFilter (the PUBLISHED Ramanathan & Rao
    light stemmer — see analysis/hindi.py). Only Devanagari terms are
    rewritten. Runs per UNIQUE term at dictionary-encode time (Arrow
    fast path stays hot)."""

    def term_filter_unique(self, uniques: np.ndarray) -> np.ndarray:
        from .hindi import stem_unique

        return stem_unique(uniques)

    def analyze(self, text: str) -> Analyzed:
        from .hindi import hindi_light_stem

        a = super().analyze(text)
        return Analyzed([hindi_light_stem(t) for t in a.tokens], a.positions)


class GreekLightAnalyzer(StandardAnalyzer):
    """GreekAnalyzer (Analysis/El/GreekAnalyzer.cs:40 chain):
    StandardTokenizer -> GreekLowerCase (tonos removal + final sigma) ->
    StopFilter(Greek) -> light stem (UniNE-family inflectional rules —
    see analysis/greek.py; the full Ntais automaton is the documented
    non-goal). Only Greek-script terms are rewritten. Runs per UNIQUE
    term at dictionary-encode time (Arrow fast path stays hot).

    Stop matching note: entries are stored NORMALIZED and the stop filter
    runs before term_filter_unique here, so Greek stopwords written WITH
    tonos in text are normalized by the stem hook instead of dropped —
    the suite pins the normalized-entry behavior."""

    def term_filter_unique(self, uniques: np.ndarray) -> np.ndarray:
        from .greek import stem_unique

        return stem_unique(uniques)

    def analyze(self, text: str) -> Analyzed:
        from .greek import greek_light_stem

        a = super().analyze(text)
        return Analyzed([greek_light_stem(t) for t in a.tokens], a.positions)


class TurkishLightAnalyzer(StandardAnalyzer):
    """TurkishAnalyzer (Analysis/Tr/TurkishAnalyzer.cs:43 chain):
    StandardTokenizer (apostrophe suffixes split off structurally) ->
    TurkishLowerCase (dotted/dotless I repair) -> StopFilter(Turkish) ->
    light stem (UniNE-family case/plural strip — see analysis/turkish.py;
    the Snowball automaton is the documented non-goal). Runs per UNIQUE
    term at dictionary-encode time (Arrow fast path stays hot)."""

    def term_filter_unique(self, uniques: np.ndarray) -> np.ndarray:
        from .turkish import stem_unique

        return stem_unique(uniques)

    def analyze(self, text: str) -> Analyzed:
        from .turkish import turkish_light_stem

        a = super().analyze(text)
        return Analyzed([turkish_light_stem(t) for t in a.tokens], a.positions)


class RomanianLightAnalyzer(StandardAnalyzer):
    """RomanianAnalyzer (Analysis/Ro/RomanianAnalyzer.cs:43 chain):
    StandardTokenizer -> LowerCase -> StopFilter(Romanian) -> light stem
    (UniNE-family enclitic-article + plural strip — see
    analysis/romanian.py). Runs per UNIQUE term at dictionary-encode
    time (Arrow fast path stays hot)."""

    def term_filter_unique(self, uniques: np.ndarray) -> np.ndarray:
        from .romanian import stem_unique

        return stem_unique(uniques)

    def analyze(self, text: str) -> Analyzed:
        from .romanian import romanian_light_stem

        a = super().analyze(text)
        return Analyzed([romanian_light_stem(t) for t in a.tokens], a.positions)


class LatvianLightAnalyzer(StandardAnalyzer):
    """LatvianAnalyzer (Analysis/Lv/LatvianAnalyzer.cs:47 chain):
    StandardTokenizer -> LowerCase -> StopFilter(Latvian) ->
    LatvianStemFilter (the published Kreslins inventory, light form with
    the 2-syllable guard — see analysis/latvian.py). Runs per UNIQUE
    term at dictionary-encode time (Arrow fast path stays hot)."""

    def term_filter_unique(self, uniques: np.ndarray) -> np.ndarray:
        from .latvian import stem_unique

        return stem_unique(uniques)

    def analyze(self, text: str) -> Analyzed:
        from .latvian import latvian_light_stem

        a = super().analyze(text)
        return Analyzed([latvian_light_stem(t) for t in a.tokens], a.positions)


class SoraniAnalyzer(StandardAnalyzer):
    """SoraniAnalyzer (Analysis/Ckb/SoraniAnalyzer.cs chain):
    StandardTokenizer -> SoraniNormalization (yeh/kaf unification, final
    ae-vowel respelling, tatweel/harakat/ZWNJ removal) -> LowerCase ->
    StopFilter(Sorani) -> SoraniStemFilter (the PUBLISHED Esmaili et al.
    2013 suffix inventory — see analysis/sorani.py). Only Arabic-script
    terms are rewritten. Runs per UNIQUE term at dictionary-encode time
    (Arrow fast path stays hot)."""

    def term_filter_unique(self, uniques: np.ndarray) -> np.ndarray:
        from .sorani import stem_unique

        return stem_unique(uniques)

    def analyze(self, text: str) -> Analyzed:
        from .sorani import sorani_light_stem

        a = super().analyze(text)
        return Analyzed([sorani_light_stem(t) for t in a.tokens], a.positions)


class CatalanLightAnalyzer(StandardAnalyzer):
    """CatalanAnalyzer (Analysis/Ca/CatalanAnalyzer.cs:121 chain):
    StandardTokenizer -> Elision (split article tokens stopped — the
    French divergence note) -> LowerCase -> StopFilter(Catalan) -> light
    stem (UniNE-family ending strip + diacritic fold — see
    analysis/catalan.py; the Snowball automaton is the documented
    non-goal). Runs per UNIQUE term at dictionary-encode time (Arrow
    fast path stays hot)."""

    def term_filter_unique(self, uniques: np.ndarray) -> np.ndarray:
        from .catalan import stem_unique

        return stem_unique(uniques)

    def analyze(self, text: str) -> Analyzed:
        from .catalan import catalan_light_stem

        a = super().analyze(text)
        return Analyzed([catalan_light_stem(t) for t in a.tokens], a.positions)


class BasqueLightAnalyzer(StandardAnalyzer):
    """BasqueAnalyzer (Analysis/Eu/BasqueAnalyzer.cs:40 chain):
    StandardTokenizer -> LowerCase -> StopFilter(Basque) -> light
    de-agglutination (determiner + case endings from the published
    Snowball inventory — see analysis/basque.py). Runs per UNIQUE term
    at dictionary-encode time (Arrow fast path stays hot)."""

    def term_filter_unique(self, uniques: np.ndarray) -> np.ndarray:
        from .basque import stem_unique

        return stem_unique(uniques)

    def analyze(self, text: str) -> Analyzed:
        from .basque import basque_light_stem

        a = super().analyze(text)
        return Analyzed([basque_light_stem(t) for t in a.tokens], a.positions)


class ArmenianLightAnalyzer(StandardAnalyzer):
    """ArmenianAnalyzer (Analysis/Hy/ArmenianAnalyzer.cs:40 chain):
    StandardTokenizer -> LowerCase -> StopFilter(Armenian) -> light stem
    (article/plural/case endings from the published Snowball inventory —
    see analysis/armenian.py). Only Armenian-script terms are rewritten.
    Runs per UNIQUE term at dictionary-encode time (Arrow fast path
    stays hot)."""

    def term_filter_unique(self, uniques: np.ndarray) -> np.ndarray:
        from .armenian import stem_unique

        return stem_unique(uniques)

    def analyze(self, text: str) -> Analyzed:
        from .armenian import armenian_light_stem

        a = super().analyze(text)
        return Analyzed([armenian_light_stem(t) for t in a.tokens], a.positions)


class IrishLightAnalyzer(StandardAnalyzer):
    """IrishAnalyzer (Analysis/Ga/IrishAnalyzer.cs:48 chain):
    StandardTokenizer -> hyphenation/elision particles stopped ->
    IrishLowerCase -> StopFilter(Irish) -> demutation + light stem
    (eclipsis/lenition prefix removal + plural ending strip — see
    analysis/irish.py; the Snowball automaton is the documented
    non-goal). Runs per UNIQUE term at dictionary-encode time (Arrow
    fast path stays hot)."""

    def term_filter_unique(self, uniques: np.ndarray) -> np.ndarray:
        from .irish import stem_unique

        return stem_unique(uniques)

    def analyze(self, text: str) -> Analyzed:
        from .irish import irish_light_stem

        a = super().analyze(text)
        return Analyzed([irish_light_stem(t) for t in a.tokens], a.positions)


class GalicianMinimalAnalyzer(StandardAnalyzer):
    """GalicianAnalyzer, minimal variant (Analysis/Gl/GalicianAnalyzer.cs:40
    chain with Gl/GalicianMinimalStemmer.cs:25): StandardTokenizer ->
    LowerCase -> StopFilter(Galician) -> plural-only reduction (published
    RSLP-for-Galician rules — see analysis/galician.py). Runs per UNIQUE
    term at dictionary-encode time (Arrow fast path stays hot)."""

    def term_filter_unique(self, uniques: np.ndarray) -> np.ndarray:
        from .galician import stem_unique

        return stem_unique(uniques)

    def analyze(self, text: str) -> Analyzed:
        from .galician import galician_minimal_stem

        a = super().analyze(text)
        return Analyzed(
            [galician_minimal_stem(t) for t in a.tokens], a.positions
        )


class BrazilianLightAnalyzer(StandardAnalyzer):
    """BrazilianAnalyzer (Analysis/Br/BrazilianAnalyzer.cs:43 chain):
    StandardTokenizer -> LowerCase -> StopFilter(Brazilian) -> RSLP light
    steps (plural -> adverb -> diminutive -> final vowel -> fold, from
    the published Orengo & Huyck 2001 paper — see analysis/brazilian.py;
    the derivational rule tables are the documented non-goal). Distinct
    from the UniNE ``portuguese`` pack, as in the reference. Runs per
    UNIQUE term at dictionary-encode time (Arrow fast path stays hot)."""

    def term_filter_unique(self, uniques: np.ndarray) -> np.ndarray:
        from .brazilian import stem_unique

        return stem_unique(uniques)

    def analyze(self, text: str) -> Analyzed:
        from .brazilian import brazilian_light_stem

        a = super().analyze(text)
        return Analyzed(
            [brazilian_light_stem(t) for t in a.tokens], a.positions
        )


class ASCIIFoldingAnalyzer(StandardAnalyzer):
    """StandardTokenizer -> LowerCase -> StopFilter -> ASCIIFolding
    (Analysis/Miscellaneous/ASCIIFoldingFilter.cs): accented/decomposable
    tokens fold to their ASCII base forms ("café" -> "cafe", "naïve" ->
    "naive"), unmapped scripts pass through. Folding runs AFTER the stop
    filter (same slot as the Porter stemmer), so an accented stopword
    variant ("thé") is folded, not stop-filtered — a documented divergence
    from reference chains that place the filter before StopFilter.

    Indexing stays on the Arrow fast path: the fold applies per UNIQUE
    term at dictionary-encode time (term_filter_unique), so Python cost is
    per vocabulary entry per batch — the EnglishAnalyzer pattern."""

    def term_filter_unique(self, uniques: np.ndarray) -> np.ndarray:
        from .folding import fold_unique

        return fold_unique(uniques)

    def analyze(self, text: str) -> Analyzed:
        from .folding import fold

        a = super().analyze(text)
        return Analyzed([fold(t) for t in a.tokens], a.positions)


class KeywordAnalyzer(StandardAnalyzer):
    """KeywordAnalyzer (Analysis/Core/KeywordAnalyzer.cs): the entire input
    is ONE token, unanalyzed — the StringField chain. Rides the Arrow fast
    path via a trivial tokenize_arrow (0/1-length lists, no lowercase, no
    token-length cap — the value stays verbatim)."""

    def __init__(self):
        super().__init__(stop_words=frozenset())
        # no cap: the whole value IS the token, any length (tokenize()
        # never applied one; the Arrow path's shared cap filter must agree)
        self.max_token_length = 1 << 31

    def tokenize(self, text: str) -> list[str]:
        return [text] if text else []

    def tokenize_arrow(self, texts):
        import pyarrow as pa
        import pyarrow.compute as pc

        keep = pc.fill_null(pc.not_equal(texts, ""), False)
        values = texts.filter(keep)
        offs = np.concatenate(
            [[0], np.cumsum(keep.to_numpy(zero_copy_only=False).astype(np.int32))]
        ).astype(np.int32)
        return pa.ListArray.from_arrays(pa.array(offs, pa.int32()), values)

    def analyze(self, text: str) -> Analyzed:
        toks = self.tokenize(text)
        return Analyzed(toks, list(range(len(toks))))


class WhitespaceAnalyzer(StandardAnalyzer):
    """WhitespaceAnalyzer (Analysis/Core/WhitespaceAnalyzer.cs): split on
    whitespace only, no lowercasing, no stop filter. Rides the Arrow fast
    path via ``utf8_split_whitespace`` (utf8proc UNICODE whitespace, which
    re2's ASCII \\s could not express — the reason this chain used to be
    generic); run-collapse edge artifacts ('' at ends) are dropped by the
    shared downstream filter, so tokens and positions match Python
    str.split() exactly (asserted by the suite's equivalence test)."""

    def __init__(self, max_token_length: int = MAX_TOKEN_LENGTH):
        super().__init__(stop_words=frozenset(), max_token_length=max_token_length)

    def tokenize(self, text: str) -> list[str]:
        if not text:
            return []
        ml = self.max_token_length
        return [t for t in text.split() if len(t) <= ml]

    def tokenize_arrow(self, texts):
        import pyarrow.compute as pc

        return pc.utf8_split_whitespace(texts)


_LETTERS_ONLY: re.Pattern | None = None


def _letters_pattern() -> re.Pattern:
    """Python regex matching maximal Unicode LETTER runs (category L only)
    — the row-path twin of the re2 ``[^\\p{L}]+`` split and the reference's
    ``Char.IsLetter`` (Analysis/Core/LetterTokenizer.cs). ``[^\\W\\d_]``
    alone would also admit the Nl/No number letters (Ⅻ, ①, ㊷ — 1131
    codepoints) that both the re2 fast path and the reference reject, so
    those are excluded via ranges derived from unicodedata at first use
    (lazy: the Arrow path never needs this pattern)."""
    global _LETTERS_ONLY
    if _LETTERS_ONLY is None:
        import unicodedata

        parts: list[tuple[int, int]] = []
        start = prev = None
        for cp in range(0x110000):
            if unicodedata.category(chr(cp)) in ("Nl", "No"):
                if prev == cp - 1:
                    prev = cp
                else:
                    if start is not None:
                        parts.append((start, prev))
                    start = prev = cp
        if start is not None:
            parts.append((start, prev))
        cls = "".join(
            re.escape(chr(a)) + (f"-{re.escape(chr(b))}" if b > a else "")
            for a, b in parts
        )
        _LETTERS_ONLY = re.compile(rf"[^\W\d_{cls}]+", re.UNICODE)
    return _LETTERS_ONLY


class SimpleAnalyzer(StandardAnalyzer):
    """SimpleAnalyzer (Analysis/Core/SimpleAnalyzer.cs): maximal letter runs,
    lowercased — digits split tokens (unlike StandardAnalyzer). Arrow fast
    path: ONE re2 split on non-letters (no CJK pad — letter runs join
    ideographs, matching the Python pattern)."""

    cjk_pad = False

    def __init__(self, max_token_length: int = MAX_TOKEN_LENGTH):
        super().__init__(stop_words=frozenset(), max_token_length=max_token_length)
        self.split_re_re2 = r"[^\p{L}]+"

    def tokenize(self, text: str) -> list[str]:
        if not text:
            return []
        ml = self.max_token_length
        return [t for t in _letters_pattern().findall(text.lower()) if len(t) <= ml]


class StopAnalyzer(StandardAnalyzer):
    """StopAnalyzer (Analysis/Core/StopAnalyzer.cs): SimpleAnalyzer letter
    runs + the English stop set. Same Arrow fast path as SimpleAnalyzer."""

    cjk_pad = False

    def __init__(
        self,
        stop_words: frozenset[str] = ENGLISH_STOP_WORDS,
        max_token_length: int = MAX_TOKEN_LENGTH,
    ):
        super().__init__(stop_words=stop_words, max_token_length=max_token_length)
        self.split_re_re2 = r"[^\p{L}]+"

    def tokenize(self, text: str) -> list[str]:
        if not text:
            return []
        ml = self.max_token_length
        return [t for t in _letters_pattern().findall(text.lower()) if len(t) <= ml]


_SHIPPED_CHAINS = (
    StandardAnalyzer,
    EnglishAnalyzer,
    FrenchLightAnalyzer,
    GermanLightAnalyzer,
    SpanishLightAnalyzer,
    ItalianLightAnalyzer,
    PortugueseLightAnalyzer,
    DutchSnowballAnalyzer,
    ASCIIFoldingAnalyzer,
    KeywordAnalyzer,
    WhitespaceAnalyzer,
    SimpleAnalyzer,
    StopAnalyzer,
)


def arrow_fast_path_for(analyzer: StandardAnalyzer) -> bool:
    """Effective fast-path gate, used by every kernel entry point: the
    analyzer's ``arrow_fast_path`` capability flag AND an unmodified
    ``tokenize()`` (it must come from a shipped chain — an override has
    semantics the re2 split cannot know about, so it drops to the generic
    row path, matching the pre-flag behavior for such subclasses).
    Overriding ``analyze()``/``term_filter_unique`` for a term filter
    keeps the fast path — the EnglishAnalyzer language-pack pattern.
    Fast-path chains ride the Arrow C++ kernel with the term filter
    applied at the dictionary-encode step; generic chains run their full
    ``analyze()`` per row, so encode_terms skips the term filter for those
    to avoid double-application."""
    if not analyzer.arrow_fast_path:
        return False
    if type(analyzer).tokenize_arrow is not StandardAnalyzer.tokenize_arrow:
        # the chain ships its OWN Arrow tokenizer (Whitespace/Keyword) —
        # an override declares tokenize()/tokenize_arrow() equivalence,
        # asserted by the suite for every shipped chain
        return True
    return type(analyzer).tokenize in {c.tokenize for c in _SHIPPED_CHAINS}


_DEFAULT = StandardAnalyzer()


def analyzer_for(
    name: str,
    stop_words: frozenset[str],
    max_token_length: int,
    ascii_only: bool,
) -> StandardAnalyzer:
    """Construct a chain by its config name (IndexConfig.analyzer). Used by
    BOTH the index builder and the Searcher (from the stats commit meta),
    so query-side analysis always matches the chain the index was built
    with — the PerFieldAnalyzerWrapper consistency contract."""
    if name == "standard":
        return StandardAnalyzer(stop_words, max_token_length, ascii_only)
    if name == "english":
        return EnglishAnalyzer(stop_words, max_token_length, ascii_only)
    if name == "french":
        from .french import FRENCH_STOP_WORDS

        # the stop_words argument is an on/off signal here: a build with
        # stop_filter=True passes the English set, but a French chain stops
        # FRENCH words (FrenchAnalyzer.cs:116 DEFAULT_STOP_SET)
        sw = FRENCH_STOP_WORDS if stop_words else frozenset()
        return FrenchLightAnalyzer(sw, max_token_length, ascii_only)
    if name == "german":
        from .german import GERMAN_STOP_WORDS

        sw = GERMAN_STOP_WORDS if stop_words else frozenset()
        return GermanLightAnalyzer(sw, max_token_length, ascii_only)
    if name == "spanish":
        from .spanish import SPANISH_STOP_WORDS

        sw = SPANISH_STOP_WORDS if stop_words else frozenset()
        return SpanishLightAnalyzer(sw, max_token_length, ascii_only)
    if name == "italian":
        from .italian import ITALIAN_STOP_WORDS

        sw = ITALIAN_STOP_WORDS if stop_words else frozenset()
        return ItalianLightAnalyzer(sw, max_token_length, ascii_only)
    if name == "portuguese":
        from .portuguese import PORTUGUESE_STOP_WORDS

        sw = PORTUGUESE_STOP_WORDS if stop_words else frozenset()
        return PortugueseLightAnalyzer(sw, max_token_length, ascii_only)
    if name == "dutch":
        from .dutch import DUTCH_STOP_WORDS

        sw = DUTCH_STOP_WORDS if stop_words else frozenset()
        return DutchSnowballAnalyzer(sw, max_token_length, ascii_only)
    if name == "russian":
        from .russian import RUSSIAN_STOP_WORDS

        sw = RUSSIAN_STOP_WORDS if stop_words else frozenset()
        return RussianLightAnalyzer(sw, max_token_length, ascii_only)
    if name == "swedish":
        from .swedish import SWEDISH_STOP_WORDS

        sw = SWEDISH_STOP_WORDS if stop_words else frozenset()
        return SwedishLightAnalyzer(sw, max_token_length, ascii_only)
    if name == "arabic":
        from .arabic import ARABIC_STOP_WORDS

        sw = ARABIC_STOP_WORDS if stop_words else frozenset()
        return ArabicLightAnalyzer(sw, max_token_length, ascii_only)
    if name == "indonesian":
        from .indonesian import INDONESIAN_STOP_WORDS

        sw = INDONESIAN_STOP_WORDS if stop_words else frozenset()
        return IndonesianAnalyzer(sw, max_token_length, ascii_only)
    if name == "finnish":
        from .finnish import FINNISH_STOP_WORDS

        sw = FINNISH_STOP_WORDS if stop_words else frozenset()
        return FinnishLightAnalyzer(sw, max_token_length, ascii_only)
    if name == "hungarian":
        from .hungarian import HUNGARIAN_STOP_WORDS

        sw = HUNGARIAN_STOP_WORDS if stop_words else frozenset()
        return HungarianLightAnalyzer(sw, max_token_length, ascii_only)
    if name == "norwegian":
        from .norwegian import NORWEGIAN_STOP_WORDS

        sw = NORWEGIAN_STOP_WORDS if stop_words else frozenset()
        return NorwegianLightAnalyzer(sw, max_token_length, ascii_only)
    if name == "danish":
        from .danish import DANISH_STOP_WORDS

        sw = DANISH_STOP_WORDS if stop_words else frozenset()
        return DanishLightAnalyzer(sw, max_token_length, ascii_only)
    if name == "czech":
        from .czech import CZECH_STOP_WORDS

        sw = CZECH_STOP_WORDS if stop_words else frozenset()
        return CzechLightAnalyzer(sw, max_token_length, ascii_only)
    if name == "bulgarian":
        from .bulgarian import BULGARIAN_STOP_WORDS

        sw = BULGARIAN_STOP_WORDS if stop_words else frozenset()
        return BulgarianLightAnalyzer(sw, max_token_length, ascii_only)
    if name == "persian":
        from .persian import PERSIAN_STOP_WORDS

        sw = PERSIAN_STOP_WORDS if stop_words else frozenset()
        return PersianAnalyzer(sw, max_token_length, ascii_only)
    if name == "hindi":
        from .hindi import HINDI_STOP_WORDS

        sw = HINDI_STOP_WORDS if stop_words else frozenset()
        return HindiAnalyzer(sw, max_token_length, ascii_only)
    if name == "greek":
        from .greek import GREEK_STOP_WORDS

        sw = GREEK_STOP_WORDS if stop_words else frozenset()
        return GreekLightAnalyzer(sw, max_token_length, ascii_only)
    if name == "turkish":
        from .turkish import TURKISH_STOP_WORDS

        sw = TURKISH_STOP_WORDS if stop_words else frozenset()
        return TurkishLightAnalyzer(sw, max_token_length, ascii_only)
    if name == "romanian":
        from .romanian import ROMANIAN_STOP_WORDS

        sw = ROMANIAN_STOP_WORDS if stop_words else frozenset()
        return RomanianLightAnalyzer(sw, max_token_length, ascii_only)
    if name == "latvian":
        from .latvian import LATVIAN_STOP_WORDS

        sw = LATVIAN_STOP_WORDS if stop_words else frozenset()
        return LatvianLightAnalyzer(sw, max_token_length, ascii_only)
    if name == "sorani":
        from .sorani import SORANI_STOP_WORDS

        sw = SORANI_STOP_WORDS if stop_words else frozenset()
        return SoraniAnalyzer(sw, max_token_length, ascii_only)
    if name == "cjk":
        from .cjk import CJK_STOP_WORDS, CJKAnalyzer

        sw = CJK_STOP_WORDS if stop_words else frozenset()
        return CJKAnalyzer(sw, max_token_length, ascii_only)
    if name == "catalan":
        from .catalan import CATALAN_STOP_WORDS

        sw = CATALAN_STOP_WORDS if stop_words else frozenset()
        return CatalanLightAnalyzer(sw, max_token_length, ascii_only)
    if name == "basque":
        from .basque import BASQUE_STOP_WORDS

        sw = BASQUE_STOP_WORDS if stop_words else frozenset()
        return BasqueLightAnalyzer(sw, max_token_length, ascii_only)
    if name == "armenian":
        from .armenian import ARMENIAN_STOP_WORDS

        sw = ARMENIAN_STOP_WORDS if stop_words else frozenset()
        return ArmenianLightAnalyzer(sw, max_token_length, ascii_only)
    if name == "irish":
        from .irish import IRISH_STOP_WORDS

        sw = IRISH_STOP_WORDS if stop_words else frozenset()
        return IrishLightAnalyzer(sw, max_token_length, ascii_only)
    if name == "galician":
        from .galician import GALICIAN_STOP_WORDS

        sw = GALICIAN_STOP_WORDS if stop_words else frozenset()
        return GalicianMinimalAnalyzer(sw, max_token_length, ascii_only)
    if name == "brazilian":
        from .brazilian import BRAZILIAN_STOP_WORDS

        sw = BRAZILIAN_STOP_WORDS if stop_words else frozenset()
        return BrazilianLightAnalyzer(sw, max_token_length, ascii_only)
    if name == "thai":
        from .thai import THAI_STOP_WORDS, ThaiAnalyzer

        sw = THAI_STOP_WORDS if stop_words else frozenset()
        return ThaiAnalyzer(sw, max_token_length, ascii_only)
    if name == "shingle":
        from .modules import ShingleAnalyzer

        return ShingleAnalyzer(stop_words, max_token_length, ascii_only)
    if name == "common_grams":
        from .modules import CommonGramsAnalyzer

        return CommonGramsAnalyzer(stop_words, max_token_length, ascii_only)
    if name == "reverse":
        from .modules import ReverseAnalyzer

        return ReverseAnalyzer(stop_words, max_token_length, ascii_only)
    if name == "path_hierarchy":
        from .modules import PathHierarchyAnalyzer

        return PathHierarchyAnalyzer(stop_words, max_token_length, ascii_only)
    if name == "edge_ngram":
        from .modules import EdgeNGramAnalyzer

        return EdgeNGramAnalyzer(stop_words, max_token_length, ascii_only)
    if name == "ngram":
        from .modules import NGramAnalyzer

        return NGramAnalyzer(stop_words, max_token_length, ascii_only)
    if name.startswith("pattern:"):
        from .modules import PatternAnalyzer

        return PatternAnalyzer(
            name[len("pattern:"):], stop_words, max_token_length, ascii_only
        )
    if name.startswith("synonyms:"):
        from .modules import SynonymAnalyzer

        return SynonymAnalyzer(
            name[len("synonyms:"):], stop_words, max_token_length, ascii_only
        )
    if name == "ascii_folding":
        return ASCIIFoldingAnalyzer(stop_words, max_token_length, ascii_only)
    if name == "simple":
        return SimpleAnalyzer(max_token_length)
    if name == "stop":
        return StopAnalyzer(stop_words, max_token_length)
    if name == "whitespace":
        return WhitespaceAnalyzer(max_token_length)
    if name == "keyword":
        return KeywordAnalyzer()
    raise ValueError(f"unknown analyzer chain {name!r}")


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
    tok_lists = s.str.findall(analyzer._pattern)
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
    if arrow_fast_path_for(analyzer) and len(tokens):
        tf_codes, tf_uniq = pd.factorize(tokens)
        tf = analyzer.term_filter_unique(np.asarray(tf_uniq, dtype=object))
        if tf is not None:
            tokens = np.asarray(tf, dtype=object)[tf_codes]
    doclens = np.zeros(n, dtype=np.int64)
    if len(doc_idx):
        uniq, cnt = np.unique(doc_idx, return_counts=True)
        doclens[uniq] = cnt
    return tokens, doc_idx, positions, doclens


def analyze_flat_arrow(
    texts, analyzer: StandardAnalyzer = _DEFAULT, encode: bool = True
) -> tuple:
    """Arrow-native full analysis chain — the indexing hot path at scale.

    Same semantics as :func:`analyze_flat` (asserted by tests) but tokens
    never become Python objects: tokenize/lower/filter run inside pyarrow
    compute (C++, re2), and the term dictionary comes from
    ``dictionary_encode`` so only the UNIQUE terms of the batch materialize
    as Python strings. This removes the per-token allocation churn that
    capped multi-core scaling of the pandas path (memory-allocator bound,
    not CPU bound).

    ``texts``: pa.Array/ChunkedArray of strings (nulls = empty docs).

    Returns ``(codes, uniques, doc_idx, positions, doclens)``:
    - codes: int64 per surviving token, index into ``uniques``
    - uniques: np object array of SORTED unique terms of the batch
    - doc_idx / positions: aligned with codes (0-based row; pre-stop pos)
    - doclens: post-stop token count per input row

    With ``encode=False`` the first two slots are instead
    ``(flat_tokens_arrow, None)`` — the surviving tokens as an Arrow
    StringArray, still zero Python objects; callers that accumulate several
    batches before inverting (the flush buffer) concat those and
    dictionary-encode once per segment.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    if not arrow_fast_path_for(analyzer):
        # true custom chain (user subclass overriding tokenize() without an
        # Arrow twin): honor its analyze() row-by-row — correctness over
        # speed for unknown chains; every SHIPPED chain (incl. Whitespace/
        # Keyword via their tokenize_arrow overrides) stays on the C++ path
        return _analyze_flat_generic(texts, analyzer, encode)
    n = len(texts)
    sp = analyzer.tokenize_arrow(texts)
    lens_all = pc.list_value_length(sp)
    lens_all = pc.fill_null(lens_all, 0).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(sp)
    doc_idx_all = np.repeat(np.arange(n, dtype=np.int64), lens_all)

    # drop split artifacts ('' at edges) and over-long tokens (255-char cap)
    valid = pc.and_(
        pc.not_equal(flat, ""),
        pc.less_equal(pc.utf8_length(flat), analyzer.max_token_length),
    )
    valid_np = valid.to_numpy(zero_copy_only=False)
    flat = flat.filter(valid)
    doc_idx_v = doc_idx_all[valid_np]
    # pre-stop position = rank within doc after the cap filter
    vcounts = np.bincount(doc_idx_v, minlength=n).astype(np.int64)
    starts = np.concatenate([[0], np.cumsum(vcounts)[:-1]])
    positions = np.arange(len(doc_idx_v), dtype=np.int64) - starts[doc_idx_v]

    if analyzer.stop_words:
        stop = pc.is_in(flat, value_set=pa.array(sorted(analyzer.stop_words)))
        keep_arrow = pc.invert(stop)
        keep = keep_arrow.to_numpy(zero_copy_only=False)
        flat = flat.filter(keep_arrow)
        doc_idx_v = doc_idx_v[keep]
        positions = positions[keep]

    doclens = np.bincount(doc_idx_v, minlength=n).astype(np.int64)
    if not encode:
        # NOTE: with encode=False the term filter (stemmer) is NOT applied
        # here — the caller owns the dictionary-encode step and must call
        # encode_terms(analyzer, ...) (the builder's flush path does)
        return flat, None, doc_idx_v, positions, doclens
    if len(flat) == 0:
        e = np.array([], dtype=np.int64)
        return e, np.array([], dtype=object), e, e, doclens

    d = pc.dictionary_encode(flat)
    uniques = d.dictionary.to_numpy(zero_copy_only=False)
    codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    scodes, suniq = encode_terms(analyzer, codes, uniques)
    return scodes, suniq, doc_idx_v, positions, doclens


def encode_terms(
    analyzer: StandardAnalyzer,
    codes: np.ndarray,
    uniques: np.ndarray,
    text_fields: tuple[str, ...] = (),
    apply_filter: bool = True,
) -> tuple[np.ndarray, np.ndarray]:
    """Apply the analyzer's term filter (stemmer) to a dictionary-encoded
    batch and return (codes, uniques) with uniques SORTED and merged —
    np.unique's inverse both sorts and collapses stems that several surface
    forms map to, at vocabulary cost, never per-token cost. Generic-path
    chains are skipped: their analyze() already applied the full chain.

    ``text_fields``: extra ANALYZED fields whose terms arrive namespaced
    "<field>:term". Term filters themselves skip ':'-containing terms (they
    could be keyword postings, which must stay verbatim), so this function
    re-applies the filter to the SUFFIX of text-field-namespaced terms —
    the index side then matches what ``analyze_query`` produces for those
    fields (the reference analyzes every TextField with the full per-field
    chain, TextField.cs:38 + PerFieldAnalyzerWrapper).

    ``apply_filter=False`` skips the term filter entirely (sort/merge
    only) — used by lang-routed builds, which pre-apply each route's
    filter per document group in :func:`term_filter_flat`."""
    if apply_filter and arrow_fast_path_for(analyzer):
        tf = analyzer.term_filter_unique(uniques)
        if tf is not None:
            uniques = np.asarray(tf, dtype=object)
            if text_fields:
                tfset = set(text_fields)
                idxs = [
                    i
                    for i, t in enumerate(uniques)
                    if ":" in t and t.split(":", 1)[0] in tfset
                ]
                if idxs:
                    parts = [uniques[i].split(":", 1) for i in idxs]
                    sufs = analyzer.term_filter_unique(
                        np.array([p[1] for p in parts], dtype=object)
                    )
                    if sufs is not None:
                        for i, (p, s) in zip(idxs, zip(parts, sufs)):
                            uniques[i] = p[0] + ":" + s
    suniq, inv = np.unique(uniques, return_inverse=True)
    return inv.astype(np.int64)[codes], suniq


def term_filter_flat(analyzer: StandardAnalyzer, flat):
    """Apply a chain's per-unique term filter to a flat Arrow token array:
    one dictionary encode, the filter over the (tiny) vocabulary, one C++
    take back to flat — vocabulary-cost Python, never per token. Used by
    lang-routed builds to pre-apply each route's filter; generic-path
    chains already applied their full chain inside analyze()."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if not arrow_fast_path_for(analyzer) or len(flat) == 0:
        return flat
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    d = pc.dictionary_encode(flat)
    uniq = d.dictionary.to_numpy(zero_copy_only=False)
    tf = analyzer.term_filter_unique(np.asarray(uniq, dtype=object))
    if tf is None:
        return flat
    return pc.take(pa.array(list(tf), pa.string()), d.indices)


def _analyze_flat_generic(texts, analyzer: StandardAnalyzer, encode: bool) -> tuple:
    """Row-at-a-time fallback for custom analyzer chains, same contract as
    :func:`analyze_flat_arrow`."""
    import pyarrow as pa

    rows = texts.to_pylist()
    n = len(rows)
    toks: list[str] = []
    doc_idx: list[int] = []
    positions: list[int] = []
    doclens = np.zeros(n, dtype=np.int64)
    for i, t in enumerate(rows):
        a = analyzer.analyze(t or "")
        toks.extend(a.tokens)
        doc_idx.extend([i] * len(a.tokens))
        positions.extend(a.positions)
        doclens[i] = len(a.tokens)
    flat = pa.array(toks, pa.string())
    di = np.asarray(doc_idx, dtype=np.int64)
    po = np.asarray(positions, dtype=np.int64)
    if not encode:
        return flat, None, di, po, doclens
    if len(toks) == 0:
        e = np.array([], dtype=np.int64)
        return e, np.array([], dtype=object), e, e, doclens
    codes, uniques = pd.factorize(np.asarray(toks, dtype=object), sort=True)
    return codes.astype(np.int64), uniques, di, po, doclens


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
