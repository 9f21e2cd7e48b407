"""CJK bigram analyzer pack — the CJKAnalyzer chain.

Mirrors the reference CJKAnalyzer
(src/Lucene.Net.Analysis.Common/Analysis/Cjk/CJKAnalyzer.cs:40-92):
StandardTokenizer -> CJKWidthFilter -> LowerCaseFilter -> CJKBigramFilter
-> StopFilter(English-ish CJK stop set). Both filters are original
implementations written from the documented public semantics:

- width fold (Cjk/CJKWidthFilter.cs:32-58): fullwidth ASCII variants
  (U+FF01-FF5E) fold to their basic-latin forms; halfwidth katakana
  (U+FF66-FF9F) folds to standard katakana, composing a halfwidth voiced /
  semi-voiced sound mark into the preceding kana where the composed
  codepoint exists (halfwidth KA + halfwidth dakuten == GA);
- bigrams (Cjk/CJKBigramFilter.cs:40-120, default HAN | HIRAGANA |
  KATAKANA | HANGUL flags, outputUnigrams=false): consecutive CJK tokens'
  CODEPOINTS accumulate into one run buffer — token-stream adjacency, not
  text adjacency, exactly like the reference which keys on position
  increments — and each run emits its overlapping codepoint bigrams; a
  run of a single codepoint is emitted as a unigram so lone ideographs
  stay searchable. Non-CJK tokens pass through and break the run.

Positions: the engine convention (position = index in the pre-stop output
stream) matches the reference's posIncrement=1 per emitted bigram/unigram.

Scale note: bigramming needs stream ADJACENCY, which the per-UNIQUE-term
hook (term_filter_unique) cannot see, so this chain declares
``arrow_fast_path = False`` and runs its ``analyze()`` per row inside the
builder's distributed mapInPandas batches — a linear per-token pass that
scales horizontally with partitions; only the per-token constant is larger
than the Arrow C++ chains.
"""

from __future__ import annotations

import re

from .analyzer import StandardAnalyzer

# CJKAnalyzer.cs stop set (analysis/cjk/stopwords.txt — classic English
# function words + web artifacts; the bigrams themselves are never stopped)
CJK_STOP_WORDS: frozenset[str] = frozenset(
    """
    a and are as at be but by for if in into is it no not of on or s such
    t that the their then there these they this to was will with www
    """.split()
)

# codepoint classes the bigram filter buffers (CJKBigramFilter.cs HAN /
# HIRAGANA / KATAKANA / HANGUL default flags). Han covers the URO +
# extension A + compatibility ideographs the tokenizer already isolates.
_CJK_CLASS = (
    "ᄀ-ᇿ"  # Hangul Jamo
    "぀-ゟ"  # Hiragana
    "゠-ヿ"  # Katakana
    "㄰-㆏"  # Hangul compatibility Jamo
    "㐀-䶿"  # Han ext A
    "一-鿿"  # Han URO
    "가-힯"  # Hangul syllables
    "豈-﫿"  # Han compatibility
)
_CJK_TOKEN_RE = re.compile(f"^[{_CJK_CLASS}]+$")

# --------------------------------------------------------------------- #
# CJKWidthFilter tables
# --------------------------------------------------------------------- #

# fullwidth ASCII variants -> basic latin (U+FF01..FF5E -> U+21..7E)
_WIDTH_TABLE: dict[int, int] = {cp: cp - 0xFF01 + 0x21 for cp in range(0xFF01, 0xFF5F)}
_WIDTH_TABLE[0x3000] = 0x20  # ideographic space -> space

# halfwidth katakana -> standard katakana (U+FF66..FF9D), plus the
# halfwidth sound marks (FF9E dakuten / FF9F handakuten) left for the
# compose step below
_HALF_KANA = (
    "ヲァィゥェォャュョッーアイウエオカキクケコサシスセソタチツテト"
    "ナニヌネノハヒフヘホマミムメモヤユヨラリルレロワン"
)
for _i, _ch in enumerate(_HALF_KANA):
    _WIDTH_TABLE[0xFF66 + _i] = ord(_ch)

# kana that compose with dakuten (U+3099 semantics): base -> voiced
_DAKUTEN = {
    "カ": "ガ", "キ": "ギ", "ク": "グ", "ケ": "ゲ", "コ": "ゴ",
    "サ": "ザ", "シ": "ジ", "ス": "ズ", "セ": "ゼ", "ソ": "ゾ",
    "タ": "ダ", "チ": "ヂ", "ツ": "ヅ", "テ": "デ", "ト": "ド",
    "ハ": "バ", "ヒ": "ビ", "フ": "ブ", "ヘ": "ベ", "ホ": "ボ",
    "ウ": "ヴ",
}
_HANDAKUTEN = {"ハ": "パ", "ヒ": "ピ", "フ": "プ", "ヘ": "ペ", "ホ": "ポ"}


def cjk_width_fold(text: str) -> str:
    """CJKWidthFilter analogue over raw text (run before tokenize: the
    folded forms are what the tokenizer should segment)."""
    if not text:
        return text
    folded = text.translate(_WIDTH_TABLE)
    if "ﾞ" in text or "ﾟ" in text:
        out: list[str] = []
        for ch in folded:
            if ch == "ﾞ" and out and out[-1] in _DAKUTEN:
                out[-1] = _DAKUTEN[out[-1]]
            elif ch == "ﾟ" and out and out[-1] in _HANDAKUTEN:
                out[-1] = _HANDAKUTEN[out[-1]]
            else:
                out.append(ch)
        folded = "".join(out)
    return folded


def cjk_bigrams(tokens: list[str]) -> list[str]:
    """CJKBigramFilter analogue over a token stream: buffer codepoints of
    consecutive CJK-class tokens, emit overlapping codepoint bigrams per
    run (lone codepoint -> unigram); other tokens pass through."""
    out: list[str] = []
    buf: list[str] = []

    def flush() -> None:
        if len(buf) == 1:
            out.append(buf[0])
        else:
            out.extend(buf[i] + buf[i + 1] for i in range(len(buf) - 1))
        buf.clear()

    for t in tokens:
        if _CJK_TOKEN_RE.match(t):
            buf.extend(t)
        else:
            if buf:
                flush()
            out.append(t)
    if buf:
        flush()
    return out


class CJKAnalyzer(StandardAnalyzer):
    """The full CJKAnalyzer chain (CJKAnalyzer.cs:40): width fold ->
    standard tokenize (per-ideograph / kana-run tokens) -> codepoint
    bigrams -> stop filter (via the inherited analyze())."""

    # bigramming consumes stream adjacency — per-unique-term hooks can't
    # express it, so this chain runs analyze() per row (generic path)
    arrow_fast_path = False

    def tokenize(self, text: str) -> list[str]:
        return cjk_bigrams(super().tokenize(cjk_width_fold(text)))
