"""Thai analyzer pack — TCC segmentation + cluster bigrams.

The reference chain is Analysis/Th/ThaiAnalyzer.cs:40
StandardTokenizer -> LowerCase -> ThaiWordFilter / ThaiTokenizer
(Th/ThaiTokenizer.cs — DICTIONARY-based word segmentation via the
platform BreakIterator) -> StopFilter(Thai). Thai writes without
spaces, so segmentation is the whole game. The platform dictionary
BreakIterator does not exist in this stack (no ICU, no JDK Thai
dictionary reachable from Python) — the documented impossibility —
so this pack implements the published dictionary-FREE alternative:

1. **Thai Character Cluster (TCC) segmentation** (Theeramunkong,
   Sornlertlamvanich, Tanhermhong & Chinnan 2000, "Character Cluster
   Based Thai Information Retrieval"): split a Thai run into the
   inseparable orthographic units — a leading vowel (เแโใไ) binds to the
   following consonant, combining vowels/tones bind to their base —
   guaranteeing no boundary ever falls inside a linguistically
   unsplittable unit.
2. **Cluster bigrams** within each run (the CJKBigramFilter strategy,
   Cjk/CJKBigramFilter.cs — one-cluster runs emit their unigram), which
   is the published IR-effective indexing unit over TCCs: overlapping
   bigrams approximate word matching without a lexicon.

Non-Thai text falls through to the standard chain untouched. The
reference's Thai stop set operates on dictionary WORDS, which bigram
terms never equal — so Thai stopping is vacuous here and only the
passthrough (Latin/digit) tokens are stop-filtered; a documented
divergence.

Scale note: bigramming needs stream adjacency, so like the CJK pack
this chain declares ``arrow_fast_path = False`` and runs per row inside
the builder's distributed batches — linear per-token cost, horizontal
scale by partitions.
"""

from __future__ import annotations

import re

from .analyzer import StandardAnalyzer

# Thai-script stop entries would be dictionary words (see module note);
# the passthrough stop set mirrors the CJK pack's English function words
THAI_STOP_WORDS: frozenset[str] = frozenset(
    """
    a an and are as at be but by for if in into is it no not of on or
    such that the their then there these they this to was will with www
    """.split()
)

_THAI_LO, _THAI_HI = "฀", "๿"

# TCC: [leading vowel]? consonant [combining vowel/marks]* [tone]?
# [following vowel]? [killer/nikhahit/repeat]?  — any Thai char that the
# cluster production cannot start (stray marks, digits ๐-๙, ฯ) stands
# alone so segmentation is total.
_TCC_RE = re.compile(
    "[เ-ไ]?"              # เ แ โ ใ ไ leading vowels
    "[ก-ฮฤฦ]"   # consonant (incl. ฤ ฦ)
    "[ัิ-ฺ็]*"  # ั ิ ี ึ ื ฺ ุ ู ็ combining vowels
    "[่-๋]?"              # ่ ้ ๊ ๋ tones
    "[ะาำๅ]?"   # ะ า ำ ๅ following vowels
    "[์-๎ๆ]?"        # ์ ํ ๎ ๆ killer/nikhahit/repeat
    "|[฀-๿]"              # fallback: lone Thai char
)

_HAS_THAI_RE = re.compile(f"[{_THAI_LO}-{_THAI_HI}]")
# mixed-script token splitter: maximal Thai runs vs maximal non-Thai runs
_RUN_RE = re.compile(
    f"[{_THAI_LO}-{_THAI_HI}]+|[^{_THAI_LO}-{_THAI_HI}]+"
)


def thai_tcc_segment(run: str) -> list[str]:
    """Segment one Thai run into its TCC clusters (rules above)."""
    return _TCC_RE.findall(run)


def thai_cluster_bigrams(run: str) -> list[str]:
    """TCC-segment a Thai run and emit overlapping cluster bigrams
    (a one-cluster run emits its unigram)."""
    cl = thai_tcc_segment(run)
    if len(cl) <= 1:
        return cl
    return [cl[i] + cl[i + 1] for i in range(len(cl) - 1)]


class ThaiAnalyzer(StandardAnalyzer):
    """ThaiAnalyzer analogue (Th/ThaiAnalyzer.cs:40): standard tokenize
    (a Thai run is one UAX#29 token), then each Thai token expands to
    its TCC cluster bigrams; other tokens pass through to the stop
    filter via the inherited analyze()."""

    # bigramming consumes stream adjacency — runs per row (generic path)
    arrow_fast_path = False

    def tokenize(self, text: str) -> list[str]:
        out: list[str] = []
        for t in super().tokenize(text):
            if _HAS_THAI_RE.search(t):
                # mixed-script tokens (ตาราง2024) split into runs: Thai
                # runs bigram, the rest pass through — nothing is dropped
                for run in _RUN_RE.findall(t):
                    if _HAS_THAI_RE.match(run):
                        out.extend(thai_cluster_bigrams(run))
                    else:
                        out.append(run)
            else:
                out.append(t)
        return out
