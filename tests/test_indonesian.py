"""IndonesianAnalyzer pack: the published Tala 2003 algorithm, light form
(Analysis/Id/IndonesianAnalyzer.cs:43 + IndonesianStemmer.cs; prefix
recoding omitted — documented divergence), hand-traced goldens + chain
integration."""

import numpy as np
import pytest

from lucenenet_spark.analysis.analyzer import (
    IndonesianAnalyzer,
    analyzer_for,
)
from lucenenet_spark.analysis.indonesian import (
    INDONESIAN_STOP_WORDS,
    indonesian_stem,
    stem_unique,
)

GOLDEN = [
    ("bukunya", "buku"),        # possessive -nya
    ("bukuku", "buku"),         # possessive -ku
    ("bukumu", "buku"),         # possessive -mu
    ("makanlah", "makan"),      # particle -lah; -an refused (1 vowel left)
    ("apakah", "apa"),          # particle -kah
    ("membaca", "baca"),        # prefix mem-
    ("mengambil", "ambil"),     # prefix meng-
    ("menulis", "ulis"),        # prefix men- (no recoding: documented)
    ("terbaik", "baik"),        # prefix ter-
    ("dibaca", "baca"),         # prefix di-
    # -kan is tried before -an (Tala's listed order), so an -ik/-ak root +
    # -an parse over-stems to the -kan parse — the thesis's acknowledged
    # ambiguity, kept for fidelity to the published order
    ("perbaikan", "bai"),       # prefix per-, then suffix -kan
    ("kebijakan", "bija"),      # prefix ke-, then suffix -kan
    ("seorang", "orang"),       # prefix se-
    ("berjalan", "jalan"),      # prefix ber-; -an refused (1 vowel left)
    ("ajaran", "ajar"),         # suffix -an
    ("gunakan", "guna"),        # suffix -kan
    ("melihat", "lihat"),       # prefix me- (longer mem-/men- don't match)
    ("buku", "buku"),           # bare root; -ku refused (1 vowel left)
]


@pytest.mark.parametrize("surface,stem", GOLDEN)
def test_golden_stems(surface, stem):
    assert indonesian_stem(surface) == stem


def test_layered_strip():
    # particle + possessive + prefix + suffix, outermost first
    assert indonesian_stem("perbaikannyalah") == "bai"


def test_syllable_guard():
    # every strip must leave >= 2 vowels in the remainder
    assert indonesian_stem("makan") == "makan"   # -kan/-an would leave 1 vowel
    assert indonesian_stem("diam") == "diam"     # di- would leave 1 vowel


def test_chain_stop_and_positions():
    a = IndonesianAnalyzer(INDONESIAN_STOP_WORDS)
    an = a.analyze("dia membaca bukunya di rumah")
    # 'dia' and 'di' are stopwords; positions keep the gaps
    assert an.tokens == ["baca", "buku", "rumah"]
    assert an.positions == [1, 2, 4]


def test_analyzer_for_indonesian():
    a = analyzer_for(
        "indonesian", stop_words=frozenset({"x"}),
        max_token_length=255, ascii_only=False,
    )
    assert a.stop_words == INDONESIAN_STOP_WORDS
    assert a.analyze_query("membaca") == ["baca"]


def test_term_filter_unique_namespaced_passthrough():
    arr = np.array(["membaca", "lang:membaca"], dtype=object)
    out = stem_unique(arr)
    assert list(out) == ["baca", "lang:membaca"]


def test_arrow_fast_path_kept():
    from lucenenet_spark.analysis.analyzer import arrow_fast_path_for

    assert arrow_fast_path_for(IndonesianAnalyzer(frozenset()))
