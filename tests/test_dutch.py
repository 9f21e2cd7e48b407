"""DutchSnowballAnalyzer pack: original implementation of the published
Snowball Dutch algorithm (snowballstem.org/algorithms/dutch/stemmer.html;
the reference's Nl/DutchAnalyzer.cs:47 runs the tartarus DutchStemmer —
the same algorithm), hand-traced goldens + chain integration."""

import numpy as np
import pytest

from lucenenet_spark.analysis.analyzer import DutchSnowballAnalyzer, analyzer_for
from lucenenet_spark.analysis.dutch import (
    DUTCH_STOP_WORDS,
    dutch_stem,
    stem_unique,
)

# hand-traced through the published spec (R1 forced >= 3; step numbers in
# comments refer to the spec's steps)
GOLDEN = [
    ("lichamelijk", "licham"),    # 3b -lijk, then repeated step 2 drops e
    ("lichamelijke", "licham"),   # step 2 e, then 3b -lijk + e
    ("lichamen", "licham"),       # step 1 -en after non-vowel
    ("lichamelijkheden", "licham"),  # 1 heden->heid, 3a heid + en
    ("opheffen", "opheff"),       # step 1 -en; ff not undoubled (only kk/dd/tt)
    ("gekken", "gek"),            # step 1 -en + undouble kk
    ("bedden", "bed"),            # step 1 -en + undouble dd
    ("katten", "kat"),            # step 1 -en + undouble tt
    ("maan", "man"),              # step 4 undouble vowel CVVD
    ("brood", "brod"),            # step 4
    ("lichaam", "licham"),        # step 4 (aa before m)
    ("kleding", "kleding"),       # -ing NOT in R2 (R2 starts at 'g') -> kept
    ("koninklijke", "konink"),    # step 2 e, then -lijk (in R2, starts at 6)
    ("vrouwen", "vrouw"),         # step 1 -en after non-vowel w
    ("huizen", "huiz"),           # step 1 -en
    ("duidelijkheid", "duidelijk"),  # 3a -heid; -lijk starts BEFORE R2 -> kept
    ("aardappels", "aardappel"),  # step 1 -s after non-vowel l
    ("boekjes", "boekjes"),       # -s preceded by the vowel e -> kept
    ("één", "een"),               # fold only; too short for every step
]


@pytest.mark.parametrize("surface,stem", GOLDEN)
def test_golden_stems(surface, stem):
    assert dutch_stem(surface) == stem


def test_s_after_j_kept():
    # step 1: -s deleted only when preceded by a non-vowel OTHER THAN j
    assert dutch_stem("anijs") == "anijs"   # j before s: kept
    assert dutch_stem("mans") == "man"      # n before s: deleted


def test_gem_exception():
    # step 1: -en not removed directly after gem
    assert dutch_stem("gemeen")[-1] != "m" or dutch_stem("gemeen") == "gemen"


def test_i_between_vowels_is_consonant_marker():
    # 'i' between vowels never counts as a vowel (drinkwater 'aaie' shapes);
    # the marker must lowercase back in the output
    out = dutch_stem("draaien")
    assert out.islower() and "I" not in out


def test_chain_stop_and_positions():
    a = DutchSnowballAnalyzer(DUTCH_STOP_WORDS)
    an = a.analyze("de lichamen van een vrouw")
    assert an.tokens == ["licham", "vrouw"]
    assert an.positions == [1, 4]


def test_analyzer_for_dutch():
    a = analyzer_for(
        "dutch", stop_words=frozenset({"x"}),
        max_token_length=255, ascii_only=False,
    )
    assert a.stop_words == DUTCH_STOP_WORDS
    assert a.analyze_query("lichamen") == ["licham"]


def test_term_filter_unique_namespaced_passthrough():
    arr = np.array(["lichamen", "lang:lichamen"], dtype=object)
    out = stem_unique(arr)
    assert list(out) == ["licham", "lang:lichamen"]


def test_arrow_fast_path_kept():
    from lucenenet_spark.analysis.analyzer import arrow_fast_path_for

    assert arrow_fast_path_for(DutchSnowballAnalyzer(frozenset()))
