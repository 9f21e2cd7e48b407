"""ThaiAnalyzer pack: TCC segmentation (published Theeramunkong et al.
2000 rules) + cluster bigrams as the dictionary-free realization of
Analysis/Th/ThaiAnalyzer.cs:40 / ThaiTokenizer.cs (platform dictionary
BreakIterator — unavailable here, documented in the pack module),
hand-traced goldens + chain integration."""

import pytest

from lucenenet_spark.analysis.analyzer import analyzer_for
from lucenenet_spark.analysis.thai import (
    THAI_STOP_WORDS,
    ThaiAnalyzer,
    thai_cluster_bigrams,
    thai_tcc_segment,
)

SEGMENT = [
    # ภา ษา ไท ย: following vowels bind, leading vowel ไ binds forward
    ("ภาษาไทย", ["ภา", "ษา", "ไท", "ย"]),
    # ส วั ส ดี: combining วั and ดี bind to their base consonant
    ("สวัสดี", ["ส", "วั", "ส", "ดี"]),
    # เ มื อ ง: leading เ + ม + combining ื is one cluster
    ("เมือง", ["เมื", "อ", "ง"]),
    # ก ำ: sara am binds
    ("คำ", ["คำ"]),
    # tone mark binds: ไม่ is one cluster
    ("ไม่", ["ไม่"]),
]


@pytest.mark.parametrize("run,clusters", SEGMENT)
def test_tcc_segment(run, clusters):
    assert thai_tcc_segment(run) == clusters


def test_segmentation_is_total():
    # every Thai char lands in exactly one cluster (no loss, no overlap)
    for run, _ in SEGMENT:
        assert "".join(thai_tcc_segment(run)) == run


def test_cluster_bigrams():
    assert thai_cluster_bigrams("ภาษาไทย") == ["ภาษา", "ษาไท", "ไทย"]
    # one-cluster run emits its unigram (the CJK convention)
    assert thai_cluster_bigrams("ไป") == ["ไป"]
    assert thai_cluster_bigrams("คำ") == ["คำ"]


def test_chain_mixed_text_and_positions():
    a = ThaiAnalyzer(THAI_STOP_WORDS)
    an = a.analyze("the ภาษาไทย data")
    # 'the' stops; the Thai run expands to its bigrams; 'data' passes
    assert an.tokens == ["ภาษา", "ษาไท", "ไทย", "data"]
    assert an.positions == [1, 2, 3, 4]


def test_mixed_script_token_keeps_both_runs():
    # real Thai glues digits/Latin to Thai with no space: nothing drops
    a = ThaiAnalyzer(frozenset())
    assert a.tokenize("ตาราง2024") == ["ตารา", "ราง", "2024"]
    assert a.tokenize("รุ่นxl") == ["รุ่น", "xl"]


def test_analyzer_for_thai():
    a = analyzer_for(
        "thai", stop_words=frozenset({"x"}),
        max_token_length=255, ascii_only=False,
    )
    assert a.stop_words == THAI_STOP_WORDS
    assert a.analyze_query("ภาษาไทย") == ["ภาษา", "ษาไท", "ไทย"]


def test_generic_row_path_declared():
    from lucenenet_spark.analysis.analyzer import arrow_fast_path_for

    # bigramming needs stream adjacency: MUST be off the Arrow fast path
    assert not arrow_fast_path_for(ThaiAnalyzer(frozenset()))
