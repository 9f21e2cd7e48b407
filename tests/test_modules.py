"""Non-language analysis modules (analysis/modules.py): Shingle,
CommonGrams, Reverse (leading wildcard), Pattern, PathHierarchy —
golden streams + chain integration (reference specs:
Shingle/ShingleFilter.cs:58, CommonGrams/CommonGramsFilter.cs:44,
Reverse/ReverseStringFilter.cs:32, Miscellaneous/PatternAnalyzer.cs:45,
Path/PathHierarchyTokenizer.cs:38)."""

import numpy as np

from lucenenet_spark.analysis.analyzer import analyzer_for, arrow_fast_path_for
from lucenenet_spark.analysis.modules import (
    CommonGramsAnalyzer,
    PathHierarchyAnalyzer,
    PatternAnalyzer,
    ReverseAnalyzer,
    ShingleAnalyzer,
    common_grams_stream,
    shingle_stream,
)


def test_shingle_stream():
    assert shingle_stream(["the", "quick", "fox"]) == [
        "the", "the quick", "quick", "quick fox", "fox",
    ]
    assert shingle_stream(["one"]) == ["one"]
    assert shingle_stream([]) == []


def test_shingle_chain_stop_after_shingling():
    a = ShingleAnalyzer(frozenset({"the"}))
    an = a.analyze("the quick fox")
    # stopped unigram drops, its shingles survive (documented composition)
    assert an.tokens == ["the quick", "quick", "quick fox", "fox"]
    assert an.positions == [1, 2, 3, 4]


def test_common_grams_stream():
    common = frozenset({"the", "a"})
    assert common_grams_stream(["the", "quick", "fox"], common) == [
        "the", "the_quick", "quick", "fox",
    ]
    # bigram keyed on either side
    assert common_grams_stream(["quick", "the", "fox"], common) == [
        "quick", "quick_the", "the", "the_fox", "fox",
    ]
    assert common_grams_stream(["quick", "fox"], common) == ["quick", "fox"]


def test_common_grams_default_set():
    a = CommonGramsAnalyzer(frozenset())
    assert "the" in a.common  # English stop set by default


def test_reverse_chain_and_fast_path():
    a = ReverseAnalyzer(frozenset())
    assert a.analyze("filter customers").tokens == ["retlif", "sremotsuc"]
    arr = np.array(["filter", "lang:en"], dtype=object)
    assert list(a.term_filter_unique(arr)) == ["retlif", "lang:en"]
    # 1:1 per-unique-term rewrite keeps the Arrow fast path
    assert arrow_fast_path_for(a)


def test_leading_wildcard_idiom():
    # *er as a prefix seek over the reversed dictionary
    a = ReverseAnalyzer(frozenset())
    terms = [t for t in a.analyze("filter customer order merge").tokens]
    probe = "er"[::-1]
    assert sorted(t for t in terms if t.startswith(probe)) == [
        "redro", "remotsuc", "retlif",
    ]


def test_pattern_analyzer():
    a = analyzer_for(
        "pattern:[^a-z]+", stop_words=frozenset(),
        max_token_length=255, ascii_only=True,
    )
    assert isinstance(a, PatternAnalyzer)
    assert a.pattern == "[^a-z]+"
    # digits split (unlike the [^a-z0-9]+ default), case folds
    assert a.tokenize("Src12 the-quick") == ["src", "the", "quick"]
    assert a.tokenize("") == []


def test_pattern_capturing_group_rejected():
    # Python re.split leaks captured groups as tokens; reject clearly
    import pytest

    with pytest.raises(ValueError):
        PatternAnalyzer("([^a-z]+)", frozenset())
    # the non-capturing form works
    a = PatternAnalyzer("(?:[^a-z]+)", frozenset())
    assert a.tokenize("Ab3 Cd") == ["ab", "cd"]


def test_path_hierarchy():
    a = PathHierarchyAnalyzer(frozenset())
    assert a.tokenize("src3/DE/extra") == ["src3", "src3/de", "src3/de/extra"]
    assert a.tokenize("/leading/slash/") == ["leading", "leading/slash"]
    assert a.tokenize("flat") == ["flat"]
    assert a.tokenize("") == []


def test_generic_row_path_declared():
    for a in [
        ShingleAnalyzer(frozenset()),
        CommonGramsAnalyzer(frozenset()),
        PatternAnalyzer("[^a-z]+", frozenset()),
        PathHierarchyAnalyzer(frozenset()),
    ]:
        assert not arrow_fast_path_for(a), type(a).__name__


def test_edge_ngram_and_char_ngram():
    from lucenenet_spark.analysis.modules import EdgeNGramAnalyzer, NGramAnalyzer

    e = EdgeNGramAnalyzer(frozenset())
    # prefixes 2..5; 'ab' -> only its 2-gram; 'a' -> nothing
    assert e.tokenize("query ab a") == ["qu", "que", "quer", "query", "ab"]
    g = NGramAnalyzer(frozenset())
    assert g.tokenize("table ab") == ["tab", "abl", "ble"]
    assert not arrow_fast_path_for(e) and not arrow_fast_path_for(g)
    assert analyzer_for(
        "edge_ngram", stop_words=frozenset(),
        max_token_length=255, ascii_only=True,
    ).tokenize("cd") == ["cd"]
    assert analyzer_for(
        "ngram", stop_words=frozenset(),
        max_token_length=255, ascii_only=True,
    ).tokenize("cd") == []


def test_synonym_parse():
    from lucenenet_spark.analysis.modules import parse_synonym_spec

    assert parse_synonym_spec("line>row,scan>query") == {
        "line": "row", "scan": "query",
    }
    import pytest

    with pytest.raises(ValueError):
        parse_synonym_spec("line>")          # malformed
    with pytest.raises(ValueError):
        parse_synonym_spec("a>b,b>c")        # transitive chain
    with pytest.raises(ValueError):
        parse_synonym_spec("a> b")           # whitespace -> dead mapping
    with pytest.raises(ValueError):
        parse_synonym_spec("Line>row")       # uppercase never fires


def test_synonym_collapse_chain():
    from lucenenet_spark.analysis.modules import SynonymAnalyzer

    a = SynonymAnalyzer("line>row,scan>query", frozenset())
    assert a.analyze("line scan row data").tokens == [
        "row", "query", "row", "data",
    ]
    arr = np.array(["line", "lang:line", "other"], dtype=object)
    assert list(a.term_filter_unique(arr)) == ["row", "lang:line", "other"]
    # 1:1 per-unique-term rewrite keeps the Arrow fast path
    assert arrow_fast_path_for(a)
    # name-encoded map roundtrips through analyzer_for
    b = analyzer_for(
        "synonyms:line>row", stop_words=frozenset(),
        max_token_length=255, ascii_only=False,
    )
    assert b.synonyms == {"line": "row"}


def test_analyzer_for_names_roundtrip():
    for name in ["shingle", "common_grams", "reverse", "path_hierarchy"]:
        a = analyzer_for(
            name, stop_words=frozenset({"x"}),
            max_token_length=255, ascii_only=False,
        )
        assert a is not None
