"""Snippet highlighting — the Highlighter module analogue
(Lucene.Net.Highlighter/Highlight/Highlighter.cs:34): extract a fragment of
the stored text around the best (first) query-term match and wrap term
occurrences. Runs as a pandas UDF over the TOP-K result only (k rows —
per-hit work exactly like the reference's collector-side highlighting, never
over the corpus)."""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def highlight(
    topk_with_text: DataFrame,
    terms: list[str],
    text_col: str = "text",
    pre: str = "<b>",
    post: str = "</b>",
    fragment_chars: int = 120,
) -> DataFrame:
    """Add a ``snippet`` column to a (small) DataFrame that carries the
    stored text of each hit."""
    pattern = re.compile(
        r"\b(" + "|".join(re.escape(t) for t in terms) + r")\b", re.IGNORECASE
    )

    @pandas_udf("string")
    def snip(texts: pd.Series) -> pd.Series:
        def one(t):
            if not t:
                return ""
            m = pattern.search(t)
            if not m:
                return t[:fragment_chars]
            lo = max(0, m.start() - fragment_chars // 2)
            hi = min(len(t), lo + fragment_chars)
            frag = t[lo:hi]
            out = pattern.sub(lambda mm: pre + mm.group(0) + post, frag)
            return ("..." if lo > 0 else "") + out + ("..." if hi < len(t) else "")

        return texts.map(one)

    return topk_with_text.withColumn("snippet", snip(F.col(text_col)))


def highlight_fragments(
    topk_with_text: DataFrame,
    terms: list[str],
    text_col: str = "text",
    pre: str = "<b>",
    post: str = "</b>",
    fragment_chars: int = 100,
    max_fragments: int = 3,
    snap_to_whitespace: bool = True,
) -> DataFrame:
    """Best-fragments highlighting — the reference's fragmenter/scorer
    pipeline (Highlighter.GetBestFragments: SimpleFragmenter fixed-size
    fragments + QueryTermScorer fragment scores + top-N selection,
    Lucene.Net.Highlighter/Highlight/Highlighter.cs:34,
    SimpleFragmenter.cs, QueryTermScorer.cs):

    - the text splits into ~``fragment_chars`` fragments (snapped back to a
      whitespace boundary unless ``snap_to_whitespace=False``);
    - each fragment scores ``occurrences + distinct-terms`` (QueryTermScorer
      sums per-term weights; occurrence count + a distinct bonus is the
      flat-weight equivalent);
    - the ``max_fragments`` best (score desc, position asc) fragments are
      re-assembled in TEXT ORDER joined by ``"..."`` with matches wrapped.

    Adds ``snippet`` (string) and ``n_fragments`` (int). Runs as a pandas
    UDF over the TOP-K rows only — per-hit work, never the corpus."""
    pattern = re.compile(
        "(" + "|".join(re.escape(t) for t in terms) + ")", re.IGNORECASE
    )

    @pandas_udf("snippet string, n_fragments int")
    def snip(texts: pd.Series) -> pd.DataFrame:
        def one(t):
            if not t:
                return "", 0
            # fragment boundaries (SimpleFragmenter: fixed size, snapped)
            bounds = [0]
            while bounds[-1] < len(t):
                nxt = bounds[-1] + fragment_chars
                if snap_to_whitespace and nxt < len(t):
                    ws = t.rfind(" ", bounds[-1] + 1, nxt)
                    if ws > bounds[-1]:
                        nxt = ws
                bounds.append(min(nxt, len(t)))
            frags = [
                (i, t[lo:hi])
                for i, (lo, hi) in enumerate(zip(bounds, bounds[1:]))
            ]
            scored = []
            for i, frag in frags:
                hits = pattern.findall(frag)
                if hits:
                    scored.append((len(hits) + len({h.lower() for h in hits}), i, frag))
            if not scored:
                return "", 0
            best = sorted(scored, key=lambda x: (-x[0], x[1]))[:max_fragments]
            best.sort(key=lambda x: x[1])  # re-assemble in text order
            parts = [
                pattern.sub(lambda mm: pre + mm.group(0) + post, frag).strip()
                for _, _, frag in best
            ]
            return "...".join(parts), len(best)

        out = texts.map(one)
        return pd.DataFrame(
            {"snippet": out.map(lambda x: x[0]), "n_fragments": out.map(lambda x: x[1])}
        )

    s = snip(F.col(text_col))
    return topk_with_text.withColumn("snippet", s["snippet"]).withColumn(
        "n_fragments", s["n_fragments"]
    )
