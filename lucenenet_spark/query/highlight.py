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
