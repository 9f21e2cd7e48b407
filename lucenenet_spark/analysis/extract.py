"""HTML -> text extraction: the input_hint's per-row invariant.

BASELINE.json's input table carries BOTH ``html: binary`` (the raw crawl
payload) and ``text: string`` (the extracted text), with the contract that
the extracted text per url is byte-identical through the analysis chain.
This module is the extraction step itself, so an index can be built from
the raw ``html`` column alone and end up identical to one built from
``text`` (asserted by tests/test_extract.py).

The reference's analogue is the benchmark content-source chain
(src/Lucene.Net.Benchmark/ByTask/Feeds/DemoHTMLParser.cs:36-88 — body
extraction, script/style removal, entity decoding) feeding DocMaker; as
everywhere else, the semantics are re-expressed, not ported: the whole
pipeline runs inside pyarrow compute (C++/re2) — zero per-row Python.

Extraction contract (deterministic, byte-exact inverse of
:func:`wrap_html` for any text):

1. utf-8 decode of the binary payload;
2. keep only the ``<body ...> ... </body>`` inner content (whole document
   if no body element — a fragment crawl);
3. drop ``<script>``/``<style>`` element CONTENT and HTML comments;
4. strip remaining tags (``<[^>]*>`` -> empty, no whitespace inserted);
5. decode the closed entity set ``&lt; &gt; &quot; &#39; &amp;``
   (``&amp;`` last, so escaped ampersands round-trip).

The closed entity set is the exact image of :func:`escape_html`; payloads
produced by other escapers may keep e.g. ``&eacute;`` literal — the
invariant promised (and tested) is wrap -> extract byte-identity.
"""

from __future__ import annotations

# ordered: & first on escape, last on unescape — classic round-trip order
_ESCAPES = [("&", "&amp;"), ("<", "&lt;"), (">", "&gt;"), ('"', "&quot;"), ("'", "&#39;")]

# re2 syntax throughout (pyarrow compute): (?s) dot-matches-newline,
# non-greedy block bodies so adjacent script/style elements don't fuse
_BODY_RE = r"(?is)<body[^>]*>(?P<body>.*)</body>"
_DROP_BLOCKS_RE = r"(?is)<script[^>]*>.*?</script>|<style[^>]*>.*?</style>|<!--.*?-->"
_TAG_RE = r"(?s)<[^>]*>"


def escape_html(text: str) -> str:
    """Escape text for embedding in an HTML element (wrap_html's escaper)."""
    for raw, ent in _ESCAPES:
        text = text.replace(raw, ent)
    return text


def wrap_html(text: str, title: str = "page") -> bytes:
    """Deterministic Common-Crawl-style page around ``text`` — includes the
    head/title, a script, a style and a comment precisely so extraction is
    non-trivial: naive tag-stripping would leak the title and script body
    into the text and break byte-identity."""
    return (
        f"<html><head><title>{title}</title>"
        f"<script>var q=1&&2;</script><style>p {{color:#000}}</style></head>"
        f'<body class="page"><!-- warc --><p>{escape_html(text)}</p></body></html>'
    ).encode("utf-8")


def extract_text_arrow(html):
    """Vectorized extraction: pa.Array/ChunkedArray of binary -> StringArray.

    Every step is a pyarrow compute kernel (C++, re2): this is the shape
    that runs inside ``mapInArrow`` over a 100 TB html column — per-batch
    cost is a handful of re2 passes, no Python object per row.
    Null payloads stay null.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(html, pa.ChunkedArray):
        html = html.combine_chunks()
    s = html.cast(pa.string())  # utf-8 validate + decode
    body = pc.struct_field(pc.extract_regex(s, _BODY_RE), "body")
    # fragment crawls (no <body>) extract from the whole payload
    s = pc.if_else(pc.is_valid(body), body, s)
    s = pc.replace_substring_regex(s, _DROP_BLOCKS_RE, "")
    s = pc.replace_substring_regex(s, _TAG_RE, "")
    for raw, ent in reversed(_ESCAPES):
        s = pc.replace_substring(s, ent, raw)
    return s


def extract_text(df, html_col: str = "html", out_col: str = "text"):
    """DataFrame transform: add/replace ``out_col`` with the text extracted
    from ``html_col``. Narrow mapInArrow — streams batches, preserves the
    input partitioning (no shuffle), prunes nothing (all other columns pass
    through untouched)."""
    import pyarrow as pa

    schema_out = []
    for f in df.schema.fields:
        if f.name != out_col:
            schema_out.append(f"{f.name} {f.dataType.simpleString()}")
    schema_out.append(f"{out_col} string")
    names = [f.name for f in df.schema.fields if f.name != out_col]

    def gen(batches):
        for rb in batches:
            cols = [rb.column(n) for n in names]
            yield pa.RecordBatch.from_arrays(
                cols + [extract_text_arrow(rb.column(html_col))],
                names=names + [out_col],
            )

    return df.mapInArrow(gen, schema=", ".join(schema_out))
