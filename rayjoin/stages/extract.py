"""HTML -> text extraction over the pages table (the north rule's per-row
invariant: byte-identical extracted text per url, verified end-to-end).

The extractor is fully vectorized Arrow compute over the ``html`` binary
column — re2 regex kernels over the flat utf8 buffer, zero per-row Python —
so it runs as a plain ``map_batches`` stage at corpus scale.  Semantics
(documented contract, matched by the page builder in sources/pages.py):

- the extracted text is the content of the ``<body>`` element (first
  ``<body`` open tag to the LAST ``</body>``), with every ``<...>`` tag
  span removed and the minimal HTML entity set (&amp; &lt; &gt;) decoded,
  in that order — the exact inverse of ``html_escape_column``;
- pages with no ``<body>`` element extract to null (surfaced, not dropped,
  so a malformed-page rate is one ``count(text IS NULL)`` away);
- bytes must be valid UTF-8 (true of WARC-converted text payloads by
  construction here; a real crawl would transcode upstream).

Round-trip law (pytest-pinned): for ANY text,
``extract_text_batch(build_page_html(text)) == text`` byte-for-byte —
escape & first / decode & last makes entity handling a true inverse even
for adversarial inputs like ``&amp;lt;``.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

_BODY_RE = r"(?s)<body[^>]*>(?P<body>.*)</body>"
_TAG_RE = r"(?s)<[^>]*>"


def html_escape_column(col) -> pa.Array:
    """Minimal HTML entity escape of a string column (& first, then < >)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    arr = pc.replace_substring(arr, pattern="&", replacement="&amp;")
    arr = pc.replace_substring(arr, pattern="<", replacement="&lt;")
    return pc.replace_substring(arr, pattern=">", replacement="&gt;")


def extract_text_batch(html_col) -> pa.Array:
    """Extracted body text (string) from an html binary/string column;
    null where the page has no <body> element."""
    arr = (html_col.combine_chunks()
           if isinstance(html_col, pa.ChunkedArray) else html_col)
    if pa.types.is_binary(arr.type) or pa.types.is_large_binary(arr.type):
        arr = arr.cast(pa.large_string()
                       if pa.types.is_large_binary(arr.type) else pa.string())
    body = pc.struct_field(pc.extract_regex(arr, pattern=_BODY_RE), "body")
    inner = pc.replace_substring_regex(body, pattern=_TAG_RE, replacement="")
    # entity decode — the inverse of html_escape_column, & LAST
    inner = pc.replace_substring(inner, pattern="&lt;", replacement="<")
    inner = pc.replace_substring(inner, pattern="&gt;", replacement=">")
    return pc.replace_substring(inner, pattern="&amp;", replacement="&")


def extract_text(ds, *, html_col: str = "html", out_col: str = "text"):
    """Dataset stage: derive ``out_col`` from ``html_col`` per batch
    (replacing an existing column of that name)."""

    def run(t: pa.Table) -> pa.Table:
        got = extract_text_batch(t[html_col])
        if out_col in t.column_names:
            t = t.drop_columns([out_col])
        return t.append_column(out_col, got)

    return ds.map_batches(run, batch_format="pyarrow")
