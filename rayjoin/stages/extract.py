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


def extract_links_batch(html_col, doc_ids: "pa.Array") -> pa.Table:
    """Vectorized href extraction: every ``href=\"...\"`` value, in document
    order, as (doc_id, link_idx, href) rows.  One split on the attribute
    marker + one find/slice for the closing quote — equivalent to
    regexp_extract_all(html, 'href=\"([^\"]*)\"', 1), with unterminated
    attributes dropped, and NO per-row Python or backtracking regex."""
    import numpy as np
    import pyarrow.compute as pc

    html = html_col
    if pa.types.is_binary(html.type) or pa.types.is_large_binary(html.type):
        html = pc.cast(html, pa.large_string())
    frags = pc.split_pattern(html, pattern='href="')
    nfrag = np.asarray(pc.list_value_length(frags), dtype=np.int64)
    flat = frags.flatten() if not isinstance(frags, pa.ChunkedArray) \
        else frags.combine_chunks().flatten()
    nb = nfrag.size
    doc = np.repeat(np.asarray(doc_ids, dtype=np.int64), nfrag)
    starts = np.concatenate([[0], np.cumsum(nfrag)])[:-1]
    idx_in_doc = np.arange(doc.size, dtype=np.int64) - np.repeat(starts, nfrag)
    is_link = idx_in_doc >= 1  # fragment 0 precedes the first href
    # prefix up to the closing quote: split(max 1) -> 2 elements iff a
    # quote exists; unterminated attributes (1 element) are dropped
    cut = pc.split_pattern(flat, pattern='"', max_splits=1)
    terminated = np.asarray(pc.list_value_length(cut), dtype=np.int64) == 2
    keep = is_link & terminated
    href = pc.list_element(cut.filter(pa.array(keep, pa.bool_())), 0)
    # link_idx: 0-based among KEPT links per doc
    kd = doc[keep]
    new_doc = np.concatenate([[True], kd[1:] != kd[:-1]]) if kd.size else \
        np.empty(0, bool)
    seg_first = np.flatnonzero(new_doc)
    link_idx = (np.arange(kd.size, dtype=np.int64)
                - np.repeat(seg_first, np.diff(np.concatenate(
                    [seg_first, [kd.size]])))) if kd.size else \
        np.empty(0, np.int64)
    return pa.table(
        {"doc_id": pa.array(kd, pa.int64()),
         "link_idx": pa.array(link_idx, pa.int64()),
         "href": pc.cast(href, pa.large_string())}
    )


def extract_links(ds, *, html_col: str = "html", id_col: str = "doc_id"):
    """Dataset[doc_id, link_idx, href] — the link-graph construction step
    over raw pages (feeds functions/graph.py pagerank / components).
    Doc-local, no shuffle."""

    def run(t: pa.Table) -> pa.Table:
        return extract_links_batch(
            t[html_col].combine_chunks(),
            t[id_col].combine_chunks().cast(pa.int64()),
        )

    return ds.map_batches(run, batch_format="pyarrow")
