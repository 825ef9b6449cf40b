"""The Common-Crawl-style ``pages`` table (BASELINE.json input_hint:
url:string, warc_ts:timestamp, html:binary, text:string, lang:string).

Two deterministic sources:
- ``pages_from_documents``: derive pages from the driver-provided
  ``documents`` testdata table (doc_id -> url/warc_ts; text rides through
  BYTE-IDENTICAL — the per-row invariant the north rule pins).
- ``synth_pages``: standalone seeded generator (FIXTURES.md §1) for tests
  that need scale without testdata.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

LANGS = ["en", "de", "fr", "es", "pt", "zh"]
_EPOCH_2024 = 1704067200  # 2024-01-01T00:00:00Z in unix seconds


def _pages_batch(t: pa.Table) -> pa.Table:
    doc_id = np.asarray(t["doc_id"].combine_chunks(), dtype=np.int64)
    url = pc.binary_join_element_wise(
        "https://site",
        pc.cast(pa.array(doc_id % 997), pa.string()),
        ".example/",
        pc.cast(pa.array(doc_id), pa.string()),
        "",
    )
    ts = pa.array((_EPOCH_2024 + doc_id) * 1_000_000, pa.timestamp("us"))
    text = t["text"]
    # Non-trivial page shape: head/title outside the body, attributes on
    # the body tag, entity-escaped text inside a <p> — so the byte-identity
    # invariant exercises a REAL extraction (stages/extract.py round-trip),
    # not a substring slice.
    from ..stages.extract import html_escape_column

    html_str = pc.binary_join_element_wise(
        "<html><head><title>doc ",
        pc.cast(pa.array(doc_id), pa.string()),
        '</title></head><body class="page"><p>',
        html_escape_column(text),
        "</p></body></html>",
        "",
    )
    html = pc.cast(html_str, pa.binary())
    return pa.table(
        {
            "doc_id": pa.array(doc_id, pa.int64()),
            "url": url,
            "warc_ts": ts,
            "html": html,
            "text": text.combine_chunks(),  # byte-identical ride-through
            "lang": t["lang"].combine_chunks(),
        }
    )


def pages_from_documents(sf_dir: str):
    """Dataset of pages derived 1:1 from {sf_dir}/documents.parquet."""
    import ray.data

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text", "lang"])
    return docs.map_batches(_pages_batch, batch_format="pyarrow")


def synth_pages(n: int, seed: int = 42) -> pa.Table:
    """Seeded token-soup pages table (FIXTURES.md §1), 50-2000 chars.

    Vectorized: token picks are one RNG draw; per-row strings come from a
    ListArray over the flat token-string column joined with pc.binary_join
    (no per-row Python).  Draw order matches the original per-row generator
    (one lengths pass, then one flat token pass) — same seed, same corpus
    shape class; texts are seeded-deterministic either way.
    """
    rng = np.random.default_rng(seed)
    vocab = pa.array([f"tok{v}" for v in range(500)], pa.string())
    lens = rng.integers(8, 250, size=n)
    total = int(lens.sum())
    flat_idx = rng.integers(0, len(vocab), size=total)
    tokens = vocab.take(pa.array(flat_idx))
    offsets = pa.array(
        np.concatenate([[0], np.cumsum(lens)]).astype(np.int32)
    )
    token_lists = pa.ListArray.from_arrays(offsets, tokens)
    texts = pc.binary_join(token_lists, " ")
    lang_codes = pa.array(LANGS, pa.string()).take(
        pa.array(np.arange(n, dtype=np.int64) % len(LANGS))
    )
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64), pa.int64()),
            "text": texts,
            "lang": lang_codes,
        }
    )
    return _pages_batch(t)
