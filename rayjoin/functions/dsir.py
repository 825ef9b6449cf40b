"""DSIR-style data selection: importance weights between a target and a
raw hashed-token unigram model, then deterministic top-k selection.

Data Selection via Importance Resampling (Xie et al. 2023,
arXiv:2302.03169) scores every raw document by how much more likely its
hashed n-gram bag is under a TARGET distribution than under the RAW
distribution, then resamples by those weights.  This implementation keeps
the exactly-checkable core: hashed unigram features (FNV-1a token hash mod
``n_buckets`` — the same byte-exact hash the gate's SQL twins replicate),
Laplace-smoothed bucket models, and a fixed-point log-ratio score

    score(d) = sum over token occurrences of
               floor(1e6 * (ln p_target(b) - ln p_raw(b)))   [int64]

so summation is order-free and the whole fit+score pipeline hash-checks
bit-exactly against SQL (gate rows ``dsir_scores`` / ``dsir_select``).
``math.log`` per DISTINCT bucket keeps libm parity with DuckDB's LN (the
trick proven by tfidf/unigram_lm_scores).  Selection is top-k by
(score DESC, doc_id ASC) — the deterministic stand-in for DSIR's Gumbel
resampling (which would add seeded noise to the same weights).

100 TB shape: model fit is ONE streaming pass emitting an
``n_buckets``-long histogram pair per block (no shuffle, no token rows
leave their block); scoring is a second pass against the tiny broadcast
log-ratio LUT; selection is per-block partial top-k + driver merge of
k-row partials.  Nothing is ever grouped or sorted corpus-wide.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _token_buckets(text: pa.ChunkedArray, n_buckets: int):
    """(flat bucket ids uint64 -> int64, per-doc token counts).  Whitespace
    split with empty tokens KEPT (DuckDB ``string_split`` parity: an empty
    text contributes one empty token)."""
    from ..stages.geocode import fnv1a64

    toks = pc.split_pattern(text, pattern=" ")
    flat = pc.list_flatten(toks)
    lens = np.asarray(pc.list_value_length(toks), dtype=np.int64)
    h = fnv1a64(flat.combine_chunks() if isinstance(flat, pa.ChunkedArray)
                else flat)
    return (h % np.uint64(n_buckets)).astype(np.int64), lens


def _fit_lut(ds, *, target_col: str, target_value, text_col: str,
             n_buckets: int) -> np.ndarray:
    """One streaming pass -> int64 LUT of floor(1e6*(ln p_t - ln p_r)) per
    bucket.  Buckets never seen in the raw corpus keep lam=0 (they cannot
    appear at scoring time by construction)."""
    import math

    import ray

    def hist(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({
                "tgt": pa.array([], pa.list_(pa.int64())),
                "raw": pa.array([], pa.list_(pa.int64())),
            })
        b, lens = _token_buckets(t[text_col].combine_chunks(), n_buckets)
        is_tgt = np.asarray(
            pc.equal(t[target_col].combine_chunks(),
                     target_value).fill_null(False))
        tok_tgt = np.repeat(is_tgt, lens)
        raw = np.bincount(b, minlength=n_buckets).astype(np.int64)
        tgt = np.bincount(b[tok_tgt], minlength=n_buckets).astype(np.int64)
        return pa.table({
            "tgt": pa.array([tgt], pa.list_(pa.int64())),
            "raw": pa.array([raw], pa.list_(pa.int64())),
        })

    parts = ds.select_columns([text_col, target_col]).map_batches(
        hist, batch_format="pyarrow", batch_size=None)
    tabs = [t for t in ray.get(parts.to_arrow_refs()) if t.num_rows]
    tgt = np.zeros(n_buckets, np.int64)
    raw = np.zeros(n_buckets, np.int64)
    for t in tabs:  # integer sums: order-free
        from .ann import vec_matrix

        tgt += vec_matrix(t["tgt"].combine_chunks()).astype(np.int64).sum(axis=0)
        raw += vec_matrix(t["raw"].combine_chunks()).astype(np.int64).sum(axis=0)
    nt = float(tgt.sum() + n_buckets)
    nr = float(raw.sum() + n_buckets)
    lam = np.zeros(n_buckets, np.int64)
    seen = np.flatnonzero(raw > 0)
    for b in seen:  # n_buckets is small; math.log for libm parity with LN
        lam[b] = int(np.floor(1_000_000.0 * (
            math.log((float(tgt[b]) + 1.0) / nt)
            - math.log((float(raw[b]) + 1.0) / nr))))
    return lam


def dsir_scores(ds, *, target_col: str = "lang", target_value="en",
                text_col: str = "text", id_col: str = "doc_id",
                n_buckets: int = 256):
    """Fit the target/raw hashed-unigram models (pass 1), then score every
    document (pass 2).  Returns Dataset[doc_id, n_tokens, dsir_micro]."""
    lam = _fit_lut(ds, target_col=target_col, target_value=target_value,
                   text_col=text_col, n_buckets=n_buckets)

    def score(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({
                id_col: pa.array([], pa.int64()),
                "n_tokens": pa.array([], pa.int64()),
                "dsir_micro": pa.array([], pa.int64()),
            })
        b, lens = _token_buckets(t[text_col].combine_chunks(), n_buckets)
        off = np.concatenate([[0], np.cumsum(lens)])
        csum = np.concatenate([[0], np.cumsum(lam[b])])
        return pa.table({
            id_col: t[id_col],
            "n_tokens": pa.array(lens, pa.int64()),
            "dsir_micro": pa.array(csum[off[1:]] - csum[off[:-1]], pa.int64()),
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        score, batch_format="pyarrow", batch_size=None)


def dsir_select(ds, *, k: int = 100, target_col: str = "lang",
                target_value="en", text_col: str = "text",
                id_col: str = "doc_id", n_buckets: int = 256):
    """Top-``k`` documents by (dsir_micro DESC, doc_id ASC) with dense
    0-based rank — per-block partial top-k, then a driver merge of k-row
    partials (never a corpus-wide sort).  Returns a pyarrow Table
    ``(doc_id, dsir_micro, rank)``."""
    import ray

    scores = dsir_scores(
        ds, target_col=target_col, target_value=target_value,
        text_col=text_col, id_col=id_col, n_buckets=n_buckets)

    def partial_topk(t: pa.Table) -> pa.Table:
        if t.num_rows <= k:
            return t.select([id_col, "dsir_micro"])
        s = np.asarray(t["dsir_micro"].combine_chunks(), np.int64)
        ids = np.asarray(t[id_col].combine_chunks(), np.int64)
        order = np.lexsort((ids, -s))[:k]
        return t.select([id_col, "dsir_micro"]).take(pa.array(np.sort(order)))

    parts = scores.map_batches(partial_topk, batch_format="pyarrow")
    tabs = [t for t in ray.get(parts.to_arrow_refs()) if t.num_rows]
    if not tabs:
        return pa.table({id_col: pa.array([], pa.int64()),
                         "dsir_micro": pa.array([], pa.int64()),
                         "rank": pa.array([], pa.int64())})
    t = pa.concat_tables(tabs)
    s = np.asarray(t["dsir_micro"].combine_chunks(), np.int64)
    ids = np.asarray(t[id_col].combine_chunks(), np.int64)
    order = np.lexsort((ids, -s))[:k]
    return pa.table({
        id_col: pa.array(ids[order], pa.int64()),
        "dsir_micro": pa.array(s[order], pa.int64()),
        "rank": pa.array(np.arange(len(order), dtype=np.int64), pa.int64()),
    })
