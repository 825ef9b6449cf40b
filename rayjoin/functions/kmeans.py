"""Distributed k-means over an embedding column, and SemDeDup-style
semantic near-duplicate removal built on it.

Engine scope beyond the reference (the reference, msalib/spatial-join, is a
geometry-join library with no vector ops; this follows the driver brief's
"embedding-cosine near-dup" / clustering line).  SemDeDup (Abbas et al.,
2023, arXiv:2303.09540) is the standard LLM-curation recipe: cluster the
corpus embeddings with k-means, then search for near-duplicates only WITHIN
each cluster — the clustering bounds the quadratic pair search that an
exhaustive cosine sweep cannot afford at corpus scale.

100 TB shape
------------
* Each Lloyd iteration is ONE streaming pass: a single ``map_batches`` stage
  computes assignments AND per-cluster partial sums (k x dim doubles + k
  counts per block) in the same kernel, so only tiny partials reach the
  driver — never vectors, never assignments.  No shuffle at all during
  fitting; ``iters`` passes total plus one final assignment pass.
* The driver-side reduce is O(k * dim * num_blocks) bytes.  At extreme
  scale (k=256, dim=1024, 100k+ blocks) the partials themselves need a
  pre-combine ``map_batches`` tier before the pull — straightforward to
  add since partial tables sum cluster-wise, at the cost of the bit-exact
  refit guarantee (Ray's batching of partials is not order-stable; the
  quantized update absorbs the last-bit wobble, so only exact-refit
  reproducibility weakens, not correctness).  Not wired here: every
  in-sandbox workload is orders of magnitude below that line.  Partials
  are reduced in sorted block order (vectorized segmented left fold) so
  refits are bit-deterministic across runs.
* Centroid updates are quantized to a fixed binary grid
  (``floor(avg * 2^quant_bits + 0.5) / 2^quant_bits``): float averages
  summed in different orders (Ray blocks vs any SQL oracle's internal
  order) agree after quantization, making the whole fit reproducible and
  SQL-checkable without carrying floats into the output.
* ``semdedup_drop_list``'s pair search is one ``groupby(cluster)`` shuffle
  followed by a per-cluster chunked-matmul scan (chunk x m sims in memory,
  never m x m).  Per-cluster work is O(m^2) by algorithm design — SemDeDup's
  contract is that k is chosen to bound m; a hot cluster can be re-split by
  a nested fit (see ``max_cluster_rows``).

Determinism and oracle contract (mirrored by ``sql_kmeans`` in
``pipelines/gate.py``): init centroids are the ``k`` lowest-id vectors;
assignment is argmin euclidean distance with ties to the LOWER cluster id;
empty clusters drop out of subsequent rounds (surviving clusters keep their
original ids); outputs are integer-only (ids + cluster labels), so float
noise in distance computation only matters at exact ties, which the gate's
measured margins put ~9 orders of magnitude above double rounding error.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .ann import vec_matrix


def _quantize(m: np.ndarray, quant_bits: int) -> np.ndarray:
    q = float(1 << quant_bits)
    return np.floor(m * q + 0.5) / q


def _init_centroids(ds, *, k: int, id_col: str, vec_col: str):
    """(labels, centroids) = the k lowest-id vectors: per-block bottom-k
    partials (tiny) reduced on the driver."""
    import ray

    def bottomk(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.select([id_col, vec_col])
        ids = np.asarray(t[id_col].combine_chunks(), np.int64)
        order = np.argsort(ids, kind="stable")[:k]
        return t.select([id_col, vec_col]).take(pa.array(order))

    parts = ds.select_columns([id_col, vec_col]).map_batches(
        bottomk, batch_format="pyarrow"
    )
    tabs = [t for t in ray.get(parts.to_arrow_refs()) if t.num_rows]
    if not tabs:
        raise ValueError("kmeans: empty input dataset")
    t = pa.concat_tables(tabs)
    ids = np.asarray(t[id_col].combine_chunks(), np.int64)
    order = np.argsort(ids, kind="stable")[:k]
    vecs = vec_matrix(t[vec_col].combine_chunks()).astype(np.float64)
    labels = np.arange(min(k, len(order)), dtype=np.int64)
    return labels, vecs[order]


_FAST_ASSIGN_K = 32


def _assign(X: np.ndarray, centroids: np.ndarray) -> np.ndarray:
    """Argmin squared-euclidean row index (ties -> lowest index).

    Small k (the SQL-oracled configs): the direct (x - c)^2 form — not the
    ||x||^2 - 2xc + ||c||^2 expansion — keeps rounding behaviour closest to
    a scalar distance oracle.  Large k: the expansion via one matmul (the
    per-centroid loop would make assignment O(k) passes over X); identical
    argmin except at ties within float rounding, which real embeddings
    don't produce — scale path only, never under an exactness oracle."""
    n = X.shape[0]
    kk = centroids.shape[0]
    if kk > _FAST_ASSIGN_K:
        # row-chunked so the (chunk, k) distance matrix stays ~32 MB
        step = max(1, (4 << 20) // kk)
        cc = np.einsum("ij,ij->i", centroids, centroids)[None, :]
        out = np.empty(n, np.int64)
        for lo in range(0, n, step):
            Xc = X[lo:lo + step]
            d2 = (np.einsum("ij,ij->i", Xc, Xc)[:, None]
                  - 2.0 * (Xc @ centroids.T) + cc)
            out[lo:lo + step] = np.argmin(d2, axis=1)
        return out
    d2 = np.empty((n, kk), np.float64)
    for j in range(kk):
        diff = X - centroids[j]
        d2[:, j] = np.einsum("ij,ij->i", diff, diff)
    return np.argmin(d2, axis=1)


def kmeans_fit(ds, *, k: int = 4, iters: int = 2, id_col: str = "vec_id",
               vec_col: str = "embedding", quant_bits: int = 20,
               batch_size=None):
    """Lloyd's k-means over ``ds[vec_col]``; returns ``(labels, centroids)``
    where ``labels[i]`` is the original cluster id of ``centroids[i]``
    (clusters that went empty in any round are gone).  ``iters`` update
    rounds; one streaming pass per round, no shuffle.  ``batch_size=None``
    (the default) feeds whole Ray blocks to the kernel — no splitting or
    coalescing — so per-batch Python/Arrow overhead amortizes over the
    BLAS-heavy assignment (Ray's small 1024-row default made the fit
    launch-bound at scale); the row-chunked ``_assign`` bounds the
    distance-matrix memory regardless of block size."""
    import ray

    labels, cents = _init_centroids(ds, k=k, id_col=id_col, vec_col=vec_col)
    slim = ds.select_columns([id_col, vec_col])
    for _ in range(iters):
        cur_labels, cur_cents = labels, cents

        def partial(t: pa.Table) -> pa.Table:
            kk = cur_cents.shape[0]
            dim = cur_cents.shape[1]
            if t.num_rows == 0:
                return pa.table({
                    "c": pa.array([], pa.int64()),
                    "vsum": pa.array([], pa.list_(pa.float64())),
                    "cnt": pa.array([], pa.int64()),
                    "key": pa.array([], pa.int64()),
                })
            ids = np.asarray(t[id_col].combine_chunks(), np.int64)
            X = vec_matrix(t[vec_col].combine_chunks()).astype(np.float64)
            a = _assign(X, cur_cents)
            sums = np.zeros((kk, dim), np.float64)
            np.add.at(sums, a, X)
            cnt = np.bincount(a, minlength=kk).astype(np.int64)
            inner = pa.array(sums.ravel(), pa.float64())
            offs = pa.array(np.arange(0, (kk + 1) * dim, dim, dtype=np.int32))
            return pa.table({
                "c": pa.array(cur_labels, pa.int64()),
                "vsum": pa.ListArray.from_arrays(offs, inner),
                "cnt": pa.array(cnt, pa.int64()),
                "key": pa.array(np.full(kk, ids.min(), np.int64), pa.int64()),
            })

        parts = slim.map_batches(
            partial, batch_format="pyarrow", batch_size=batch_size)
        tabs = [t for t in ray.get(parts.to_arrow_refs()) if t.num_rows]
        pt = pa.concat_tables(tabs)
        cs = np.asarray(pt["c"].combine_chunks(), np.int64)
        cnts = np.asarray(pt["cnt"].combine_chunks(), np.int64)
        vs = vec_matrix(pt["vsum"].combine_chunks())
        kk, dim = cents.shape
        # deterministic reduce: re-sort per-cluster (cluster major, block
        # key minor) and left-fold each cluster segment with reduceat —
        # np.add.at would sum in unspecified order, breaking bit-exact
        # refits (float addition is not associative)
        order2 = np.lexsort((np.asarray(pt["key"].combine_chunks(),
                                        np.int64), cs))
        cs, cnts, vs = cs[order2], cnts[order2], vs[order2]
        starts = np.flatnonzero(np.r_[True, cs[1:] != cs[:-1]])
        seg_c = cs[starts]
        sums = np.zeros((kk, dim), np.float64)
        counts = np.zeros(kk, np.int64)
        pos = np.searchsorted(labels, seg_c)
        sums[pos] = np.add.reduceat(vs, starts, axis=0)
        counts[pos] = np.add.reduceat(cnts, starts)
        alive = counts > 0
        labels = labels[alive]
        cents = _quantize(sums[alive] / counts[alive, None], quant_bits)
    return labels, cents


def kmeans_assign(ds, *, k: int = 4, iters: int = 2, id_col: str = "vec_id",
                  vec_col: str = "embedding", quant_bits: int = 20,
                  carry_vec: bool = False, batch_size=None,
                  fitted=None):
    """Fit k-means (or reuse a ``fitted=(labels, centroids)`` pair from a
    prior ``kmeans_fit``), then one final streaming pass appending an int64
    ``cluster`` column.  Returns a Dataset of ``(id_col, cluster)``
    (plus ``vec_col`` when ``carry_vec``)."""
    labels, cents = fitted if fitted is not None else kmeans_fit(
        ds, k=k, iters=iters, id_col=id_col, vec_col=vec_col,
        quant_bits=quant_bits, batch_size=batch_size)

    def assign(t: pa.Table) -> pa.Table:
        cols = {id_col: t[id_col]}
        if t.num_rows == 0:
            cols["cluster"] = pa.array([], pa.int64())
        else:
            X = vec_matrix(t[vec_col].combine_chunks()).astype(np.float64)
            cols["cluster"] = pa.array(labels[_assign(X, cents)], pa.int64())
        if carry_vec:
            cols[vec_col] = t[vec_col]
        return pa.table(cols)

    cols = [id_col, vec_col]
    return ds.select_columns(cols).map_batches(
        assign, batch_format="pyarrow", batch_size=batch_size)


def _scan_drops(X: np.ndarray, *, threshold: float, chunk_rows: int,
                max_rows, depth: int = 0) -> np.ndarray:
    """Drop mask over rows of unit-normalized ``X`` IN ID ORDER: row j drops
    iff some earlier row has cosine >= threshold.  Chunked matmul (chunk x m
    sims in memory, never m x m).  When ``max_rows`` is set and m exceeds
    it, a LOCAL deterministic k-means splits the rows and each sub-cluster
    recurses — SemDeDup applied at depth 2+ (an approximation: pairs split
    across sub-clusters are missed, exactly like the top-level clustering
    misses cross-cluster pairs).  A no-progress split (every row in one
    sub-cluster) falls through to the direct scan."""
    m = len(X)
    if max_rows is not None and m > max_rows and depth < 8:
        sub_k = min(m, 2 * -(-m // max_rows))
        cents = X[:sub_k].copy()  # lowest-id rows, like the top-level init
        for _ in range(2):
            a = _assign(X, cents)
            alive = np.unique(a)
            sums = np.zeros((len(alive), X.shape[1]))
            remap = np.searchsorted(alive, a)
            np.add.at(sums, remap, X)
            cnt = np.bincount(remap).astype(np.float64)
            cents = sums / cnt[:, None]
        a = _assign(X, cents)
        labs = np.unique(a)
        if len(labs) > 1:
            drop = np.zeros(m, bool)
            for lab in labs:
                sel = a == lab
                drop[sel] = _scan_drops(
                    X[sel], threshold=threshold, chunk_rows=chunk_rows,
                    max_rows=max_rows, depth=depth + 1)
            return drop
    drop = np.zeros(m, bool)
    cols = np.arange(m)
    for lo in range(0, m, chunk_rows):
        hi = min(lo + chunk_rows, m)
        sims = X[lo:hi] @ X.T  # (chunk, m)
        # row with global index g drops if any column < g matches
        # (rows are in id order, so column order == id order)
        earlier = cols[None, :] < np.arange(lo, hi)[:, None]
        drop[lo:hi] |= (earlier & (sims >= threshold)).any(axis=1)
    return drop


def semdedup_drop_list(ds, *, threshold: float = 0.5, k: int = 4,
                       iters: int = 2, id_col: str = "vec_id",
                       vec_col: str = "embedding", quant_bits: int = 20,
                       chunk_rows: int = 1024, max_cluster_rows=None,
                       batch_size=None, fitted=None):
    """SemDeDup: cluster embeddings, then drop every vector that has a
    SMALLER-id near-duplicate (cosine >= threshold) in its own cluster.
    Returns a Dataset with one ``{id_col}`` column (the drop list).

    The keep-lowest-id rule is the deterministic stand-in for SemDeDup's
    "keep one per duplicate group"; restricting pairs to a cluster is the
    algorithm's defining approximation (cross-cluster near-dups are missed
    by design — that is the price of linearizing the pair search).

    Mega-duplicate safety (the minhash pre-collapse, applied here): BYTE-
    EQUAL vectors inside a cluster are collapsed to their lowest-id
    representative before the quadratic scan — every other member drops
    unconditionally (equal vectors have cosine 1 up to rounding; exact for
    any threshold not within ~1e-12 of 1), and representative-only scanning
    preserves the drop rule (a's representative has id <= a, so "some
    earlier rep matches" iff "some earlier row matches").  A boilerplate
    page embedded 10^5 times costs one lexsort, not O(m^2) sims.
    ``max_cluster_rows`` additionally sub-splits oversized clusters with a
    local k-means (a further approximation — off by default and in the
    SQL-oracled registry query)."""
    assigned = kmeans_assign(
        ds, k=k, iters=iters, id_col=id_col, vec_col=vec_col,
        quant_bits=quant_bits, carry_vec=True, batch_size=batch_size,
        fitted=fitted)

    empty = pa.table({id_col: pa.array([], pa.int64())})

    def per_cluster(t: pa.Table) -> pa.Table:
        if t.num_rows < 2:
            return empty
        ids = np.asarray(t[id_col].combine_chunks(), np.int64)
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        X = vec_matrix(t[vec_col].combine_chunks()).astype(np.float64)[order]
        m = len(ids)
        drop = np.zeros(m, bool)
        # exact collapse: rows are id-sorted, so each byte-equal group's
        # first occurrence is its lowest-id representative; the rest drop
        _, first, inv = np.unique(
            X, axis=0, return_index=True, return_inverse=True)
        if len(first) < m:
            drop[first[inv] != np.arange(m)] = True
        rep_idx = np.sort(first)  # representatives back in id order
        Xr = X[rep_idx]
        Xr = Xr / np.maximum(np.linalg.norm(Xr, axis=1, keepdims=True), 1e-300)
        if len(rep_idx) >= 2:
            drop[rep_idx] |= _scan_drops(
                Xr, threshold=threshold, chunk_rows=chunk_rows,
                max_rows=max_cluster_rows)
        if not drop.any():
            return empty
        return pa.table({id_col: pa.array(ids[drop], pa.int64())})

    out = assigned.groupby("cluster").map_groups(
        per_cluster, batch_format="pyarrow")
    # all-empty groups yield schemaless blocks (Ray quirk); pin the schema
    from ..util import drop_schemaless_empty_blocks

    return drop_schemaless_empty_blocks(out, empty)
