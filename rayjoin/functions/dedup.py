"""Deduplication operators (training-data engine scope; driver brief):

- exact:     content hash -> hash-partitioned groupby -> keep min doc_id
- minhash:   shingle -> minhash -> LSH band buckets -> candidate pairs ->
             exact Jaccard verify   (the scalable near-dup path)
- simhash:   64-bit simhash hamming buckets (4-table split) -> verify
- ngram:     brute Jaccard on n-gram sets for candidate pairs (the verifier)

Everything per-batch is vectorized; the only shuffles are the groupbys on
hash/bucket keys, which is the minimum any distributed dedup needs (partial
state per batch first, SURVEY.md aggregation guidance).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import pandas as pd
import pyarrow as pa

from ..stages.geocode import fnv1a64


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def add_content_hash(batch: pa.Table, *, text_col: str = "text", out_col: str = "content_hash") -> pa.Table:
    h = fnv1a64(batch[text_col])
    return batch.append_column(out_col, pa.array(h.astype(np.int64), pa.int64()))


def dedup_exact(ds, *, id_col: str = "doc_id", text_col: str = "text"):
    """Keep the minimum id per distinct text.  Hash first (vectorized, per
    batch), then a partial min per batch, then one small groupby — the
    pre-aggregation keeps the shuffle tiny at scale."""
    import ray.data
    from ray.data.aggregate import Min

    hashed = ds.map_batches(
        lambda t: add_content_hash(t, text_col=text_col).select([id_col, "content_hash"]),
        batch_format="pyarrow",
    )

    def partial_min(t: pa.Table) -> pa.Table:
        df = t.to_pandas().groupby("content_hash", as_index=False)[id_col].min()
        return pa.Table.from_pandas(df, preserve_index=False)

    partial = hashed.map_batches(partial_min, batch_format="pyarrow")
    return partial.groupby("content_hash").aggregate(Min(id_col, alias_name=id_col))


# ---------------------------------------------------------------------------
# minhash + LSH
# ---------------------------------------------------------------------------


def _shingle_hashes(texts: pa.Array, k: int = 5) -> Tuple[np.ndarray, np.ndarray]:
    """Character k-shingle hashes per document (flat hashes + doc offsets).
    Vectorized: the flat utf-8 buffer is hashed with a rolling polynomial."""
    arr = texts.combine_chunks() if isinstance(texts, pa.ChunkedArray) else texts
    n = len(arr)
    buf = arr.buffers()
    offsets = np.frombuffer(buf[1], dtype=np.int32, count=n + 1 + arr.offset)[
        arr.offset : arr.offset + n + 1
    ].astype(np.int64)
    data = (
        np.frombuffer(buf[2], dtype=np.uint8)
        if buf[2] is not None
        else np.empty(0, np.uint8)
    )
    lens = offsets[1:] - offsets[:-1]
    # rolling hash over the whole flat buffer, then mask out windows that
    # cross document boundaries
    if data.size < k:
        return np.empty(0, np.uint64), np.zeros(n + 1, np.int64)
    with np.errstate(over="ignore"):
        h = np.zeros(data.size - k + 1, dtype=np.uint64)
        for j in range(k):
            h = h * np.uint64(1099511628211) + data[j : data.size - k + 1 + j].astype(np.uint64)
    # windows fully inside doc i: start in [offsets[i], offsets[i+1]-k]
    counts = np.maximum(lens - k + 1, 0)
    doc_off = np.concatenate([[0], np.cumsum(counts)])
    idx = np.concatenate(
        [np.arange(offsets[i], offsets[i] + counts[i]) for i in range(n)]
    ) if counts.sum() else np.empty(0, np.int64)
    return h[idx], doc_off


def minhash_signatures(texts, *, num_perm: int = 64, k: int = 5, seed: int = 1) -> np.ndarray:
    """(n, num_perm) uint64 minhash signatures via affine permutations of the
    shingle hash universe."""
    flat, doc_off = _shingle_hashes(texts, k)
    n = doc_off.size - 1
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 2**61, size=num_perm, dtype=np.uint64) | np.uint64(1)
    b = rng.integers(0, 2**61, size=num_perm, dtype=np.uint64)
    sig = np.full((n, num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
    counts = np.diff(doc_off)
    nonempty = counts > 0
    starts = doc_off[:-1][nonempty]
    with np.errstate(over="ignore"):
        for p in range(num_perm):
            ph = flat * a[p] + b[p]
            if ph.size:
                # shingles are contiguous per doc -> segmented min via
                # reduceat (ufunc.at is ~100x slower)
                sig[nonempty, p] = np.minimum.reduceat(ph, starts)
    return sig


def minhash_dedup_pairs(ds, *, id_col: str = "doc_id", text_col: str = "text",
                        num_perm: int = 64, bands: int = 16, k: int = 5,
                        threshold: float = 0.8, shingle_k: int = 5):
    """Near-duplicate pairs via MinHash-LSH.

    Pipeline: per-batch signatures -> explode to (band, band_hash, id) rows ->
    groupby band buckets -> candidate pairs (id_a < id_b) -> exact character
    k-shingle Jaccard verify >= threshold -> distinct pairs.
    """
    import ray.data

    rows_per_band = num_perm // bands

    def to_bands(t: pa.Table) -> pa.Table:
        sig = minhash_signatures(t[text_col], num_perm=num_perm, k=shingle_k)
        ids = np.asarray(t[id_col].combine_chunks(), dtype=np.int64)
        n = sig.shape[0]
        band_ids = np.repeat(np.arange(bands, dtype=np.int64), n)
        doc_rep = np.tile(ids, bands)
        bh = np.empty(bands * n, dtype=np.int64)
        with np.errstate(over="ignore"):
            for b in range(bands):
                seg = sig[:, b * rows_per_band : (b + 1) * rows_per_band]
                h = np.zeros(n, dtype=np.uint64)
                for c in range(rows_per_band):
                    h = h * np.uint64(1099511628211) ^ seg[:, c]
                bh[b * n : (b + 1) * n] = h.astype(np.int64)
        return pa.table(
            {
                "band": pa.array(band_ids, pa.int64()),
                "band_hash": pa.array(bh, pa.int64()),
                id_col: pa.array(doc_rep, pa.int64()),
            }
        )

    bands_ds = ds.map_batches(to_bands, batch_format="pyarrow")

    # coarse-bucket the (band, band_hash) space so each map_groups group is a
    # large chunk (a per-LSH-bucket map_groups would shuffle into millions of
    # singleton groups); the per-bucket pairing is a vectorized pandas groupby
    def add_bucket(t: pa.Table) -> pa.Table:
        b = np.asarray(t["band_hash"].combine_chunks(), dtype=np.int64)
        return t.append_column("bucket", pa.array((b % 127 + 127) % 127, pa.int64()))

    bands_ds = bands_ds.map_batches(add_bucket, batch_format="pyarrow")

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        for _, grp in df.groupby(["band", "band_hash"]):
            ids = np.sort(grp[id_col].unique())
            if ids.size < 2:
                continue
            ia, ib = np.triu_indices(ids.size, 1)
            out_a.append(ids[ia])
            out_b.append(ids[ib])
        if not out_a:
            return pd.DataFrame(
                {"id_a": pd.Series([], dtype="int64"), "id_b": pd.Series([], dtype="int64")}
            )
        df = pd.DataFrame(
            {"id_a": np.concatenate(out_a), "id_b": np.concatenate(out_b)}
        )
        return df.drop_duplicates()

    cands = bands_ds.groupby("bucket").map_groups(bucket_pairs, batch_format="pandas")

    # verify with exact jaccard: broadcast the text of candidate ids
    # (broadcast verify is the small-side pattern; at cluster scale the
    # verifier becomes a hash-join of texts onto the candidate pairs)
    import ray

    texts = {r[id_col]: r[text_col] for r in ds.select_columns([id_col, text_col]).take_all()}
    text_ref = ray.put(texts)

    def verify(t: pa.Table) -> pa.Table:
        tx = ray.get(text_ref)
        ia = t["id_a"].to_pylist()
        ib = t["id_b"].to_pylist()
        keep = [jaccard_shingles(tx[x], tx[y], shingle_k) >= threshold for x, y in zip(ia, ib)]
        return t.filter(pa.array(keep, pa.bool_())).select(["id_a", "id_b"])

    verified = cands.map_batches(verify, batch_format="pyarrow")
    # distinct (a pair can fire in buckets of several bands): the verified
    # set is small, so a single-partition dedupe beats a full groupby shuffle
    return verified.repartition(1).map_batches(
        lambda df: df.drop_duplicates(ignore_index=True),
        batch_format="pandas",
        batch_size=None,
    )


def jaccard_shingles(a: str, b: str, k: int = 5) -> float:
    sa = {a[i : i + k] for i in range(max(len(a) - k + 1, 0))}
    sb = {b[i : i + k] for i in range(max(len(b) - k + 1, 0))}
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


# ---------------------------------------------------------------------------
# duplicate clusters (connected components over near-dup pairs)
# ---------------------------------------------------------------------------


def dup_clusters(pairs_ds, *, max_rounds: int = 20):
    """Resolve near-dup pairs into clusters: every doc gets the MIN id of its
    connected component (so `keep = doc_id == cluster_id` keeps one doc per
    cluster).

    Min-label propagation: edges as (node, neighbor_label) rows,
    groupby(node).min -> new labels, iterate until fixed point.  The edge
    list never leaves the cluster; only the LABEL table (docs that appear in
    some near-dup pair — a small fraction of any real corpus) is broadcast
    per round for the lookup.

    Returns Dataset[doc_id, cluster_id] for every doc appearing in a pair.
    """
    import ray.data
    from ray.data.aggregate import Min

    edges = pairs_ds.map_batches(
        lambda t: pa.table(
            {
                "node": pa.concat_arrays(
                    [t["id_a"].combine_chunks(), t["id_b"].combine_chunks()]
                ),
                "peer": pa.concat_arrays(
                    [t["id_b"].combine_chunks(), t["id_a"].combine_chunks()]
                ),
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    # labels: start at min(node, peer) per node
    labels = (
        edges.map_batches(
            lambda t: pa.table(
                {
                    "node": t["node"],
                    "label": pa.compute.min_element_wise(t["node"], t["peer"]),
                }
            ),
            batch_format="pyarrow",
        )
        .groupby("node")
        .aggregate(Min("label", alias_name="label"))
        .materialize()
    )

    for _ in range(max_rounds):
        # propagate: neighbor labels via broadcast join of current labels
        lbl = {r["node"]: r["label"] for r in labels.take_all()}
        import ray

        ref = ray.put(lbl)

        def prop(t: pa.Table) -> pa.Table:
            m = ray.get(ref)
            node = np.asarray(t["node"].combine_chunks(), dtype=np.int64)
            peer = np.asarray(t["peer"].combine_chunks(), dtype=np.int64)
            peer_lbl = np.array([m[p] for p in peer], dtype=np.int64)
            own = np.array([m[p] for p in node], dtype=np.int64)
            return pa.table(
                {
                    "node": pa.array(node, pa.int64()),
                    "label": pa.array(np.minimum(own, peer_lbl), pa.int64()),
                }
            )

        new_labels = (
            edges.map_batches(prop, batch_format="pyarrow")
            .groupby("node")
            .aggregate(Min("label", alias_name="label"))
            .materialize()
        )
        new = {r["node"]: r["label"] for r in new_labels.take_all()}
        if new == lbl:
            break
        labels = new_labels

    return labels.map_batches(
        lambda t: t.rename_columns(["doc_id", "cluster_id"]), batch_format="pyarrow"
    )


def near_dup_drop_list(ds, *, id_col: str = "doc_id", text_col: str = "text",
                       threshold: float = 0.8):
    """End-to-end near-dedup: MinHash-LSH pairs -> connected components ->
    the doc ids to DROP (every doc that is not its cluster's min).  Keeping
    `corpus WHERE doc_id NOT IN drop_list` retains exactly one doc per
    near-dup cluster."""
    pairs = minhash_dedup_pairs(ds, id_col=id_col, text_col=text_col, threshold=threshold)
    clusters = dup_clusters(pairs)
    return clusters.map_batches(
        lambda t: t.filter(
            pa.compute.not_equal(t["doc_id"], t["cluster_id"])
        ).select(["doc_id"]),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# embedding near-dup (cosine)
# ---------------------------------------------------------------------------


def embedding_dup_pairs(ds, *, id_col: str = "vec_id", vec_col: str = "embedding",
                        threshold: float = 0.95, block: int = 2048):
    """Near-duplicate vector pairs by cosine >= threshold.

    Baseline path: normalize per batch, broadcast the full normalized matrix
    (bounded — embeddings tables are the 'small' modality), block-matmul per
    batch against it.  Emits (id_a < id_b, sim)."""
    import ray
    import ray.data

    rows = ds.select_columns([id_col, vec_col]).take_all()
    ids = np.array([r[id_col] for r in rows], dtype=np.int64)
    M = np.array([r[vec_col] for r in rows], dtype=np.float64)
    M /= np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
    ref = ray.put((ids, M))

    def block_pairs(t: pa.Table) -> pa.Table:
        all_ids, all_m = ray.get(ref)
        bids = np.asarray(t[id_col].combine_chunks(), dtype=np.int64)
        bm = np.array(t[vec_col].to_pylist(), dtype=np.float64)
        bm /= np.maximum(np.linalg.norm(bm, axis=1, keepdims=True), 1e-12)
        sims = bm @ all_m.T
        ii, jj = np.nonzero(sims >= threshold)
        a = bids[ii]
        b = all_ids[jj]
        keep = a < b
        return pa.table(
            {
                "id_a": pa.array(a[keep], pa.int64()),
                "id_b": pa.array(b[keep], pa.int64()),
                "cosine": pa.array(sims[ii, jj][keep], pa.float64()),
            }
        )

    return ds.map_batches(block_pairs, batch_format="pyarrow", batch_size=block)
