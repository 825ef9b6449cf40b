"""Similarity search over embedding columns (driver brief: brute-force cosine
top-k as the baseline; an LSH/IVF-bucketed variant as the scale path).

Baseline: the query matrix is broadcast once (``ray.put``); every batch of
database vectors computes a block matmul and emits per-query partial top-k;
a final small groupby-free reduction merges partials.  No shuffle of the
database side at all.

Scale path (``ann_ivf``): coarse k-means-ish centroids (sampled, seeded)
assign each vector to a bucket; queries probe the ``nprobe`` nearest buckets
only.  Approximate (standard IVF trade-off), deterministic given the seed.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def ann_cosine_topk(ds, queries: np.ndarray, query_ids: np.ndarray, *, k: int = 10,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    batch_size: int = 4096):
    """Exact brute-force cosine top-k.

    Returns Dataset[query_id, vec_id, rank] — ranks ordered by
    (-similarity, vec_id); similarity values are intentionally not emitted in
    the oracle-checked output (summation order differs between engines at the
    last ulp; ordering is stable far above that).
    """
    import ray

    Q = _normalize(np.asarray(queries, dtype=np.float64))
    qids = np.asarray(query_ids, dtype=np.int64)
    ref = ray.put((qids, Q))

    def partial_topk(t: pa.Table) -> pa.Table:
        qids_, Q_ = ray.get(ref)
        ids = np.asarray(t[id_col].combine_chunks(), dtype=np.int64)
        M = _normalize(np.array(t[vec_col].to_pylist(), dtype=np.float64))
        sims = Q_ @ M.T  # (q, n)
        kk = min(k, ids.size)
        # per query: partial top-k within this batch
        part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        qq = np.repeat(np.arange(Q_.shape[0]), kk)
        vv = part.ravel()
        return pa.table(
            {
                "query_id": pa.array(qids_[qq], pa.int64()),
                "vec_id": pa.array(ids[vv], pa.int64()),
                "sim": pa.array(sims[qq, vv], pa.float64()),
            }
        )

    partials = ds.map_batches(partial_topk, batch_format="pyarrow", batch_size=batch_size)

    def final_topk(df):
        import pandas as pd

        df = df.sort_values(["sim", "vec_id"], ascending=[False, True]).head(k)
        df = df.reset_index(drop=True)
        df["rank"] = np.arange(len(df), dtype=np.int64)
        return df[["query_id", "vec_id", "rank"]]

    return partials.groupby("query_id").map_groups(final_topk, batch_format="pandas")


class IVFIndex:
    """Coarse quantizer: seeded sample -> centroids by farthest-point-ish
    selection, vectors bucketed by nearest centroid."""

    def __init__(self, vectors: np.ndarray, ids: np.ndarray, n_lists: int = 16, seed: int = 7):
        self.ids = np.asarray(ids, np.int64)
        M = _normalize(np.asarray(vectors, np.float64))
        rng = np.random.default_rng(seed)
        n = M.shape[0]
        n_lists = min(n_lists, max(n, 1))
        first = rng.integers(0, n) if n else 0
        cent = [M[first]] if n else []
        for _ in range(1, n_lists):
            d = 1.0 - np.max(np.stack(cent) @ M.T, axis=0)
            cent.append(M[int(np.argmax(d))])
        self.centroids = np.stack(cent) if cent else np.zeros((0, M.shape[1] if M.ndim > 1 else 0))
        self.assign = np.argmax(self.centroids @ M.T, axis=0) if n else np.empty(0, np.int64)
        self.M = M

    def search(self, Q: np.ndarray, k: int, nprobe: int = 4):
        Q = _normalize(np.asarray(Q, np.float64))
        out = []
        cq = Q @ self.centroids.T  # (q, lists)
        probe = np.argsort(-cq, axis=1)[:, :nprobe]
        for qi in range(Q.shape[0]):
            mask = np.isin(self.assign, probe[qi])
            cand = np.flatnonzero(mask)
            if cand.size == 0:
                continue
            sims = self.M[cand] @ Q[qi]
            order = np.lexsort((self.ids[cand], -sims))[:k]
            for rank, o in enumerate(order):
                out.append((qi, int(self.ids[cand[o]]), float(sims[o]), rank))
        return out


def ann_ivf_topk(ds, queries: np.ndarray, query_ids: np.ndarray, *, k: int = 10,
                 n_lists: int = 16, nprobe: int = 4,
                 id_col: str = "vec_id", vec_col: str = "embedding"):
    """IVF-bucketed approximate top-k (scale path: at cluster scale the
    buckets become the shuffle key and each bucket is an actor-held
    partition; here the index is built driver-side and broadcast)."""
    import ray
    import ray.data

    rows = ds.select_columns([id_col, vec_col]).take_all()
    ids = np.array([r[id_col] for r in rows], dtype=np.int64)
    M = np.array([r[vec_col] for r in rows], dtype=np.float64)
    index = IVFIndex(M, ids, n_lists=n_lists)
    hits = index.search(np.asarray(queries, np.float64), k=k, nprobe=nprobe)
    qids = np.asarray(query_ids, np.int64)
    return pa.table(
        {
            "query_id": pa.array([qids[h[0]] for h in hits], pa.int64()),
            "vec_id": pa.array([h[1] for h in hits], pa.int64()),
            "sim": pa.array([h[2] for h in hits], pa.float64()),
            "rank": pa.array([h[3] for h in hits], pa.int64()),
        }
    )
