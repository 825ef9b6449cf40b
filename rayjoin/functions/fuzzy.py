"""Fuzzy string joins: blocked candidate pairs + vectorized banded
Levenshtein verify (the crawl-dedup "same host, URL variants" case).

The verifier is an O(L * (2k+1)) banded edit-distance DP vectorized ACROSS
pairs: the python loops run over string length and band width only, every
inner step is a numpy column op over all pairs at once.  Distances are
saturated at k+1 (cells outside the |i-j| <= k band cannot be on a <= k
path), so the kernel is exact for the <= k decision and the reported
distance of every emitted pair.

Scale shape: one groupby shuffle on a coarse bucket of the blocking key;
within each group one lexsort finds key runs and only runs >= 2 expand
pairs.  A loud ``max_pairs_per_key`` guard raises on pathological blocking
keys instead of silently truncating (the caller picks a finer key or salts
— same contract as the LSH hot-bucket handling in dedup.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _pad_bytes(strs: np.ndarray):
    """object array of str -> (uint8 matrix (n, L), lengths)."""
    enc = [s.encode() for s in strs]
    lens = np.fromiter((len(b) for b in enc), np.int64, len(enc))
    L = int(lens.max()) if lens.size else 0
    out = np.zeros((len(enc), L), np.uint8)
    for i, b in enumerate(enc):  # one memcpy per row at ingest, not per DP cell
        out[i, : len(b)] = np.frombuffer(b, np.uint8)
    return out, lens


def banded_levenshtein(a: np.ndarray, b: np.ndarray, k: int) -> np.ndarray:
    """Exact edit distances saturated at k+1 for row-aligned object arrays
    of strings (byte-level)."""
    n = len(a)
    if n == 0:
        return np.empty(0, np.int64)
    A, la = _pad_bytes(a)
    B, lb = _pad_bytes(b)
    INF = k + 1
    res = np.full(n, INF, np.int64)
    feasible = np.abs(la - lb) <= k
    res[(la == 0) & (lb <= k)] = lb[(la == 0) & (lb <= k)]
    W = 2 * k + 1
    # dp[p] holds cell (i, j = i - k + p); previous row in `prev`
    prev = np.full((n, W), INF, np.int64)
    for p in range(k, W):
        j = p - k
        prev[:, p] = np.where(j <= lb, j, INF)
    LA = int(la.max()) if la.size else 0
    LB = B.shape[1]
    for i in range(1, LA + 1):
        cur = np.full((n, W), INF, np.int64)
        ai = A[:, i - 1]
        for p in range(W):
            j = i - k + p
            if j < 0 or j > LB:
                continue
            if j == 0:
                # first column: i deletions (i <= k inside the band)
                cur[:, p] = np.minimum(i, INF)
                continue
            sub = prev[:, p] + (ai != B[:, j - 1])
            dele = prev[:, p + 1] + 1 if p + 1 < W else np.full(n, INF, np.int64)
            ins = cur[:, p - 1] + 1 if p - 1 >= 0 else np.full(n, INF, np.int64)
            v = np.minimum(np.minimum(sub, dele), ins)
            cur[:, p] = np.minimum(np.where(j <= lb, v, INF), INF)
        prev = cur
        done = feasible & (la == i)
        if done.any():
            pf = lb - i + k  # j == lb
            ok = done & (pf >= 0) & (pf < W)
            idx = np.flatnonzero(ok)
            res[idx] = np.minimum(prev[idx, pf[idx]], INF)
    zero = feasible & (la == 0)
    res[zero] = np.minimum(lb[zero], INF)
    return res


def edit_distance_pairs(ds, *, id_col: str = "doc_id", str_col: str = "url",
                        key_col: str = "block_key", max_dist: int = 2,
                        coarse_buckets: int = 127,
                        max_pairs_per_key: int | None = 1_000_000):
    """All pairs sharing ``key_col`` with edit_distance(str) <= max_dist.
    Returns Dataset[id_a, id_b, dist], id_a < id_b, distinct (ids are
    assumed unique per row, as elsewhere in the dedup family)."""

    def bucketed(t: pa.Table) -> pa.Table:
        from ..stages.geocode import fnv1a64

        kh = fnv1a64(t[key_col]).view(np.int64)
        return pa.table({
            "bucket": pa.array((kh % coarse_buckets + coarse_buckets) % coarse_buckets,
                               pa.int64()),
            "kh": pa.array(kh, pa.int64()),
            id_col: t[id_col],
            str_col: t[str_col],
            key_col: t[key_col],
        })

    def group_pairs(t: pa.Table) -> pa.Table:
        kh = np.asarray(t["kh"].combine_chunks(), dtype=np.int64)
        ids = np.asarray(t[id_col].combine_chunks(), dtype=np.int64)
        strs = t[str_col].combine_chunks().to_numpy(zero_copy_only=False).astype(object)
        keys = t[key_col].combine_chunks().to_numpy(zero_copy_only=False).astype(object)
        order = np.lexsort((ids, keys, kh))
        kh, ids, strs, keys = kh[order], ids[order], strs[order], keys[order]
        new = np.concatenate([[True], (kh[1:] != kh[:-1]) | (keys[1:] != keys[:-1])]) \
            if kh.size else np.empty(0, bool)
        starts = np.flatnonzero(new)
        sizes = np.diff(np.concatenate([starts, [kh.size]]))
        if max_pairs_per_key is not None:
            worst = sizes.max() if sizes.size else 0
            if worst * (worst - 1) // 2 > max_pairs_per_key:
                raise ValueError(
                    f"edit_distance_pairs: a blocking key holds {worst} rows "
                    f"(> max_pairs_per_key={max_pairs_per_key} candidate pairs); "
                    "use a finer key or raise the guard")
        ia_l, ib_l = [], []
        for st, m in zip(starts[sizes >= 2], sizes[sizes >= 2]):
            a, b = np.triu_indices(m, 1)
            ia_l.append(st + a)
            ib_l.append(st + b)
        if not ia_l:
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64()),
                             "dist": pa.array([], pa.int64())})
        ia = np.concatenate(ia_l)
        ib = np.concatenate(ib_l)
        d = banded_levenshtein(strs[ia], strs[ib], max_dist)
        keep = d <= max_dist
        return pa.table({
            "id_a": pa.array(ids[ia][keep], pa.int64()),
            "id_b": pa.array(ids[ib][keep], pa.int64()),
            "dist": pa.array(d[keep], pa.int64()),
        })

    return (
        ds.map_batches(bucketed, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(group_pairs, batch_format="pyarrow")
    )
