"""STR-packed R-tree over NumPy bbox arrays.

From-scratch bulk-loaded R-tree (Sort-Tile-Recursive packing) replacing the
reference's per-type ``rstar`` trees (/root/reference/src/rtrees.rs:24-96).
Like the reference, the tree stores only (id, bbox) entries — geometry
payloads stay in the GeomBatch — and the indexed side's boxes are expected to
be pre-dilated by ``max_distance`` (``cheap_buffer``,
/root/reference/src/rtrees.rs:159-166).  Candidate generation is inclusive
bbox overlap (rstar ``locate_in_envelope_intersecting`` semantics); any
bulk-packed tree is semantically equivalent since trees only affect candidate
generation, never the final predicate answer (SURVEY.md §2.3).

Queries are fully vectorized: a whole batch of query boxes descends level by
level with one overlap test per (frontier × child) expansion — no per-row
Python.
"""

from __future__ import annotations

import math
from typing import List, Tuple

import numpy as np


def _minmax_reduceat(arr: np.ndarray, starts: np.ndarray, fanout: int) -> np.ndarray:
    """Group rows of (n,4) bbox array into chunks of `fanout`; union bboxes."""
    out = np.empty((starts.size, 4), dtype=np.float64)
    out[:, 0] = np.minimum.reduceat(arr[:, 0], starts)
    out[:, 1] = np.minimum.reduceat(arr[:, 1], starts)
    out[:, 2] = np.maximum.reduceat(arr[:, 2], starts)
    out[:, 3] = np.maximum.reduceat(arr[:, 3], starts)
    return out


class STRtree:
    """Bulk-packed static R-tree; query returns (query_idx, entry_id) pairs."""

    def __init__(self, bbox: np.ndarray, ids: np.ndarray | None = None, leaf_size: int = 16):
        bbox = np.ascontiguousarray(bbox, dtype=np.float64)
        n = bbox.shape[0]
        self.n = n
        self.fanout = leaf_size
        self.ids = np.arange(n, dtype=np.int64) if ids is None else np.asarray(ids, np.int64)
        if n == 0:
            self.order = np.empty(0, dtype=np.int64)
            self.levels: List[np.ndarray] = []
            return
        c = leaf_size
        # STR pack: sort by x-center, tile into sqrt(L) vertical slices,
        # sort each slice by y-center
        cx = (bbox[:, 0] + bbox[:, 2]) * 0.5
        cy = (bbox[:, 1] + bbox[:, 3]) * 0.5
        n_leaves = math.ceil(n / c)
        n_slices = math.ceil(math.sqrt(n_leaves))
        slice_sz = c * math.ceil(n_leaves / n_slices)
        order = np.argsort(cx, kind="stable")
        for s in range(0, n, slice_sz):
            seg = order[s : s + slice_sz]
            seg_sorted = seg[np.argsort(cy[seg], kind="stable")]
            order[s : s + slice_sz] = seg_sorted
        self.order = order

        levels = [bbox[order]]
        while levels[-1].shape[0] > 1:
            cur = levels[-1]
            starts = np.arange(0, cur.shape[0], self.fanout, dtype=np.int64)
            levels.append(_minmax_reduceat(cur, starts, self.fanout))
        self.levels = levels
        self._padded = None

    @property
    def padded(self):
        """Padded (n_nodes, F, 4) child views per level: padding boxes are
        inverted-infinite so they never overlap anything; lets the query
        descend with one gather + one 3-D compare per level instead of
        repeat/cumsum frontier machinery (~3x faster on wide frontiers).
        Derivable from ``levels`` -> dropped from pickles (broadcast size)
        and rebuilt once per receiving worker."""
        if self._padded is None:
            F = self.fanout
            padded = []
            for lvl in self.levels:
                n_nodes = (lvl.shape[0] + F - 1) // F
                pad = np.empty((n_nodes * F, 4), dtype=np.float64)
                pad[:, 0] = np.inf
                pad[:, 1] = np.inf
                pad[:, 2] = -np.inf
                pad[:, 3] = -np.inf
                pad[: lvl.shape[0]] = lvl
                padded.append(pad.reshape(n_nodes, F, 4))
            self._padded = padded
        return self._padded

    def __getstate__(self):
        d = self.__dict__.copy()
        d["_padded"] = None
        return d

    def query(self, qbox: np.ndarray, chunk: int = 8192) -> Tuple[np.ndarray, np.ndarray]:
        """Inclusive bbox-overlap candidates.

        qbox: (m,4) query boxes -> (query_idx, entry_id) with entry_id from
        ``ids`` (original row identity).  Processed in probe chunks so the
        per-level (frontier, F, 4) gather temporaries stay cache-sized —
        unbounded frontiers allocate GBs and thrash memory bandwidth when
        many workers run concurrently.
        """
        qbox = np.ascontiguousarray(qbox, dtype=np.float64)
        m = qbox.shape[0]
        if self.n == 0 or m == 0:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        if m > chunk:
            qs, es = [], []
            for lo in range(0, m, chunk):
                q, e = self.query(qbox[lo : lo + chunk], chunk)
                qs.append(q + lo)
                es.append(e)
            return np.concatenate(qs), np.concatenate(es)
        F = self.fanout
        top = len(self.levels) - 1
        # root check
        root = self.levels[top][0]
        fq = np.flatnonzero(
            ~(
                (qbox[:, 0] > root[2])
                | (qbox[:, 2] < root[0])
                | (qbox[:, 1] > root[3])
                | (qbox[:, 3] < root[1])
            )
        ).astype(np.int64)
        fn = np.zeros(fq.size, dtype=np.int64)
        for lvl in range(top - 1, -1, -1):
            if fq.size == 0:
                break
            C = self.padded[lvl][fn]  # (k, F, 4)
            Q = qbox[fq]
            hit = ~(
                (Q[:, None, 0] > C[:, :, 2])
                | (Q[:, None, 2] < C[:, :, 0])
                | (Q[:, None, 1] > C[:, :, 3])
                | (Q[:, None, 3] < C[:, :, 1])
            )
            i, j = np.nonzero(hit)
            fq = fq[i]
            fn = fn[i] * F + j
        return fq, self.ids[self.order[fn]]


def dilate(bbox: np.ndarray, max_distance) -> np.ndarray:
    """cheap_buffer (/root/reference/src/rtrees.rs:159-166): dilate AABBs on
    all sides; applied to the indexed (small) side only.  ``max_distance``
    may be a scalar or a per-row array (the per-row-radius proximity
    variant dilates each indexed box by its own radius)."""
    if np.ndim(max_distance) == 0:
        if max_distance == 0.0:
            return bbox
        r = float(max_distance)
    else:
        r = np.asarray(max_distance, np.float64)
        if r.size != bbox.shape[0]:
            raise ValueError("per-row radius length != bbox count")
    out = bbox.copy()
    out[:, 0] -= r
    out[:, 1] -= r
    out[:, 2] += r
    out[:, 3] += r
    return out
