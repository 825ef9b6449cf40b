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

    def query(self, qbox: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """Inclusive bbox-overlap candidates.

        qbox: (m,4) query boxes -> (query_idx, entry_id) with entry_id from
        ``ids`` (original row identity).
        """
        qbox = np.ascontiguousarray(qbox, dtype=np.float64)
        m = qbox.shape[0]
        if self.n == 0 or m == 0:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        F = self.fanout
        top = len(self.levels) - 1
        fq = np.arange(m, dtype=np.int64)
        fn = np.zeros(m, dtype=np.int64)
        for lvl in range(top, -1, -1):
            boxes = self.levels[lvl][fn]
            hit = ~(
                (qbox[fq, 0] > boxes[:, 2])
                | (qbox[fq, 2] < boxes[:, 0])
                | (qbox[fq, 1] > boxes[:, 3])
                | (qbox[fq, 3] < boxes[:, 1])
            )
            fq = fq[hit]
            fn = fn[hit]
            if lvl == 0 or fq.size == 0:
                break
            child_n = self.levels[lvl - 1].shape[0]
            base = fn * F
            cnt = np.minimum(F, child_n - base)
            pair = np.repeat(np.arange(fq.size, dtype=np.int64), cnt)
            starts = np.concatenate([[0], np.cumsum(cnt)[:-1]])
            k = np.arange(pair.size, dtype=np.int64) - starts[pair]
            fq = fq[pair]
            fn = base[pair] + k
        return fq, self.ids[self.order[fn]]


def dilate(bbox: np.ndarray, max_distance: float) -> np.ndarray:
    """cheap_buffer (/root/reference/src/rtrees.rs:159-166): dilate AABBs on
    all sides; applied to the indexed (small) side only."""
    if max_distance == 0.0:
        return bbox
    out = bbox.copy()
    out[:, 0] -= max_distance
    out[:, 1] -= max_distance
    out[:, 2] += max_distance
    out[:, 3] += max_distance
    return out
