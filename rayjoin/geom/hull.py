"""Grouped convex hulls (dissolve): per-key hull VERTICES of a point set.

Strict-turn Andrew monotone chain (collinear edge-interior points are not
vertices), applied per group after a vectorized interior-pruning pass:

1. one lexsort per shuffle bucket orders (group, x, y) and dedups;
2. the 4 axis-extreme points of every group are found with segmented
   reductions, and every point STRICTLY inside their quadrilateral is
   dropped vectorized (the classic Akl-Toussaint heuristic — on uniform
   points this eliminates the vast majority before any per-group code);
3. the bounded survivor set runs the scalar chain per group.

The per-group python cost is bounded by the survivor count (hull size is
O(n^{1/3}) expected on uniform points), and groups are resolved inside
bucketed map_groups like the other per-key merges in this engine.

Exactness: with integer-valued coordinates every cross product is exact,
so the vertex set is gate-checkable against a Caratheodory SQL oracle
(a point is NOT a hull vertex iff it lies in a triangle — or on a segment
— of other points of its group).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def convex_hull_scalar(pts):
    """Strict-turn monotone chain over a point iterable; returns the sorted
    vertex list (deduped).  <= 2 distinct points are all vertices."""
    P = sorted(set(pts))
    if len(P) <= 2:
        return P

    def half(points):
        out = []
        for p in points:
            while len(out) >= 2:
                ox, oy = out[-2]
                ax, ay = out[-1]
                if (ax - ox) * (p[1] - oy) - (ay - oy) * (p[0] - ox) <= 0:
                    out.pop()
                else:
                    break
            out.append(p)
        return out

    lower = half(P)
    upper = half(P[::-1])
    return sorted(set(lower[:-1] + upper[:-1]))


def _prune_interior(g: np.ndarray, x: np.ndarray, y: np.ndarray):
    """Akl-Toussaint: drop points strictly inside the quadrilateral of the
    4 axis extremes of their group.  Input sorted by (g, x, y).  Returns a
    keep mask."""
    starts = np.flatnonzero(np.concatenate([[True], g[1:] != g[:-1]])) if g.size else np.empty(0, np.int64)
    ends = np.concatenate([starts[1:], [g.size]])
    gi = np.repeat(np.arange(starts.size), ends - starts)
    # extremes per group (ties resolved deterministically by the sort order)
    minx_i = starts
    maxx_i = ends - 1
    ymin_i = np.zeros(starts.size, np.int64)
    ymax_i = np.zeros(starts.size, np.int64)
    order_y = np.lexsort((x, y, g))
    gy = g[order_y]
    s2 = np.flatnonzero(np.concatenate([[True], gy[1:] != gy[:-1]])) if g.size else np.empty(0, np.int64)
    e2 = np.concatenate([s2[1:], [g.size]])
    ymin_i = order_y[s2]
    ymax_i = order_y[e2 - 1]
    quad = np.stack([  # (G, 4, 2) in CCW-ish order: W, S, E, N
        np.stack([x[minx_i], y[minx_i]], 1),
        np.stack([x[ymin_i], y[ymin_i]], 1),
        np.stack([x[maxx_i], y[maxx_i]], 1),
        np.stack([x[ymax_i], y[ymax_i]], 1),
    ], axis=1)
    keep = np.zeros(g.size, bool)
    inside = np.ones(g.size, bool)
    for e in range(4):
        a = quad[gi, e]
        b = quad[gi, (e + 1) % 4]
        c = (b[:, 0] - a[:, 0]) * (y - a[:, 1]) - (b[:, 1] - a[:, 1]) * (x - a[:, 0])
        inside &= c > 0  # strictly inside every edge (degenerate quads give
        # zero-area edges -> c == 0 -> nothing pruned: safe)
    keep = ~inside
    return keep


def group_convex_hull(ds, *, key_col: str = "group_id", x_col: str = "x",
                      y_col: str = "y", num_buckets: int = 64):
    """Dataset[key, x, y] (int64 coords) -> Dataset[key, x, y] of the
    strict convex-hull vertices of each key's DISTINCT point set."""

    def bucketed(t: pa.Table) -> pa.Table:
        k = np.asarray(t[key_col].combine_chunks(), dtype=np.int64)
        return pa.table({
            "bucket": pa.array((k % num_buckets + num_buckets) % num_buckets,
                               pa.int64()),
            key_col: t[key_col], x_col: t[x_col], y_col: t[y_col],
        })

    def hull_groups(t: pa.Table) -> pa.Table:
        g = np.asarray(t[key_col].combine_chunks(), dtype=np.int64)
        x = np.asarray(t[x_col].combine_chunks(), dtype=np.int64)
        y = np.asarray(t[y_col].combine_chunks(), dtype=np.int64)
        order = np.lexsort((y, x, g))
        g, x, y = g[order], x[order], y[order]
        if g.size:
            d = np.concatenate([[True], (g[1:] != g[:-1]) | (x[1:] != x[:-1]) | (y[1:] != y[:-1])])
            g, x, y = g[d], x[d], y[d]
        keep = _prune_interior(g, x, y) if g.size else np.empty(0, bool)
        g, x, y = g[keep], x[keep], y[keep]
        out_g, out_x, out_y = [], [], []
        starts = np.flatnonzero(np.concatenate([[True], g[1:] != g[:-1]])) if g.size else []
        ends = np.concatenate([starts[1:], [g.size]]) if g.size else []
        for s, e in zip(starts, ends):
            hull = convex_hull_scalar(zip(x[s:e].tolist(), y[s:e].tolist()))
            out_g.extend([g[s]] * len(hull))
            out_x.extend(h[0] for h in hull)
            out_y.extend(h[1] for h in hull)
        return pa.table({
            key_col: pa.array(out_g, pa.int64()),
            x_col: pa.array(out_x, pa.int64()),
            y_col: pa.array(out_y, pa.int64()),
        })

    return (
        ds.map_batches(bucketed, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(hull_groups, batch_format="pyarrow")
    )
