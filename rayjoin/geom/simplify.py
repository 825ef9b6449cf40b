"""Douglas-Peucker polyline simplification (1973), vectorized.

Classic DP is a per-polyline recursion; here the recursion is flattened to
BREADTH-FIRST LEVELS over a global segment queue so each level is one
vectorized pass across every active segment of every polyline in the batch
(ragged interior-vertex expansion + segmented max) — the python loop runs
over recursion DEPTH only, never over polylines or vertices.

Decision rule (shared verbatim by the scalar spec `dp_keep_scalar` and the
SQL twin): a chord (s, e) splits at the interior vertex maximizing the
SQUARED cross-product distance test  cross(e-s, v-s)^2 > tol^2 * |e-s|^2
(degenerate chords fall back to squared point distance), ties broken by the
LOWEST vertex index.  The rearranged comparison avoids the division, and
with integer-valued coordinates every quantity is exact.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def dp_keep_scalar(pts, tol: float):
    """Reference recursion: returns the sorted kept-vertex index list."""
    n = len(pts)
    if n <= 2:
        return list(range(n))
    keep = {0, n - 1}

    def rec(s, e):
        if e - s < 2:
            return
        sx, sy = pts[s]
        ex, ey = pts[e]
        dx, dy = ex - sx, ey - sy
        ln = dx * dx + dy * dy
        best, bi = -1.0, -1
        for v in range(s + 1, e):
            vx, vy = pts[v]
            if ln > 0:
                c = dx * (vy - sy) - dy * (vx - sx)
                d = c * c
            else:
                d = ((vx - sx) ** 2 + (vy - sy) ** 2) * 1.0
            if d > best:
                best, bi = d, v
        thresh = tol * tol * ln if ln > 0 else tol * tol
        if best > thresh:
            keep.add(bi)
            rec(s, bi)
            rec(bi, e)

    rec(0, n - 1)
    return sorted(keep)


def dp_keep_mask(xy: np.ndarray, off: np.ndarray, tol: float) -> np.ndarray:
    """Vectorized keep mask for ragged polylines: xy (V, 2) float64,
    off (P+1,) vertex offsets."""
    from .primitives import repeat_expand

    V = xy.shape[0]
    keep = np.zeros(V, bool)
    first = off[:-1][off[1:] > off[:-1]]
    last = off[1:][off[1:] > off[:-1]] - 1
    keep[first] = True
    keep[last] = True
    seg_s = off[:-1][off[1:] - off[:-1] >= 3]
    seg_e = off[1:][off[1:] - off[:-1] >= 3] - 1
    t2 = tol * tol
    while seg_s.size:
        counts = seg_e - seg_s - 1
        sid, k = repeat_expand(counts)
        v = seg_s[sid] + 1 + k
        s, e = seg_s[sid], seg_e[sid]
        dx = xy[e, 0] - xy[s, 0]
        dy = xy[e, 1] - xy[s, 1]
        ln = dx * dx + dy * dy
        vx = xy[v, 0] - xy[s, 0]
        vy = xy[v, 1] - xy[s, 1]
        c = dx * vy - dy * vx
        d = np.where(ln > 0, c * c, vx * vx + vy * vy)
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        dmax = np.maximum.reduceat(d, starts)
        # first interior index attaining the max (lowest vertex index)
        eqv = np.where(d == dmax[sid], v, np.iinfo(np.int64).max)
        vbest = np.minimum.reduceat(eqv, starts)
        thresh = np.where(ln[starts] > 0, t2 * ln[starts], t2)
        split = dmax > thresh
        vb = vbest[split]
        keep[vb] = True
        ls, le = seg_s[split], seg_e[split]
        ns = np.concatenate([ls, vb])
        ne = np.concatenate([vb, le])
        live = ne - ns >= 2
        seg_s, seg_e = ns[live], ne[live]
    return keep


def simplify_linestrings(ds, *, tolerance: float):
    """Simplify every LINESTRING row of a geometry Dataset (other kinds
    pass through untouched); coords rebuilt from the keep mask with one
    ListArray.from_arrays, no per-row Python."""
    from .spec import LINESTRING

    def simp(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        kind = np.asarray(t["geom_type"].combine_chunks(), dtype=np.int8)
        ls = np.flatnonzero(kind == LINESTRING)
        if ls.size == 0:
            # same projected schema as the processed branch (mixed batches
            # must not emit different column sets)
            return t.select(["row_id", "geom_type", "coords"])
        sub = t.take(pa.array(ls))
        ring = pc.list_element(sub["coords"].combine_chunks(), 0)
        if isinstance(ring, pa.ChunkedArray):
            ring = ring.combine_chunks()
        flat = np.asarray(ring.values, dtype=np.float64)
        off_v = np.asarray(ring.offsets, dtype=np.int64) // 2
        xy = flat.reshape(-1, 2)
        keep = dp_keep_mask(xy, off_v, tolerance)
        counts = np.add.reduceat(keep.astype(np.int64), off_v[:-1]) \
            if off_v.size > 1 else np.empty(0, np.int64)
        new_off = np.concatenate([[0], np.cumsum(counts)]) * 2
        kept_xy = xy[keep].ravel()
        inner = pa.ListArray.from_arrays(
            pa.array(new_off, pa.int32()), pa.array(kept_xy, pa.float64()))
        coords = pa.ListArray.from_arrays(
            pa.array(np.arange(ls.size + 1, dtype=np.int32) , pa.int32()), inner)
        new_rows = pa.table({
            "row_id": sub["row_id"], "geom_type": sub["geom_type"],
            "coords": coords,
        })
        others = t.take(pa.array(np.flatnonzero(kind != LINESTRING)))
        return pa.concat_tables(
            [others.select(["row_id", "geom_type", "coords"]), new_rows])

    return ds.map_batches(simp, batch_format="pyarrow")
