"""Convex polygon overlay: vectorized pairwise intersection AREA.

The missing piece between the predicate joins (intersects/contains) and
zonal analytics: area-weighted overlay (`join pairs -> how MUCH do they
overlap`).  Implements Sutherland–Hodgman clipping (1974) — the subject
polygon is clipped by each half-plane of a CONVEX clip polygon — fully
vectorized across a batch of pairs: the slot loops run over the bounded
per-polygon vertex count (<= 8 for rect/triangle overlays), never over
pairs.

Exactness contract:
- rect x rect pairs take a closed-form min/max fast path whose IEEE
  expression graph is reproduced verbatim in the SQL oracle (bit-exact).
- general convex pairs (triangle/rect/convex single-ring polygon) run S-H
  with a fixed, documented operation order, differentially tested against
  the scalar reference `clip_area_scalar` below (bit-exact agreement).
- lower-dimensional geometries (point/line/linestring) have zero area by
  the dimension rule; concave polygons are outside the contract (S-H is
  only exact for convex clips).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .spec import LINE, LINESTRING, POINT, POLYGON, RECT, TRIANGLE


# ---------------------------------------------------------------------------
# scalar reference (the spec; tests pin the vectorized kernel against it)
# ---------------------------------------------------------------------------


def clip_area_scalar(subj, clip):
    """Reference S-H: subj/clip are CCW vertex lists [(x, y), ...]."""
    out = list(subj)
    m = len(clip)
    for e in range(m):
        px, py = clip[e]
        qx, qy = clip[(e + 1) % m]
        ex, ey = qx - px, qy - py
        cur_list, out = out, []
        k = len(cur_list)
        for j in range(k):
            cx, cy = cur_list[j]
            nx, ny = cur_list[(j + 1) % k]
            d1 = ex * (cy - py) - ey * (cx - px)
            d2 = ex * (ny - py) - ey * (nx - px)
            if d1 >= 0:
                out.append((cx, cy))
            if (d1 >= 0) != (d2 >= 0):
                t = d1 / (d1 - d2)
                out.append((cx + t * (nx - cx), cy + t * (ny - cy)))
        if not out:
            break
    s = 0.0
    k = len(out)
    for j in range(k):
        xj, yj = out[j]
        xn, yn = out[(j + 1) % k]
        s += xj * yn - xn * yj
    return 0.5 * s


def signed_area_scalar(pts):
    s = 0.0
    k = len(pts)
    for j in range(k):
        xj, yj = pts[j]
        xn, yn = pts[(j + 1) % k]
        s += xj * yn - xn * yj
    return 0.5 * s


# ---------------------------------------------------------------------------
# vectorized kernel
# ---------------------------------------------------------------------------


def _emit(buf, cnt, mask, pts):
    idx = np.flatnonzero(mask)
    if idx.size:
        buf[idx, cnt[idx]] = pts[idx]
        cnt[idx] += 1


def _shoelace(V: np.ndarray, cnt: np.ndarray) -> np.ndarray:
    """Signed area over slot-padded vertex buffers; accumulation in slot
    order (ascending j) — the scalar reference uses the identical order."""
    n, VM, _ = V.shape
    s = np.zeros(n, np.float64)
    ar = np.arange(n)
    for j in range(VM):
        alive = j < cnt
        if not alive.any():
            break
        nj = np.where(j + 1 < cnt, j + 1, 0)
        x0, y0 = V[:, j, 0], V[:, j, 1]
        x1 = V[ar, nj, 0]
        y1 = V[ar, nj, 1]
        s = np.where(alive, s + (x0 * y1 - x1 * y0), s)
    return 0.5 * s


def _reverse_in_place(V: np.ndarray, cnt: np.ndarray, mask: np.ndarray):
    idx = np.flatnonzero(mask)
    if idx.size == 0:
        return
    VM = V.shape[1]
    sub = V[idx].copy()
    for j in range(VM):
        alive = j < cnt[idx]
        src = cnt[idx] - 1 - j
        rows = idx[alive]
        V[rows, j] = sub[alive, src[alive]]


def ensure_ccw(V: np.ndarray, cnt: np.ndarray):
    """Reverse rings with negative signed area (in place)."""
    a = _shoelace(V, cnt)
    _reverse_in_place(V, cnt, a < 0)


def clip_convex(subj: np.ndarray, scnt: np.ndarray,
                clip: np.ndarray, ccnt: np.ndarray) -> np.ndarray:
    """Areas of pairwise intersections; subj (n,SM,2) / clip (n,CM,2) slot
    buffers with per-pair vertex counts, both CCW."""
    n, SM, _ = subj.shape
    CM = clip.shape[1]
    VM = SM + CM
    S = np.zeros((n, VM, 2), np.float64)
    S[:, :SM] = subj
    m = scnt.astype(np.int64).copy()
    ar = np.arange(n)
    with np.errstate(divide="ignore", invalid="ignore"):
        for e in range(CM):
            active = (e < ccnt) & (m >= 1)
            if not active.any():
                continue
            qidx = np.where(e + 1 < ccnt, e + 1, 0)
            P = clip[:, min(e, CM - 1)]
            Q = clip[ar, qidx]
            ex, ey = Q[:, 0] - P[:, 0], Q[:, 1] - P[:, 1]
            out = np.zeros_like(S)
            ocnt = np.zeros(n, np.int64)
            for j in range(VM):
                alive = active & (j < m)
                if not alive.any():
                    break
                cur = S[:, j]
                nj = np.where(j + 1 < m, j + 1, 0)
                nxt = S[ar, nj]
                d1 = ex * (cur[:, 1] - P[:, 1]) - ey * (cur[:, 0] - P[:, 0])
                d2 = ex * (nxt[:, 1] - P[:, 1]) - ey * (nxt[:, 0] - P[:, 0])
                c_in = d1 >= 0
                n_in = d2 >= 0
                _emit(out, ocnt, alive & c_in, cur)
                t = d1 / (d1 - d2)
                pt = cur + t[:, None] * (nxt - cur)
                _emit(out, ocnt, alive & (c_in != n_in), pt)
            keep = ~active
            out[keep] = S[keep]
            ocnt[keep] = m[keep]
            S, m = out, ocnt
    return _shoelace(S, m)


# ---------------------------------------------------------------------------
# batch operator over *_with_geos join output
# ---------------------------------------------------------------------------


def _ring0(coords) -> tuple:
    arr = coords.combine_chunks() if isinstance(coords, pa.ChunkedArray) else coords
    ring = pc.list_element(arr, 0)
    if isinstance(ring, pa.ChunkedArray):
        ring = ring.combine_chunks()
    flat = np.asarray(ring.values, dtype=np.float64)
    off = np.asarray(ring.offsets, dtype=np.int64)
    return flat, off


def _poly_buffers(kind: np.ndarray, coords) -> tuple:
    """Slot-padded CCW vertex buffers from geometry columns.  Rect coords
    ([x0,y0,x1,y1]) expand to 4 corners; point/line/linestring keep their
    vertices (their shoelace is exactly 0)."""
    flat, off = _ring0(coords)
    n = kind.size
    nvals = off[1:] - off[:-1]
    cnt = nvals // 2
    is_rect = kind == RECT
    cnt = np.where(is_rect, 4, cnt).astype(np.int64)
    VM = max(int(cnt.max()) if n else 0, 4)
    V = np.zeros((n, VM, 2), np.float64)
    # non-rect: scatter the ragged vertex pairs into slots
    from .primitives import repeat_expand

    nr = np.flatnonzero(~is_rect)
    if nr.size:
        c = (nvals[nr] // 2)
        pid, slot = repeat_expand(c)
        base = off[:-1][nr]
        src = base[pid] + 2 * slot
        rows = nr[pid]
        V[rows, slot, 0] = flat[src]
        V[rows, slot, 1] = flat[src + 1]
    r = np.flatnonzero(is_rect)
    if r.size:
        b = off[:-1][r]
        x0, y0, x1, y1 = flat[b], flat[b + 1], flat[b + 2], flat[b + 3]
        V[r, 0, 0], V[r, 0, 1] = x0, y0
        V[r, 1, 0], V[r, 1, 1] = x1, y0
        V[r, 2, 0], V[r, 2, 1] = x1, y1
        V[r, 3, 0], V[r, 3, 1] = x0, y1
    ensure_ccw(V, cnt)
    return V, cnt


def intersection_area_batch(t: pa.Table, *, out_col: str = "inter_area") -> pa.Table:
    """Append the pairwise intersection area to a *_with_geos join batch.
    rect x rect pairs take the closed-form min/max path (SQL-reproducible
    bit-exactly); other convex pairs run the S-H kernel; pairs involving a
    0/1-dimensional geometry get exactly 0.0."""
    bk = np.asarray(t["big_geom_type"].combine_chunks(), dtype=np.int8)
    sk = np.asarray(t["small_geom_type"].combine_chunks(), dtype=np.int8)
    n = len(t)
    area = np.zeros(n, np.float64)
    bflat, boff = _ring0(t["big_coords"])
    sflat, soff = _ring0(t["small_coords"])

    both_rect = (bk == RECT) & (sk == RECT)
    rr = np.flatnonzero(both_rect)
    if rr.size:
        b, s = boff[:-1][rr], soff[:-1][rr]
        w = np.minimum(bflat[b + 2], sflat[s + 2]) - np.maximum(bflat[b], sflat[s])
        h = np.minimum(bflat[b + 3], sflat[s + 3]) - np.maximum(bflat[b + 1], sflat[s + 1])
        area[rr] = np.maximum(w, 0.0) * np.maximum(h, 0.0)

    areal = np.isin(bk, (RECT, TRIANGLE, POLYGON)) & np.isin(sk, (RECT, TRIANGLE, POLYGON))
    gen = np.flatnonzero(areal & ~both_rect)
    if gen.size:
        sub = t.take(pa.array(gen))
        BV, bc = _poly_buffers(np.asarray(sub["big_geom_type"], dtype=np.int8),
                               sub["big_coords"])
        SV, sc = _poly_buffers(np.asarray(sub["small_geom_type"], dtype=np.int8),
                               sub["small_coords"])
        area[gen] = clip_convex(BV, bc, SV, sc)

    return t.append_column(out_col, pa.array(area, pa.float64()))


def buffer_points_batch(t: pa.Table, *, k: int = 16, radius_col: str = "radius",
                        x_col: str = "x", y_col: str = "y",
                        id_col: str = "row_id") -> pa.Table:
    """ST_Buffer for points: each point becomes a regular k-gon POLYGON of
    its per-row radius (CCW, vertex j at angle 2*pi*j/k).  Fully
    vectorized ((n, k) broadcasting + one ListArray build); cos/sin carry
    the same shared-libm bit-parity contract as the s2 trig oracle."""
    from .encode import pack_single_rings
    from .spec import POLYGON

    ids = np.asarray(t[id_col].combine_chunks(), dtype=np.int64)
    x = np.asarray(t[x_col].combine_chunks(), dtype=np.float64)
    y = np.asarray(t[y_col].combine_chunks(), dtype=np.float64)
    r = np.asarray(t[radius_col].combine_chunks(), dtype=np.float64)
    j = np.arange(k, dtype=np.float64)
    ang = 2.0 * np.pi * j / k
    vx = x[:, None] + r[:, None] * np.cos(ang)[None, :]
    vy = y[:, None] + r[:, None] * np.sin(ang)[None, :]
    flat = np.empty((ids.size, 2 * k), np.float64)
    flat[:, 0::2] = vx
    flat[:, 1::2] = vy
    return pa.table({
        "row_id": pa.array(ids, pa.int64()),
        "geom_type": pa.array(np.full(ids.size, POLYGON, np.int8), pa.int8()),
        "coords": pack_single_rings(flat.ravel(), 2 * k),
    })


# ---------------------------------------------------------------------------
# polyline x rect clipped LENGTH (Liang–Barsky, 1984)
# ---------------------------------------------------------------------------


def clip_length_scalar(verts, rect, scale: int = 1_000_000) -> int:
    """Reference Liang–Barsky clipped length: ``verts`` is a polyline
    [(x, y), ...], ``rect`` is (x0, y0, x1, y1).  Returns the summed
    per-segment clipped length floored to int fixed-point units BEFORE the
    sum (aggregation-order-free — the same exactness contract as
    polyline_chord_length)."""
    x0, y0, x1, y1 = rect
    BIG = 1e300
    total = 0
    for (sx, sy), (ex, ey) in zip(verts[:-1], verts[1:]):
        dx, dy = ex - sx, ey - sy
        if dx > 0:
            tx_lo, tx_hi = (x0 - sx) / dx, (x1 - sx) / dx
        elif dx < 0:
            tx_lo, tx_hi = (x1 - sx) / dx, (x0 - sx) / dx
        elif x0 <= sx <= x1:
            tx_lo, tx_hi = -BIG, BIG
        else:
            tx_lo, tx_hi = BIG, -BIG
        if dy > 0:
            ty_lo, ty_hi = (y0 - sy) / dy, (y1 - sy) / dy
        elif dy < 0:
            ty_lo, ty_hi = (y1 - sy) / dy, (y0 - sy) / dy
        elif y0 <= sy <= y1:
            ty_lo, ty_hi = -BIG, BIG
        else:
            ty_lo, ty_hi = BIG, -BIG
        t0 = max(0.0, tx_lo, ty_lo)
        t1 = min(1.0, tx_hi, ty_hi)
        if t1 > t0:
            import math

            total += int(math.floor(scale * ((t1 - t0) * math.sqrt(dx * dx + dy * dy))))
    return total


def clip_length_batch(t: pa.Table, *, out_col: str = "clip_micro",
                      scale: int = 1_000_000) -> pa.Table:
    """Append the Liang–Barsky clipped polyline length (int64 fixed-point,
    ``scale`` units per coordinate unit) to a *_with_geos join batch whose
    big side is LINE/LINESTRING and small side RECT.  Per SEGMENT the
    in-rect parameter interval [t0, t1] comes from the four half-plane
    entry/exit parameters (GREATEST/LEAST of exact IEEE divisions — the
    SQL twin spells the identical expression graph), the contribution is
    floor(scale * ((t1-t0) * sqrt(dx*dx+dy*dy))) floored BEFORE the
    per-pair sum so the total is aggregation-order-free and hash-exact.
    Pairs whose sides are not (line-ish, rect) get 0."""
    from .primitives import repeat_expand

    bk = np.asarray(t["big_geom_type"].combine_chunks(), dtype=np.int8)
    sk = np.asarray(t["small_geom_type"].combine_chunks(), dtype=np.int8)
    n = len(t)
    out = np.zeros(n, np.int64)
    ok = np.isin(bk, (LINE, LINESTRING)) & (sk == RECT)
    idx = np.flatnonzero(ok)
    if idx.size:
        bflat, boff = _ring0(t["big_coords"])
        sflat, soff = _ring0(t["small_coords"])
        nseg = np.maximum((boff[1:] - boff[:-1])[idx] // 2 - 1, 0)
        pid, j = repeat_expand(nseg)
        rows = idx[pid]
        b = boff[:-1][rows] + 2 * j
        sx, sy = bflat[b], bflat[b + 1]
        ex, ey = bflat[b + 2], bflat[b + 3]
        s = soff[:-1][rows]
        rx0, ry0, rx1, ry1 = sflat[s], sflat[s + 1], sflat[s + 2], sflat[s + 3]
        contrib = lb_clip_micro(sx, sy, ex, ey, rx0, ry0, rx1, ry1, scale=scale)
        # contributions are integer-valued doubles < 2^53: bincount's float
        # accumulation is exact
        out += np.bincount(rows, weights=contrib, minlength=n).astype(np.int64)
    return t.append_column(out_col, pa.array(out, pa.int64()))


def lb_clip_micro(sx, sy, ex, ey, rx0, ry0, rx1, ry1, *,
                  scale: int = 1_000_000) -> np.ndarray:
    """Per-(segment, rect) Liang–Barsky clipped length, floored to
    fixed-point units — the shared kernel behind ``clip_length_batch`` and
    the line-density raster.  Returns integer-valued float64 contributions
    (exact < 2^53), one per input row."""
    dx, dy = ex - sx, ey - sy
    BIG = 1e300
    dxs = np.where(dx == 0.0, 1.0, dx)
    dys = np.where(dy == 0.0, 1.0, dy)
    in_x = (sx >= rx0) & (sx <= rx1)
    in_y = (sy >= ry0) & (sy <= ry1)
    tx_lo = np.where(dx > 0, (rx0 - sx) / dxs,
                     np.where(dx < 0, (rx1 - sx) / dxs,
                              np.where(in_x, -BIG, BIG)))
    tx_hi = np.where(dx > 0, (rx1 - sx) / dxs,
                     np.where(dx < 0, (rx0 - sx) / dxs,
                              np.where(in_x, BIG, -BIG)))
    ty_lo = np.where(dy > 0, (ry0 - sy) / dys,
                     np.where(dy < 0, (ry1 - sy) / dys,
                              np.where(in_y, -BIG, BIG)))
    ty_hi = np.where(dy > 0, (ry1 - sy) / dys,
                     np.where(dy < 0, (ry0 - sy) / dys,
                              np.where(in_y, BIG, -BIG)))
    t0 = np.maximum.reduce([np.zeros_like(dx), tx_lo, ty_lo])
    t1 = np.minimum.reduce([np.ones_like(dx), tx_hi, ty_hi])
    seglen = np.sqrt(dx * dx + dy * dy)
    return np.where(t1 > t0, np.floor(scale * ((t1 - t0) * seglen)), 0.0)


def line_cross_points_batch(t: pa.Table, *, keep_cols=("big_row_id", "small_row_id")) -> pa.Table:
    """Intersection POINT coordinates for PROPER segment crossings in a
    *_with_geos LINE x LINE join batch: pairs whose endpoints STRICTLY
    straddle each other's supporting line (endpoint touches and collinear
    overlaps are excluded — they have no unique crossing point).  With the
    classical orientation cross-products d1..d4, the crossing parameter
    along the big segment is t = d1/(d1-d2) and the point is
    p1 + t*(p2-p1) — the exact expression graph the SQL twin spells, so
    for integer-valued coordinates the emitted doubles hash-match."""
    bflat, boff = _ring0(t["big_coords"])
    sflat, soff = _ring0(t["small_coords"])
    b = boff[:-1]
    s = soff[:-1]
    ax1, ay1, ax2, ay2 = bflat[b], bflat[b + 1], bflat[b + 2], bflat[b + 3]
    bx1, by1, bx2, by2 = sflat[s], sflat[s + 1], sflat[s + 2], sflat[s + 3]
    d1 = (bx2 - bx1) * (ay1 - by1) - (by2 - by1) * (ax1 - bx1)
    d2 = (bx2 - bx1) * (ay2 - by1) - (by2 - by1) * (ax2 - bx1)
    d3 = (ax2 - ax1) * (by1 - ay1) - (ay2 - ay1) * (bx1 - ax1)
    d4 = (ax2 - ax1) * (by2 - ay1) - (ay2 - ay1) * (bx2 - ax1)
    proper = (((d1 > 0) != (d2 > 0)) & (d1 != 0) & (d2 != 0)
              & ((d3 > 0) != (d4 > 0)) & (d3 != 0) & (d4 != 0))
    idx = np.flatnonzero(proper)
    tt = d1[idx] / (d1[idx] - d2[idx])
    px = ax1[idx] + tt * (ax2[idx] - ax1[idx])
    py = ay1[idx] + tt * (ay2[idx] - ay1[idx])
    out = {c: t[c].take(pa.array(idx)) for c in keep_cols}
    out["ix"] = pa.array(px, pa.float64())
    out["iy"] = pa.array(py, pa.float64())
    return pa.table(out)
