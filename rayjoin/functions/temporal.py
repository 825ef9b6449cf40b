"""Temporal joins over keyed streams: as-of (most-recent-match) and band
(bounded time-window range) joins.

Ray Data has no native as-of or range join (engine guidance: implement such
operators as map_batches + groupby().map_groups + sort compositions and
document the partitioning assumption).  Both operators here shuffle ONCE on
a bounded hash-bucket key and resolve every key inside a bucket with one
vectorized sort — the bucketed group-merge pattern from ``rayjoin/util.py``
(a per-key ``map_groups`` would pay ~100 µs of Python per key).

Partitioning assumptions, stated:

- ``asof_join`` co-partitions both sides by ``hash(key) % num_buckets``.
  A bucket must fit in a worker's heap; keys are arbitrary (the kernel
  handles any number of keys per bucket in one lexsort).
- ``band_join`` co-partitions by ``hash(key, time_bin)`` where the bin
  width equals the band span, so each right row is replicated to at most 2
  bins and every qualifying pair meets in exactly one partition.  The skew
  unit is (key, span) — a single key emitting most of its rows into one
  span window still bounds work to that window, never the whole key.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..util import knuth_bucket


def _arrow_types(ds, cols):
    """Arrow type per column name from a Dataset/Table schema."""
    sch = ds.schema() if hasattr(ds, "schema") and not isinstance(ds, pa.Table) else ds.schema
    if callable(sch):  # pa.Table.schema is a property; ray Dataset.schema()
        sch = sch()
    base = getattr(sch, "base_schema", sch)
    if isinstance(base, pa.Schema):
        return {c: base.field(c).type for c in cols}
    # ray.data.Schema fallback: parallel names/types lists
    m = dict(zip(sch.names, sch.types))
    return {c: m[c] for c in cols}


def _mk_prep(side_is_right, key_col, ts_col, col_map, l_out_types, r_out_types,
             tiebreak_col, num_buckets):
    """Build a map_batches fn emitting the unified asof shuffle schema —
    part, K (key), TS (timestamp us), ISR, TB, then L_* and R_* payloads
    (typed nulls on the absent side) — in one fixed column order so the two
    sides union cleanly."""
    own = set(col_map.values())
    src_of = {out: src for src, out in col_map.items()}

    def prep(t: pa.Table) -> pa.Table:
        n = t.num_rows
        key = np.asarray(t[key_col].combine_chunks(), dtype=np.int64)
        cols = {
            "part": pa.array(knuth_bucket(key, num_buckets), pa.int64()),
            "K": pa.array(key, pa.int64()),
            "TS": t[ts_col].combine_chunks().cast(pa.timestamp("us")),
            "ISR": pa.array(
                np.full(n, 1 if side_is_right else 0, np.int8), pa.int8()
            ),
            "TB": (
                t[tiebreak_col].combine_chunks().cast(pa.int64())
                if side_is_right
                else pa.array(np.zeros(n, np.int64), pa.int64())
            ),
        }
        for out, typ in l_out_types.items():
            cols["L_" + out] = (
                t[src_of[out]].combine_chunks()
                if (not side_is_right and out in own)
                else pa.nulls(n, typ)
            )
        for out, typ in r_out_types.items():
            cols["R_" + out] = (
                t[src_of[out]].combine_chunks()
                if (side_is_right and out in own)
                else pa.nulls(n, typ)
            )
        return pa.table(cols)

    return prep


def asof_join(left, right, *, key_col, left_ts_col="ts", right_ts_col="ts",
              left_cols, right_cols, right_tiebreak_col, strict=True,
              num_buckets=256):
    """For every left row, attach the single right row with the same key and
    the greatest right timestamp ``<`` (``<=`` when ``strict=False``) the
    left timestamp — a LEFT as-of join: unmatched left rows survive with
    null right payload.

    Ties on right timestamp are broken deterministically by the greatest
    ``right_tiebreak_col`` (required so results are reproducible and
    SQL-oracle-checkable; DuckDB's native ASOF leaves ties unspecified).

    ``left_cols`` / ``right_cols`` map source -> output column names; the
    key column is emitted once under ``key_col``.  Returns a Dataset with
    columns ``key_col`` + left outputs + right outputs (right nullable).

    One shuffle total (``groupby(part)`` over ``num_buckets`` hash buckets);
    each bucket resolves ALL its keys with one lexsort + a running
    maximum-position scan — no per-key Python.
    """
    l_types = _arrow_types(left, list(left_cols))
    r_types = _arrow_types(right, list(right_cols))
    l_out_types = {out: l_types[src] for src, out in left_cols.items()}
    r_out_types = {out: r_types[src] for src, out in right_cols.items()}

    lp = _mk_prep(False, key_col, left_ts_col, left_cols, l_out_types,
                  r_out_types, None, num_buckets)
    rp = _mk_prep(True, key_col, right_ts_col, right_cols, l_out_types,
                  r_out_types, right_tiebreak_col, num_buckets)

    def empty() -> pa.Table:
        cols = {key_col: pa.array([], pa.int64())}
        for out, typ in l_out_types.items():
            cols[out] = pa.array([], typ)
        for out, typ in r_out_types.items():
            cols[out] = pa.array([], typ)
        return pa.table(cols)

    def per_bucket(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty()
        key = np.asarray(t["K"].combine_chunks(), dtype=np.int64)
        ts = np.asarray(t["TS"].combine_chunks().cast(pa.int64()), dtype=np.int64)
        isr = np.asarray(t["ISR"].combine_chunks(), dtype=np.int8) == 1
        tb = np.asarray(t["TB"].combine_chunks(), dtype=np.int64)
        # At equal (key, ts): strict -> left sorts first so the scan cannot
        # see an equal-ts right row; inclusive -> right sorts first so it can.
        sortside = np.where(isr, 1, 0) if strict else np.where(isr, 0, 1)
        order = np.lexsort((tb, sortside, ts, key))
        key_s, isr_s = key[order], isr[order]
        n = key_s.size
        # Running latest-right-position scan.  Positions only increase, so
        # the max position < i is the latest right row at or before i; a
        # cross-key carry-over is rejected by the same-key check below.
        rmark = np.where(isr_s, np.arange(1, n + 1, dtype=np.int64), 0)
        last = np.maximum.accumulate(rmark)
        match = last - 1
        valid = (last > 0) & (key_s[np.maximum(match, 0)] == key_s)
        lpos = np.flatnonzero(~isr_s)
        m = match[lpos]
        v = valid[lpos]
        t_s = t.take(pa.array(order, pa.int64()))
        out = {key_col: t_s["K"].take(pa.array(lpos, pa.int64()))}
        lidx = pa.array(lpos, pa.int64())
        for out_name in l_out_types:
            out[out_name] = t_s["L_" + out_name].take(lidx)
        ridx = pa.array(np.where(v, m, 0), mask=~v)
        for out_name in r_out_types:
            out[out_name] = t_s["R_" + out_name].take(ridx)
        return pa.table(out)

    return (
        left.map_batches(lp, batch_format="pyarrow")
        .union(right.map_batches(rp, batch_format="pyarrow"))
        .groupby("part")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def band_join(left, right, *, key_col, left_ts_col="ts", right_ts_col="ts",
              lower_us, upper_us, left_cols, right_cols, num_buckets=256):
    """Inner range join: all (left, right) pairs with equal ``key_col`` and
    ``right.ts - left.ts`` in ``[lower_us, upper_us)`` (microseconds,
    half-open).  Returns ``key_col`` + renamed left + right payloads.

    Scale design: the shuffle key is ``hash(key, floor(left_ts / span))``
    with span = ``upper_us - lower_us``, so every right row is replicated to
    AT MOST 2 time bins (the candidate left-timestamp window has length
    span) and each qualifying pair meets in exactly one partition — no
    post-join dedup.  In-bucket resolution packs (group, ts-rank) into one
    int64 sort key and finds every window with two vectorized
    ``searchsorted`` calls.
    """
    if upper_us <= lower_us:
        raise ValueError("band_join requires lower_us < upper_us")
    span = np.int64(upper_us - lower_us)
    lower_us = np.int64(lower_us)
    upper_us = np.int64(upper_us)

    l_types = _arrow_types(left, list(left_cols))
    r_types = _arrow_types(right, list(right_cols))
    l_out_types = {out: l_types[src] for src, out in left_cols.items()}
    r_out_types = {out: r_types[src] for src, out in right_cols.items()}

    def pack_part(key: np.ndarray, tbin: np.ndarray) -> np.ndarray:
        with np.errstate(over="ignore"):
            return knuth_bucket(key * np.int64(1000003) + tbin, num_buckets)

    def prep_left(t: pa.Table) -> pa.Table:
        key = np.asarray(t[key_col].combine_chunks(), dtype=np.int64)
        ts_arr = t[left_ts_col].combine_chunks().cast(pa.timestamp("us"))
        ts = np.asarray(ts_arr.cast(pa.int64()), dtype=np.int64)
        tbin = np.floor_divide(ts, span)
        cols = {
            "part": pa.array(pack_part(key, tbin), pa.int64()),
            "K": pa.array(key, pa.int64()),
            "BIN": pa.array(tbin, pa.int64()),
            "TS": ts_arr,
            "ISR": pa.array(np.zeros(key.size, np.int8), pa.int8()),
        }
        for src, out in left_cols.items():
            cols["L_" + out] = t[src].combine_chunks()
        for out, typ in r_out_types.items():
            cols["R_" + out] = pa.nulls(key.size, typ)
        return pa.table(cols)

    def prep_right(t: pa.Table) -> pa.Table:
        key = np.asarray(t[key_col].combine_chunks(), dtype=np.int64)
        ts_arr = t[right_ts_col].combine_chunks().cast(pa.timestamp("us"))
        ts = np.asarray(ts_arr.cast(pa.int64()), dtype=np.int64)
        # Candidate left timestamps lie in (ts - upper, ts - lower], i.e.
        # [ts - upper + 1, ts - lower] in integer µs: at most 2 bins.
        b0 = np.floor_divide(ts - upper_us + 1, span)
        b1 = np.floor_divide(ts - lower_us, span)
        second = np.flatnonzero(b1 != b0)
        idx = np.concatenate([np.arange(key.size, dtype=np.int64), second])
        tbin = np.concatenate([b0, b1[second]])
        keys2 = key[idx]
        take = pa.array(idx, pa.int64())
        cols = {
            "part": pa.array(pack_part(keys2, tbin), pa.int64()),
            "K": pa.array(keys2, pa.int64()),
            "BIN": pa.array(tbin, pa.int64()),
            "TS": ts_arr.take(take),
            "ISR": pa.array(np.ones(idx.size, np.int8), pa.int8()),
        }
        for out, typ in l_out_types.items():
            cols["L_" + out] = pa.nulls(idx.size, typ)
        for src, out in right_cols.items():
            cols["R_" + out] = t[src].combine_chunks().take(take)
        return pa.table(cols)

    def empty() -> pa.Table:
        cols = {key_col: pa.array([], pa.int64())}
        for out, typ in l_out_types.items():
            cols[out] = pa.array([], typ)
        for out, typ in r_out_types.items():
            cols[out] = pa.array([], typ)
        return pa.table(cols)

    def per_bucket(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty()
        key = np.asarray(t["K"].combine_chunks(), dtype=np.int64)
        tbin = np.asarray(t["BIN"].combine_chunks(), dtype=np.int64)
        ts = np.asarray(t["TS"].combine_chunks().cast(pa.int64()), dtype=np.int64)
        isr = np.asarray(t["ISR"].combine_chunks(), dtype=np.int8) == 1
        # Exact (key, bin) group ids via a byte-view unique — several key
        # groups share a hash bucket, and packing key*C+bin into int64 could
        # collide; the void view is byte-exact.
        kb = np.empty((key.size, 2), np.int64)
        kb[:, 0] = key
        kb[:, 1] = tbin
        v = np.ascontiguousarray(kb).view([("a", "<i8"), ("b", "<i8")]).ravel()
        _, g = np.unique(v, return_inverse=True)
        g = g.astype(np.int64, copy=False)
        a_pos = np.flatnonzero(~isr)
        b_pos = np.flatnonzero(isr)
        if a_pos.size == 0 or b_pos.size == 0:
            return empty()
        ts_b = ts[b_pos]
        uts = np.unique(ts_b)
        # Pack (group, ts-rank) into one int64: g <= n and W <= n+1 so the
        # product stays < n^2 — safe for any realistic per-bucket n (<3e9).
        W = np.int64(uts.size + 1)
        packed_b = g[b_pos] * W + np.searchsorted(uts, ts_b)
        order_b = np.argsort(packed_b, kind="stable")
        pb = packed_b[order_b]
        ts_a = ts[a_pos]
        qlo = g[a_pos] * W + np.searchsorted(uts, ts_a + lower_us, "left")
        qhi = g[a_pos] * W + np.searchsorted(uts, ts_a + upper_us, "left")
        lo = np.searchsorted(pb, qlo, "left")
        hi = np.searchsorted(pb, qhi, "left")
        counts = hi - lo
        total = int(counts.sum())
        if total == 0:
            return empty()
        a_idx = np.repeat(np.arange(a_pos.size, dtype=np.int64), counts)
        offs = (
            np.arange(total, dtype=np.int64)
            - np.repeat(np.cumsum(counts) - counts, counts)
        )
        b_sorted_idx = np.repeat(lo, counts) + offs
        a_rows = pa.array(a_pos[a_idx], pa.int64())
        b_rows = pa.array(b_pos[order_b[b_sorted_idx]], pa.int64())
        out = {key_col: t["K"].take(a_rows)}
        for out_name in l_out_types:
            out[out_name] = t["L_" + out_name].take(a_rows)
        for out_name in r_out_types:
            out[out_name] = t["R_" + out_name].take(b_rows)
        return pa.table(out)

    return (
        left.map_batches(prep_left, batch_format="pyarrow")
        .union(right.map_batches(prep_right, batch_format="pyarrow"))
        .groupby("part")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def interval_join(a, b, *, id_col: str = "id", start_col: str = "start_us",
                  end_col: str = "end_us", cell_us: int, num_buckets: int = 256,
                  duration_col: str | None = None):
    """Keyless interval OVERLAP join: all (a, b) pairs whose closed
    intervals intersect — ``s_a <= e_b AND s_b <= e_a`` over int64
    microseconds.  Returns Dataset[id_a, id_b]; with ``duration_col`` set,
    adds the overlap length ``min(e_a, e_b) - max(s_a, s_b)`` (int64 us,
    >= 0 for closed intervals) under that name — computed in the reference
    cell where both endpoints are already in hand, so the duration variant
    costs no extra shuffle.

    This is the 1-D PBSM plan (same shape as the 2-D spatial partitioned
    join): each interval replicates to every time cell of width ``cell_us``
    it touches (``e//cell - s//cell + 1`` copies — pick ``cell_us`` at or
    above the typical duration so replication stays ~2), cells hash into
    ``num_buckets`` shuffle groups, and a pair is emitted ONLY in its
    reference cell (the one containing ``max(s_a, s_b)``) so no
    dedup shuffle is needed afterwards.  In-bucket resolution is the
    band_join rank-packing kernel: B rows sort once by (cell, start-rank);
    each A row's candidates — same cell, ``s_b <= e_a`` — are one packed
    ``searchsorted`` window, then the ``e_b >= s_a`` half and the
    reference-cell rule filter the emitted candidates.  Candidate volume is
    per-cell bounded (never global all-pairs); the skew unit is one cell.
    """
    cell = np.int64(cell_us)
    if cell <= 0:
        raise ValueError("cell_us must be positive")

    def mk_prep(isr: int):
        def prep(t: pa.Table) -> pa.Table:
            s = np.asarray(t[start_col].combine_chunks(), dtype=np.int64)
            e = np.asarray(t[end_col].combine_chunks(), dtype=np.int64)
            if np.any(e < s):
                raise ValueError("interval_join: end < start row present")
            ids = np.asarray(t[id_col].combine_chunks(), dtype=np.int64)
            c0 = np.floor_divide(s, cell)
            rep = (np.floor_divide(e, cell) - c0 + 1)
            total = int(rep.sum())
            idx = np.repeat(np.arange(s.size, dtype=np.int64), rep)
            offs = (np.arange(total, dtype=np.int64)
                    - np.repeat(np.cumsum(rep) - rep, rep))
            cells = c0[idx] + offs
            return pa.table({
                "part": pa.array(knuth_bucket(cells, num_buckets), pa.int64()),
                "CELL": pa.array(cells, pa.int64()),
                "S": pa.array(s[idx], pa.int64()),
                "E": pa.array(e[idx], pa.int64()),
                "ID": pa.array(ids[idx], pa.int64()),
                "ISR": pa.array(np.full(total, isr, np.int8), pa.int8()),
            })
        return prep

    empty_cols = {"id_a": pa.array([], pa.int64()),
                  "id_b": pa.array([], pa.int64())}
    if duration_col is not None:
        empty_cols[duration_col] = pa.array([], pa.int64())
    empty = pa.table(empty_cols)

    def per_bucket(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty
        cells = np.asarray(t["CELL"].combine_chunks(), dtype=np.int64)
        s = np.asarray(t["S"].combine_chunks(), dtype=np.int64)
        e = np.asarray(t["E"].combine_chunks(), dtype=np.int64)
        ids = np.asarray(t["ID"].combine_chunks(), dtype=np.int64)
        isr = np.asarray(t["ISR"].combine_chunks(), dtype=np.int8) == 1
        _, g = np.unique(cells, return_inverse=True)
        g = g.astype(np.int64, copy=False)
        a_pos = np.flatnonzero(~isr)
        b_pos = np.flatnonzero(isr)
        if a_pos.size == 0 or b_pos.size == 0:
            return empty
        s_b = s[b_pos]
        us = np.unique(s_b)
        W = np.int64(us.size + 1)
        packed_b = g[b_pos] * W + np.searchsorted(us, s_b)
        order_b = np.argsort(packed_b, kind="stable")
        pb = packed_b[order_b]
        # candidates for a: same cell, s_b <= e_a  (every true pair has
        # s_b <= e_a, so the one-sided prefix loses nothing)
        qlo = g[a_pos] * W
        qhi = g[a_pos] * W + np.searchsorted(us, e[a_pos], "right")
        lo = np.searchsorted(pb, qlo, "left")
        hi = np.searchsorted(pb, qhi, "left")
        counts = hi - lo
        total = int(counts.sum())
        if total == 0:
            return empty
        a_idx = np.repeat(np.arange(a_pos.size, dtype=np.int64), counts)
        offs = (np.arange(total, dtype=np.int64)
                - np.repeat(np.cumsum(counts) - counts, counts))
        arows = a_pos[a_idx]
        brows = b_pos[order_b[np.repeat(lo, counts) + offs]]
        # second overlap half + reference-cell dedup
        ref = np.floor_divide(np.maximum(s[arows], s[brows]), cell)
        keep = (e[brows] >= s[arows]) & (ref == cells[arows])
        ka, kb = arows[keep], brows[keep]
        out = {"id_a": pa.array(ids[ka], pa.int64()),
               "id_b": pa.array(ids[kb], pa.int64())}
        if duration_col is not None:
            ov = np.minimum(e[ka], e[kb]) - np.maximum(s[ka], s[kb])
            out[duration_col] = pa.array(ov, pa.int64())
        return pa.table(out)

    return (a.map_batches(mk_prep(0), batch_format="pyarrow")
            .union(b.map_batches(mk_prep(1), batch_format="pyarrow"))
            .groupby("part")
            .map_groups(per_bucket, batch_format="pyarrow"))
