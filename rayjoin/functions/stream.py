"""Stream-shaped operators over the events log (engine guidance: Ray Data has
no event-time watermarks; windows are implemented as ``groupby(key)`` +
per-group ordered processing, with the ordering assumption stated here:
events are processed per-key sorted by (ts, event_id) — deterministic and
exactly reproducible by the SQL oracle's window functions).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def sessionize(ds, *, gap_minutes: int = 30, key_col: str = "user_id",
               ts_col: str = "ts", value_col: str = "value",
               num_buckets: int = 256):
    """Session windows per key: a new session starts when the gap to the
    previous event (ordered by ts, event_id) STRICTLY exceeds ``gap_minutes``.

    Returns Dataset[user_id, session_id, n_events, session_start,
    session_end, sum_value_milli] with session_id 1-based per key.

    Keys hash into ``num_buckets`` shuffle buckets; EACH BUCKET sessionizes
    all its keys with one lexsort + segmented reductions — a per-key
    map_groups would pay one Python group call per user (the partitioned-kNN
    merge lesson: ~100 µs x million of keys is minutes of pure overhead).
    """
    gap_us = np.int64(gap_minutes) * 60 * 1_000_000

    def prep(t: pa.Table) -> pa.Table:
        from ..util import knuth_bucket

        vm = pc.cast(pc.floor(pc.multiply(t[value_col], 1000.0)), pa.int64())
        key = np.asarray(t[key_col].combine_chunks(), dtype=np.int64)
        part = knuth_bucket(key, num_buckets)
        return pa.table(
            {
                key_col: t[key_col],
                ts_col: pc.cast(t[ts_col], pa.timestamp("us")),
                "event_id": t["event_id"],
                "value_milli": vm,
                "part": pa.array(part, pa.int64()),
            }
        )

    def per_bucket(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    key_col: pa.array([], pa.int64()),
                    "session_id": pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                    "session_start": pa.array([], pa.timestamp("us")),
                    "session_end": pa.array([], pa.timestamp("us")),
                    "sum_value_milli": pa.array([], pa.int64()),
                }
            )
        key = np.asarray(t[key_col].combine_chunks(), dtype=np.int64)
        ts = np.asarray(
            t[ts_col].combine_chunks().cast(pa.int64()), dtype=np.int64
        )
        ev = np.asarray(t["event_id"].combine_chunks(), dtype=np.int64)
        vm = np.asarray(t["value_milli"].combine_chunks(), dtype=np.int64)
        order = np.lexsort((ev, ts, key))
        key, ts, ev, vm = key[order], ts[order], ev[order], vm[order]
        new_key = np.concatenate([[True], key[1:] != key[:-1]])
        gap_break = np.concatenate([[True], (ts[1:] - ts[:-1]) > gap_us])
        new_sess = new_key | gap_break
        # global session index, then 1-based within each key
        sid = np.cumsum(new_sess)
        key_first_sid = sid[np.flatnonzero(new_key)]
        starts = np.flatnonzero(new_sess)
        counts = np.diff(np.concatenate([starts, [key.size]]))
        sess_key = key[starts]
        # session_id = global sid at start - (key's first sid) + 1
        base = np.repeat(key_first_sid, np.diff(np.concatenate(
            [np.flatnonzero(new_key[starts]), [starts.size]]
        ))) if starts.size else np.empty(0, np.int64)
        session_id = sid[starts] - base + 1
        sum_vm = np.add.reduceat(vm, starts) if key.size else np.empty(0, np.int64)
        return pa.table(
            {
                key_col: pa.array(sess_key, pa.int64()),
                "session_id": pa.array(session_id, pa.int64()),
                "n_events": pa.array(counts, pa.int64()),
                "session_start": pa.array(ts[starts], pa.int64()).cast(pa.timestamp("us")),
                "session_end": pa.array(
                    ts[np.concatenate([starts[1:], [key.size]]) - 1], pa.int64()
                ).cast(pa.timestamp("us")),
                "sum_value_milli": pa.array(sum_vm, pa.int64()),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("part")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def merge_intervals(ds, *, key_col: str = "user_id", start_col: str = "s",
                    end_col: str = "e", num_buckets: int = 256):
    """Per-key interval UNION (gaps and islands): merge every overlapping or
    touching [start, end] pair (inclusive touch: next.start == current
    running end merges) into islands.

    Input columns: key (int64), start/end (timestamp[us] or int64 with
    start <= end).  Returns Dataset[<key_col>, island_id, island_start,
    island_end, n_events] with island_id 1-based per key in start order.

    Same shuffle shape as ``sessionize``: keys hash into ``num_buckets``
    buckets, each bucket merges ALL its keys with one lexsort + segmented
    kernels (no per-key Python).  The segmented running-max-of-end uses the
    rank + segment-base trick so a single ``np.maximum.accumulate`` serves
    every key in the bucket."""
    # Output island_start/island_end mirror the INPUT type (ADVICE r4:
    # plain-int64 intervals used to come back silently coerced to
    # timestamp[us]).  The type decision travels WITH the data: ``prep``
    # stamps a constant ts_flag column from the batch's ACTUAL dtype, so a
    # lazy (map_batches-built) upstream whose driver-side schema probe
    # returns None still mirrors correctly (review finding r5: the
    # metadata-only probe silently fell back to timestamps there).  The
    # driver probe below only decides the schema of an all-empty result,
    # where no batch exists to consult.
    ts_out = True
    try:
        sch = ds.schema(fetch_if_missing=False)
        if sch is not None and start_col in sch.names:
            ts_out = pa.types.is_timestamp(
                sch.base_schema.field(start_col).type
                if hasattr(sch, "base_schema") else sch.field(start_col).type
            )
    except Exception:
        pass

    def _isl(arr: np.ndarray, as_ts: bool) -> pa.Array:
        a = pa.array(arr, pa.int64())
        return a.cast(pa.timestamp("us")) if as_ts else a

    def prep(t: pa.Table) -> pa.Table:
        from ..util import knuth_bucket

        key = np.asarray(t[key_col].combine_chunks(), dtype=np.int64)
        part = knuth_bucket(key, num_buckets)
        s = t[start_col]
        e = t[end_col]
        was_ts = pa.types.is_timestamp(s.type)
        if was_ts:
            s = pc.cast(pc.cast(s, pa.timestamp("us")), pa.int64())
            e = pc.cast(pc.cast(e, pa.timestamp("us")), pa.int64())
        return pa.table(
            {key_col: t[key_col], "s": s, "e": e,
             "part": pa.array(part, pa.int64()),
             "ts_flag": pa.array(
                 np.full(t.num_rows, int(was_ts), np.int64), pa.int64())}
        )

    out_empty = pa.table(
        {
            key_col: pa.array([], pa.int64()),
            "island_id": pa.array([], pa.int64()),
            "island_start": _isl(np.empty(0, np.int64), ts_out),
            "island_end": _isl(np.empty(0, np.int64), ts_out),
            "n_events": pa.array([], pa.int64()),
        }
    )

    def per_bucket(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_empty
        # input schema is uniform, so every row agrees on the flag
        as_ts = bool(t["ts_flag"][0].as_py())
        key = np.asarray(t[key_col].combine_chunks(), dtype=np.int64)
        s = np.asarray(t["s"].combine_chunks(), dtype=np.int64)
        e = np.asarray(t["e"].combine_chunks(), dtype=np.int64)
        n = key.size
        # rank * segment base must stay in int64: n^2 < 2^63 -> n < 3e9;
        # a shuffle bucket beyond 2^31 rows has bigger problems first
        assert n < 2**31, "merge_intervals bucket too large"
        order = np.lexsort((e, s, key))
        key, s, e = key[order], s[order], e[order]
        new_key = np.empty(n, np.bool_)
        new_key[0] = True
        new_key[1:] = key[1:] != key[:-1]
        seg = np.cumsum(new_key) - 1
        # segmented running max of e, EXCLUDING the current row: rank the
        # ends, add seg*n so no segment's running max can leak into the
        # next, one global accumulate, shift by one
        er_order = np.argsort(e, kind="stable")
        rank = np.empty(n, np.int64)
        rank[er_order] = np.arange(n, dtype=np.int64)
        adj = rank + seg * np.int64(n)
        cm = np.maximum.accumulate(adj)
        prev_rank = np.empty(n, np.int64)
        prev_rank[0] = 0
        prev_rank[1:] = cm[:-1] - seg[1:] * np.int64(n)
        prev_end = e[er_order[np.clip(prev_rank, 0, n - 1)]]
        brk = new_key | (s > prev_end)
        starts = np.flatnonzero(brk)
        counts = np.diff(np.concatenate([starts, [n]]))
        isl_key = key[starts]
        isl_start = s[starts]
        isl_end = np.maximum.reduceat(e, starts)
        # 1-based island index per key (same base algebra as sessionize)
        gid = np.cumsum(brk)
        key_first_gid = gid[np.flatnonzero(new_key)]
        base = np.repeat(key_first_gid, np.diff(np.concatenate(
            [np.flatnonzero(new_key[starts]), [starts.size]]
        ))) if starts.size else np.empty(0, np.int64)
        island_id = gid[starts] - base + 1
        return pa.table(
            {
                key_col: pa.array(isl_key, pa.int64()),
                "island_id": pa.array(island_id, pa.int64()),
                "island_start": _isl(isl_start, as_ts),
                "island_end": _isl(isl_end, as_ts),
                "n_events": pa.array(counts, pa.int64()),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("part")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def broadcast_semi_join(ds, keys, *, key_col: str, anti: bool = False):
    """Semi/anti join by broadcast key set (engine guidance: broadcast the
    key set and filter inside map_batches — no shuffle)."""
    import ray

    ref = ray.put(np.unique(np.asarray(list(keys), dtype=np.int64)))

    def filt(t: pa.Table) -> pa.Table:
        k = ray.get(ref)
        vals = np.asarray(t[key_col].combine_chunks(), dtype=np.int64)
        hit = np.isin(vals, k)
        return t.filter(pa.array(~hit if anti else hit, pa.bool_()))

    return ds.map_batches(filt, batch_format="pyarrow")


def funnel(ds, *, steps=("view", "click", "purchase"), key_col: str = "user_id",
           ts_col: str = "ts", type_col: str = "event_type",
           num_buckets: int = 64):
    """Ordered funnel progression per key: t1 = earliest step-1 event,
    t2 = earliest step-2 event STRICTLY after t1, and so on — the standard
    product-analytics funnel with earliest-completion semantics.  Returns
    Dataset[key, depth, t1_us, t2_us, ...] (timestamps in epoch micros,
    -1 where the step was never reached).

    One bucketed shuffle on the key; each bucket resolves ALL its keys with
    one lexsort + per-step segmented masked minimum — no per-key Python,
    same merge pattern as sessionize."""
    import pyarrow.compute as pc

    SENT = np.iinfo(np.int64).max

    def bucketed(t: pa.Table) -> pa.Table:
        k = np.asarray(t[key_col].combine_chunks(), dtype=np.int64)
        ts = np.asarray(t[ts_col].combine_chunks()).astype("datetime64[us]").astype(np.int64)
        return pa.table({
            "bucket": pa.array((k % num_buckets + num_buckets) % num_buckets,
                               pa.int64()),
            key_col: pa.array(k, pa.int64()),
            "ts_us": pa.array(ts, pa.int64()),
            type_col: t[type_col],
        })

    def resolve(t: pa.Table) -> pa.Table:
        k = np.asarray(t[key_col].combine_chunks(), dtype=np.int64)
        ts = np.asarray(t["ts_us"].combine_chunks(), dtype=np.int64)
        et = t[type_col].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((ts, k))
        k, ts, et = k[order], ts[order], et[order]
        new = np.concatenate([[True], k[1:] != k[:-1]]) if k.size else np.empty(0, bool)
        starts = np.flatnonzero(new)
        uid = k[starts]
        gid = np.cumsum(new) - 1
        prev = np.full(uid.size, np.iinfo(np.int64).min, np.int64)  # step 0: no bound
        out = {key_col: pa.array(uid, pa.int64())}
        depth = np.zeros(uid.size, np.int64)
        for i, step in enumerate(steps):
            m = (et == step) & (ts > prev[gid])
            vals = np.where(m, ts, SENT)
            tmin = np.minimum.reduceat(vals, starts) if k.size else np.empty(0, np.int64)
            reached = tmin != SENT
            depth += reached.astype(np.int64) * (depth == i)
            out[f"t{i + 1}_us"] = pa.array(np.where(reached, tmin, -1), pa.int64())
            prev = tmin  # unreached -> SENT: later steps can't fire (ts > SENT impossible)
        out["depth"] = pa.array(depth, pa.int64())
        return pa.table(out)

    return (
        ds.map_batches(bucketed, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(resolve, batch_format="pyarrow")
    )


def cohort_retention(ds, *, anchor_us: int, bucket_us: int,
                     user_col: str = "user_id", ts_col: str = "ts",
                     broadcast_rows: int = 20_000_000):
    """Cohort retention matrix over an event log: users are grouped into
    cohorts by the time bucket of their FIRST event, and each (cohort,
    buckets-since-cohort) cell counts the distinct users from that cohort
    active in that bucket.  The classic warehouse retention query, kept
    integer-exact: bucket = (epoch_us - anchor_us) // bucket_us with a
    non-negative anchor below min(ts) (floor vs truncate never diverges).

    Plan (never materializes the raw log):
    1. distinct (user, bucket) pairs — per-batch local dedup shrinks the
       payload, ONE groupby((user, bucket)) hash shuffle makes it global;
    2. cohort per user = groupby(user).min(bucket) over those pairs
       (user-sized, i.e. orders of magnitude lighter than the log);
    3. pairs x cohort: the cohort table broadcasts as two sorted numpy
       arrays (ray.put once, searchsorted per batch) up to
       ``broadcast_rows`` users, hash-joining above — the same tiering as
       near_dup_drop_list; each distinct (user, bucket) contributes
       exactly one row to its (cohort, delta) cell, so the final count is
       a Sum over per-batch partials, no count-distinct shuffle.

    Returns Dataset[cohort, delta, n_users].
    """
    import ray
    import ray.data
    from ray.data.aggregate import Count, Min, Sum

    if bucket_us <= 0:
        raise ValueError("need bucket_us > 0")
    a0 = np.int64(anchor_us)
    bw = np.int64(bucket_us)

    def to_pairs(t: pa.Table) -> pa.Table:
        u = np.asarray(t[user_col].combine_chunks(), dtype=np.int64)
        ts = np.asarray(
            pc.cast(t[ts_col].combine_chunks(), pa.int64()), dtype=np.int64)
        b = (ts - a0) // bw
        order = np.lexsort((b, u))
        u, b = u[order], b[order]
        first = np.concatenate([[True], (u[1:] != u[:-1]) | (b[1:] != b[:-1])]) \
            if u.size else np.zeros(0, bool)
        return pa.table({"user": pa.array(u[first], pa.int64()),
                         "bucket": pa.array(b[first], pa.int64())})

    pairs = (ds.map_batches(to_pairs, batch_format="pyarrow")
             .groupby(["user", "bucket"]).aggregate(Count(alias_name="_n"))
             .select_columns(["user", "bucket"])
             .materialize())

    cohort = (pairs.groupby("user")
              .aggregate(Min("bucket", alias_name="cohort"))
              .materialize())

    if cohort.count() <= broadcast_rows:
        import ray

        @ray.remote
        def prep(tabs):
            tabs = ray.get(list(tabs))  # refs nested in a list don't auto-resolve
            t = pa.concat_tables([x for x in tabs if x.num_rows])
            u = np.asarray(t["user"], dtype=np.int64)
            c = np.asarray(t["cohort"], dtype=np.int64)
            order = np.argsort(u)
            return u[order], c[order]

        ref = prep.remote(cohort.to_arrow_refs())

        def cell_parts(t: pa.Table) -> pa.Table:
            us, cs = ray.get(ref)
            u = np.asarray(t["user"].combine_chunks(), dtype=np.int64)
            b = np.asarray(t["bucket"].combine_chunks(), dtype=np.int64)
            coh = cs[np.searchsorted(us, u)]  # every user has a cohort row
            key = np.stack([coh, b - coh], axis=1)
            uniq, counts = np.unique(key, axis=0, return_counts=True)
            return pa.table({"cohort": pa.array(uniq[:, 0], pa.int64()),
                             "delta": pa.array(uniq[:, 1], pa.int64()),
                             "part": pa.array(counts.astype(np.int64),
                                              pa.int64())})

        return (pairs.map_batches(cell_parts, batch_format="pyarrow")
                .groupby(["cohort", "delta"])
                .aggregate(Sum("part", alias_name="n_users")))

    from .dedup import _num_join_partitions

    j = pairs.join(cohort, "inner", _num_join_partitions(pairs, cohort),
                   on=("user",))

    def cell_rows(t: pa.Table) -> pa.Table:
        b = np.asarray(t["bucket"].combine_chunks(), dtype=np.int64)
        c = np.asarray(t["cohort"].combine_chunks(), dtype=np.int64)
        one = np.ones(b.size, np.int64)
        return pa.table({"cohort": pa.array(c, pa.int64()),
                         "delta": pa.array(b - c, pa.int64()),
                         "part": pa.array(one, pa.int64())})

    return (j.map_batches(cell_rows, batch_format="pyarrow")
            .groupby(["cohort", "delta"])
            .aggregate(Sum("part", alias_name="n_users")))


def resample_locf(ds, *, anchor_us: int, bucket_us: int,
                  key_col: str = "user_id", ts_col: str = "ts",
                  value_col: str = "value", num_buckets: int = 256):
    """Per-key time-series resampling with forward fill (LOCF, "last
    observation carried forward"): each key gets one row per time bucket
    from its first to its last observed bucket; a bucket's value is the
    LAST event in it (ordered by ts, event_id — the sessionize ordering
    contract), and empty buckets carry the previous bucket's value.
    The gap-fill step every feature-store / metrics pipeline runs before
    windowed aggregation.

    Keys hash into ``num_buckets`` shuffle buckets (ONE groupby shuffle of
    light 5-column rows); inside a bucket all keys resolve with one
    lexsort + segment arithmetic and the fill is a searchsorted gather —
    zero Python per key or per grid cell.  Grid size is data-bounded:
    sum over keys of (observed span / bucket_us).

    Returns Dataset[key, bucket, vm, filled] — vm the milli-fixed-point
    carried value, filled=1 on gap-filled rows.
    """
    if bucket_us <= 0:
        raise ValueError("need bucket_us > 0")
    a0 = np.int64(anchor_us)
    bw = np.int64(bucket_us)

    def prep(t: pa.Table) -> pa.Table:
        from ..util import knuth_bucket

        key = np.asarray(t[key_col].combine_chunks(), dtype=np.int64)
        ts = np.asarray(
            pc.cast(t[ts_col].combine_chunks(), pa.int64()), dtype=np.int64)
        vm = pc.cast(pc.floor(pc.multiply(t[value_col], 1000.0)), pa.int64())
        return pa.table({
            "key": pa.array(key, pa.int64()),
            "b": pa.array((ts - a0) // bw, pa.int64()),
            "ts_us": pa.array(ts, pa.int64()),
            "event_id": t["event_id"],
            "vm": vm,
            "part": pa.array(knuth_bucket(key, num_buckets), pa.int64()),
        })

    empty = pa.table({
        key_col: pa.array([], pa.int64()), "bucket": pa.array([], pa.int64()),
        "vm": pa.array([], pa.int64()), "filled": pa.array([], pa.int64()),
    })

    def per_bucket(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty
        key = np.asarray(t["key"].combine_chunks(), dtype=np.int64)
        b = np.asarray(t["b"].combine_chunks(), dtype=np.int64)
        ts = np.asarray(t["ts_us"].combine_chunks(), dtype=np.int64)
        ev = np.asarray(t["event_id"].combine_chunks(), dtype=np.int64)
        vm = np.asarray(t["vm"].combine_chunks(), dtype=np.int64)
        order = np.lexsort((ev, ts, b, key))
        key, b, vm = key[order], b[order], vm[order]
        # last row of each (key, bucket) run is the bucket's value
        last = np.concatenate([(key[1:] != key[:-1]) | (b[1:] != b[:-1]),
                               [True]])
        okey, ob, ovm = key[last], b[last], vm[last]
        # per-key spans over the observed-bucket rows (sorted by key)
        new_key = np.concatenate([[True], okey[1:] != okey[:-1]])
        kstart = np.flatnonzero(new_key)
        kend = np.concatenate([kstart[1:], [okey.size]]) - 1
        spans = ob[kend] - ob[kstart] + 1
        from ..geom.primitives import repeat_expand

        gid, off = repeat_expand(spans)  # grid row -> key index, offset
        gkey = okey[kstart][gid]
        gb = ob[kstart][gid] + off
        # LOCF: map each grid cell to the latest observed bucket <= it.
        # ob is sorted within a key; make it globally sorted by pairing
        # with the key index, then one searchsorted over the packed pair.
        pk = (gid.astype(np.int64) << 40) | (gb - ob[kstart][gid])
        kidx = np.repeat(np.arange(kstart.size, dtype=np.int64),
                         kend - kstart + 1)
        ok = (kidx << 40) | (ob - ob[kstart][kidx])
        src = np.searchsorted(ok, pk, side="right") - 1
        gvm = ovm[src]
        filled = (ok[src] != pk).astype(np.int64)
        return pa.table({
            key_col: pa.array(gkey, pa.int64()),
            "bucket": pa.array(gb, pa.int64()),
            "vm": pa.array(gvm, pa.int64()),
            "filled": pa.array(filled, pa.int64()),
        })

    return (ds.map_batches(prep, batch_format="pyarrow")
            .groupby("part")
            .map_groups(per_bucket, batch_format="pyarrow"))


def transition_counts(ds, *, key_col: str = "user_id", ts_col: str = "ts",
                      type_col: str = "event_type", num_buckets: int = 256):
    """First-order Markov transition counts over per-key event sequences:
    for each key ordered by (ts, event_id) — the sessionize ordering
    contract — every adjacent (state, next state) pair contributes one
    count.  The contingency table behind next-event prediction features
    and sequence-model corpus stats.

    Keys hash into ``num_buckets`` shuffle buckets so each key's whole
    sequence lands in one group; inside a bucket states dictionary-encode
    to int32 codes, adjacency is one shifted compare (masked at key
    boundaries), and pairs pack into int64 keys for a np.unique partial
    count.  A second tiny groupby sums partials across buckets.

    Returns Dataset[from_type, to_type, n].
    """

    def prep(t: pa.Table) -> pa.Table:
        from ..util import knuth_bucket

        key = np.asarray(t[key_col].combine_chunks(), dtype=np.int64)
        return pa.table({
            "key": pa.array(key, pa.int64()),
            "ts_us": pc.cast(pc.cast(t[ts_col], pa.timestamp("us")),
                             pa.int64()),
            "event_id": t["event_id"],
            "state": t[type_col],
            "part": pa.array(knuth_bucket(key, num_buckets), pa.int64()),
        })

    empty = pa.table({"from_type": pa.array([], pa.string()),
                      "to_type": pa.array([], pa.string()),
                      "n_partial": pa.array([], pa.int64())})

    def per_bucket(t: pa.Table) -> pa.Table:
        if t.num_rows < 2:
            return empty
        key = np.asarray(t["key"].combine_chunks(), dtype=np.int64)
        ts = np.asarray(t["ts_us"].combine_chunks(), dtype=np.int64)
        ev = np.asarray(t["event_id"].combine_chunks(), dtype=np.int64)
        st = t["state"].combine_chunks().dictionary_encode()
        codes = np.asarray(st.indices, dtype=np.int64)
        order = np.lexsort((ev, ts, key))
        key, codes = key[order], codes[order]
        same = key[1:] == key[:-1]
        pk = (codes[:-1][same] << 32) | codes[1:][same]
        if not pk.size:
            return empty
        uniq, counts = np.unique(pk, return_counts=True)
        dic = st.dictionary
        return pa.table({
            "from_type": dic.take(pa.array(uniq >> 32, pa.int64())),
            "to_type": dic.take(pa.array(uniq & 0xFFFFFFFF, pa.int64())),
            "n_partial": pa.array(counts.astype(np.int64), pa.int64()),
        })

    from ray.data.aggregate import Sum

    return (ds.map_batches(prep, batch_format="pyarrow")
            .groupby("part").map_groups(per_bucket, batch_format="pyarrow")
            .groupby(["from_type", "to_type"])
            .aggregate(Sum("n_partial", alias_name="n")))


def running_sum(ds, *, key_col: str = "user_id", ts_col: str = "ts",
                id_col: str = "event_id", value_col: str = "value",
                num_buckets: int = 256):
    """Segmented prefix sum: every row gets the CUMULATIVE milli
    fixed-point value of its key up to and including itself, ordered by
    (ts, id) — ``SUM(vm) OVER (PARTITION BY key ORDER BY ts, id)``, the
    running-balance primitive.

    One (key, ts, id, vm) projection shuffles into ``num_buckets`` hash
    buckets (every row of a key lands in one bucket); each bucket scans ALL
    its keys with one lexsort + one np.cumsum + a per-segment base subtract
    — zero Python per key, the sessionize pattern.  Output is row-sized but
    4 int64 columns, never the input table.

    Returns Dataset[id_col, key_col, vm, run_vm].
    """

    def prep(t: pa.Table) -> pa.Table:
        from ..util import knuth_bucket

        key = np.asarray(t[key_col].combine_chunks(), dtype=np.int64)
        return pa.table({
            key_col: t[key_col],
            "ts_us": pc.cast(pc.cast(t[ts_col], pa.timestamp("us")),
                             pa.int64()),
            id_col: t[id_col],
            "vm": pc.cast(pc.floor(pc.multiply(t[value_col], 1000.0)),
                          pa.int64()),
            "part": pa.array(knuth_bucket(key, num_buckets), pa.int64()),
        })

    empty = pa.table({id_col: pa.array([], pa.int64()),
                      key_col: pa.array([], pa.int64()),
                      "vm": pa.array([], pa.int64()),
                      "run_vm": pa.array([], pa.int64())})

    def per_bucket(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty
        key = np.asarray(t[key_col].combine_chunks(), dtype=np.int64)
        ts = np.asarray(t["ts_us"].combine_chunks(), dtype=np.int64)
        ev = np.asarray(t[id_col].combine_chunks(), dtype=np.int64)
        vm = np.asarray(t["vm"].combine_chunks(), dtype=np.int64)
        order = np.lexsort((ev, ts, key))
        key, ev, vm = key[order], ev[order], vm[order]
        run = np.cumsum(vm)
        starts = np.flatnonzero(np.concatenate([[True], key[1:] != key[:-1]]))
        counts = np.diff(np.concatenate([starts, [key.size]]))
        base = run[starts] - vm[starts]
        run -= np.repeat(base, counts)
        return pa.table({id_col: pa.array(ev, pa.int64()),
                         key_col: pa.array(key, pa.int64()),
                         "vm": pa.array(vm, pa.int64()),
                         "run_vm": pa.array(run, pa.int64())})

    return (ds.map_batches(prep, batch_format="pyarrow")
            .groupby("part").map_groups(per_bucket, batch_format="pyarrow"))


def event_paths(ds, *, key_col: str = "user_id", ts_col: str = "ts",
                type_col: str = "event_type", id_col: str = "event_id",
                sep: str = ">", num_buckets: int = 256):
    """Ordered per-key path strings: each key's event types concatenated in
    (ts, id) order — ``string_agg(type, sep ORDER BY ts, id)``, the
    clickstream-mining projection.

    Same bucketed segmented kernel as running_sum, but the per-bucket
    concat is pure Arrow: the lexsorted type column becomes ONE
    ``ListArray`` (zero-copy over group offsets) and ``pc.binary_join``
    emits every key's joined path in a single kernel call — no Python
    string building anywhere.

    Returns Dataset[key_col, n_events, path].
    """

    def prep(t: pa.Table) -> pa.Table:
        from ..util import knuth_bucket

        key = np.asarray(t[key_col].combine_chunks(), dtype=np.int64)
        return pa.table({
            key_col: t[key_col],
            "ts_us": pc.cast(pc.cast(t[ts_col], pa.timestamp("us")),
                             pa.int64()),
            id_col: t[id_col],
            "typ": t[type_col].combine_chunks().cast(pa.string()),
            "part": pa.array(knuth_bucket(key, num_buckets), pa.int64()),
        })

    empty = pa.table({key_col: pa.array([], pa.int64()),
                      "n_events": pa.array([], pa.int64()),
                      "path": pa.array([], pa.string())})

    def per_bucket(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty
        key = np.asarray(t[key_col].combine_chunks(), dtype=np.int64)
        ts = np.asarray(t["ts_us"].combine_chunks(), dtype=np.int64)
        ev = np.asarray(t[id_col].combine_chunks(), dtype=np.int64)
        typ = t["typ"].combine_chunks()
        order = np.lexsort((ev, ts, key))
        key = key[order]
        typ = typ.take(pa.array(order, pa.int64()))
        starts = np.flatnonzero(np.concatenate([[True], key[1:] != key[:-1]]))
        offsets = np.concatenate([starts, [key.size]]).astype(np.int64)
        lists = pa.LargeListArray.from_arrays(
            pa.array(offsets, pa.int64()), typ.cast(pa.large_string()))
        joined = pc.binary_join(lists, pa.scalar(sep, pa.large_string()))
        return pa.table({
            key_col: pa.array(key[starts], pa.int64()),
            "n_events": pa.array(np.diff(offsets), pa.int64()),
            "path": joined.cast(pa.string()),
        })

    return (ds.map_batches(prep, batch_format="pyarrow")
            .groupby("part").map_groups(per_bucket, batch_format="pyarrow"))


def rolling_active_counts(ds, *, key_col: str = "user_id", ts_col: str = "ts",
                          window_days: int = 7, num_buckets: int = 256,
                          max_days: int = 5_000_000):
    """EXACT rolling-window distinct counts (the WAU/MAU curve): for every
    ACTIVE day d, how many keys had at least one event in
    ``[d - window_days + 1, d]``.

    Rolling COUNT DISTINCT does not decompose into partials — the trick is
    coverage algebra: a key active on day a covers days ``[a, a+w-1]``, so
    the answer at d is "how many keys' coverage unions contain d".  Each
    key's union is computed vectorized inside one hash bucket (lexsort +
    the segment-cummax island kernel over per-day windows; only OVERLAPPING
    windows merge — adjacent ones may stay split because their +1/-1 diffs
    telescope away), every island emits two diff rows, and ONE small
    groupby(day) reduces them.  The cumulative scan then runs over the
    days-cardinality diff table (<= ``max_days`` rows — loudly capped, the
    calendar is not big data) in a single Ray task whose sorted
    (day, coverage) arrays broadcast back to score each active day.

    Returns Dataset[d, n_active] over active days only.
    """
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    from ..util import knuth_bucket

    w = np.int64(window_days)
    if w <= 0:
        raise ValueError("window_days must be positive")
    day_us = np.int64(86_400_000_000)

    def prep(t: pa.Table) -> pa.Table:
        key = np.asarray(t[key_col].combine_chunks(), dtype=np.int64)
        ts = np.asarray(
            t[ts_col].combine_chunks().cast(pa.timestamp("us"))
            .cast(pa.int64()), dtype=np.int64)
        d = np.floor_divide(ts, day_us)
        # batch-local dedup before the shuffle: (key, day) repeats heavily
        kb = np.empty((key.size, 2), np.int64)
        kb[:, 0] = key
        kb[:, 1] = d
        uv = np.unique(
            np.ascontiguousarray(kb).view([("a", "<i8"), ("b", "<i8")]).ravel())
        key, d = uv["a"], uv["b"]
        return pa.table({
            "K": pa.array(key, pa.int64()),
            "D": pa.array(d, pa.int64()),
            "part": pa.array(knuth_bucket(key, num_buckets), pa.int64()),
        })

    diff_empty = pa.table({"d": pa.array([], pa.int64()),
                           "delta": pa.array([], pa.int64()),
                           "active": pa.array([], pa.int64())})

    def per_bucket(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return diff_empty
        key = np.asarray(t["K"].combine_chunks(), dtype=np.int64)
        d = np.asarray(t["D"].combine_chunks(), dtype=np.int64)
        kb = np.empty((key.size, 2), np.int64)
        kb[:, 0] = key
        kb[:, 1] = d
        uv = np.unique(
            np.ascontiguousarray(kb).view([("a", "<i8"), ("b", "<i8")]).ravel())
        key, d = uv["a"], uv["b"]  # sorted by (key, day), distinct
        # islands of OVERLAPPING per-day windows [d, d+w-1] within a key:
        # window end running max is monotone here (d sorted, w constant),
        # so a new island starts when d > prev_d + w - 1
        new_key = np.concatenate([[True], key[1:] != key[:-1]])
        gap = np.concatenate([[True], d[1:] > d[:-1] + w - 1])
        new_isl = new_key | gap
        starts = np.flatnonzero(new_isl)
        ends = np.concatenate([starts[1:], [key.size]]) - 1
        # diffs: +1 at island start day, -1 one past island end coverage
        dd = np.concatenate([d[starts], d[ends] + w])
        delta = np.concatenate([np.ones(starts.size, np.int64),
                                np.full(starts.size, -1, np.int64)])
        # active-day marker rows ride the same shuffle (delta 0)
        ud = np.unique(d)
        return pa.table({
            "d": pa.array(np.concatenate([dd, ud]), pa.int64()),
            "delta": pa.array(
                np.concatenate([delta, np.zeros(ud.size, np.int64)]),
                pa.int64()),
            "active": pa.array(
                np.concatenate([np.zeros(dd.size, np.int64),
                                np.ones(ud.size, np.int64)]), pa.int64()),
        })

    diffs = (ds.map_batches(prep, batch_format="pyarrow")
             .groupby("part").map_groups(per_bucket, batch_format="pyarrow")
             .groupby("d")
             .aggregate(Sum("delta", alias_name="delta"),
                        Sum("active", alias_name="active"))
             .materialize())
    n_days = diffs.count()
    if n_days > max_days:
        raise ValueError(
            f"rolling_active_counts: {n_days} distinct diff days "
            f"(> max_days={max_days}) — not a calendar; check ts units")

    @ray.remote
    def scan(*tabs):
        t = pa.concat_tables([x for x in tabs if x.num_rows])
        d = np.asarray(t["d"], dtype=np.int64)
        delta = np.asarray(t["delta"], dtype=np.int64)
        act = np.asarray(t["active"], dtype=np.int64)
        order = np.argsort(d)
        d, delta, act = d[order], delta[order], act[order]
        cov = np.cumsum(delta)
        keep = act > 0
        return pa.table({"d": pa.array(d[keep], pa.int64()),
                         "n_active": pa.array(cov[keep], pa.int64())})

    out = ray.get(scan.remote(*diffs.to_arrow_refs()))
    return ray.data.from_arrow(out)


def daily_deltas(ds, *, cat_col: str = "event_type", ts_col: str = "ts",
                 num_buckets: int = 64):
    """Day-over-day trending: per category, the per-day event count and
    its delta vs the category's PREVIOUS ACTIVE day (first day's delta is
    the count itself) — ``n - LAG(n) OVER (PARTITION BY cat ORDER BY d)``.

    Counts pre-aggregate per batch so the shuffle is (cat, day)-sized;
    the LAG resolves per hash bucket with one lexsort + a shifted
    same-category mask (no Python per category).

    Returns Dataset[cat_col, d, n, delta].
    """
    from ray.data.aggregate import Sum

    day_us = np.int64(86_400_000_000)

    def partial(t: pa.Table) -> pa.Table:
        ts = np.asarray(
            t[ts_col].combine_chunks().cast(pa.timestamp("us"))
            .cast(pa.int64()), dtype=np.int64)
        d = np.floor_divide(ts, day_us)
        g = (pa.table({"cat": t[cat_col], "d": pa.array(d, pa.int64())})
             .group_by(["cat", "d"]).aggregate([([], "count_all")]))
        return (g.select(["cat", "d", "count_all"])
                .rename_columns(["cat", "d", "n_p"]))

    counts = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby(["cat", "d"])
              .aggregate(Sum("n_p", alias_name="n")))

    def bucketize(t: pa.Table) -> pa.Table:
        from ..util import knuth_bucket

        # bucket by a CONTENT hash of the category string (dictionary codes
        # are batch-local and would split a category across buckets):
        # crc32 over the few DISTINCT strings, gathered to rows
        s = t["cat"].combine_chunks().cast(pa.string())
        de = s.dictionary_encode()
        import zlib

        hu = np.array([zlib.crc32(u.encode())
                       for u in de.dictionary.to_pylist()], dtype=np.int64)
        codes = np.asarray(de.indices.cast(pa.int64()), dtype=np.int64)
        return t.append_column(
            "part", pa.array(knuth_bucket(hu[codes], num_buckets),
                             pa.int64()))

    empty = pa.table({cat_col: pa.array([], pa.string()),
                      "d": pa.array([], pa.int64()),
                      "n": pa.array([], pa.int64()),
                      "delta": pa.array([], pa.int64())})

    def per_bucket(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty
        s = t["cat"].combine_chunks().cast(pa.string())
        d = np.asarray(t["d"].combine_chunks(), dtype=np.int64)
        n = np.asarray(t["n"].combine_chunks(), dtype=np.int64)
        ucat, code = np.unique(np.asarray(s, dtype=object),
                               return_inverse=True)
        order = np.lexsort((d, code))
        code, d, n = code[order], d[order], n[order]
        prev_same = np.concatenate([[False], code[1:] == code[:-1]])
        delta = n.copy()
        delta[prev_same] = n[prev_same] - n[np.flatnonzero(prev_same) - 1]
        return pa.table({
            cat_col: pa.array(ucat[code].tolist(), pa.string()),
            "d": pa.array(d, pa.int64()),
            "n": pa.array(n, pa.int64()),
            "delta": pa.array(delta, pa.int64()),
        })

    return (counts.map_batches(bucketize, batch_format="pyarrow")
            .groupby("part").map_groups(per_bucket, batch_format="pyarrow"))


def rows_window_sum(ds, *, key_col: str = "user_id", ts_col: str = "ts",
                    id_col: str = "event_id", value_col: str = "value",
                    frame_rows: int = 4, num_buckets: int = 256):
    """ROWS-frame moving sum: for every row, the sum of its key's last
    ``frame_rows`` values (current row included) in (ts, id) order —
    ``SUM(vm) OVER (PARTITION BY key ORDER BY ts, id ROWS frame_rows-1
    PRECEDING)``.

    Same bucketed segmented-cumsum kernel as running_sum, plus a lagged
    subtraction that respects key boundaries: win = run - run[i-k] when
    row i-k is the same key, else run - base_of_key.

    Returns Dataset[id_col, key_col, vm, win_vm].
    """
    k = int(frame_rows)
    if k <= 0:
        raise ValueError("frame_rows must be positive")

    def prep(t: pa.Table) -> pa.Table:
        from ..util import knuth_bucket

        key = np.asarray(t[key_col].combine_chunks(), dtype=np.int64)
        return pa.table({
            key_col: t[key_col],
            "ts_us": pc.cast(pc.cast(t[ts_col], pa.timestamp("us")),
                             pa.int64()),
            id_col: t[id_col],
            "vm": pc.cast(pc.floor(pc.multiply(t[value_col], 1000.0)),
                          pa.int64()),
            "part": pa.array(knuth_bucket(key, num_buckets), pa.int64()),
        })

    empty = pa.table({id_col: pa.array([], pa.int64()),
                      key_col: pa.array([], pa.int64()),
                      "vm": pa.array([], pa.int64()),
                      "win_vm": pa.array([], pa.int64())})

    def per_bucket(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty
        key = np.asarray(t[key_col].combine_chunks(), dtype=np.int64)
        ts = np.asarray(t["ts_us"].combine_chunks(), dtype=np.int64)
        ev = np.asarray(t[id_col].combine_chunks(), dtype=np.int64)
        vm = np.asarray(t["vm"].combine_chunks(), dtype=np.int64)
        order = np.lexsort((ev, ts, key))
        key, ev, vm = key[order], ev[order], vm[order]
        run = np.cumsum(vm)
        starts = np.flatnonzero(np.concatenate([[True],
                                                key[1:] != key[:-1]]))
        counts = np.diff(np.concatenate([starts, [key.size]]))
        base = (run[starts] - vm[starts])  # prefix sum before each key
        seg_base = np.repeat(base, counts)
        pos = np.arange(key.size, dtype=np.int64) \
            - np.repeat(starts, counts)  # 0-based rank within key
        # prefix to subtract: run at rank pos-k within the key, or the
        # key's base when fewer than k predecessors exist
        prev_idx = np.arange(key.size, dtype=np.int64) - k
        in_frame = pos >= k
        sub = np.where(in_frame, run[np.maximum(prev_idx, 0)], seg_base)
        win = run - sub
        return pa.table({id_col: pa.array(ev, pa.int64()),
                         key_col: pa.array(key, pa.int64()),
                         "vm": pa.array(vm, pa.int64()),
                         "win_vm": pa.array(win, pa.int64())})

    return (ds.map_batches(prep, batch_format="pyarrow")
            .groupby("part").map_groups(per_bucket, batch_format="pyarrow"))


def state_transitions(ds, *, key_col: str = "user_id", ts_col: str = "ts",
                      seq_col: str = "event_id", state_col: str = "state",
                      num_buckets: int = 256):
    """Status-change detection: one row per ping whose int64 state differs
    from the SAME key's previous state in (ts, seq) order — geofence
    entry/exit, subscription tier changes, online/offline flips.  Returns
    Dataset[<key_col>, ts_us, <seq_col>, from_state, to_state] for the row
    where the new state begins; a key's first observation emits nothing.

    One groupby(part) shuffle of light (key, ts, seq, state) rows; each
    bucket lexsorts once and masks key boundaries + unchanged states with
    two shifted compares — per-bucket output is final (keys live whole in
    their bucket).
    """
    from ..util import knuth_bucket

    def prep(t: pa.Table) -> pa.Table:
        key = np.asarray(t[key_col].combine_chunks(), dtype=np.int64)
        return pa.table({
            "key": pa.array(key, pa.int64()),
            "ts_us": pc.cast(pc.cast(t[ts_col], pa.timestamp("us")),
                             pa.int64()),
            "seq": pc.cast(t[seq_col], pa.int64()),
            "state": pc.cast(t[state_col], pa.int64()),
            "part": pa.array(knuth_bucket(key, num_buckets), pa.int64()),
        })

    empty = pa.table({key_col: pa.array([], pa.int64()),
                      "ts_us": pa.array([], pa.int64()),
                      seq_col: pa.array([], pa.int64()),
                      "from_state": pa.array([], pa.int64()),
                      "to_state": pa.array([], pa.int64())})

    def per_bucket(t: pa.Table) -> pa.Table:
        if t.num_rows < 2:
            return empty
        key = np.asarray(t["key"].combine_chunks(), dtype=np.int64)
        ts = np.asarray(t["ts_us"].combine_chunks(), dtype=np.int64)
        sq = np.asarray(t["seq"].combine_chunks(), dtype=np.int64)
        st = np.asarray(t["state"].combine_chunks(), dtype=np.int64)
        o = np.lexsort((sq, ts, key))
        key, ts, sq, st = key[o], ts[o], sq[o], st[o]
        chg = (key[1:] == key[:-1]) & (st[1:] != st[:-1])
        if not chg.any():
            return empty
        i = np.flatnonzero(chg) + 1
        return pa.table({
            key_col: pa.array(key[i], pa.int64()),
            "ts_us": pa.array(ts[i], pa.int64()),
            seq_col: pa.array(sq[i], pa.int64()),
            "from_state": pa.array(st[i - 1], pa.int64()),
            "to_state": pa.array(st[i], pa.int64()),
        })

    return (ds.map_batches(prep, batch_format="pyarrow")
            .groupby("part").map_groups(per_bucket, batch_format="pyarrow"))


def time_weighted_sum(ds, *, key_col: str = "user_id", ts_col: str = "ts",
                      seq_col: str = "event_id", value_col: str = "value_fp",
                      num_buckets: int = 256):
    """Time-weighted usage integral per key (metering/billing): each
    observation holds until the key's next one (LOCF), contributing
    value * dt_us; the key's last observation contributes nothing (no
    horizon assumed).  Values are caller-scaled int64 fixed-point, so the
    integral is exact int64 (dt in us: keep |value| * total_span_us below
    2^63).  Returns Dataset[<key_col>, tw_sum, span_us, n_obs].

    One groupby(part) shuffle; per bucket a single lexsort + shifted-diff
    segment kernel with np.add.at per-key accumulation — final output per
    bucket, no second shuffle.
    """
    from ..util import knuth_bucket

    def prep(t: pa.Table) -> pa.Table:
        key = np.asarray(t[key_col].combine_chunks(), dtype=np.int64)
        return pa.table({
            "key": pa.array(key, pa.int64()),
            "ts_us": pc.cast(pc.cast(t[ts_col], pa.timestamp("us")),
                             pa.int64()),
            "seq": pc.cast(t[seq_col], pa.int64()),
            "v": pc.cast(t[value_col], pa.int64()),
            "part": pa.array(knuth_bucket(key, num_buckets), pa.int64()),
        })

    empty = pa.table({key_col: pa.array([], pa.int64()),
                      "tw_sum": pa.array([], pa.int64()),
                      "span_us": pa.array([], pa.int64()),
                      "n_obs": pa.array([], pa.int64())})

    def per_bucket(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty
        key = np.asarray(t["key"].combine_chunks(), dtype=np.int64)
        ts = np.asarray(t["ts_us"].combine_chunks(), dtype=np.int64)
        sq = np.asarray(t["seq"].combine_chunks(), dtype=np.int64)
        v = np.asarray(t["v"].combine_chunks(), dtype=np.int64)
        o = np.lexsort((sq, ts, key))
        key, ts, v = key[o], ts[o], v[o]
        uniq, inv = np.unique(key, return_inverse=True)
        inv = inv.astype(np.int64, copy=False)
        same = key[1:] == key[:-1]
        contrib = np.where(same, v[:-1] * (ts[1:] - ts[:-1]), 0)
        tw = np.zeros(uniq.size, np.int64)
        np.add.at(tw, inv[:-1], contrib)
        span = np.zeros(uniq.size, np.int64)
        np.add.at(span, inv[:-1], np.where(same, ts[1:] - ts[:-1], 0))
        n = np.zeros(uniq.size, np.int64)
        np.add.at(n, inv, 1)
        return pa.table({key_col: pa.array(uniq, pa.int64()),
                         "tw_sum": pa.array(tw, pa.int64()),
                         "span_us": pa.array(span, pa.int64()),
                         "n_obs": pa.array(n, pa.int64())})

    return (ds.map_batches(prep, batch_format="pyarrow")
            .groupby("part").map_groups(per_bucket, batch_format="pyarrow"))


def changelog_compact(ds, *, key_col: str = "user_id", ts_col: str = "ts",
                      seq_col: str = "event_id", op_col: str = "op",
                      delete_op: str = "D", num_buckets: int = 256):
    """CDC changelog compaction (the Iceberg/Delta MERGE semantics as a
    batch op): per key the row with the greatest (ts, seq) wins; if the
    winner's op equals ``delete_op`` the key vanishes from the output.
    ALL payload columns ride along unchanged — the result is the final
    table state after replaying the log.

    Two-level plan: each input batch compacts locally first (argmax per
    key via one lexsort — deletes are KEPT locally so they can still
    outrank older upserts from other batches), shrinking the shuffle to at
    most keys-per-batch rows; the bucketed final pass re-runs the same
    kernel and drops delete winners.  One shuffle total.
    """
    from ..util import knuth_bucket

    def compact_kernel(t: pa.Table, drop_deletes: bool) -> pa.Table:
        key = np.asarray(t[key_col].combine_chunks(), dtype=np.int64)
        ts = np.asarray(
            pc.cast(pc.cast(t[ts_col], pa.timestamp("us")), pa.int64()),
            dtype=np.int64)
        sq = np.asarray(t[seq_col].combine_chunks(), dtype=np.int64)
        o = np.lexsort((sq, ts, key))
        ks = key[o]
        last = np.flatnonzero(
            np.concatenate([ks[1:] != ks[:-1], [True]]))
        out = t.take(pa.array(o[last], pa.int64()))
        if drop_deletes:
            out = out.filter(
                pc.invert(pc.equal(out[op_col], pa.scalar(delete_op))))
        return out

    def local(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        t = compact_kernel(t, drop_deletes=False)
        key = np.asarray(t[key_col].combine_chunks(), dtype=np.int64)
        return t.append_column(
            "part", pa.array(knuth_bucket(key, num_buckets), pa.int64()))

    def final(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["part"])
        if t.num_rows == 0:
            return t
        return compact_kernel(t, drop_deletes=True)

    return (ds.map_batches(local, batch_format="pyarrow")
            .groupby("part").map_groups(final, batch_format="pyarrow"))


def event_thinning(ds, *, key_col: str = "user_id", ts_col: str = "ts",
                   seq_col: str = "event_id", window_us: int,
                   num_buckets: int = 256):
    """Telemetry thinning: keep only the FIRST event (by (ts, seq)) per key
    per fixed time window of ``window_us`` (tumbling, epoch-aligned:
    window = ts_us // window_us).  The standard ping-rate cap before
    expensive downstream joins.  Returns the surviving rows with all their
    columns plus the window id.

    Two-level plan like changelog_compact: batch-local winners first (one
    lexsort + unique on packed (key, window)), so the single bucketed
    shuffle carries at most one row per (key, window) per batch.
    """
    from ..util import knuth_bucket

    w = np.int64(window_us)
    if w <= 0:
        raise ValueError("window_us must be positive")

    def winners(t: pa.Table) -> pa.Table:
        key = np.asarray(t[key_col].combine_chunks(), dtype=np.int64)
        ts = np.asarray(
            pc.cast(pc.cast(t[ts_col], pa.timestamp("us")), pa.int64()),
            dtype=np.int64)
        sq = np.asarray(t[seq_col].combine_chunks(), dtype=np.int64)
        win = np.floor_divide(ts, w)
        o = np.lexsort((sq, ts, win, key))
        ks, ws = key[o], win[o]
        first = np.concatenate(
            [[True], (ks[1:] != ks[:-1]) | (ws[1:] != ws[:-1])])
        take = o[first]
        out = t.take(pa.array(take, pa.int64()))
        if "win_id" not in out.column_names:
            out = out.append_column("win_id", pa.array(win[take], pa.int64()))
        return out

    def local(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        t = winners(t)
        key = np.asarray(t[key_col].combine_chunks(), dtype=np.int64)
        return t.append_column(
            "part", pa.array(knuth_bucket(key, num_buckets), pa.int64()))

    def final(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["part"])
        if t.num_rows == 0:
            return t
        return winners(t)

    return (ds.map_batches(local, batch_format="pyarrow")
            .groupby("part").map_groups(final, batch_format="pyarrow"))
