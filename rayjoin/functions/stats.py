"""Distributed exact statistics over keyed columns.

Exact per-group quantiles cannot pre-aggregate (any value can be the
quantile), so the shuffle volume is inherently the pruned (key, value)
projection — two int64 columns, not the input table.  The wide step is one
``groupby(bucket)`` over ``num_buckets`` hash buckets; inside a bucket ALL
keys are reduced with one lexsort + segmented index arithmetic (zero Python
calls per key — the bucketed-merge pattern, see functions/stream.py).

Quantile rule: ``quantile_disc`` semantics — the element at 0-based sorted
index ``max(ceil(q*n) - 1, 0)`` within its group, matching DuckDB exactly so
gate rows hash-MATCH.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def grouped_quantiles(ds, *, key_col: str, val_col: str,
                      qs: tuple[float, ...] = (0.25, 0.5, 0.9),
                      num_buckets: int = 256, pre_aggregate: bool = False):
    """Exact per-key quantiles of an int64 value column.

    Returns Dataset[key_col, n, q<pct> per q] — one row per distinct key,
    one ``q25``-style int64 column per requested quantile (pct = round(q*100);
    callers needing finer labels pass distinct rounded percents).

    Keys hash into ``num_buckets`` shuffle buckets; each bucket computes
    every key's quantiles with one lexsort over (key, value) + one vectorized
    gather per q.  At 100 TB the only wide step is the 2-column shuffle;
    buckets are balanced by the avalanche-mixed key hash, and a hot key
    costs its group's sort share, never a Python loop.

    ``pre_aggregate=True`` combines each batch into (key, value, count)
    partials BEFORE the shuffle and computes weighted quantiles from count
    cumsums per bucket — byte-identical output, but shuffle volume drops
    from O(rows) to O(distinct (key, value) pairs per batch).  The right
    mode when the value domain repeats (scores, bucketed sizes, milli
    units); pointless for unique-per-row values.
    """
    if not qs:
        raise ValueError("qs must be non-empty")
    if any(not (0.0 <= q <= 1.0) for q in qs):
        raise ValueError(f"quantile fractions must be in [0, 1]: {qs}")
    labels = [f"q{round(q * 100)}" for q in qs]
    if len(set(labels)) != len(labels):
        raise ValueError(f"quantile labels collide after rounding: {labels}")
    reserved = {"val", "cnt", "part", "n", *labels}
    if key_col in reserved:
        raise ValueError(f"key_col {key_col!r} collides with an internal column")

    def prep(t: pa.Table) -> pa.Table:
        from ..util import knuth_bucket

        t = pa.table(
            {key_col: t[key_col], "val": pc.cast(t[val_col], pa.int64())}
        )
        if pre_aggregate:
            t = t.group_by([key_col, "val"]).aggregate([([], "count_all")])
            # select by NAME (key/aggregate column order is a pyarrow
            # implementation detail) before the positional rename
            t = t.select([key_col, "val", "count_all"])
            t = t.rename_columns([key_col, "val", "cnt"])
        key = np.asarray(t[key_col].combine_chunks(), dtype=np.int64)
        part = knuth_bucket(key, num_buckets)
        return t.append_column("part", pa.array(part, pa.int64()))

    empty = pa.table(
        {key_col: pa.array([], pa.int64()),
         "n": pa.array([], pa.int64()),
         **{lab: pa.array([], pa.int64()) for lab in labels}}
    )

    def per_bucket(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty
        key = np.asarray(t[key_col].combine_chunks(), dtype=np.int64)
        val = np.asarray(t["val"].combine_chunks(), dtype=np.int64)
        cnt = (np.asarray(t["cnt"].combine_chunks(), dtype=np.int64)
               if pre_aggregate else np.ones(key.size, np.int64))
        order = np.lexsort((val, key))
        key, val, cnt = key[order], val[order], cnt[order]
        starts = np.flatnonzero(
            np.concatenate([[True], key[1:] != key[:-1]])
        )
        ccum = np.cumsum(cnt)
        base = np.concatenate([[0], ccum[starts[1:] - 1]]) \
            if starts.size > 1 else np.zeros(starts.size, np.int64)
        ends = np.concatenate([starts[1:], [key.size]])
        counts = ccum[ends - 1] - base
        cols = {key_col: pa.array(key[starts], pa.int64()),
                "n": pa.array(counts, pa.int64())}
        for q, lab in zip(qs, labels):
            # quantile_disc: the value whose cumulative count first reaches
            # rank max(ceil(q*n), 1) within the group
            rank = np.ceil(q * counts).astype(np.int64)
            np.clip(rank, 1, counts, out=rank)
            # first sorted position where (ccum - base) >= rank
            pos = np.searchsorted(ccum, base + rank, side="left")
            cols[lab] = pa.array(val[pos], pa.int64())
        return pa.table(cols)

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("part")
        .map_groups(per_bucket, batch_format="pyarrow")
    )
