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
                      num_buckets: int = 256):
    """Exact per-key quantiles of an int64 value column.

    Returns Dataset[key_col, n, q<pct> per q] — one row per distinct key,
    one ``q25``-style int64 column per requested quantile (pct = round(q*100);
    callers needing finer labels pass distinct rounded percents).

    Keys hash into ``num_buckets`` shuffle buckets; each bucket computes
    every key's quantiles with one lexsort over (key, value) + one vectorized
    gather per q.  At 100 TB the only wide step is the 2-column shuffle;
    buckets are balanced by the avalanche-mixed key hash, and a hot key
    costs its group's sort share, never a Python loop.
    """
    if not qs:
        raise ValueError("qs must be non-empty")
    labels = [f"q{round(q * 100)}" for q in qs]
    if len(set(labels)) != len(labels):
        raise ValueError(f"quantile labels collide after rounding: {labels}")

    def prep(t: pa.Table) -> pa.Table:
        from ..util import knuth_bucket

        key = np.asarray(t[key_col].combine_chunks(), dtype=np.int64)
        part = knuth_bucket(key, num_buckets)
        return pa.table(
            {
                key_col: t[key_col],
                "val": pc.cast(t[val_col], pa.int64()),
                "part": pa.array(part, pa.int64()),
            }
        )

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
        order = np.lexsort((val, key))
        key, val = key[order], val[order]
        starts = np.flatnonzero(
            np.concatenate([[True], key[1:] != key[:-1]])
        )
        counts = np.diff(np.concatenate([starts, [key.size]]))
        cols = {key_col: pa.array(key[starts], pa.int64()),
                "n": pa.array(counts, pa.int64())}
        for q, lab in zip(qs, labels):
            # quantile_disc: 0-based index max(ceil(q*n)-1, 0) in the group
            idx = np.ceil(q * counts).astype(np.int64) - 1
            np.clip(idx, 0, counts - 1, out=idx)
            cols[lab] = pa.array(val[starts + idx], pa.int64())
        return pa.table(cols)

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("part")
        .map_groups(per_bucket, batch_format="pyarrow")
    )
