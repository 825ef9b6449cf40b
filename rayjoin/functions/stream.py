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
               ts_col: str = "ts", value_col: str = "value"):
    """Session windows per key: a new session starts when the gap to the
    previous event (ordered by ts, event_id) STRICTLY exceeds ``gap_minutes``.

    Returns Dataset[user_id, session_id, n_events, session_start,
    session_end, sum_value_milli] with session_id 1-based per key.
    """
    gap = np.timedelta64(gap_minutes * 60, "s")

    def prep(t: pa.Table) -> pa.Table:
        vm = pc.cast(pc.floor(pc.multiply(t[value_col], 1000.0)), pa.int64())
        return pa.table(
            {
                key_col: t[key_col],
                ts_col: pc.cast(t[ts_col], pa.timestamp("us")),
                "event_id": t["event_id"],
                "value_milli": vm,
            }
        )

    def per_key(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([ts_col, "event_id"], kind="mergesort").reset_index(drop=True)
        prev = df[ts_col].shift(1)
        new_sess = (df[ts_col] - prev > gap) | prev.isna()
        sess = new_sess.cumsum()
        out = (
            df.assign(session_id=sess)
            .groupby("session_id", as_index=False)
            .agg(
                n_events=("event_id", "size"),
                session_start=(ts_col, "min"),
                session_end=(ts_col, "max"),
                sum_value_milli=("value_milli", "sum"),
            )
        )
        out.insert(0, key_col, df[key_col].iloc[0])
        return out

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(key_col)
        .map_groups(per_key, batch_format="pandas")
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
