"""Spatial interpolation over kNN join results.

IDW (inverse-distance weighting, Shepard 1968) in FIXED POINT: weights are
w = min(floor(1e9 / d^2), 1e12) as int64 (the cap handles coincident and
near-coincident points without overflow), so the per-query weighted sums
are integer — order-independent, bit-exact against a SQL twin — while the
distance itself keeps full float64 precision from the exact kNN join.

Scale shape: composes with ANY kNN join output (broadcast or partitioned
plan) as one map_batches (values attached by broadcast sorted lookup under
a threshold, hash join beyond) + one pre-aggregated groupby(big) — the
shuffle carries one partial row per touched query point per batch.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

W_CAP = 1_000_000_000_000  # weight cap: also the d == 0 weight
# |value| bound keeping every int64 sum exact: W_CAP * V_MAX * k must stay
# under 2^63, so V_MAX = 4e6 supports up to ~2300 neighbors per query point
# (ADVICE r3: unchecked, w*v overflowed silently past |v| ~ 9.2e6)
V_MAX = 4_000_000


def _weights(d: np.ndarray) -> np.ndarray:
    with np.errstate(divide="ignore"):
        wf = np.where(d == 0.0, np.inf, np.floor(1e9 / (d * d)))
    return np.minimum(wf, float(W_CAP)).astype(np.int64)


def idw_interpolate(knn_ds, values, *, value_col: str = "value",
                    broadcast_threshold_rows: int = 5_000_000):
    """Inverse-distance-weighted interpolation: for each query point of a
    kNN join result Dataset[big_row_id, small_row_id, distance, ...], the
    weighted value of its neighbors.  ``values`` is a Dataset[small_row_id,
    value(int64)].  Returns Dataset[big_row_id, idw_num, idw_den,
    idw_milli] with idw_milli = (1000 * sum(w*v)) // sum(w)."""
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    from .dedup import _num_join_partitions

    values = values.materialize()

    def partial(t: pa.Table) -> pa.Table:
        big = np.asarray(t["big_row_id"].combine_chunks(), dtype=np.int64)
        d = np.asarray(t["distance"].combine_chunks(), dtype=np.float64)
        v = np.asarray(t[value_col].combine_chunks(), dtype=np.int64)
        if v.size and int(np.abs(v).max()) > V_MAX:
            raise ValueError(
                f"idw_interpolate: |{value_col}| exceeds {V_MAX}; the fixed-"
                "point weighted sums would overflow int64 (pre-scale the "
                "values or lower the weight cap)")
        w = _weights(d)
        uniq, inv = np.unique(big, return_inverse=True)
        num = np.zeros(uniq.size, np.int64)
        den = np.zeros(uniq.size, np.int64)
        np.add.at(num, inv, w * v)
        np.add.at(den, inv, w)
        return pa.table({
            "big_row_id": pa.array(uniq, pa.int64()),
            "num": pa.array(num, pa.int64()),
            "den": pa.array(den, pa.int64()),
        })

    if values.count() <= broadcast_threshold_rows:
        tabs = [t for t in ray.get(values.to_arrow_refs()) if t.num_rows]
        if tabs:
            tbl = pa.concat_tables(tabs)
            sid = np.asarray(tbl["small_row_id"], dtype=np.int64)
            val = np.asarray(tbl[value_col], dtype=np.int64)
        else:
            sid = np.empty(0, np.int64)
            val = np.empty(0, np.int64)
        order = np.argsort(sid)
        ref = ray.put((sid[order], val[order]))

        def attach(t: pa.Table) -> pa.Table:
            ks, vs = ray.get(ref)
            s = np.asarray(t["small_row_id"].combine_chunks(), dtype=np.int64)
            pos = np.clip(np.searchsorted(ks, s), 0, max(ks.size - 1, 0))
            if ks.size == 0 or not (ks[pos] == s).all():
                raise KeyError("idw_interpolate: neighbor id missing from values")
            return t.append_column(value_col, pa.array(vs[pos], pa.int64()))

        parts = knn_ds.map_batches(attach, batch_format="pyarrow").map_batches(
            partial, batch_format="pyarrow")
    else:
        j = knn_ds.join(values, "inner", _num_join_partitions(),
                        on=("small_row_id",))
        parts = j.map_batches(partial, batch_format="pyarrow")

    sums = (
        parts.groupby("big_row_id")
        .aggregate(Sum("num", alias_name="idw_num"), Sum("den", alias_name="idw_den"))
    )

    def finish(t: pa.Table) -> pa.Table:
        num = np.asarray(t["idw_num"].combine_chunks(), dtype=np.int64)
        den = np.asarray(t["idw_den"].combine_chunks(), dtype=np.int64)
        if den.size and int(den.min()) == 0:
            # every neighbor farther than ~sqrt(1e9) units quantizes to
            # weight 0 (ADVICE r3: numpy int division by zero silently
            # yields 0 where the SQL twin errors) — raise with the cause
            bad = np.asarray(t["big_row_id"].combine_chunks(), np.int64)[den == 0][:3]
            raise ValueError(
                "idw_interpolate: all neighbor weights quantized to 0 for "
                f"query points {bad.tolist()} (every neighbor farther than "
                "~31623 units); enlarge the weight scale or cap the kNN "
                "max_distance")
        return t.append_column(
            "idw_milli", pa.array((1000 * num) // den, pa.int64()))

    return sums.map_batches(finish, batch_format="pyarrow")
