"""Spatial-autocorrelation statistics over point geometries.

Local Moran's I (Anselin 1995, "Local indicators of spatial association —
LISA") expressed over the engine's existing scale primitives, the same way
DBSCAN is (functions/cluster.py):

  neighbor pairs (binary W, d-band)  -> the PBSM partitioned proximity
                                        SELF-join (rayjoin/join/partitioned.py)
  value lookup for the small side    -> broadcast sorted-array tier under a
                                        row cap (ray.put once, searchsorted in
                                        map_batches), hash-join tier above
  per-point lag sums                 -> per-batch Arrow partials + ONE groupby
                                        (the shuffle carries (row_id, cnt,
                                        sum) partials, never the pair list)

Everything is INTEGER-exact so the SQL twin hash-matches: values are int64,
the weights are binary (w_ij = 1 iff 0 < dist(i,j) <= d, inclusive — the
same predicate as proximity_map), and the mean is never divided out.
With n = #points and S = sum(val):

    z_num_i   = n*val_i - S              ( = n   * (val_i - mean) )
    lag_num_i = n*sum_{j in N(i)} val_j - |N(i)|*S
                                         ( = n   * sum_j (val_j - mean) )

so the real local Moran numerator z_i * sum_j w_ij z_j equals
z_num_i * lag_num_i / n^2 — recoverable downstream without ever leaving
int64 here.  Caller contract for no-overflow: n * max|val| * (1 + max
neighborhood size) < 2^63 (document values are small codes/counts, not raw
micro-quantities).

100 TB shape: one proximity-join shuffle + one (row_id, cnt, sum) groupby;
the values table rides as a broadcast object under ``broadcast_rows``
(default 16M rows = 256 MiB of id+val pairs) and as two hash joins above it.
No driver materialization anywhere; the only driver scalars are n and S
(one tiny aggregate).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_LAG_EMPTY = pa.table({
    "row_id": pa.array([], pa.int64()),
    "val": pa.array([], pa.int64()),
    "nbrs": pa.array([], pa.int64()),
    "lag_sum": pa.array([], pa.int64()),
})


def spatial_lag(points, values, *, max_distance: float,
                target_cells: int = 256,
                broadcast_rows: int = 16_000_000):
    """Per-point d-band neighbor count and value sum.

    ``points``: Dataset/Table of point geometries (row_id/geom_type/coords,
    as built by ``geom.encode.points_geom``; row_ids unique).
    ``values``: Dataset/Table[row_id:int64, val:int64] — one row per point.

    Returns Dataset[row_id, val, nbrs, lag_sum] covering EVERY point:
    ``nbrs`` = #{j != i : dist(i,j) <= max_distance} (inclusive, the
    proximity_map predicate), ``lag_sum`` = sum of val_j over those j.
    Isolated points come back with nbrs = 0, lag_sum = 0 (the self-pair the
    proximity join always emits keeps them in the aggregate; its own val is
    subtracted back out per group).
    """
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    from ..config import Config
    from ..join.partitioned import partitioned_proximity_map
    from ..util import drop_schemaless_empty_blocks
    from .dedup import _num_join_partitions

    pts = ray.data.from_arrow(points) if isinstance(points, pa.Table) else points
    vals = ray.data.from_arrow(values) if isinstance(values, pa.Table) else values
    pts = pts.materialize()
    vals = vals.materialize()

    pairs = partitioned_proximity_map(
        pts, pts, Config(max_distance=float(max_distance)),
        target_cells=target_cells)
    pairs = pairs.map_batches(
        lambda t: t.select(["big_row_id", "small_row_id"]),
        batch_format="pyarrow")
    pairs = drop_schemaless_empty_blocks(
        pairs, pa.table({"big_row_id": pa.array([], pa.int64()),
                         "small_row_id": pa.array([], pa.int64())}))

    n_vals = vals.count()

    if n_vals <= broadcast_rows:
        # broadcast tier: (sorted ids, vals) built in a Ray task — the
        # driver never holds them — read once per worker via ray.get.
        @ray.remote(num_cpus=0)
        def _sorted_lookup(*tabs):
            keep = [x for x in tabs if x.num_rows]
            if not keep:
                return np.empty(0, np.int64), np.empty(0, np.int64)
            t = pa.concat_tables(keep)
            k = np.asarray(t["row_id"], dtype=np.int64)
            v = np.asarray(t["val"], dtype=np.int64)
            o = np.argsort(k, kind="stable")
            return k[o], v[o]

        lut_ref = _sorted_lookup.remote(*vals.to_arrow_refs())

        def partial(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table({"row_id": pa.array([], pa.int64()),
                                 "cnt": pa.array([], pa.int64()),
                                 "sumv": pa.array([], pa.int64())})
            k, v = ray.get(lut_ref)
            big = np.asarray(t["big_row_id"].combine_chunks(), np.int64)
            small = np.asarray(t["small_row_id"].combine_chunks(), np.int64)
            vs = v[np.searchsorted(k, small)]
            # group within the batch: sort by big id, segment-reduce
            o = np.argsort(big, kind="stable")
            big, vs = big[o], vs[o]
            starts = np.flatnonzero(np.concatenate(
                [[True], big[1:] != big[:-1]]))
            cnt = np.diff(np.concatenate([starts, [big.size]]))
            sums = np.add.reduceat(vs, starts)
            return pa.table({"row_id": pa.array(big[starts], pa.int64()),
                             "cnt": pa.array(cnt, pa.int64()),
                             "sumv": pa.array(sums, pa.int64())})

        agg = (pairs.map_batches(partial, batch_format="pyarrow")
               .groupby("row_id")
               .aggregate(Sum("cnt", alias_name="cnt"),
                          Sum("sumv", alias_name="sumv")))

        def finish(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return _LAG_EMPTY
            k, v = ray.get(lut_ref)
            ids = np.asarray(t["row_id"].combine_chunks(), np.int64)
            own = v[np.searchsorted(k, ids)]
            cnt = np.asarray(t["cnt"].combine_chunks(), np.int64)
            sumv = np.asarray(t["sumv"].combine_chunks(), np.int64)
            return pa.table({"row_id": pa.array(ids, pa.int64()),
                             "val": pa.array(own, pa.int64()),
                             "nbrs": pa.array(cnt - 1, pa.int64()),
                             "lag_sum": pa.array(sumv - own, pa.int64())})

        return agg.map_batches(finish, batch_format="pyarrow")

    # join tier: correct at any size — one hash join of the pair list
    # against values (small_row_id), partial-agg, then one join of the
    # O(n)-row aggregate against values for the self-subtract.
    nparts = _num_join_partitions(pairs, vals)
    v_small = vals.map_batches(
        lambda t: t.rename_columns(["small_row_id", "v_small"]),
        batch_format="pyarrow")
    joined = pairs.join(v_small, "inner", nparts, on=("small_row_id",))

    def partial_j(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"row_id": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64()),
                             "sumv": pa.array([], pa.int64())})
        g = t.group_by("big_row_id").aggregate(
            [("v_small", "count"), ("v_small", "sum")])
        return pa.table({"row_id": g["big_row_id"].cast(pa.int64()),
                         "cnt": g["v_small_count"].cast(pa.int64()),
                         "sumv": g["v_small_sum"].cast(pa.int64())})

    from ray.data.aggregate import Sum as _Sum
    agg = (joined.map_batches(partial_j, batch_format="pyarrow")
           .groupby("row_id")
           .aggregate(_Sum("cnt", alias_name="cnt"),
                      _Sum("sumv", alias_name="sumv")))
    agg = drop_schemaless_empty_blocks(
        agg, pa.table({"row_id": pa.array([], pa.int64()),
                       "cnt": pa.array([], pa.int64()),
                       "sumv": pa.array([], pa.int64())}))
    out = agg.join(vals, "inner", nparts, on=("row_id",))

    def finish_j(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _LAG_EMPTY
        ids = np.asarray(t["row_id"].combine_chunks(), np.int64)
        own = np.asarray(t["val"].combine_chunks(), np.int64)
        cnt = np.asarray(t["cnt"].combine_chunks(), np.int64)
        sumv = np.asarray(t["sumv"].combine_chunks(), np.int64)
        return pa.table({"row_id": pa.array(ids, pa.int64()),
                         "val": pa.array(own, pa.int64()),
                         "nbrs": pa.array(cnt - 1, pa.int64()),
                         "lag_sum": pa.array(sumv - own, pa.int64())})

    return out.map_batches(finish_j, batch_format="pyarrow")


def ripley_k(points, *, radii, target_cells: int = 256):
    """Unnormalized Ripley's K pair counts (Ripley 1976): for each radius
    r in ``radii`` (ascending), the number of ORDERED pairs (i, j), i != j,
    with dist(i, j) <= r (inclusive — the proximity_map predicate).  The
    K estimate itself is |A| * pairs / n^2, derivable downstream; emitting
    the exact integer numerator keeps the SQL twin hash-exact.

    One PBSM proximity SELF-join at max(radii) produces every candidate
    pair once (with its bit-exact ``distance`` — the same sqrt expression
    the SQL oracle uses, parity established by the prox_points rows); each
    batch then collapses to ONE row per radius (a <=-threshold histogram),
    so the only shuffle after the join carries len(radii) rows per block.
    A zeros base rides along in the union so radii with no pairs still
    come back as 0 (the LEFT JOIN semantics of the twin) with no driver
    materialization.

    Returns Dataset[r_code:int64 (1-based index), radius:float64,
    pairs:int64].
    """
    import ray.data
    from ray.data.aggregate import Sum

    from ..config import Config
    from ..join.partitioned import partitioned_proximity_map

    rr = [float(r) for r in radii]
    if not rr or sorted(rr) != rr:
        raise ValueError("radii must be a non-empty ascending sequence")
    r_codes = np.arange(1, len(rr) + 1, dtype=np.int64)
    r_arr = np.asarray(rr, dtype=np.float64)

    pts = ray.data.from_arrow(points) if isinstance(points, pa.Table) else points
    pts = pts.materialize()
    pairs = partitioned_proximity_map(
        pts, pts, Config(max_distance=rr[-1]), target_cells=target_cells)

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"r_code": pa.array([], pa.int64()),
                             "pairs": pa.array([], pa.int64())})
        big = np.asarray(t["big_row_id"].combine_chunks(), np.int64)
        small = np.asarray(t["small_row_id"].combine_chunks(), np.int64)
        d = np.asarray(t["distance"].combine_chunks(), np.float64)
        d = d[big != small]
        # counts per radius: searchsorted on the sorted distances gives
        # #{d <= r} for every r in one shot (side="right" = inclusive)
        cnt = np.searchsorted(np.sort(d), r_arr, side="right").astype(np.int64)
        return pa.table({"r_code": pa.array(r_codes, pa.int64()),
                         "pairs": pa.array(cnt, pa.int64())})

    zeros = ray.data.from_arrow(pa.table({
        "r_code": pa.array(r_codes, pa.int64()),
        "pairs": pa.array(np.zeros(len(rr), np.int64), pa.int64()),
    }))
    agg = (pairs.map_batches(partial, batch_format="pyarrow")
           .union(zeros)
           .groupby("r_code")
           .aggregate(Sum("pairs", alias_name="pairs")))

    lut = {int(c): r for c, r in zip(r_codes, rr)}

    def finish(t: pa.Table) -> pa.Table:
        codes = np.asarray(t["r_code"].combine_chunks(), np.int64)
        return pa.table({
            "r_code": pa.array(codes, pa.int64()),
            "radius": pa.array([lut[int(c)] for c in codes], pa.float64()),
            "pairs": t["pairs"].cast(pa.int64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def getis_ord(points, values, *, max_distance: float,
              target_cells: int = 256,
              broadcast_rows: int = 16_000_000):
    """Integer-exact Getis-Ord Gi* hot-spot numerators (Getis & Ord 1992;
    Ord & Getis 1995) under the same binary d-band weights as
    ``local_moran``, INCLUDING self (the * variant).  With n = #points and
    S = sum(val), the z-score numerator sum_j w*_ij val_j - mean * W*_i
    scales by n to the exact int64

        g_num_i = n * (lag_sum_i + val_i) - (nbrs_i + 1) * S

    (W*_i = nbrs_i + 1 is emitted too — the denominator's only
    data-dependent term besides the global S, S2 scalars).  Same
    no-overflow contract and 100 TB shape as local_moran: one proximity
    shuffle + one partial-aggregated groupby via ``spatial_lag``.

    Returns Dataset[row_id, w_star, g_num].
    """
    import ray.data

    vals = ray.data.from_arrow(values) if isinstance(values, pa.Table) else values
    vals = vals.materialize()
    from ray.data.aggregate import Count, Sum
    stats = vals.aggregate(Count(alias_name="n"), Sum("val", alias_name="s"))
    n = int(stats["n"])
    s = int(stats["s"] or 0)

    lag = spatial_lag(points, vals, max_distance=max_distance,
                      target_cells=target_cells,
                      broadcast_rows=broadcast_rows)
    nn = pa.scalar(n, pa.int64())
    ss = pa.scalar(s, pa.int64())
    one = pa.scalar(1, pa.int64())

    def score(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        w_star = pc.add_checked(t["nbrs"].cast(pa.int64()), one)
        inc = pc.add_checked(t["lag_sum"].cast(pa.int64()),
                             t["val"].cast(pa.int64()))
        return pa.table({
            "row_id": t["row_id"].cast(pa.int64()),
            "w_star": w_star,
            "g_num": pc.subtract_checked(pc.multiply_checked(inc, nn),
                                         pc.multiply_checked(w_star, ss)),
        })

    return lag.map_batches(score, batch_format="pyarrow")


def local_moran(points, values, *, max_distance: float,
                target_cells: int = 256,
                broadcast_rows: int = 16_000_000):
    """Integer-exact local Moran's I numerators (see module docstring).

    Returns Dataset[row_id, nbrs, z_num, lag_num] with
    z_num = n*val - S and lag_num = n*lag_sum - nbrs*S (both int64;
    caller guarantees n * max|val| * (1 + max nbrs) < 2^63).
    The global Moran's I is sum(z_num*lag_num) / (n^2 * W0 * var-ish
    normalizers) — all derivable downstream from these exact parts.
    """
    import ray.data
    from ray.data.aggregate import Count, Sum

    vals = ray.data.from_arrow(values) if isinstance(values, pa.Table) else values
    vals = vals.materialize()
    stats = vals.aggregate(Count(alias_name="n"), Sum("val", alias_name="s"))
    n = int(stats["n"])
    s = int(stats["s"] or 0)

    lag = spatial_lag(points, vals, max_distance=max_distance,
                      target_cells=target_cells,
                      broadcast_rows=broadcast_rows)
    nn = pa.scalar(n, pa.int64())
    ss = pa.scalar(s, pa.int64())

    def score(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({
            "row_id": t["row_id"].cast(pa.int64()),
            "nbrs": t["nbrs"].cast(pa.int64()),
            "z_num": pc.subtract_checked(
                pc.multiply_checked(t["val"].cast(pa.int64()), nn), ss),
            "lag_num": pc.subtract_checked(
                pc.multiply_checked(t["lag_sum"].cast(pa.int64()), nn),
                pc.multiply_checked(t["nbrs"].cast(pa.int64()), ss)),
        })

    return lag.map_batches(score, batch_format="pyarrow")
