"""Trajectory segmentation over per-key ping streams (events with lon/lat).

``track_speed`` turns (key, ts, seq, lon, lat) pings into per-segment
speed rows — the building block for GPS track analytics (speed profiles,
moving/stationary splits, stay-point detection downstream).

Plan shape (the sessionize lesson, functions/stream.py): keys hash into
``num_buckets`` shuffle buckets and EACH BUCKET processes all its keys with
one lexsort + vectorized segment kernels — never a per-key Python call.
One groupby(part) shuffle total; everything else is map_batches.

Exactness contract (engine == SQL under any plan):
  * ordering per key is (ts, seq) — total, so deterministic;
  * segment distance is the great-circle CHORD in fixed-point micro-meters,
    floor(1e6 * 2R*sqrt(hav)) — the polyline_chord_length kernel
    (join/geodesic.py), bit-exact vs the SQL twin's identical expression;
  * speed_mm_s = (dist_micro * 1000) // max(dt_us, 1) — integer division,
    zero-gap (duplicate-timestamp) segments clamp the divisor to 1 rather
    than raising; dist*1000 <= 2e16 for any terrestrial segment, no
    overflow.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def track_speed(ds, *, key_col: str = "user_id", ts_col: str = "ts",
                seq_col: str = "event_id", lon_col: str = "lon",
                lat_col: str = "lat", moving_mm_s: int = 1000,
                num_buckets: int = 256):
    """Per-key consecutive-ping segments with chord distance and speed.

    Returns Dataset[<key_col>, seg_idx, dt_us, dist_micro, speed_mm_s,
    moving] — seg_idx 1-based per key (segment i joins ping i and i+1 in
    (ts, seq) order), ``moving`` = speed_mm_s >= ``moving_mm_s``.
    Keys with a single ping emit nothing.
    """
    from ..join.geodesic import EARTH_RADIUS_M, _hav
    from ..util import knuth_bucket

    out_empty = pa.table({
        key_col: pa.array([], pa.int64()),
        "seg_idx": pa.array([], pa.int64()),
        "dt_us": pa.array([], pa.int64()),
        "dist_micro": pa.array([], pa.int64()),
        "speed_mm_s": pa.array([], pa.int64()),
        "moving": pa.array([], pa.bool_()),
    })

    def prep(t: pa.Table) -> pa.Table:
        key = np.asarray(t[key_col].combine_chunks(), dtype=np.int64)
        return pa.table({
            key_col: t[key_col],
            ts_col: pc.cast(t[ts_col], pa.timestamp("us")),
            seq_col: t[seq_col],
            lon_col: pc.cast(t[lon_col], pa.float64()),
            lat_col: pc.cast(t[lat_col], pa.float64()),
            "part": pa.array(knuth_bucket(key, num_buckets), pa.int64()),
        })

    thr = np.int64(moving_mm_s)

    def per_bucket(t: pa.Table) -> pa.Table:
        if t.num_rows < 2:
            return out_empty
        key = np.asarray(t[key_col].combine_chunks(), dtype=np.int64)
        ts = np.asarray(t[ts_col].combine_chunks().cast(pa.int64()),
                        dtype=np.int64)
        sq = np.asarray(t[seq_col].combine_chunks(), dtype=np.int64)
        lon = np.asarray(t[lon_col].combine_chunks(), dtype=np.float64)
        lat = np.asarray(t[lat_col].combine_chunks(), dtype=np.float64)
        o = np.lexsort((sq, ts, key))
        key, ts, lon, lat = key[o], ts[o], lon[o], lat[o]
        same = key[1:] == key[:-1]  # segment i joins row i and i+1
        if not same.any():
            return out_empty
        a = np.flatnonzero(same)
        h = _hav(lat[a], lon[a], lat[a + 1], lon[a + 1])
        dist = np.floor(
            1_000_000 * ((2.0 * EARTH_RADIUS_M) * np.sqrt(h))
        ).astype(np.int64)
        dt = ts[a + 1] - ts[a]
        speed = (dist * np.int64(1000)) // np.maximum(dt, np.int64(1))
        # 1-based segment index within each key (a is sorted; key[a] groups)
        grp_start = np.concatenate([[True], key[a][1:] != key[a][:-1]])
        idx = np.arange(a.size, dtype=np.int64)
        seg_idx = idx - np.repeat(idx[grp_start], np.diff(
            np.concatenate([np.flatnonzero(grp_start), [a.size]]))) + 1
        return pa.table({
            key_col: pa.array(key[a], pa.int64()),
            "seg_idx": pa.array(seg_idx, pa.int64()),
            "dt_us": pa.array(dt, pa.int64()),
            "dist_micro": pa.array(dist, pa.int64()),
            "speed_mm_s": pa.array(speed, pa.int64()),
            "moving": pa.array(speed >= thr),
        })

    return (ds.map_batches(prep, batch_format="pyarrow")
            .groupby("part")
            .map_groups(per_bucket, batch_format="pyarrow"))


def od_matrix(ds, *, key_col: str = "user_id", ts_col: str = "ts",
              seq_col: str = "event_id", state_col: str = "tile_id",
              num_buckets: int = 256):
    """Origin-destination matrix over per-key ordered spatial states: every
    adjacent ping pair (ordered by (ts, seq) within key) contributes one
    count to its (from_tile, to_tile) cell — the mobility-analytics OD
    matrix (trips between zones), with tiles standing in for zones.

    Same plan as transition_counts (functions/stream.py) but for int64
    states: one groupby(part) shuffle of (key, ts, seq, state) light rows;
    each bucket lexsorts once, masks key boundaries with one shifted
    compare, packs pairs into int64 (``from << 32 | to`` — tile ids are
    < 2^31 at any resolution <= 15), and pre-aggregates with np.unique so
    the final groupby sums OD-cell-sized partials, never ping-sized rows.
    Self-transitions (consecutive pings in the same tile) count.

    Returns Dataset[from_tile, to_tile, n].
    """
    from ..util import knuth_bucket

    def prep(t: pa.Table) -> pa.Table:
        key = np.asarray(t[key_col].combine_chunks(), dtype=np.int64)
        return pa.table({
            "key": pa.array(key, pa.int64()),
            "ts_us": pc.cast(pc.cast(t[ts_col], pa.timestamp("us")),
                             pa.int64()),
            "seq": t[seq_col],
            "state": pc.cast(t[state_col], pa.int64()),
            "part": pa.array(knuth_bucket(key, num_buckets), pa.int64()),
        })

    empty = pa.table({"from_tile": pa.array([], pa.int64()),
                      "to_tile": pa.array([], pa.int64()),
                      "n_partial": pa.array([], pa.int64())})

    def per_bucket(t: pa.Table) -> pa.Table:
        if t.num_rows < 2:
            return empty
        key = np.asarray(t["key"].combine_chunks(), dtype=np.int64)
        ts = np.asarray(t["ts_us"].combine_chunks(), dtype=np.int64)
        sq = np.asarray(t["seq"].combine_chunks(), dtype=np.int64)
        st = np.asarray(t["state"].combine_chunks(), dtype=np.int64)
        if (st < 0).any() or (st >> 31).any():
            raise ValueError("od_matrix states must fit in uint31")
        order = np.lexsort((sq, ts, key))
        key, st = key[order], st[order]
        same = key[1:] == key[:-1]
        pk = (st[:-1][same] << 32) | st[1:][same]
        if not pk.size:
            return empty
        uniq, counts = np.unique(pk, return_counts=True)
        return pa.table({
            "from_tile": pa.array(uniq >> 32, pa.int64()),
            "to_tile": pa.array(uniq & 0x7FFFFFFF, pa.int64()),
            "n_partial": pa.array(counts.astype(np.int64), pa.int64()),
        })

    from ray.data.aggregate import Sum

    return (ds.map_batches(prep, batch_format="pyarrow")
            .groupby("part").map_groups(per_bucket, batch_format="pyarrow")
            .groupby(["from_tile", "to_tile"])
            .aggregate(Sum("n_partial", alias_name="n")))


def bearing_rose(ds, *, key_col: str = "user_id", ts_col: str = "ts",
                 seq_col: str = "event_id", lon_col: str = "lon",
                 lat_col: str = "lat", num_buckets: int = 256):
    """Per-key travel-direction rose: each consecutive ping pair (ordered
    by (ts, seq) within key) is classified into one of 8 half-open angular
    octants — sector 0 = [E, NE), 1 = [NE, N), ... 7 = [SE, E) over the
    PLANAR displacement (dx = Δlon, dy = Δlat; the planar contract is the
    same as tiles.py) — or sector -1 for zero-displacement ("still")
    segments.  Returns Dataset[<key_col>, sector, n].

    Exactness: the octant ladder uses COMPARISONS ONLY (dy < dx, -dx >= dy,
    ...) — no atan2, no constants — evaluated top-down in the same order as
    the SQL twin's CASE ladder, so boundary segments (45-degree multiples)
    classify identically everywhere.

    Plan: one groupby(part) shuffle of light (key, ts, seq, lon, lat) rows;
    keys hash whole into buckets, so each bucket's np.unique over packed
    (key, sector) is FINAL — no second shuffle.
    """
    from ..util import knuth_bucket

    def prep(t: pa.Table) -> pa.Table:
        key = np.asarray(t[key_col].combine_chunks(), dtype=np.int64)
        return pa.table({
            "key": pa.array(key, pa.int64()),
            "ts_us": pc.cast(pc.cast(t[ts_col], pa.timestamp("us")),
                             pa.int64()),
            "seq": t[seq_col],
            "lon": pc.cast(t[lon_col], pa.float64()),
            "lat": pc.cast(t[lat_col], pa.float64()),
            "part": pa.array(knuth_bucket(key, num_buckets), pa.int64()),
        })

    empty = pa.table({key_col: pa.array([], pa.int64()),
                      "sector": pa.array([], pa.int64()),
                      "n": pa.array([], pa.int64())})

    def per_bucket(t: pa.Table) -> pa.Table:
        if t.num_rows < 2:
            return empty
        key = np.asarray(t["key"].combine_chunks(), dtype=np.int64)
        ts = np.asarray(t["ts_us"].combine_chunks(), dtype=np.int64)
        sq = np.asarray(t["seq"].combine_chunks(), dtype=np.int64)
        lon = np.asarray(t["lon"].combine_chunks(), dtype=np.float64)
        lat = np.asarray(t["lat"].combine_chunks(), dtype=np.float64)
        o = np.lexsort((sq, ts, key))
        key, lon, lat = key[o], lon[o], lat[o]
        same = key[1:] == key[:-1]
        if not same.any():
            return empty
        a = np.flatnonzero(same)
        dx = lon[a + 1] - lon[a]
        dy = lat[a + 1] - lat[a]
        # top-down octant ladder, comparisons only (mirrors the SQL CASE)
        sec = np.select(
            [
                (dx == 0) & (dy == 0),
                (dx > 0) & (dy >= 0) & (dy < dx),
                (dx > 0) & (dy >= dx),
                (dx <= 0) & (dy > 0) & (-dx < dy),
                (dy > 0) & (-dx >= dy),
                (dx < 0) & (dy <= 0) & (-dy < -dx),
                (dx < 0) & (-dy >= -dx),
                (dy < 0) & (dx >= 0) & (dx < -dy),
            ],
            [-1, 0, 1, 2, 3, 4, 5, 6],
            default=7,
        ).astype(np.int64)
        # pack (key, sector) for one-pass counting: sector+1 in 4 bits
        if (key[a] < 0).any() or (key[a] >> 59).any():
            raise ValueError("bearing_rose keys must fit in uint59")
        pk = (key[a] << 4) | (sec + 1)
        uniq, counts = np.unique(pk, return_counts=True)
        return pa.table({
            key_col: pa.array(uniq >> 4, pa.int64()),
            "sector": pa.array((uniq & 0xF).astype(np.int64) - 1, pa.int64()),
            "n": pa.array(counts.astype(np.int64), pa.int64()),
        })

    return (ds.map_batches(prep, batch_format="pyarrow")
            .groupby("part")
            .map_groups(per_bucket, batch_format="pyarrow"))


def dwell_episodes(ds, *, key_col: str = "user_id", ts_col: str = "ts",
                   seq_col: str = "event_id", lon_col: str = "lon",
                   lat_col: str = "lat", slow_mm_s: int = 1000,
                   num_buckets: int = 256):
    """Stop (dwell) detection: maximal runs of CONSECUTIVE slow segments
    per key — segments with speed_mm_s < ``slow_mm_s``, speed defined
    exactly as track_speed (chord micro-meters, integer division).
    Returns Dataset[<key_col>, ep_idx, start_us, end_us, n_segs,
    dist_micro]: episode index 1-based per key in time order, start/end
    int64 microseconds, total chord length.

    The gaps-and-islands kernel is vectorized RLE: island starts where a
    slow segment follows a key boundary, a ping gap, or a fast segment;
    per-island aggregation is np.add.at over the island index.  One
    groupby(part) shuffle (keys live whole in their bucket), so per-bucket
    episodes are final.
    """
    from ..join.geodesic import EARTH_RADIUS_M, _hav
    from ..util import knuth_bucket

    def prep(t: pa.Table) -> pa.Table:
        key = np.asarray(t[key_col].combine_chunks(), dtype=np.int64)
        return pa.table({
            "key": pa.array(key, pa.int64()),
            "ts_us": pc.cast(pc.cast(t[ts_col], pa.timestamp("us")),
                             pa.int64()),
            "seq": t[seq_col],
            "lon": pc.cast(t[lon_col], pa.float64()),
            "lat": pc.cast(t[lat_col], pa.float64()),
            "part": pa.array(knuth_bucket(key, num_buckets), pa.int64()),
        })

    empty = pa.table({key_col: pa.array([], pa.int64()),
                      "ep_idx": pa.array([], pa.int64()),
                      "start_us": pa.array([], pa.int64()),
                      "end_us": pa.array([], pa.int64()),
                      "n_segs": pa.array([], pa.int64()),
                      "dist_micro": pa.array([], pa.int64())})

    thr = np.int64(slow_mm_s)

    def per_bucket(t: pa.Table) -> pa.Table:
        if t.num_rows < 2:
            return empty
        key = np.asarray(t["key"].combine_chunks(), dtype=np.int64)
        ts = np.asarray(t["ts_us"].combine_chunks(), dtype=np.int64)
        sq = np.asarray(t["seq"].combine_chunks(), dtype=np.int64)
        lon = np.asarray(t["lon"].combine_chunks(), dtype=np.float64)
        lat = np.asarray(t["lat"].combine_chunks(), dtype=np.float64)
        o = np.lexsort((sq, ts, key))
        key, ts, lon, lat = key[o], ts[o], lon[o], lat[o]
        same = key[1:] == key[:-1]
        if not same.any():
            return empty
        a = np.flatnonzero(same)                      # segment = rows a, a+1
        h = _hav(lat[a], lon[a], lat[a + 1], lon[a + 1])
        dist = np.floor(
            1_000_000 * ((2.0 * EARTH_RADIUS_M) * np.sqrt(h))
        ).astype(np.int64)
        dt = ts[a + 1] - ts[a]
        speed = (dist * np.int64(1000)) // np.maximum(dt, np.int64(1))
        slow = speed < thr
        if not slow.any():
            return empty
        adjacent = np.concatenate([[False], a[1:] == a[:-1] + 1])
        prev_slow = np.concatenate([[False], slow[:-1]])
        starts = slow & ~(adjacent & prev_slow)
        isl = np.cumsum(starts) - 1                   # island id per segment
        srow = np.flatnonzero(slow)
        sisl = isl[srow]
        n_isl = int(isl[srow[-1]]) + 1
        n_segs = np.zeros(n_isl, np.int64)
        dsum = np.zeros(n_isl, np.int64)
        np.add.at(n_segs, sisl, 1)
        np.add.at(dsum, sisl, dist[srow])
        # sisl is non-decreasing (islands are created in segment order), so
        # unique's first-index gives each island's first slow row directly
        _, fidx = np.unique(sisl, return_index=True)
        lidx = np.concatenate([fidx[1:], [sisl.size]]) - 1
        first = srow[fidx]
        last = srow[lidx]
        ikey = key[a[first]]
        start_us = ts[a[first]]
        end_us = ts[a[last] + 1]
        # 1-based episode index per key (islands are in (key, time) order)
        grp_start = np.concatenate([[True], ikey[1:] != ikey[:-1]])
        idx = np.arange(n_isl, dtype=np.int64)
        ep_idx = idx - np.repeat(idx[grp_start], np.diff(
            np.concatenate([np.flatnonzero(grp_start), [n_isl]]))) + 1
        return pa.table({
            key_col: pa.array(ikey, pa.int64()),
            "ep_idx": pa.array(ep_idx, pa.int64()),
            "start_us": pa.array(start_us, pa.int64()),
            "end_us": pa.array(end_us, pa.int64()),
            "n_segs": pa.array(n_segs, pa.int64()),
            "dist_micro": pa.array(dsum, pa.int64()),
        })

    return (ds.map_batches(prep, batch_format="pyarrow")
            .groupby("part")
            .map_groups(per_bucket, batch_format="pyarrow"))


def copresence_pairs(ds, *, key_col: str = "user_id", cx_col: str = "cx",
                     cy_col: str = "cy", window_col: str = "w",
                     min_shared: int = 1, num_buckets: int = 256,
                     max_cell_keys: int | None = 100_000,
                     out_cols: tuple = ("user_a", "user_b", "n_shared")):
    """Spatio-temporal co-occurrence join: pairs of keys observed in the
    same (cell, time-window) at least ``min_shared`` DISTINCT windows-cells.

    Input rows are (key, cx, cy, w) cell assignments from ANY upstream
    tiling stage (tile_assign / hex_assign / s2_assign / geohash all emit
    compatible integer cells); duplicates are fine — presence is counted
    once per (key, cell, window).  Output: Dataset[user_a, user_b,
    n_shared] with user_a < user_b.

    Plan (the LSH-banding shape re-pointed at space-time cells): per-batch
    local distinct -> ONE groupby(bucket-of-cell) shuffle -> per-bucket
    global distinct + per-(cell,w) i<j pair expansion + partial pair counts
    -> groupby(pair).sum -> filter >= min_shared.  Pair expansion per cell
    is O(occupancy^2) BY SEMANTICS (every co-present pair is an output
    candidate); ``max_cell_keys`` fail-fasts with a clear error when a
    single (cell, window) holds more keys than that — choose cells sized to
    physical density instead of capping silently (a silent cap would change
    the counts)."""
    import ray.data
    from ray.data.aggregate import Sum

    from ..util import knuth_bucket

    out_empty = pa.table({
        "user_a": pa.array([], pa.int64()),
        "user_b": pa.array([], pa.int64()),
        "n": pa.array([], pa.int64()),
    })

    def prep(t: pa.Table) -> pa.Table:
        key = np.asarray(t[key_col].combine_chunks(), dtype=np.int64)
        cx = np.asarray(t[cx_col].combine_chunks(), dtype=np.int64)
        cy = np.asarray(t[cy_col].combine_chunks(), dtype=np.int64)
        w = np.asarray(t[window_col].combine_chunks(), dtype=np.int64)
        # local distinct (the partial-aggregation rule: shrink before the
        # shuffle; duplicate presences are common in ping streams)
        o = np.lexsort((key, w, cy, cx))
        key, cx, cy, w = key[o], cx[o], cy[o], w[o]
        if key.size:
            keep = np.concatenate([[True], (key[1:] != key[:-1]) | (cx[1:] != cx[:-1])
                                   | (cy[1:] != cy[:-1]) | (w[1:] != w[:-1])])
            key, cx, cy, w = key[keep], cx[keep], cy[keep], w[keep]
        with np.errstate(over="ignore"):
            mix = cx * np.int64(-7046029254386353131) ^ cy * np.int64(
                2654435761) ^ w * np.int64(40503)
        return pa.table({
            key_col: pa.array(key, pa.int64()),
            "cx": pa.array(cx, pa.int64()),
            "cy": pa.array(cy, pa.int64()),
            "w": pa.array(w, pa.int64()),
            "part": pa.array(knuth_bucket(mix, num_buckets), pa.int64()),
        })

    def per_bucket(t: pa.Table) -> pa.Table:
        key = np.asarray(t[key_col].combine_chunks(), dtype=np.int64)
        cx = np.asarray(t["cx"].combine_chunks(), dtype=np.int64)
        cy = np.asarray(t["cy"].combine_chunks(), dtype=np.int64)
        w = np.asarray(t["w"].combine_chunks(), dtype=np.int64)
        o = np.lexsort((key, w, cy, cx))
        key, cx, cy, w = key[o], cx[o], cy[o], w[o]
        if not key.size:
            return out_empty
        # global distinct (all rows of a cell land in this bucket)
        keep = np.concatenate([[True], (key[1:] != key[:-1]) | (cx[1:] != cx[:-1])
                               | (cy[1:] != cy[:-1]) | (w[1:] != w[:-1])])
        key, cx, cy, w = key[keep], cx[keep], cy[keep], w[keep]
        new_grp = np.concatenate([[True], (cx[1:] != cx[:-1]) | (cy[1:] != cy[:-1])
                                  | (w[1:] != w[:-1])])
        starts = np.flatnonzero(new_grp)
        sizes = np.diff(np.concatenate([starts, [key.size]]))
        if max_cell_keys is not None and sizes.size and sizes.max() > max_cell_keys:
            raise ValueError(
                f"a single (cell, window) holds {int(sizes.max())} keys "
                f"(> max_cell_keys={max_cell_keys}); use smaller cells/windows "
                "or raise the cap — capping silently would change the counts")
        out_a, out_b = [], []
        for st, m in zip(starts[sizes >= 2], sizes[sizes >= 2]):
            # mask-free i<j expansion (keys ascend within the group, so
            # user_a < user_b by construction)
            cnts = np.arange(m - 1, 0, -1)
            ia = np.repeat(np.arange(m - 1), cnts)
            ib = np.arange(m * (m - 1) // 2) - (np.cumsum(cnts) - cnts)[ia] + ia + 1
            out_a.append(key[st + ia])
            out_b.append(key[st + ib])
        if not out_a:
            return out_empty
        a = np.concatenate(out_a)
        b = np.concatenate(out_b)
        # partial per-bucket pair counts shrink the final shuffle
        g = (pa.table({"user_a": pa.array(a, pa.int64()),
                       "user_b": pa.array(b, pa.int64())})
             .group_by(["user_a", "user_b"]).aggregate([("user_a", "count")]))
        return pa.table({"user_a": g["user_a"], "user_b": g["user_b"],
                         "n": g["user_a_count"].cast(pa.int64())})

    agg = (ds.map_batches(prep, batch_format="pyarrow")
           .groupby("part").map_groups(per_bucket, batch_format="pyarrow")
           .groupby(["user_a", "user_b"]).aggregate(Sum("n", alias_name="n_shared")))
    thr = int(min_shared)
    ca, cb, cn = out_cols

    def finish(t: pa.Table) -> pa.Table:
        # rebuild (rather than rename) so an all-empty aggregate — whose
        # blocks can arrive schemaless at tiny scale — still emits the
        # declared output schema
        if t.num_rows == 0 or "user_a" not in t.column_names:
            return pa.table({ca: pa.array([], pa.int64()),
                             cb: pa.array([], pa.int64()),
                             cn: pa.array([], pa.int64())})
        t = t.filter(pc.greater_equal(t["n_shared"], thr))
        return pa.table({ca: t["user_a"].cast(pa.int64()),
                         cb: t["user_b"].cast(pa.int64()),
                         cn: t["n_shared"].cast(pa.int64())})

    return agg.map_batches(finish, batch_format="pyarrow")


def hausdorff_pairs(ds, *, nv: int, id_col: str = "track_id",
                    cell_col: str = "cell", max_pairs_per_cell: int = 2_000_000):
    """Discrete HAUSDORFF distance between candidate track pairs — the
    trajectory-similarity join.  Input: one row per fixed-length track
    with flat vertex columns x0,y0..x{nv-1},y{nv-1} plus a BLOCKING cell
    id (tracks only compare within a cell; the blocking rule is part of
    the result contract, mirrored by the SQL twin).  Output:
    Dataset[id_a, id_b, hausdorff] for every in-cell pair id_a < id_b,
    H = max(h(A->B), h(B->A)), h directed = max over A's vertices of the
    min distance to B's vertices.

    One groupby(cell) shuffle; each cell expands its pairs and evaluates
    the (pairs, nv, nv) distance tensor fully vectorized.  Only
    comparisons and one sqrt touch the doubles, so values hash-match the
    SQL twin bit-for-bit.  ``max_pairs_per_cell`` bounds the per-group
    quadratic expansion (a hot cell raises rather than OOMs — pick a finer
    blocking cell, the standard skew answer for similarity joins)."""
    cols = [f"{a}{j}" for j in range(nv) for a in ("x", "y")]

    empty = pa.table({"id_a": pa.array([], pa.int64()),
                      "id_b": pa.array([], pa.int64()),
                      "hausdorff": pa.array([], pa.float64())})

    def per_cell(t: pa.Table) -> pa.Table:
        if t.num_rows < 2:
            return empty
        ids = np.asarray(t[id_col].combine_chunks(), dtype=np.int64)
        cell = np.asarray(t[cell_col].combine_chunks(), dtype=np.int64)
        V = np.empty((ids.size, nv, 2), np.float64)
        for j in range(nv):
            V[:, j, 0] = np.asarray(t[f"x{j}"].combine_chunks(), dtype=np.float64)
            V[:, j, 1] = np.asarray(t[f"y{j}"].combine_chunks(), dtype=np.float64)
        # group rows by cell (map_groups may hand several cells per call),
        # order ids within cell so pairs are (min, max)
        order = np.lexsort((ids, cell))
        ids, cell, V = ids[order], cell[order], V[order]
        starts = np.flatnonzero(np.concatenate([[True], cell[1:] != cell[:-1]]))
        sizes = np.diff(np.concatenate([starts, [cell.size]]))
        total = int((sizes * (sizes - 1) // 2).sum())
        if total == 0:
            return empty
        if total > max_pairs_per_cell:
            raise ValueError(
                f"hausdorff_pairs: {total} pairs in one shuffle group exceeds "
                f"max_pairs_per_cell={max_pairs_per_cell}; use a finer blocking cell")
        ia = np.empty(total, np.int64)
        ib = np.empty(total, np.int64)
        pos = 0
        for st, m in zip(starts[sizes >= 2], sizes[sizes >= 2]):
            cnts = np.arange(m - 1, 0, -1)
            pa_ = np.repeat(np.arange(m - 1), cnts)
            pb_ = np.arange(m * (m - 1) // 2) - (np.cumsum(cnts) - cnts)[pa_] + pa_ + 1
            k = pa_.size
            ia[pos:pos + k] = st + pa_
            ib[pos:pos + k] = st + pb_
            pos += k
        A, B = V[ia], V[ib]                       # (p, nv, 2)
        diff = A[:, :, None, :] - B[:, None, :, :]  # (p, nv, nv, 2)
        d = np.sqrt(diff[..., 0] * diff[..., 0] + diff[..., 1] * diff[..., 1])
        h_ab = d.min(axis=2).max(axis=1)
        h_ba = d.min(axis=1).max(axis=1)
        return pa.table({
            "id_a": pa.array(ids[ia], pa.int64()),
            "id_b": pa.array(ids[ib], pa.int64()),
            "hausdorff": pa.array(np.maximum(h_ab, h_ba), pa.float64()),
        })

    return (ds.select_columns([id_col, cell_col] + cols)
            .groupby(cell_col).map_groups(per_cell, batch_format="pyarrow"))
