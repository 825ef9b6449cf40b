"""track_speed differential tests vs a per-key brute-force reference."""

import numpy as np
import pyarrow as pa

from rayjoin.functions.trajectory import track_speed
from rayjoin.join.geodesic import EARTH_RADIUS_M, _hav


def brute(key, ts, seq, lon, lat):
    rows = []
    for k in np.unique(key):
        m = key == k
        o = np.lexsort((seq[m], ts[m]))
        t, lo, la = ts[m][o], lon[m][o], lat[m][o]
        for i in range(len(t) - 1):
            h = _hav(np.array([la[i]]), np.array([lo[i]]),
                     np.array([la[i + 1]]), np.array([lo[i + 1]]))[0]
            dist = int(np.floor(1_000_000 * (2.0 * EARTH_RADIUS_M) * np.sqrt(h)))
            dt = int(t[i + 1] - t[i])
            speed = (dist * 1000) // max(dt, 1)
            rows.append((int(k), i + 1, dt, dist, speed, speed >= 1000))
    return sorted(rows)


def test_track_speed_matches_brute(ray_session):
    import ray.data

    rng = np.random.default_rng(3)
    n = 400
    key = rng.integers(0, 25, n).astype(np.int64)
    ts = rng.integers(0, 10_000_000_000, n).astype(np.int64)
    seq = np.arange(n, dtype=np.int64)
    lon = rng.uniform(-179, 179, n)
    lat = rng.uniform(-79, 79, n)
    # force duplicate timestamps within one key (dt == 0 clamps to 1)
    key[:4] = 99
    ts[:4] = 42

    t = pa.table({
        "user_id": pa.array(key, pa.int64()),
        "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
        "event_id": pa.array(seq, pa.int64()),
        "lon": pa.array(lon, pa.float64()),
        "lat": pa.array(lat, pa.float64()),
    })
    out = (track_speed(ray.data.from_arrow(t).repartition(4), num_buckets=8)
           .to_pandas())
    got = sorted(
        (int(r.user_id), int(r.seg_idx), int(r.dt_us), int(r.dist_micro),
         int(r.speed_mm_s), bool(r.moving))
        for r in out.itertuples())
    assert got == brute(key, ts, seq, lon, lat)


def test_single_ping_keys_emit_nothing(ray_session):
    import ray.data

    t = pa.table({
        "user_id": pa.array([1, 2, 3], pa.int64()),
        "ts": pa.array([10, 20, 30], pa.int64()).cast(pa.timestamp("us")),
        "event_id": pa.array([0, 1, 2], pa.int64()),
        "lon": pa.array([0.0, 1.0, 2.0]),
        "lat": pa.array([0.0, 1.0, 2.0]),
    })
    out = track_speed(ray.data.from_arrow(t), num_buckets=4).to_pandas()
    assert len(out) == 0


def test_od_matrix_matches_brute(ray_session):
    import ray.data
    from collections import Counter

    from rayjoin.functions.trajectory import od_matrix

    rng = np.random.default_rng(7)
    n = 600
    key = rng.integers(0, 30, n).astype(np.int64)
    ts = rng.integers(0, 5_000_000_000, n).astype(np.int64)
    seq = np.arange(n, dtype=np.int64)
    tile = rng.integers(0, 12, n).astype(np.int64)  # few tiles -> repeats
    # duplicate timestamps within one key (seq breaks the tie)
    key[:5] = 77
    ts[:5] = 1000

    ref = Counter()
    for k in np.unique(key):
        m = key == k
        o = np.lexsort((seq[m], ts[m]))
        tl = tile[m][o]
        for i in range(len(tl) - 1):
            ref[(int(tl[i]), int(tl[i + 1]))] += 1

    t = pa.table({
        "user_id": pa.array(key, pa.int64()),
        "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
        "event_id": pa.array(seq, pa.int64()),
        "tile_id": pa.array(tile, pa.int64()),
    })
    out = od_matrix(ray.data.from_arrow(t).repartition(4),
                    num_buckets=8).to_pandas()
    got = {(int(r.from_tile), int(r.to_tile)): int(r.n)
           for r in out.itertuples()}
    assert got == dict(ref)


def test_od_matrix_rejects_wide_states(ray_session):
    import pytest
    import ray.data

    from rayjoin.functions.trajectory import od_matrix

    t = pa.table({
        "user_id": pa.array([1, 1], pa.int64()),
        "ts": pa.array([1, 2], pa.int64()).cast(pa.timestamp("us")),
        "event_id": pa.array([0, 1], pa.int64()),
        "tile_id": pa.array([1, 1 << 40], pa.int64()),
    })
    with pytest.raises(Exception, match="uint31"):
        od_matrix(ray.data.from_arrow(t), num_buckets=2).materialize()


def test_bearing_rose_vs_atan2_octants(ray_session):
    """The comparison-only octant ladder reproduces floor(atan2/45deg)
    exactly — including zero displacements (sector -1) and exact
    45-degree boundaries from grid-snapped coordinates."""
    import collections
    import math

    import pyarrow as pa
    import ray.data

    from rayjoin.functions.trajectory import bearing_rose

    rng = np.random.default_rng(9)
    n = 4000
    key = rng.integers(0, 40, n).astype(np.int64)
    ts = rng.integers(0, 10**9, n).astype(np.int64)
    seq = np.arange(n, dtype=np.int64)
    lon = rng.integers(-5, 6, n).astype(np.float64)
    lat = rng.integers(-5, 6, n).astype(np.float64)
    t = pa.table({"user_id": key, "ts": pa.array(ts, pa.timestamp("us")),
                  "event_id": seq, "lon": lon, "lat": lat})
    out = bearing_rose(ray.data.from_arrow(t).repartition(5)).to_pandas()
    got = {(r.user_id, r.sector): r.n for r in out.itertuples()}

    def octant(dx, dy):
        if dx == 0 and dy == 0:
            return -1
        return int((math.atan2(dy, dx) % (2 * math.pi)) // (math.pi / 4)) % 8

    exp = collections.Counter()
    order = np.lexsort((seq, ts, key))
    k2, lo2, la2 = key[order], lon[order], lat[order]
    for i in range(n - 1):
        if k2[i] == k2[i + 1]:
            exp[(k2[i], octant(lo2[i + 1] - lo2[i], la2[i + 1] - la2[i]))] += 1
    assert got == dict(exp)


def test_dwell_episodes_vs_track_speed_runs(ray_session):
    """Episodes reconstruct exactly from track_speed's (already
    oracle-pinned) segments: same runs, bounds, counts, distances."""
    import collections

    import pyarrow as pa
    import ray.data

    from rayjoin.functions.trajectory import dwell_episodes, track_speed

    rng = np.random.default_rng(3)
    n = 3000
    key = rng.integers(0, 30, n).astype(np.int64)
    ts = np.sort(rng.integers(0, 10**10, n)).astype(np.int64)
    seq = np.arange(n, dtype=np.int64)
    lon = rng.uniform(-1, 1, n)
    lat = rng.uniform(-1, 1, n)
    t = pa.table({"user_id": key, "ts": pa.array(ts, pa.timestamp("us")),
                  "event_id": seq, "lon": lon, "lat": lat})
    ds = ray.data.from_arrow(t).repartition(5)
    thr = 50_000_000

    out = (dwell_episodes(ds, slow_mm_s=thr).to_pandas()
           .sort_values(["user_id", "ep_idx"]).reset_index(drop=True))

    segs = track_speed(ds, moving_mm_s=thr).to_pandas()
    o = np.lexsort((seq, ts, key))
    k2, t2 = key[o], ts[o]
    eps = []
    for uid, g in segs.groupby("user_id"):
        g = g.sort_values("seg_idx")
        rows = np.flatnonzero(k2 == uid)
        run = []
        for _, r in g.iterrows():
            i = int(r.seg_idx) - 1
            if r.speed_mm_s < thr:
                run.append((t2[rows[i]], t2[rows[i + 1]], r.dist_micro))
            elif run:
                eps.append((uid, run)); run = []
        if run:
            eps.append((uid, run))
    exp, cnt = [], collections.Counter()
    for uid, run in eps:
        cnt[uid] += 1
        exp.append((uid, cnt[uid], run[0][0], run[-1][1], len(run),
                    sum(x[2] for x in run)))
    exp.sort()
    got = [tuple(map(int, r)) for r in out.itertuples(index=False)]
    assert got == exp and exp


def test_copresence_pairs_matches_brute(ray_session):
    """copresence_pairs vs a brute itertools count over distinct presences,
    including duplicate presence rows (counted once) and the min_shared
    filter."""
    import collections
    import itertools

    import ray.data

    from rayjoin.functions.trajectory import copresence_pairs

    rng = np.random.default_rng(7)
    n = 4000
    key = rng.integers(0, 40, n).astype(np.int64)
    cx = rng.integers(0, 4, n).astype(np.int64)
    cy = rng.integers(0, 3, n).astype(np.int64)
    w = rng.integers(0, 5, n).astype(np.int64)
    t = pa.table({"user_id": pa.array(key), "cx": pa.array(cx),
                  "cy": pa.array(cy), "w": pa.array(w)})
    ds = ray.data.from_arrow(t).repartition(6)

    presences = collections.defaultdict(set)
    for i in range(n):
        presences[(cx[i], cy[i], w[i])].add(int(key[i]))
    cnt = collections.Counter()
    for cell, users in presences.items():
        for a, b in itertools.combinations(sorted(users), 2):
            cnt[(a, b)] += 1

    for min_shared in (1, 3):
        got = (copresence_pairs(ds, min_shared=min_shared, num_buckets=8)
               .to_pandas().sort_values(["user_a", "user_b"]))
        exp = sorted((a, b, c) for (a, b), c in cnt.items() if c >= min_shared)
        assert [tuple(map(int, r)) for r in got.itertuples(index=False)] == exp
        assert exp  # non-trivial fixture


def test_copresence_pairs_cell_cap_fail_fast(ray_session):
    import ray.data

    from rayjoin.functions.trajectory import copresence_pairs

    n = 50
    t = pa.table({"user_id": pa.array(np.arange(n, dtype=np.int64)),
                  "cx": pa.array(np.zeros(n, np.int64)),
                  "cy": pa.array(np.zeros(n, np.int64)),
                  "w": pa.array(np.zeros(n, np.int64))})
    ds = ray.data.from_arrow(t)
    with np.testing.assert_raises(Exception):
        copresence_pairs(ds, max_cell_keys=10).to_pandas()
    # and the documented remedy works: raising the cap completes
    out = copresence_pairs(ds, max_cell_keys=None).to_pandas()
    assert len(out) == n * (n - 1) // 2


def test_hausdorff_pairs_vs_brute(ray_session):
    import ray.data

    from rayjoin.functions.trajectory import hausdorff_pairs

    rng = np.random.default_rng(31)
    n, nv = 40, 4
    cell = rng.integers(0, 5, n).astype(np.int64)
    V = rng.uniform(-50, 50, (n, nv, 2))
    cols = {"track_id": pa.array(np.arange(n), pa.int64()),
            "cell": pa.array(cell, pa.int64())}
    for j in range(nv):
        cols[f"x{j}"] = pa.array(V[:, j, 0], pa.float64())
        cols[f"y{j}"] = pa.array(V[:, j, 1], pa.float64())
    out = (hausdorff_pairs(ray.data.from_arrow(pa.table(cols)).repartition(3),
                           nv=nv)
           .to_pandas().set_index(["id_a", "id_b"])["hausdorff"].to_dict())

    def brute_h(a, b):
        import math
        d = [[math.sqrt((a[j][0]-b[k][0])**2 + (a[j][1]-b[k][1])**2)
              for k in range(nv)] for j in range(nv)]
        hab = max(min(row) for row in d)
        hba = max(min(d[j][k] for j in range(nv)) for k in range(nv))
        return max(hab, hba)

    exp = {}
    for i in range(n):
        for j in range(i + 1, n):
            if cell[i] == cell[j]:
                exp[(i, j)] = brute_h(V[i], V[j])
    assert set(out) == set(exp)
    for key in exp:
        assert out[key] == exp[key]  # bit-exact: comparisons + one sqrt


def test_hausdorff_pairs_cap_raises(ray_session):
    import ray.data
    import pytest

    from rayjoin.functions.trajectory import hausdorff_pairs

    n, nv = 30, 2
    cols = {"track_id": pa.array(np.arange(n), pa.int64()),
            "cell": pa.array(np.zeros(n, np.int64), pa.int64())}
    for j in range(nv):
        cols[f"x{j}"] = pa.array(np.random.default_rng(1).uniform(0, 1, n))
        cols[f"y{j}"] = pa.array(np.random.default_rng(2).uniform(0, 1, n))
    ds = ray.data.from_arrow(pa.table(cols))
    with pytest.raises(Exception, match="finer blocking cell"):
        hausdorff_pairs(ds, nv=nv, max_pairs_per_cell=10).materialize()
