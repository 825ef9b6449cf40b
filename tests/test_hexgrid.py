"""Hex-grid binning: round trips, neighbor structure, rounding invariants."""
import numpy as np

from rayjoin.stages.hexgrid import (
    hex_center,
    hex_neighbors,
    hex_pack,
    hex_qr,
    hex_unpack,
)


def test_center_round_trip():
    """The center of every assigned hex maps back to the same hex."""
    rng = np.random.default_rng(9)
    lon = rng.uniform(-180, 180, 5000)
    lat = rng.uniform(-90, 90, 5000)
    size = 1.5
    q, r = hex_qr(lon, lat, size)
    hid = hex_pack(q, r)
    cx, cy = hex_center(hid, size)
    q2, r2 = hex_qr(cx, cy, size)
    assert (q2 == q).all() and (r2 == r).all()
    uq, ur = hex_unpack(hid)
    assert (uq == q).all() and (ur == r).all()


def test_nearest_center_property():
    """Each point is assigned to the hex whose center is nearest (ties
    aside): check against the 7-candidate neighborhood."""
    rng = np.random.default_rng(10)
    lon = rng.uniform(-50, 50, 2000)
    lat = rng.uniform(-50, 50, 2000)
    size = 2.0
    q, r = hex_qr(lon, lat, size)
    own = hex_pack(q, r)
    cx, cy = hex_center(own, size)
    d_own = (lon - cx) ** 2 + (lat - cy) ** 2
    nb = hex_neighbors(own)
    for k in range(6):
        nx, ny = hex_center(nb[:, k], size)
        d_nb = (lon - nx) ** 2 + (lat - ny) ** 2
        assert (d_own <= d_nb + 1e-9).all()


def test_neighbors_symmetric_and_distinct():
    rng = np.random.default_rng(11)
    hid = hex_pack(rng.integers(-100, 100, 50), rng.integers(-100, 100, 50))
    nb = hex_neighbors(hid)
    assert all(len(set(row)) == 6 for row in nb)
    for i, h in enumerate(hid):
        for x in nb[i]:
            assert h in hex_neighbors(np.array([x]))[0]


def test_geohash_canonical_and_prefix_property():
    """The canonical Wikipedia example encodes exactly; higher precision
    extends (never rewrites) the prefix; neighbors in space share prefixes."""
    from rayjoin.stages.geohash import geohash_code, geohash_strings

    lat, lon = np.array([57.64911]), np.array([10.40744])
    for p, want in ((6, "u4pruy"), (11, "u4pruydqqvj")):
        c = geohash_code(lat, lon, p)
        assert geohash_strings(c, p).to_pylist() == [want]
    rng = np.random.default_rng(12)
    lats = rng.uniform(-89, 89, 300)
    lons = rng.uniform(-179, 179, 300)
    g6 = geohash_strings(geohash_code(lats, lons, 6), 6).to_pylist()
    g9 = geohash_strings(geohash_code(lats, lons, 9), 9).to_pylist()
    assert all(b.startswith(a) for a, b in zip(g6, g9))


def test_hex_kring_sum_vs_bruteforce(ray_session):
    """K-ring disc sums match per-cell brute force for k = 0, 1, 2; only
    occupied cells appear; n_cells counts occupied disc members."""
    import collections

    import pyarrow as pa
    import ray.data

    from rayjoin.stages.hexgrid import hex_kring_sum, kring_offsets

    rng = np.random.default_rng(5)
    n, size = 3000, 2.5
    lon = rng.uniform(-30, 30, n)
    lat = rng.uniform(-20, 20, n)
    val = rng.integers(0, 100, n).astype(np.int64)
    ds = ray.data.from_arrow(pa.table(
        {"lon": lon, "lat": lat, "val": val})).repartition(6)

    q, r = hex_qr(lon, lat, size)
    cell = collections.defaultdict(int)
    for qq, rr, v in zip(q, r, val):
        cell[(int(qq), int(rr))] += int(v)

    for k in (0, 1, 2):
        offs = kring_offsets(k)
        assert len(offs) == 1 + 3 * k * (k + 1)
        exp = {}
        for (cq, cr) in cell:
            s = m = 0
            for dq, dr in offs:
                nb = (cq + dq, cr + dr)
                if nb in cell:
                    s += cell[nb]; m += 1
            exp[int(hex_pack(np.array([cq]), np.array([cr]))[0])] = (s, m)
        out = hex_kring_sum(ds, size=size, k=k, value_col="val").to_pandas()
        got = {int(rw.hex_id): (int(rw.kring_sum), int(rw.n_cells))
               for rw in out.itertuples()}
        assert got == exp
