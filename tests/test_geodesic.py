"""Geodesic proximity join vs brute-force haversine, incl. the hard zones
(polar caps, antimeridian seam) where the grid replication earns its keep."""

import numpy as np
import pytest

from rayjoin.geom.encode import points_geom
from rayjoin.join.geodesic import (
    EARTH_RADIUS_M,
    _hav,
    geodesic_proximity_map,
    hav_threshold,
)


@pytest.mark.usefixtures("ray_session")
def test_geodesic_prox_matches_brute_force():
    rng = np.random.default_rng(3)
    nb, ns = 800, 150
    lab = np.concatenate([rng.uniform(-89.9, 89.9, nb - 100),
                          rng.uniform(85, 90, 50), rng.uniform(-30, 30, 50)])
    lob = np.concatenate([rng.uniform(-180, 180, nb - 60),
                          rng.uniform(178, 180, 30), rng.uniform(-180, -178, 30)])
    las = np.concatenate([rng.uniform(-89.9, 89.9, ns - 30),
                          rng.uniform(85, 90, 15), rng.uniform(-30, 30, 15)])
    los = np.concatenate([rng.uniform(-180, 180, ns - 16),
                          rng.uniform(178, 180, 8), rng.uniform(-180, -178, 8)])
    idb = np.arange(nb, dtype=np.int64)
    ids = np.arange(ns, dtype=np.int64) + 100000
    D = 700_000.0
    h = _hav(lab[:, None], lob[:, None], las[None, :], los[None, :])
    bi, si = np.nonzero(h <= hav_threshold(D))
    exp = set(zip(idb[bi].tolist(), ids[si].tolist()))

    res = geodesic_proximity_map(
        points_geom(idb, lob, lab), points_geom(ids, los, las), max_meters=D
    ).to_pandas()
    got = set(zip(res.big_row_id.tolist(), res.small_row_id.tolist()))
    assert got == exp and len(exp) > 500

    # hav is bit-identical to the direct computation; distance_m consistent
    hv = {(int(idb[b]), int(ids[s])): h[b, s] for b, s in zip(bi, si)}
    for r in res.itertuples():
        assert np.float64(r.hav).view(np.int64) == np.float64(
            hv[(r.big_row_id, r.small_row_id)]
        ).view(np.int64)
        d = 2.0 * EARTH_RADIUS_M * np.arcsin(np.sqrt(min(r.hav, 1.0)))
        assert r.distance_m == pytest.approx(d, rel=1e-12)
        assert r.distance_m <= D * (1 + 1e-12)


@pytest.mark.usefixtures("ray_session")
def test_geodesic_prox_antimeridian_pair():
    # 179.9W and 179.9E at the equator are ~22 km apart, not ~39,970 km
    big = points_geom(np.array([1], np.int64), np.array([-179.9]), np.array([0.0]))
    small = points_geom(np.array([2], np.int64), np.array([179.9]), np.array([0.0]))
    res = geodesic_proximity_map(big, small, max_meters=25_000.0).to_pandas()
    assert len(res) == 1 and res.distance_m[0] < 25_000

    res2 = geodesic_proximity_map(big, small, max_meters=20_000.0).to_pandas()
    assert len(res2) == 0


@pytest.mark.usefixtures("ray_session")
def test_geodesic_prox_polar_pair():
    # two points at lat 89.95, opposite lons: ~11 km over the pole, while
    # naive planar dlon says "half a world apart"
    big = points_geom(np.array([1], np.int64), np.array([0.0]), np.array([89.95]))
    small = points_geom(np.array([2], np.int64), np.array([180.0]), np.array([89.95]))
    res = geodesic_proximity_map(big, small, max_meters=12_000.0).to_pandas()
    assert len(res) == 1

    res2 = geodesic_proximity_map(big, small, max_meters=10_000.0).to_pandas()
    assert len(res2) == 0


@pytest.mark.usefixtures("ray_session")
def test_geodesic_prox_rejects_bad_distance():
    p = points_geom(np.array([1], np.int64), np.array([0.0]), np.array([0.0]))
    with pytest.raises(ValueError):
        geodesic_proximity_map(p, p, max_meters=float("nan"))


@pytest.mark.usefixtures("ray_session")
def test_geodesic_knn_matches_brute_force():
    from rayjoin.join.geodesic import geodesic_knn_join

    rng = np.random.default_rng(9)
    nb, ns = 500, 80
    lab = rng.uniform(-89, 89, nb)
    lob = rng.uniform(-180, 180, nb)
    las = rng.uniform(-89, 89, ns)
    los = rng.uniform(-180, 180, ns)
    idb = np.arange(nb, dtype=np.int64)
    ids = rng.permutation(ns).astype(np.int64) * 5  # non-contiguous ids
    k = 4
    res = geodesic_knn_join(
        points_geom(idb, lob, lab), points_geom(ids, los, las), k=k
    ).to_pandas()
    assert len(res) == nb * k

    h = _hav(lab[:, None], lob[:, None], las[None, :], los[None, :])
    id_order = np.argsort(ids)
    for b in rng.integers(0, nb, 40):
        hb = h[b][id_order]
        top = np.argsort(hb, kind="stable")[:k]
        exp_ids = ids[id_order][top]
        sub = res[res.big_row_id == idb[b]].sort_values("knn_rank")
        assert list(sub.small_row_id) == list(exp_ids)
        assert np.array_equal(
            sub.hav.to_numpy().view(np.int64), hb[top].view(np.int64)
        )


@pytest.mark.usefixtures("ray_session")
def test_geodesic_knn_radius_cap_ranks_within_radius():
    from rayjoin.join.geodesic import geodesic_knn_join

    # one big at origin; smalls at ~111 km per degree of lon on the equator
    big = points_geom(np.array([0], np.int64), np.array([0.0]), np.array([0.0]))
    small = points_geom(
        np.array([1, 2, 3, 4], np.int64),
        np.array([1.0, 2.0, 3.0, 4.0]),
        np.zeros(4),
    )
    res = geodesic_knn_join(big, small, k=3, max_meters=250_000.0).to_pandas()
    # only the 1- and 2-degree smalls are within 250 km
    assert list(res.sort_values("knn_rank").small_row_id) == [1, 2]
    assert list(res.sort_values("knn_rank").knn_rank) == [0, 1]


@pytest.mark.usefixtures("ray_session")
def test_polyline_chord_length_reference():
    from rayjoin.geom.encode import LINESTRING, _geom_table, pack_single_rings
    from rayjoin.join.geodesic import polyline_chord_length

    # two tracks: equator hop 1 degree (known chord), single vertex (0)
    flat = np.array([
        [0.0, 0.0, 1.0, 0.0, 2.0, 0.0],   # two 1-degree equator segments
    ]).ravel()
    t1 = _geom_table(np.array([7], np.int64), LINESTRING,
                     pack_single_rings(flat, 6))
    got = polyline_chord_length(t1).to_pandas()
    h = np.sin(np.radians(1.0) / 2) ** 2
    term = np.floor(1_000_000 * ((2.0 * 6_371_000.0) * np.sqrt(h)))
    assert got.length_micro[0] == 2 * int(term)
    assert got.n_vertices[0] == 3

    t2 = _geom_table(np.array([8], np.int64), LINESTRING,
                     pack_single_rings(np.array([5.0, 5.0]), 2))
    got2 = polyline_chord_length(t2).to_pandas()
    assert got2.length_micro[0] == 0 and got2.n_vertices[0] == 1
