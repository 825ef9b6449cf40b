"""Laws for the cube-face (S2-style) quadtree cells: round-trip, hierarchy,
cross-face neighbors, pole coverage (the independent value-level check is the
DuckDB oracle on the s2_assign gate row)."""

import numpy as np
import pyarrow as pa
import pytest

from rayjoin.stages.s2cell import (
    MAX_LEVEL,
    latlon_to_s2,
    s2_cell_center,
    s2_children,
    s2_edge_neighbors,
    s2_parent,
    s2_to_face_ij,
)


def _random_latlon(n, seed=5):
    rng = np.random.default_rng(seed)
    # uniform on the sphere (not uniform in lat) so faces 2/5 get real mass
    z = rng.uniform(-1, 1, n)
    lon = rng.uniform(-180, 180, n)
    lat = np.degrees(np.arcsin(z))
    return lat, lon


def test_center_round_trip_all_levels():
    lat, lon = _random_latlon(5000)
    for level in (0, 1, 4, 9, 12, MAX_LEVEL):
        cell = latlon_to_s2(lat, lon, level)
        assert (cell >= 0).all() and (cell < 6 * 4**level).all()
        clat, clon = s2_cell_center(cell, level)
        assert (latlon_to_s2(clat, clon, level) == cell).all()


def test_all_faces_and_cells_reachable():
    lat, lon = _random_latlon(200_000, seed=9)
    cell = latlon_to_s2(lat, lon, 2)
    face, _, _ = s2_to_face_ij(cell, 2)
    assert set(np.unique(face)) == set(range(6))
    assert len(np.unique(cell)) == 6 * 4**2  # every level-2 cell realized


def test_parent_child_closure():
    lat, lon = _random_latlon(2000, seed=7)
    cell = latlon_to_s2(lat, lon, 10)
    parent = s2_parent(cell, 10, 8)
    # the same point quantized directly at the coarse level gives the parent
    assert (latlon_to_s2(lat, lon, 8) == parent).all()
    for c in cell[:50]:
        p = int(s2_parent(np.array([c]), 10, 9)[0])
        kids = s2_children(p, 9)
        assert c in kids
        assert (s2_parent(kids, 10, 9) == p).all()


def test_edge_neighbors_symmetric_and_cross_face():
    lat, lon = _random_latlon(500, seed=3)
    level = 6
    cell = latlon_to_s2(lat, lon, level)
    nb = s2_edge_neighbors(cell, level)
    for c, row in zip(cell[:200], nb[:200]):
        assert len(set(row.tolist())) == 4 and c not in row
        for x in row:
            back = s2_edge_neighbors(np.array([x]), level)[0]
            assert c in back  # edge adjacency is symmetric
    # a point hard against a face edge must have a neighbor on another face
    edge_cell = latlon_to_s2(np.array([0.01]), np.array([44.999]), level)
    faces = s2_to_face_ij(s2_edge_neighbors(edge_cell, level)[0], level)[0]
    own = s2_to_face_ij(edge_cell, level)[0][0]
    assert (faces != own).any()


def test_poles_and_dateline_are_single_cells():
    # both poles and the dateline quantize without error, poles on z faces
    lat = np.array([89.9999, -89.9999, 0.0, 0.0])
    lon = np.array([13.0, -77.0, 179.9999, -180.0])
    cell = latlon_to_s2(lat, lon, 12)
    face, _, _ = s2_to_face_ij(cell, 12)
    assert face[0] == 2 and face[1] == 5


def test_level_validation():
    with pytest.raises(ValueError):
        latlon_to_s2(np.array([0.0]), np.array([0.0]), MAX_LEVEL + 1)
    with pytest.raises(ValueError):
        s2_parent(np.array([0]), 5, 6)


def test_area_skew_bounded_vs_equirect():
    """The design claim: cube cells are skew-bounded while equirect cells
    collapse at the poles.  Estimate occupancy-weighted cell areas by Monte
    Carlo on the sphere: max/min populated-cell hit ratio stays small for
    cube cells, explodes for equirect tiles near the poles."""
    from rayjoin.stages.tiles import latlon_to_xy, xy_to_tile

    lat, lon = _random_latlon(400_000, seed=1)
    level = 3
    cell = latlon_to_s2(lat, lon, level)
    _, counts = np.unique(cell, return_counts=True)
    cube_skew = counts.max() / counts.min()
    tid = xy_to_tile(*latlon_to_xy(lat, lon, level), level)
    _, tcounts = np.unique(tid, return_counts=True)
    eq_skew = tcounts.max() / max(tcounts.min(), 1)
    assert cube_skew < 4.0 < eq_skew


@pytest.mark.usefixtures("ray_session")
def test_s2_assign_stage():
    import ray.data

    from rayjoin.stages.s2cell import s2_assign

    lat, lon = _random_latlon(1000, seed=2)
    t = pa.table({"lat": pa.array(lat), "lon": pa.array(lon)})
    out = s2_assign(ray.data.from_arrow(t), level=8).to_pandas()
    assert (out["s2_cell"].to_numpy() == latlon_to_s2(lat, lon, 8)).all()
