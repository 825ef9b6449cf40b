"""Grouped convex hull: operator vs scalar chain, degenerate groups,
Akl-Toussaint pruning soundness."""
import numpy as np
import pyarrow as pa
import pytest

from rayjoin.geom.hull import _prune_interior, convex_hull_scalar


def test_scalar_hull_basics():
    sq = [(0, 0), (4, 0), (4, 4), (0, 4), (2, 2), (2, 0), (4, 2)]
    assert convex_hull_scalar(sq) == [(0, 0), (0, 4), (4, 0), (4, 4)]
    assert convex_hull_scalar([(1, 1)]) == [(1, 1)]
    assert convex_hull_scalar([(0, 0), (2, 2), (1, 1), (1, 1)]) == [(0, 0), (2, 2)]


def test_prune_never_drops_hull_vertices():
    rng = np.random.default_rng(6)
    g = np.repeat(np.arange(30), 50)
    x = rng.integers(-40, 40, g.size)
    y = rng.integers(-40, 40, g.size)
    order = np.lexsort((y, x, g))
    g, x, y = g[order], x[order], y[order]
    d = np.concatenate([[True], (g[1:] != g[:-1]) | (x[1:] != x[:-1]) | (y[1:] != y[:-1])])
    g, x, y = g[d], x[d], y[d]
    keep = _prune_interior(g, x, y)
    for gid in range(30):
        m = g == gid
        full = set(convex_hull_scalar(zip(x[m].tolist(), y[m].tolist())))
        kept = set(zip(x[m][keep[m]].tolist(), y[m][keep[m]].tolist()))
        assert full <= kept  # pruning is sound
        pruned = set(convex_hull_scalar(kept))
        assert pruned == full  # and sufficient


@pytest.mark.usefixtures("ray_session")
def test_group_convex_hull_operator():
    import ray.data

    from rayjoin.geom.hull import group_convex_hull

    rng = np.random.default_rng(3)
    rows = []
    for gid in range(40):
        for _ in range(int(rng.integers(1, 40))):
            rows.append((gid, int(rng.integers(-20, 20)), int(rng.integers(-20, 20))))
    rows += [(100, i, 2 * i) for i in range(8)]      # collinear
    rows += [(101, 3, 3)] * 5                        # all identical
    t = pa.table({"group_id": pa.array([r[0] for r in rows], pa.int64()),
                  "x": pa.array([r[1] for r in rows], pa.int64()),
                  "y": pa.array([r[2] for r in rows], pa.int64())})
    out = group_convex_hull(ray.data.from_arrow(t).repartition(3)).to_pandas()
    got = {}
    for r in out.itertuples():
        got.setdefault(r.group_id, set()).add((r.x, r.y))
    for gid in set(r[0] for r in rows):
        pts = [(x, y) for g0, x, y in rows if g0 == gid]
        assert got[gid] == set(convex_hull_scalar(pts)), gid
    assert got[100] == {(0, 0), (7, 14)}
    assert got[101] == {(3, 3)}
