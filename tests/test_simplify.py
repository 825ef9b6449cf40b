"""Douglas-Peucker: vectorized BFS kernel == scalar recursion, operator
rebuilds coords, non-linestrings pass through."""
import numpy as np
import pyarrow as pa
import pytest

from rayjoin.geom.simplify import dp_keep_mask, dp_keep_scalar


def test_dp_mask_matches_scalar_recursion():
    rng = np.random.default_rng(2)
    polys = []
    for _ in range(200):
        n = rng.integers(2, 40)
        pts = (rng.integers(-10, 10, (n, 2)).astype(float)
               if rng.random() < 0.5 else rng.normal(0, 5, (n, 2)))
        if rng.random() < 0.2:
            pts[rng.integers(0, n)] = pts[0]
        polys.append(pts)
    polys.append(np.zeros((7, 2)))  # fully degenerate: all one point
    off = np.concatenate([[0], np.cumsum([len(p) for p in polys])])
    xy = np.vstack(polys)
    for tol in (0.0, 0.5, 1.0, 3.0):
        keep = dp_keep_mask(xy, off, tol)
        for i, p in enumerate(polys):
            got = np.flatnonzero(keep[off[i]:off[i + 1]]).tolist()
            assert got == dp_keep_scalar([tuple(v) for v in p], tol)


@pytest.mark.usefixtures("ray_session")
def test_simplify_linestrings_operator():
    import ray.data

    from rayjoin.geom.encode import geoms_to_table
    from rayjoin.geom.simplify import simplify_linestrings
    from rayjoin.geom import spec

    ls = spec.LineString(((0.0, 0.0), (1.0, 0.05), (2.0, 0.0), (2.0, 5.0)))
    pt = spec.Point(1.0, 2.0)
    t = geoms_to_table([ls, pt])
    out = simplify_linestrings(ray.data.from_arrow(t), tolerance=0.5).to_pandas()
    out = out.sort_values("row_id").reset_index(drop=True)
    assert len(out) == 2
    ring = out.iloc[0]["coords"][0]
    # middle vertex (1, 0.05) dropped; corner (2, 0) kept
    assert list(ring) == [0.0, 0.0, 2.0, 0.0, 2.0, 5.0]
    assert list(out.iloc[1]["coords"][0]) == [1.0, 2.0]  # point untouched
