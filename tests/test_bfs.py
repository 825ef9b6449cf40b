"""bfs_hops differential tests vs brute-force BFS, plus tier parity."""

import numpy as np
import pyarrow as pa
import pytest

from rayjoin.functions.graph import bfs_hops


def brute_bfs(n, src_arr, dst_arr, sources, max_rounds):
    adj = {}
    for s, d in zip(src_arr, dst_arr):
        adj.setdefault(int(s), []).append(int(d))
    dist = [-1] * n
    frontier = sorted(set(int(s) for s in sources))
    for s in frontier:
        dist[s] = 0
    for r in range(1, max_rounds + 1):
        nxt = set()
        for u in frontier:
            for v in adj.get(u, ()):
                if dist[v] == -1:
                    nxt.add(v)
        for v in nxt:
            dist[v] = r
        frontier = sorted(nxt)
        if not frontier:
            break
    return dist


def synth_edges(n, m, seed):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, m).astype(np.int64)
    dst = rng.integers(0, n, m).astype(np.int64)
    return src, dst


@pytest.mark.parametrize("tier_kw", [{}, {"broadcast_threshold": 0}],
                         ids=["broadcast", "join"])
def test_bfs_matches_brute(ray_session, tier_kw):
    import ray.data

    n, m = 120, 300
    src, dst = synth_edges(n, m, 11)
    sources = [0, 7, 99]
    edges = ray.data.from_arrow(pa.table({
        "src": pa.array(src, pa.int64()),
        "dst": pa.array(dst, pa.int64())})).repartition(3).materialize()
    out = (bfs_hops(edges, sources, n_nodes=n, max_rounds=4, **tier_kw)
           .to_pandas().sort_values("node").reset_index(drop=True))
    want = brute_bfs(n, src, dst, sources, 4)
    assert len(out) == n
    assert out["dist"].tolist() == want


def test_bfs_round_bound_is_contractual(ray_session):
    import ray.data

    # a directed chain 0 -> 1 -> 2 -> ... -> 9: with max_rounds=3 only
    # nodes 0..3 get distances, the rest stay -1
    edges = ray.data.from_arrow(pa.table({
        "src": pa.array(np.arange(9), pa.int64()),
        "dst": pa.array(np.arange(1, 10), pa.int64())})).materialize()
    out = (bfs_hops(edges, [0], n_nodes=10, max_rounds=3)
           .to_pandas().sort_values("node"))
    assert out["dist"].tolist() == [0, 1, 2, 3, -1, -1, -1, -1, -1, -1]


@pytest.mark.parametrize("tier_kw", [{}, {"broadcast_threshold": 0}],
                         ids=["broadcast", "join"])
def test_bfs_no_sources_all_unreached(ray_session, tier_kw):
    import ray.data

    edges = ray.data.from_arrow(pa.table({
        "src": pa.array([0, 1], pa.int64()),
        "dst": pa.array([1, 2], pa.int64())})).materialize()
    out = (bfs_hops(edges, [], n_nodes=3, max_rounds=5, **tier_kw)
           .to_pandas().sort_values("node"))
    assert out["dist"].tolist() == [-1, -1, -1]
