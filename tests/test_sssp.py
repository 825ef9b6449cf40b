"""sssp_hops differential tests vs brute-force bounded Bellman–Ford,
plus broadcast/join tier parity."""

import numpy as np
import pyarrow as pa
import pytest

from rayjoin.functions.graph import sssp_hops


def brute_sssp(n, src_arr, dst_arr, w_arr, sources, max_rounds):
    """dist[v] = min weight over paths of <= max_rounds edges (textbook
    round-limited Bellman–Ford)."""
    INF = float("inf")
    dist = [INF] * n
    for s in sources:
        dist[int(s)] = 0
    for _ in range(max_rounds):
        prev = list(dist)
        for s, d, w in zip(src_arr, dst_arr, w_arr):
            if prev[int(s)] + int(w) < dist[int(d)]:
                dist[int(d)] = prev[int(s)] + int(w)
    return [-1 if d == INF else int(d) for d in dist]


def synth(n, m, seed):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, m).astype(np.int64)
    dst = rng.integers(0, n, m).astype(np.int64)
    w = rng.integers(0, 20, m).astype(np.int64)  # includes 0-weight edges
    return src, dst, w


@pytest.mark.parametrize("tier_kw", [{}, {"broadcast_threshold": 0}],
                         ids=["broadcast", "join"])
def test_sssp_matches_brute(ray_session, tier_kw):
    import ray.data

    n, m = 120, 400
    src, dst, w = synth(n, m, 17)
    sources = [0, 5, 77]
    edges = ray.data.from_arrow(pa.table({
        "src": pa.array(src, pa.int64()),
        "dst": pa.array(dst, pa.int64()),
        "w": pa.array(w, pa.int64())})).repartition(3).materialize()
    out = (sssp_hops(edges, sources, n_nodes=n, max_rounds=4, **tier_kw)
           .to_pandas().sort_values("node").reset_index(drop=True))
    assert len(out) == n
    assert out["dist"].tolist() == brute_sssp(n, src, dst, w, sources, 4)


def test_sssp_hop_bound_is_contractual(ray_session):
    import ray.data

    # chain 0 ->(5) 1 ->(5) 2 ->(5) 3 plus a heavy shortcut 0 ->(100) 3:
    # with max_rounds=2 the 3-edge cheap path is out of budget, so node 3
    # takes the 1-edge shortcut; with max_rounds=3 it relaxes to 15
    edges = ray.data.from_arrow(pa.table({
        "src": pa.array([0, 1, 2, 0], pa.int64()),
        "dst": pa.array([1, 2, 3, 3], pa.int64()),
        "w": pa.array([5, 5, 5, 100], pa.int64())})).materialize()
    two = sssp_hops(edges, [0], n_nodes=4, max_rounds=2).to_pandas().sort_values("node")
    assert two["dist"].tolist() == [0, 5, 10, 100]
    three = sssp_hops(edges, [0], n_nodes=4, max_rounds=3).to_pandas().sort_values("node")
    assert three["dist"].tolist() == [0, 5, 10, 15]


@pytest.mark.parametrize("tier_kw", [{}, {"broadcast_threshold": 0}],
                         ids=["broadcast", "join"])
def test_sssp_no_sources_all_unreached(ray_session, tier_kw):
    import ray.data

    edges = ray.data.from_arrow(pa.table({
        "src": pa.array([0, 1], pa.int64()),
        "dst": pa.array([1, 2], pa.int64()),
        "w": pa.array([1, 1], pa.int64())})).materialize()
    out = (sssp_hops(edges, [], n_nodes=3, max_rounds=5, **tier_kw)
           .to_pandas().sort_values("node"))
    assert out["dist"].tolist() == [-1, -1, -1]


def test_sssp_zero_rounds_sources_only(ray_session):
    import ray.data

    edges = ray.data.from_arrow(pa.table({
        "src": pa.array([0], pa.int64()),
        "dst": pa.array([1], pa.int64()),
        "w": pa.array([1], pa.int64())})).materialize()
    out = (sssp_hops(edges, [0], n_nodes=3, max_rounds=0)
           .to_pandas().sort_values("node"))
    assert out["dist"].tolist() == [0, -1, -1]
