"""Integer PageRank: numpy-reference parity, plan parity, partition invariance."""
import numpy as np
import pyarrow as pa
import pytest

from rayjoin.functions.graph import _pagerank_join, pagerank_int


def _edges_ds(src, dst, blocks=3):
    import ray.data

    src = np.asarray(src, np.int64)
    dst = np.asarray(dst, np.int64)
    deg = np.bincount(src, minlength=int(src.max()) + 1)[src].astype(np.int64)
    t = pa.table({"src": pa.array(src), "dst": pa.array(dst),
                  "outdeg": pa.array(deg)})
    return ray.data.from_arrow(t).repartition(blocks)


def _ref(src, dst, n, iters, r0=10**9):
    deg = np.bincount(src, minlength=n).astype(np.int64)
    tele = (r0 * 15) // 100
    r = np.full(n, r0, np.int64)
    for _ in range(iters):
        part = (r[src] * 85) // (100 * deg[src])
        nxt = np.full(n, tele, np.int64)
        np.add.at(nxt, dst, part)
        r = nxt
    return r


def _ranks(ds):
    df = ds.to_pandas().sort_values("node").reset_index(drop=True)
    return df


def test_pagerank_matches_reference(ray_session):
    rng = np.random.default_rng(41)
    n = 200
    src = np.repeat(np.arange(n), rng.integers(1, 4, n))
    dst = rng.integers(0, n, src.size)
    got = _ranks(pagerank_int(_edges_ds(src, dst), n_nodes=n, iters=4))
    ref = _ref(src, dst, n, 4)
    assert got["node"].tolist() == list(range(n))
    assert got["rank"].to_numpy().tolist() == ref.tolist()


def test_pagerank_join_path_parity(ray_session):
    rng = np.random.default_rng(43)
    n = 120
    src = np.repeat(np.arange(n), rng.integers(1, 4, n))
    dst = rng.integers(0, n, src.size)
    a = _ranks(pagerank_int(_edges_ds(src, dst, 2).materialize(),
                            n_nodes=n, iters=2))
    b = _ranks(_pagerank_join(_edges_ds(src, dst, 5).materialize(),
                              n_nodes=n, iters=2, r0=10**9))
    # the join plan drops in-edge-less nodes only if teleport were missing;
    # both plans must emit every node with identical integer ranks
    assert a.equals(b)


def test_pagerank_sink_and_source_nodes(ray_session):
    # node 2 has no in-edges (rank = teleport after iter 1);
    # all mass flows 0->1->2->... wait: 2 links out but nothing links in
    src = np.array([0, 1, 2], np.int64)
    dst = np.array([1, 0, 0], np.int64)
    got = _ranks(pagerank_int(_edges_ds(src, dst, 1), n_nodes=3, iters=3))
    ref = _ref(src, dst, 3, 3)
    assert got["rank"].to_numpy().tolist() == ref.tolist()
    tele = (10**9 * 15) // 100
    assert got.loc[2, "rank"] == tele  # in-edge-less node


def test_pagerank_bad_iters(ray_session):
    with pytest.raises(ValueError, match="iters"):
        pagerank_int(_edges_ds([0], [0], 1), n_nodes=1, iters=0)


@pytest.mark.usefixtures("ray_session")
def test_triangle_counts_exact_vs_bruteforce():
    """Degree-oriented forward triangle counting returns exactly the
    brute-force per-node counts on a random directed multigraph with
    self-loops and duplicate edges."""
    import itertools

    import ray.data

    from rayjoin.functions.graph import triangle_counts

    rng = np.random.default_rng(3)
    n = 80
    src = rng.integers(0, n, 600).astype(np.int64)
    dst = rng.integers(0, n, 600).astype(np.int64)
    t = pa.table({"src": pa.array(src), "dst": pa.array(dst)})

    und = {(min(s, d), max(s, d)) for s, d in zip(src, dst) if s != d}
    adj = {i: set() for i in range(n)}
    for u, v in und:
        adj[u].add(v); adj[v].add(u)
    cnt = {i: 0 for i in range(n)}
    for x, y, z in itertools.combinations(range(n), 3):
        if y in adj[x] and z in adj[x] and z in adj[y]:
            cnt[x] += 1; cnt[y] += 1; cnt[z] += 1
    exp = sorted((k, c) for k, c in cnt.items() if c)
    assert exp  # non-vacuous at this density

    out = triangle_counts(ray.data.from_arrow(t).repartition(4)).to_pandas().sort_values("node")
    assert list(zip(out.node.tolist(), out.n_tri.tolist())) == exp
