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


@pytest.mark.usefixtures("ray_session")
def test_edge_embeddedness_exact_vs_bruteforce():
    """Per-edge common-neighbor counts match brute force on a random
    directed multigraph with self-loops and duplicate edges; only edges in
    >= 1 triangle appear, and pairs come back canonical (u < v)."""
    import ray.data

    from rayjoin.functions.graph import edge_embeddedness

    rng = np.random.default_rng(11)
    n = 70
    src = rng.integers(0, n, 500).astype(np.int64)
    dst = rng.integers(0, n, 500).astype(np.int64)
    t = pa.table({"src": pa.array(src), "dst": pa.array(dst)})

    und = {(min(s, d), max(s, d)) for s, d in zip(src, dst) if s != d}
    adj = {i: set() for i in range(n)}
    for u, v in und:
        adj[u].add(v); adj[v].add(u)
    exp = sorted((u, v, len(adj[u] & adj[v])) for u, v in und
                 if adj[u] & adj[v])
    assert exp  # non-vacuous at this density

    out = edge_embeddedness(
        ray.data.from_arrow(t).repartition(4)).to_pandas().sort_values(["u", "v"])
    assert list(zip(out.u.tolist(), out.v.tolist(), out.n_common.tolist())) == exp


def _hits_ref(src, dst, n, iters, h0=1, shift=0):
    hub = np.full(n, h0, np.int64)
    auth = np.zeros(n, np.int64)
    for _ in range(iters):
        auth = np.zeros(n, np.int64)
        np.add.at(auth, dst, hub[src])
        auth >>= shift
        hub = np.zeros(n, np.int64)
        np.add.at(hub, src, auth[dst])
        hub >>= shift
    return hub, auth


def _hits_synth(seed=57, n=150):
    rng = np.random.default_rng(seed)
    src = np.repeat(np.arange(n), rng.integers(1, 4, n))
    dst = rng.integers(0, n, src.size)
    return src, dst


def test_hits_matches_reference(ray_session):
    from rayjoin.functions.graph import hits_int

    src, dst = _hits_synth()
    n = 150
    hub, auth = _hits_ref(src, dst, n, iters=2)
    out = _ranks(hits_int(_edges_ds(src, dst), n_nodes=n, iters=2))
    assert np.array_equal(out["hub"].to_numpy(), hub)
    assert np.array_equal(out["auth"].to_numpy(), auth)


def test_hits_join_path_parity(ray_session):
    from rayjoin.functions.graph import _hits_join, hits_int

    src, dst = _hits_synth(seed=11)
    n = 150
    want = _ranks(hits_int(_edges_ds(src, dst), n_nodes=n, iters=2, shift=1))
    got = _ranks(_hits_join(_edges_ds(src, dst, blocks=4), n_nodes=n,
                            iters=2, h0=1, shift=1))
    assert np.array_equal(want["hub"].to_numpy(), got["hub"].to_numpy())
    assert np.array_equal(want["auth"].to_numpy(), got["auth"].to_numpy())
    # shift=1 reference parity too
    hub, auth = _hits_ref(src, dst, n, iters=2, shift=1)
    assert np.array_equal(want["hub"].to_numpy(), hub)
    assert np.array_equal(want["auth"].to_numpy(), auth)


def test_hits_sink_and_source_nodes(ray_session):
    from rayjoin.functions.graph import _hits_join, hits_int

    # node 0 -> 1 -> 2; node 3 isolated
    src = np.array([0, 1], np.int64)
    dst = np.array([1, 2], np.int64)
    for fn in (lambda e: hits_int(e, n_nodes=4, iters=1),
               lambda e: _hits_join(e, n_nodes=4, iters=1, h0=1, shift=0)):
        out = _ranks(fn(_edges_ds(src, dst, blocks=1)))
        assert out["node"].tolist() == [0, 1, 2, 3]
        # a1 = indeg (hub0=1): [0,1,1,0]; h1(u) = sum auth over targets
        assert out["auth"].tolist() == [0, 1, 1, 0]
        assert out["hub"].tolist() == [1, 1, 0, 0]


def test_hits_bad_iters(ray_session):
    from rayjoin.functions.graph import hits_int

    with pytest.raises(ValueError):
        hits_int(_edges_ds([0], [1]), n_nodes=2, iters=0)


def _kcore_ref(src, dst, n, k, rounds):
    pairs = {(min(a, b), max(a, b)) for a, b in zip(src, dst) if a != b}
    alive = np.ones(n, bool)
    for _ in range(rounds):
        deg = np.zeros(n, np.int64)
        for a, b in pairs:
            if alive[a] and alive[b]:
                deg[a] += 1
                deg[b] += 1
        new = alive & (deg >= k)
        if np.array_equal(new, alive):
            break
        alive = new
    return alive.astype(np.int64)


def test_kcore_matches_reference(ray_session):
    from rayjoin.functions.graph import kcore_nodes

    rng = np.random.default_rng(3)
    n = 200
    src = rng.integers(0, n, 600)
    dst = rng.integers(0, n, 600)
    for k, rounds in [(3, 8), (4, 8), (0, 2)]:
        want = _kcore_ref(src, dst, n, k, rounds)
        out = _ranks(kcore_nodes(_edges_ds(src, dst), n_nodes=n, k=k,
                                 max_rounds=rounds))
        assert np.array_equal(out["in_core"].to_numpy(), want), (k, rounds)


def test_kcore_join_path_parity(ray_session):
    from rayjoin.functions.graph import (_kcore_join, kcore_nodes,
                                         simple_undirected_edges)

    rng = np.random.default_rng(5)
    n = 120
    src = rng.integers(0, n, 360)
    dst = rng.integers(0, n, 360)
    ds = _edges_ds(src, dst, blocks=4)
    simple = simple_undirected_edges(ds, n_nodes=n)
    for k in (3, 50):  # 50 empties the core: exercises the all-zeros path
        want = _ranks(kcore_nodes(ds, n_nodes=n, k=k, max_rounds=6))
        got = _ranks(_kcore_join(simple, n_nodes=n, k=k, max_rounds=6))
        assert np.array_equal(want["in_core"].to_numpy(),
                              got["in_core"].to_numpy()), k
        assert np.array_equal(want["in_core"].to_numpy(),
                              _kcore_ref(src, dst, n, k, 6)), k


def test_kcore_self_loops_and_multiedges_ignored(ray_session):
    from rayjoin.functions.graph import kcore_nodes

    # triangle 0-1-2 wired with duplicates + self-loops; node 3 pendant.
    src = np.array([0, 0, 1, 1, 2, 2, 2, 3], np.int64)
    dst = np.array([1, 1, 2, 1, 0, 0, 2, 0], np.int64)
    out = _ranks(kcore_nodes(_edges_ds(src, dst, blocks=1), n_nodes=4,
                             k=2, max_rounds=5))
    assert out["in_core"].tolist() == [1, 1, 1, 0]


def test_kcore_bad_args(ray_session):
    from rayjoin.functions.graph import kcore_nodes

    with pytest.raises(ValueError):
        kcore_nodes(_edges_ds([0], [1]), n_nodes=2, k=-1, max_rounds=2)
    with pytest.raises(ValueError):
        kcore_nodes(_edges_ds([0], [1]), n_nodes=2, k=1, max_rounds=-1)


@pytest.mark.usefixtures("ray_session")
def test_keyed_indegree_vs_bruteforce():
    """Distinct-referrer counts and total cross-key links match brute
    force; intra-key edges drop by default but are kept with
    drop_intra=False."""
    import collections

    import ray.data

    from rayjoin.functions.graph import keyed_indegree

    rng = np.random.default_rng(21)
    m = 800
    sk = rng.integers(0, 12, m)
    dk = rng.integers(0, 12, m)
    t = pa.table({"src_key": pa.array([f"h{v}" for v in sk], pa.string()),
                  "dst_key": pa.array([f"h{v}" for v in dk], pa.string())})
    ds = ray.data.from_arrow(t).repartition(5)

    for drop in (True, False):
        refs = collections.defaultdict(set)
        links = collections.defaultdict(int)
        for s, d in zip(sk, dk):
            if drop and s == d:
                continue
            refs[f"h{d}"].add(f"h{s}")
            links[f"h{d}"] += 1
        exp = sorted((k, len(refs[k]), links[k]) for k in refs)
        out = keyed_indegree(ds, drop_intra=drop).to_pandas().sort_values("dst_key")
        got = list(zip(out.dst_key, out.n_ref_keys, out.n_links))
        assert got == exp


@pytest.mark.usefixtures("ray_session")
def test_reciprocity_profile_vs_bruteforce():
    """Out/in degrees of the simple graph and mutual-edge counts match
    brute force on a random multigraph with self-loops and duplicates."""
    import ray.data

    from rayjoin.functions.graph import reciprocity_profile

    rng = np.random.default_rng(17)
    m, n = 700, 50
    src = rng.integers(0, n, m).astype(np.int64)
    dst = rng.integers(0, n, m).astype(np.int64)
    t = pa.table({"src": pa.array(src), "dst": pa.array(dst)})

    e = {(s, d) for s, d in zip(src, dst) if s != d}
    exp = {}
    for v in range(n):
        outs = {d for s, d in e if s == v}
        ins = {s for s, d in e if d == v}
        mut = len(outs & ins)
        if outs or ins:
            exp[v] = (len(outs), len(ins), mut)
    assert any(x[2] for x in exp.values())  # mutual edges exist

    out = reciprocity_profile(ray.data.from_arrow(t).repartition(4)).to_pandas()
    got = {int(r.node): (int(r.n_out), int(r.n_in), int(r.n_mutual))
           for r in out.itertuples()}
    assert got == exp
