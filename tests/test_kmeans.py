"""k-means + SemDeDup (rayjoin/functions/kmeans.py): planted-truth,
empty-cluster, chunking, determinism, and an in-test DuckDB differential
through the same SQL generator the gate registers."""

import numpy as np
import pyarrow as pa
import pytest


def _emb_table(vecs: np.ndarray, ids=None) -> pa.Table:
    n, dim = vecs.shape
    if ids is None:
        ids = np.arange(n, dtype=np.int64)
    flat = pa.array(vecs.astype(np.float32).ravel(), pa.float32())
    offs = pa.array(np.arange(0, (n + 1) * dim, dim, dtype=np.int32))
    return pa.table({
        "vec_id": pa.array(np.asarray(ids, np.int64), pa.int64()),
        "embedding": pa.ListArray.from_arrays(offs, flat),
    })


def _planted(seed=7, per=40, dim=8):
    """3 tight blobs around well-separated centers; ids interleaved across
    blobs so Ray blocks mix clusters."""
    rng = np.random.default_rng(seed)
    centers = np.array([[10.0] + [0.0] * (dim - 1),
                        [0.0] * (dim - 1) + [10.0],
                        [-10.0, 10.0] + [0.0] * (dim - 2)])
    vecs = np.concatenate([
        c + 0.1 * rng.normal(size=(per, dim)) for c in centers])
    truth = np.repeat(np.arange(3), per)
    order = rng.permutation(len(vecs))
    return vecs[order], truth[order]


@pytest.mark.usefixtures("ray_session")
def test_kmeans_recovers_planted_blobs():
    import ray.data

    from rayjoin.functions.kmeans import kmeans_assign

    vecs, truth = _planted()
    ds = ray.data.from_arrow(_emb_table(vecs)).repartition(6)
    out = pa.concat_tables(
        [t for t in __import__("ray").get(
            kmeans_assign(ds, k=3, iters=3).to_arrow_refs()) if t.num_rows])
    ids = np.asarray(out["vec_id"], np.int64)
    cl = np.asarray(out["cluster"], np.int64)
    got = cl[np.argsort(ids)]
    want = truth[np.argsort(np.arange(len(truth)))]
    # same partition: every truth blob maps to exactly one cluster label
    for b in range(3):
        assert len(set(got[want == b])) == 1
    assert len({got[want == b][0] for b in range(3)}) == 3


@pytest.mark.usefixtures("ray_session")
def test_kmeans_drops_empty_cluster_and_matches_duckdb():
    """Two init centroids coincide -> the higher one goes empty after the
    first update (ties assign to the LOWER cluster id) and must vanish;
    the DuckDB twin from the gate's generator agrees bit-for-bit."""
    import duckdb
    import ray.data

    from rayjoin.functions.kmeans import kmeans_assign
    from rayjoin.pipelines.gate import sql_kmeans_cte

    rng = np.random.default_rng(3)
    dim = 6
    a = np.array([5.0] + [0.0] * (dim - 1))
    b = np.array([0.0] * (dim - 1) + [5.0])
    vecs = np.concatenate([
        [a, b, a],                       # ids 0,1,2 = inits (0 and 2 equal)
        a + 0.05 * rng.normal(size=(30, dim)),
        b + 0.05 * rng.normal(size=(30, dim)),
    ])
    tab = _emb_table(vecs)
    ds = ray.data.from_arrow(tab).repartition(4)
    out = kmeans_assign(ds, k=3, iters=2).to_pandas().sort_values(
        "vec_id").reset_index(drop=True)
    assert set(out["cluster"]) == {0, 1}  # cluster 2 went empty

    con = duckdb.connect()
    con.register("embeddings", tab)
    sql = (sql_kmeans_cte(k=3, iters=2, dim=dim)
           + "\nSELECT vec_id, c AS cluster FROM a2")
    exp = con.execute(sql).df().sort_values("vec_id").reset_index(drop=True)
    assert (out["cluster"].to_numpy() == exp["cluster"].to_numpy()).all()


@pytest.mark.usefixtures("ray_session")
def test_semdedup_drops_planted_within_cluster_dups_only():
    import ray.data

    from rayjoin.functions.kmeans import semdedup_drop_list

    vecs, truth = _planted(seed=11, per=30, dim=8)
    n = len(vecs)
    # plant near-dups: copies of rows 0..4 with tiny noise, ids offset
    rng = np.random.default_rng(5)
    dup_src = np.arange(5)
    dups = vecs[dup_src] * (1 + 1e-4) + 1e-4 * rng.normal(size=(5, 8))
    all_vecs = np.concatenate([vecs, dups])
    ids = np.arange(n + 5, dtype=np.int64)
    ds = ray.data.from_arrow(_emb_table(all_vecs, ids)).repartition(5)
    drops = semdedup_drop_list(
        ds, threshold=0.999, k=3, iters=3).to_pandas()
    # blob members share direction -> high cosine; use a threshold ABOVE
    # intra-blob cosine but below the planted-copy cosine:
    X = all_vecs / np.linalg.norm(all_vecs, axis=1, keepdims=True)
    sims = X @ X.T
    np.fill_diagonal(sims, 0)
    # expected: id b drops iff some a<b in the SAME blob has sim>=thr
    blob = np.concatenate([truth, truth[dup_src]])
    exp = sorted(
        int(bb) for bb in range(n + 5)
        if any(sims[aa, bb] >= 0.999 and blob[aa] == blob[bb]
               for aa in range(bb)))
    got = sorted(drops["vec_id"].tolist())
    assert got == exp
    assert set(np.arange(n, n + 5)) <= set(got)  # planted copies all dropped


@pytest.mark.usefixtures("ray_session")
def test_semdedup_exact_collapse_megadup_and_subsplit():
    """A cluster dominated by byte-identical copies must cost a sort, not a
    quadratic scan, and the drop list must be unchanged: every copy except
    the lowest id drops.  With max_cluster_rows forcing a sub-split, exact
    copies still all land together (assignment is a function of the vector)
    so the planted truth is preserved."""
    import ray.data

    from rayjoin.functions.kmeans import semdedup_drop_list

    vecs, _ = _planted(seed=31, per=20, dim=8)
    n = len(vecs)
    copies = np.repeat(vecs[[3]], 500, axis=0)  # 500 byte-equal copies
    all_vecs = np.concatenate([vecs, copies])
    ds = ray.data.from_arrow(_emb_table(all_vecs)).repartition(4)
    kw = dict(threshold=0.9999, k=3, iters=2)
    base = sorted(semdedup_drop_list(ds, **kw).to_pandas()["vec_id"])
    # all 500 planted copies drop (row 3 keeps, being the lowest id)
    assert set(range(n, n + 500)) <= set(base)
    assert 3 not in base
    # sub-split path: same planted copies recovered; drops form a subset
    # of the unsplit drops ONLY for near-dups — exact copies never split
    split = sorted(
        semdedup_drop_list(ds, max_cluster_rows=64, **kw)
        .to_pandas()["vec_id"])
    assert set(range(n, n + 500)) <= set(split)
    assert set(split) <= set(base)


@pytest.mark.usefixtures("ray_session")
def test_semdedup_all_identical_cluster_no_progress_guard():
    """Every vector identical: the local sub-k-means cannot split (one
    sub-cluster), the guard falls through to the collapsed scan, and all
    but the lowest id drop."""
    import ray.data

    from rayjoin.functions.kmeans import semdedup_drop_list

    vecs = np.repeat([[1.0, 2.0, 3.0, 4.0]], 300, axis=0)
    ds = ray.data.from_arrow(_emb_table(vecs)).repartition(3)
    got = sorted(
        semdedup_drop_list(ds, threshold=0.9, k=2, iters=1,
                           max_cluster_rows=16).to_pandas()["vec_id"])
    assert got == list(range(1, 300))


@pytest.mark.usefixtures("ray_session")
def test_semdedup_chunked_matches_unchunked_and_is_deterministic():
    import ray.data

    from rayjoin.functions.kmeans import semdedup_drop_list

    vecs, _ = _planted(seed=23, per=25, dim=8)
    ds = ray.data.from_arrow(_emb_table(vecs)).repartition(3)
    kw = dict(threshold=0.9999, k=3, iters=2)
    a = sorted(semdedup_drop_list(ds, chunk_rows=7, **kw)
               .to_pandas()["vec_id"].tolist())
    b = sorted(semdedup_drop_list(ds, chunk_rows=4096, **kw)
               .to_pandas()["vec_id"].tolist())
    c = sorted(semdedup_drop_list(ds, chunk_rows=7, **kw)
               .to_pandas()["vec_id"].tolist())
    assert a == b == c
