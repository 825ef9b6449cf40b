"""random_projection (pca.py): JL ±1 projection — brute-force parity,
partitioning invariance, and the distance-preservation property."""

import numpy as np
import pyarrow as pa


def _dataset(vecs):
    import ray.data

    tab = pa.table({
        "vec_id": pa.array(np.arange(len(vecs), dtype=np.int64)),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32())),
    })
    return ray.data.from_arrow(tab)


def _run(vecs, out_dims=8, parts=3):
    import ray

    from rayjoin.functions.pca import random_projection

    out = random_projection(_dataset(vecs).repartition(parts),
                            out_dims=out_dims)
    tabs = [t for t in ray.get(out.to_arrow_refs()) if t.num_rows]
    t = pa.concat_tables(tabs)
    df = t.to_pandas().sort_values(["vec_id", "out_dim"]).reset_index(drop=True)
    return df


def test_matches_bruteforce(ray_session):
    from rayjoin.stages.geocode import fmix64, fnv1a64

    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((10, 6)).astype(np.float32)
    out = _run(vecs, out_dims=4, parts=2)
    exp = []
    for v in vecs:
        vi = [int(np.floor(float(x) * (1 << 20))) for x in v]
        for i in range(4):
            s = 0
            for j, x in enumerate(vi):
                h = int(fmix64(fnv1a64(pa.array(["jl:%d" % (j * 4 + i)])))[0])
                s += x if h >> 63 else -x
            exp.append(s)
    assert out["proj"].to_list() == exp


def test_partitioning_invariant(ray_session):
    rng = np.random.default_rng(5)
    vecs = rng.standard_normal((40, 16)).astype(np.float32)
    a = _run(vecs, parts=1)
    b = _run(vecs, parts=7)
    assert a.equals(b)


def test_distance_preservation(ray_session):
    # JL with +-1 entries: E[||Px - Py||^2 / out] = ||x - y||^2.  With
    # out=64 the relative error concentrates; assert rank correlation of
    # pairwise distances is high.
    rng = np.random.default_rng(11)
    vecs = rng.standard_normal((30, 32)).astype(np.float32)
    df = _run(vecs, out_dims=64, parts=2)
    proj = df["proj"].to_numpy().reshape(30, 64).astype(np.float64) / (1 << 20)
    orig = vecs.astype(np.float64)
    d_o, d_p = [], []
    for a in range(30):
        for b in range(a + 1, 30):
            d_o.append(np.sum((orig[a] - orig[b]) ** 2))
            d_p.append(np.sum((proj[a] - proj[b]) ** 2) / 64.0)
    d_o, d_p = np.array(d_o), np.array(d_p)
    # unbiased estimator: ratios concentrate around 1
    ratio = d_p / d_o
    assert 0.6 < np.median(ratio) < 1.4
    # and orderings agree strongly
    rank_corr = np.corrcoef(np.argsort(np.argsort(d_o)),
                            np.argsort(np.argsort(d_p)))[0, 1]
    assert rank_corr > 0.8
