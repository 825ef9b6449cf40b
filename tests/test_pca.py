"""Distributed Gram + PCA (rayjoin/functions/pca.py): multi-block vs
single-matrix numpy, planted low-rank recovery, sign determinism."""

import numpy as np
import pyarrow as pa
import pytest


def _emb_table(vecs: np.ndarray) -> pa.Table:
    n, dim = vecs.shape
    flat = pa.array(vecs.astype(np.float32).ravel(), pa.float32())
    offs = pa.array(np.arange(0, (n + 1) * dim, dim, dtype=np.int32))
    return pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64), pa.int64()),
        "embedding": pa.ListArray.from_arrays(offs, flat),
    })


@pytest.mark.usefixtures("ray_session")
def test_gram_matches_numpy_across_blockings():
    import ray.data

    from rayjoin.functions.pca import gram_and_mean

    rng = np.random.default_rng(5)
    V = rng.standard_normal((1000, 16)).astype(np.float32)
    X = V.astype(np.float64)
    want_g, want_c = X.T @ X, X.sum(axis=0)
    for nparts in (1, 7):
        ds = ray.data.from_arrow(_emb_table(V)).repartition(nparts)
        G, C, n = gram_and_mean(ds)
        assert n == 1000
        assert np.allclose(G, want_g, rtol=1e-12)
        assert np.allclose(C, want_c, rtol=1e-12)
    # bit-determinism: two runs on the same blocking agree exactly
    ds = ray.data.from_arrow(_emb_table(V)).repartition(7).materialize()
    G1, C1, _ = gram_and_mean(ds)
    G2, C2, _ = gram_and_mean(ds)
    assert np.array_equal(G1, G2) and np.array_equal(C1, C2)


@pytest.mark.usefixtures("ray_session")
def test_pca_recovers_planted_low_rank_axes():
    """Data = 3 strong planted axes + weak isotropic noise: the top-3
    components must span the planted axes (|cos| > 0.99 after matching),
    and the projection must equal the numpy closed form."""
    import ray
    import ray.data

    from rayjoin.functions.pca import pca_components, pca_project

    rng = np.random.default_rng(9)
    dim, n = 12, 4000
    axes, _ = np.linalg.qr(rng.standard_normal((dim, 3)))
    scales = np.array([10.0, 6.0, 3.0])
    Z = rng.standard_normal((n, 3)) * scales
    V = (Z @ axes.T + 0.05 * rng.standard_normal((n, dim))).astype(np.float32)
    ds = ray.data.from_arrow(_emb_table(V)).repartition(5)
    mean, comps = pca_components(ds, n_components=3)
    for i in range(3):
        assert abs(comps[i] @ axes[:, i]) > 0.99, i
    # deterministic sign: the largest-|coeff| entry is positive
    for c in comps:
        assert c[np.argmax(np.abs(c))] > 0
    out = pa.concat_tables([
        t for t in ray.get(
            pca_project(ds, n_components=3).to_arrow_refs()) if t.num_rows])
    ids = np.asarray(out["vec_id"], np.int64)
    P = np.array(out["proj"].to_pylist())[np.argsort(ids)]
    want = (V.astype(np.float64) - mean) @ comps.T
    assert np.allclose(P, want, atol=1e-9)


@pytest.mark.usefixtures("ray_session")
def test_gram_quantized_matches_duckdb_on_synthetic():
    import duckdb
    import ray.data

    from rayjoin.functions.pca import gram_quantized

    rng = np.random.default_rng(2)
    V = rng.standard_normal((500, 64)).astype(np.float32)
    tab = _emb_table(V)
    ds = ray.data.from_arrow(tab).repartition(6)
    got = gram_quantized(ds, quant_bits=10).to_pandas().sort_values(
        ["i", "j"]).reset_index(drop=True)
    con = duckdb.connect()
    con.register("embeddings", tab)
    from rayjoin.pipelines.gate import sql_embedding_gram
    exp = con.execute(sql_embedding_gram()).df().sort_values(
        ["i", "j"]).reset_index(drop=True)
    assert (got["gram_q"].to_numpy() == exp["gram_q"].to_numpy()).all()
