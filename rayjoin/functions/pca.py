"""Distributed Gram/covariance computation over an embedding column, and
driver-side PCA built on it.

The distributed piece is the classic one-pass sufficient-statistics
pattern: every block contributes ``X^T X`` (dim x dim doubles), the column
sums and a row count — tiny per-block partials, no shuffle, vectors never
leave their block.  The driver reduces partials in sorted block order
(vectorized segmented left fold, same discipline as ``kmeans_fit``) so the
statistics are bit-deterministic across runs, then finishes with an
O(dim^3) eigendecomposition that is trivially driver-sized (dim <= a few
thousand for any embedding column).

100 TB shape: one streaming pass; partial bytes are O(dim^2) per block and
independent of row count.  The projection (``pca_project``) is a second
streaming ``map_batches`` pass — one matmul per batch against the
broadcast (closure-captured, dim x n_components) component matrix.

Oracle contract: ``gram_quantized`` emits the Gram matrix floored onto a
fixed binary grid (``floor(g * 2^quant_bits + 0.5)`` as int64) so a SQL
twin summing in ITS own order lands on the same integers — measured
boundary margins on the testdata are ~1e-4, five orders above double
rounding (see gate row ``embedding_gram``).  Eigenvectors are sign-fixed
(largest-|coefficient| entry made positive) so PCA output is deterministic.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .ann import vec_matrix


def gram_and_mean(ds, *, id_col: str = "vec_id", vec_col: str = "embedding"):
    """One streaming pass -> ``(G, colsum, n)`` where ``G = X^T X`` over all
    rows (float64), ``colsum = X.sum(axis=0)`` and ``n`` the row count."""
    import ray

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({
                "gram": pa.array([], pa.list_(pa.float64())),
                "csum": pa.array([], pa.list_(pa.float64())),
                "n": pa.array([], pa.int64()),
                "key": pa.array([], pa.int64()),
            })
        ids = np.asarray(t[id_col].combine_chunks(), np.int64)
        X = vec_matrix(t[vec_col].combine_chunks()).astype(np.float64)
        g = X.T @ X
        return pa.table({
            "gram": pa.array([g.ravel()], pa.list_(pa.float64())),
            "csum": pa.array([X.sum(axis=0)], pa.list_(pa.float64())),
            "n": pa.array([X.shape[0]], pa.int64()),
            "key": pa.array([int(ids.min())], pa.int64()),
        })

    parts = ds.select_columns([id_col, vec_col]).map_batches(
        partial, batch_format="pyarrow", batch_size=None)
    tabs = [t for t in ray.get(parts.to_arrow_refs()) if t.num_rows]
    if not tabs:
        raise ValueError("gram_and_mean: empty input dataset")
    pt = pa.concat_tables(tabs)
    keys = np.asarray(pt["key"].combine_chunks(), np.int64)
    order = np.argsort(keys, kind="stable")
    gs = vec_matrix(pt["gram"].combine_chunks())[order]
    cs = vec_matrix(pt["csum"].combine_chunks())[order]
    ns = np.asarray(pt["n"].combine_chunks(), np.int64)[order]
    # left fold in sorted block order -> bit-deterministic across runs
    G = gs[0].copy()
    C = cs[0].copy()
    for i in range(1, len(gs)):
        G += gs[i]
        C += cs[i]
    dim = int(round(np.sqrt(G.shape[0])))
    return G.reshape(dim, dim), C, int(ns.sum())


def gram_quantized(ds, *, id_col: str = "vec_id", vec_col: str = "embedding",
                   quant_bits: int = 10) -> pa.Table:
    """Gram matrix floored onto a fixed binary grid, as an exchange-exact
    (i, j, gram_q) int64 table — 1-based indices, both triangles, the shape
    a SQL ``GROUP BY i, j`` twin produces."""
    G, _, _ = gram_and_mean(ds, id_col=id_col, vec_col=vec_col)
    q = float(1 << quant_bits)
    gq = np.floor(G * q + 0.5).astype(np.int64)
    dim = G.shape[0]
    i = np.repeat(np.arange(1, dim + 1, dtype=np.int64), dim)
    j = np.tile(np.arange(1, dim + 1, dtype=np.int64), dim)
    return pa.table({"i": pa.array(i), "j": pa.array(j),
                     "gram_q": pa.array(gq.ravel())})


def pca_components(ds, *, n_components: int = 8, id_col: str = "vec_id",
                   vec_col: str = "embedding"):
    """(mean, components) of the top ``n_components`` principal axes from
    the one-pass sufficient statistics.  Components are rows of the
    returned (n_components, dim) matrix, eigenvalue-descending, each
    sign-fixed so its largest-|coefficient| entry (lowest index on ties)
    is positive — deterministic output for a spectrum without repeated
    eigenvalues."""
    G, csum, n = gram_and_mean(ds, id_col=id_col, vec_col=vec_col)
    if n < 2:
        raise ValueError("pca_components: need at least 2 rows")
    mean = csum / n
    cov = (G - n * np.outer(mean, mean)) / (n - 1)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    take = np.argsort(vals, kind="stable")[::-1][:n_components]
    comps = vecs[:, take].T
    flip = np.sign(comps[np.arange(len(comps)),
                         np.argmax(np.abs(comps), axis=1)])
    flip[flip == 0] = 1.0
    return mean, comps * flip[:, None]


def pca_project(ds, *, n_components: int = 8, id_col: str = "vec_id",
                vec_col: str = "embedding"):
    """Fit PCA, then a streaming projection pass.  Returns a Dataset of
    ``(id_col, proj: list<double>)`` where ``proj = comps @ (x - mean)``."""
    mean, comps = pca_components(
        ds, n_components=n_components, id_col=id_col, vec_col=vec_col)
    ct = comps.T.copy()

    def project(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({
                id_col: pa.array([], pa.int64()),
                "proj": pa.array([], pa.list_(pa.float64())),
            })
        X = vec_matrix(t[vec_col].combine_chunks()).astype(np.float64)
        P = (X - mean) @ ct
        inner = pa.array(P.ravel(), pa.float64())
        offs = pa.array(np.arange(0, P.size + 1, P.shape[1], dtype=np.int32))
        return pa.table({
            id_col: t[id_col],
            "proj": pa.ListArray.from_arrays(offs, inner),
        })

    return ds.select_columns([id_col, vec_col]).map_batches(
        project, batch_format="pyarrow", batch_size=None)


_JL_SIGN_CACHE: dict = {}


def _jl_signs(dim: int, out_dims: int) -> np.ndarray:
    """(dim, out_dims) ±1 int64 sign matrix, a pure function of position:
    sign[j, i] = +1 iff the top bit of
    fmix64(fnv1a64('jl:' + str(j*out_dims + i))) is set.

    Two pitfalls this construction dodges, both found by the
    distance-preservation test: (a) an affine double-hash h1 + idx*h2 has
    PERIODIC bit patterns in idx — with an even out_dims its bit 0 makes
    every column constant and the projection rank-1; (b) raw FNV-1a high
    bits barely avalanche on short near-identical strings ('jl:0' vs
    'jl:1' differ only below bit ~30), biasing the raw top bit to -0.95
    mean.  fmix64 restores iid-grade bits (see stages/geocode.fmix64),
    and DuckDB rebuilds every entry byte-exactly.  Cached per worker
    process — dim*out_dims scalar hashes, computed once, never shipped."""
    key = (dim, out_dims)
    m = _JL_SIGN_CACHE.get(key)
    if m is None:
        import pyarrow.compute as _pc

        from ..stages.geocode import fmix64, fnv1a64

        idx = np.arange(dim * out_dims, dtype=np.int64)
        s = _pc.binary_join_element_wise(
            pa.array(np.full(len(idx), "jl:"), pa.string()),
            _pc.cast(pa.array(idx, pa.int64()), pa.string()), "")
        h = fmix64(fnv1a64(s))
        m = np.where((h >> np.uint64(63)).astype(bool),
                     np.int64(1), np.int64(-1)).reshape(dim, out_dims)
        _JL_SIGN_CACHE[key] = m
    return m


def random_projection(ds, *, out_dims: int = 16, scale_bits: int = 20,
                      id_col: str = "vec_id", vec_col: str = "embedding"):
    """Johnson–Lindenstrauss random projection of an embedding column onto
    ``out_dims`` signed-sum coordinates (Achlioptas 2003, "Database-friendly
    random projections": entries drawn ±1 preserve pairwise distances in
    expectation like Gaussian JL, up to the constant 1/sqrt(out_dims) scale
    which we omit — the projection is used for bucketing/ANN preprocessing
    where only relative geometry matters).

    Integer-exact end to end: each float32 coordinate is quantized to
    v_int = floor(v * 2**scale_bits) (exact — a float32 mantissa times a
    power of two is exactly representable in float64, and int64 holds it),
    and proj[i] = sum_j sign[j,i] * v_int[j] is an int64 matmul, so the
    result is independent of summation order and bit-identical to the
    DuckDB twin's SUM regardless of either engine's reduction tree.

    100 TB shape: embarrassingly parallel — ONE map_batches pass, the
    (dim x out_dims) sign matrix is rebuilt per worker from two scalar
    hashes (nothing broadcast), the per-block work is a single int64
    matmul, and no shuffle exists anywhere.  Output is long-format
    Dataset[(id, out_dim, proj)] ready for groupby-free downstream use.
    """
    from .ann import vec_matrix

    if out_dims < 1:
        raise ValueError("random_projection: out_dims must be >= 1")
    scale = float(1 << scale_bits)

    def project(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "out_dim": pa.array([], pa.int64()),
                             "proj": pa.array([], pa.int64())})
        ids = np.asarray(t[id_col].combine_chunks(), np.int64)
        m = vec_matrix(t[vec_col])
        v_int = np.floor(m * scale).astype(np.int64)
        proj = v_int @ _jl_signs(m.shape[1], out_dims)
        n = len(ids)
        return pa.table({
            id_col: pa.array(np.repeat(ids, out_dims), pa.int64()),
            "out_dim": pa.array(np.tile(np.arange(out_dims, dtype=np.int64), n),
                                pa.int64()),
            "proj": pa.array(proj.reshape(-1), pa.int64()),
        })

    return ds.select_columns([id_col, vec_col]).map_batches(
        project, batch_format="pyarrow", batch_size=None)
