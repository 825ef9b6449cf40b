"""Count-min / Bloom: overestimate + no-false-negative guarantees, merge laws."""
import numpy as np
import pyarrow as pa
import pytest

from rayjoin.functions.sketch import (
    bloom_bits, bloom_blob, bloom_member, cms_counts, cms_estimate,
)


def _ds(t, blocks):
    import ray.data

    return ray.data.from_arrow(t).repartition(blocks)


def _sketch_table(ds):
    import ray

    return pa.concat_tables(ray.get(ds.to_arrow_refs()))


def test_cms_never_undercounts_and_is_tight_when_sparse(ray_session):
    rng = np.random.default_rng(11)
    vals = rng.integers(0, 40, 3000).astype(np.int64)  # heavy repeats
    true = {v: int((vals == v).sum()) for v in np.unique(vals)}
    t = pa.table({"v": pa.array(vals)})
    sk = _sketch_table(cms_counts(_ds(t, 5), value_col="v", d=4, w=4093))
    qs = list(true)
    est = cms_estimate(sk, qs, d=4, w=4093)
    for v, e in zip(qs, est):
        assert e >= true[v]
    # 40 distinct values in 4 rows of 4096 counters: collisions in ALL
    # 4 rows for one value are essentially impossible -> estimates exact
    assert [int(e) for e in est] == [true[v] for v in qs]


def test_cms_partition_invariant(ray_session):
    vals = (np.arange(2000, dtype=np.int64) % 17) * 31
    t = pa.table({"v": pa.array(vals)})
    a = (cms_counts(_ds(t, 1), value_col="v", d=3, w=251)
         .to_pandas().sort_values(["row", "col"]).reset_index(drop=True))
    b = (cms_counts(_ds(t, 9), value_col="v", d=3, w=251)
         .to_pandas().sort_values(["row", "col"]).reset_index(drop=True))
    assert a.equals(b)


def test_bloom_no_false_negatives(ray_session):
    import ray

    rng = np.random.default_rng(23)
    members = np.unique(rng.integers(0, 10**9, 500)).astype(np.int64)
    t = pa.table({"v": pa.array(members)})
    m, k = 8191, 5
    bits = _sketch_table(bloom_bits(_ds(t, 4), value_col="v", m=m, k=k))
    ref = ray.put(bloom_blob(bits, m=m))
    probe = pa.table({"v": pa.array(members)})
    out = bloom_member(_ds(probe, 3), value_col="v", blob_ref=ref,
                       m=m, k=k).to_pandas()
    assert out["maybe_member"].all()


def test_bloom_fp_rate_sane(ray_session):
    import ray

    members = np.arange(500, dtype=np.int64)
    non_members = np.arange(10_000, 30_000, dtype=np.int64)
    m, k = 8191, 5  # n=500 -> fill ~26%, fp ~ 0.26^5 ~ 1e-3
    t = pa.table({"v": pa.array(members)})
    bits = _sketch_table(bloom_bits(_ds(t, 2), value_col="v", m=m, k=k))
    ref = ray.put(bloom_blob(bits, m=m))
    out = bloom_member(_ds(pa.table({"v": pa.array(non_members)}), 4),
                       value_col="v", blob_ref=ref, m=m, k=k).to_pandas()
    fp = out["maybe_member"].mean()
    assert fp < 0.005, fp


def test_sketch_bad_args(ray_session):
    t = pa.table({"v": pa.array([1], pa.int64())})
    with pytest.raises(ValueError, match="d >= 1"):
        cms_counts(_ds(t, 1), value_col="v", d=0)
    with pytest.raises(ValueError, match="k >= 1"):
        bloom_bits(_ds(t, 1), value_col="v", k=0)


def test_heavy_hitters_exact_with_real_compression(ray_session):
    """Brute-force truth must be reproduced (tokens AND exact counts)
    whenever the soundness condition E < phi*n holds — including at
    capacity 20/25 where every Zipf batch (55+ distinct tokens) really
    compresses; a capacity too small to certify must raise loudly, never
    silently under-report."""
    from collections import Counter

    from rayjoin.functions.sketch import heavy_hitters

    rng = np.random.default_rng(5)
    vocab = [f"tok{i}" for i in range(60)]
    # zipf-ish draw: token i with weight 1/(i+1)
    w = 1.0 / np.arange(1, 61)
    ids = rng.choice(60, size=4000, p=w / w.sum())
    texts = [" ".join(vocab[i] for i in ids[j * 40:(j + 1) * 40])
             for j in range(100)]
    truth = Counter(vocab[i] for i in ids)
    n = sum(truth.values())
    phi_num, phi_den = 1, 20
    exp = {t: c for t, c in truth.items() if c * phi_den >= n * phi_num}
    assert 2 <= len(exp) < 60  # non-vacuous split

    t = pa.table({"text": pa.array(texts)})
    for cap in (20, 25, 1000):
        out = heavy_hitters(_ds(t, 7), phi_num=phi_num, phi_den=phi_den,
                            capacity=cap).to_pandas()
        got = dict(zip(out.token, out.cnt))
        assert got == exp, (cap, len(got), len(exp))

    # a capacity too small to certify now AUTO-RECOVERS (VERDICT r3 #5):
    # one warning, one re-summarize at the phi-derived sound capacity,
    # exact output — where r3 raised mid-job
    with pytest.warns(UserWarning, match="re-summarizing"):
        out = heavy_hitters(_ds(t, 7), phi_num=phi_num, phi_den=phi_den,
                            capacity=1).to_pandas()
    assert dict(zip(out.token, out.cnt)) == exp
    with pytest.raises(ValueError, match="positive rational"):
        heavy_hitters(_ds(t, 1), phi_num=0)
    with pytest.raises(ValueError, match="max_candidates"):
        heavy_hitters(_ds(t, 7), phi_num=1, phi_den=20, capacity=25,
                      max_candidates=1).to_pandas()


def test_kmv_sketch_and_intersect_vs_bruteforce(ray_session):
    """The bottom-k state equals the true k smallest distinct hashes (in
    the order-preserving sign-flipped domain), and the intersection stats
    match a brute-force replay; the Jaccard estimate lands near truth."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray
    import ray.data

    from rayjoin.functions.sketch import kmv_intersect_stats, kmv_sketch
    from rayjoin.stages.geocode import fnv1a64

    rng = np.random.default_rng(1)
    A = rng.integers(0, 5000, 20000).astype(np.int64)
    B = rng.integers(2500, 7500, 20000).astype(np.int64)
    k = 256

    def bottom(vals):
        h = np.unique(fnv1a64(pc.cast(pa.array(np.unique(vals)), pa.string())))
        return np.sort((h ^ np.uint64(1 << 63)).view(np.int64))[:k]

    sa = kmv_sketch(ray.data.from_arrow(pa.table({"v": A})).repartition(6),
                    value_col="v", k=k)
    sb = kmv_sketch(ray.data.from_arrow(pa.table({"v": B})).repartition(6),
                    value_col="v", k=k)
    got_a = np.sort(np.asarray(
        pa.concat_tables(ray.get(sa.to_arrow_refs()))["h"], dtype=np.int64))
    assert np.array_equal(got_a, bottom(A))

    stats = kmv_intersect_stats(sa, sb, k=k).to_pydict()
    ba, bb = bottom(A), bottom(B)
    theta = min(ba.max(), bb.max())
    common = np.intersect1d(ba, bb)
    merged = np.unique(np.concatenate([ba, bb]))
    assert stats["n_inter"][0] == int((common <= theta).sum())
    assert stats["n_union_k"][0] == int(min((merged <= theta).sum(), k))
    est = stats["n_inter"][0] / stats["n_union_k"][0]
    true_j = len(set(A) & set(B)) / len(set(A) | set(B))
    assert abs(est - true_j) < 0.12  # ~2 sigma at k=256
