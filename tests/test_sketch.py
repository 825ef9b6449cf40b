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
