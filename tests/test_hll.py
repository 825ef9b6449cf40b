"""HyperLogLog: register determinism / shard-merge property, estimate error."""
import numpy as np
import pyarrow as pa
import pytest

from rayjoin.functions.stats import hll_estimate, hll_registers


def _ds(t, blocks):
    import ray.data

    return ray.data.from_arrow(t).repartition(blocks)


def _ref_registers(values, p):
    """Pure-numpy reference: registers straight from the definition."""
    from rayjoin.functions.corpus_ops import id_sample_hash

    h = id_sample_hash(pa.array(values, pa.int64()))
    w = 64 - p
    reg = (h >> np.uint64(w)).astype(np.int64)
    low = (h & np.uint64((1 << w) - 1)).astype(np.int64)
    arr = np.zeros(1 << p, np.int64)
    for r, x in zip(reg, low):
        rho = w - int(x).bit_length() + 1
        arr[r] = max(arr[r], rho)
    touched = np.flatnonzero(arr)
    return {int(r): int(arr[r]) for r in touched}


def test_hll_registers_match_definition(ray_session):
    rng = np.random.default_rng(3)
    vals = rng.integers(0, 10**12, 3000).astype(np.int64)
    t = pa.table({"v": pa.array(vals)})
    got = (hll_registers(_ds(t, 4), value_col="v", p=10)
           .to_pandas().sort_values("reg"))
    ref = _ref_registers(vals, p=10)
    assert dict(zip(got["reg"], got["max_rho"])) == ref


def test_hll_registers_shard_and_dup_invariant(ray_session):
    # Registers are a pure function of the VALUE SET: duplicating every row
    # and changing the partitioning must leave the table bit-identical
    # (this is the merge-by-max union property that makes retries exact).
    rng = np.random.default_rng(5)
    vals = rng.integers(0, 10**9, 2000).astype(np.int64)
    t1 = pa.table({"v": pa.array(vals)})
    t2 = pa.table({"v": pa.array(np.concatenate([vals, vals[::-1]]))})
    a = (hll_registers(_ds(t1, 2), value_col="v", p=12)
         .to_pandas().sort_values("reg").reset_index(drop=True))
    b = (hll_registers(_ds(t2, 7), value_col="v", p=12)
         .to_pandas().sort_values("reg").reset_index(drop=True))
    assert a.equals(b)


def test_hll_estimate_error(ray_session):
    # p=14 -> relative std error ~1.04/sqrt(2^14) = 0.8%; allow 4 sigma.
    import pyarrow as pa

    for n in (500, 20_000, 200_000):
        vals = np.arange(n, dtype=np.int64) * 7919 + 13
        t = pa.table({"v": pa.array(vals)})
        regs = hll_registers(_ds(t, 4), value_col="v", p=14).to_pandas()
        est = hll_estimate(pa.Table.from_pandas(regs), p=14)
        assert abs(est - n) / n < 0.033, (n, est)


def test_hll_bad_p(ray_session):
    t = pa.table({"v": pa.array([1], pa.int64())})
    with pytest.raises(ValueError, match="p must be"):
        hll_registers(_ds(t, 1), value_col="v", p=3)
