"""global_quantiles_no_sort vs a sorted reference, bit-exact."""

import math

import numpy as np
import pyarrow as pa
import pytest

from rayjoin.functions.stats import global_quantiles_no_sort


@pytest.mark.usefixtures("ray_session")
def test_global_quantiles_bit_exact_forced_refinement():
    import ray.data

    rng = np.random.default_rng(5)
    v = np.concatenate([
        rng.normal(0, 100, 60_000), np.full(5_000, 3.25),
        [-1e308, 1e308, 0.0, -0.0], rng.uniform(-1e-5, 1e-5, 1_000),
    ])
    rng.shuffle(v)
    ds = ray.data.from_arrow(pa.table({"value": pa.array(v)})).repartition(8)
    qs = (0.0, 0.01, 0.5, 0.9, 1.0)
    # gather_cap=50 forces several histogram passes before any gather
    res = global_quantiles_no_sort(ds, value_col="value", qs=qs,
                                   gather_cap=50).to_pandas()
    sv = np.sort(v)
    for q, got in zip(qs, res.value):
        rank = min(max(math.ceil(q * v.size), 1), v.size)
        exp = sv[rank - 1]
        assert np.float64(got).view(np.int64) == np.float64(exp).view(np.int64)


@pytest.mark.usefixtures("ray_session")
def test_global_quantiles_all_equal_and_rejects_nan():
    import ray.data

    ds = ray.data.from_arrow(pa.table({"value": pa.array([7.5] * 100)}))
    res = global_quantiles_no_sort(ds, value_col="value", qs=(0.5,),
                                   gather_cap=10).to_pandas()
    assert list(res.value) == [7.5]

    bad = ray.data.from_arrow(pa.table({"value": pa.array([1.0, float("nan")])}))
    with pytest.raises(Exception, match="NaN"):
        global_quantiles_no_sort(bad, value_col="value", qs=(0.5,))
