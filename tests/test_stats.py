"""grouped_quantiles: exact per-key quantile_disc semantics, bucketed merge."""
import numpy as np
import pyarrow as pa
import pytest

from rayjoin.functions.stats import grouped_quantiles


def _ds(t, blocks=4):
    import ray.data

    return ray.data.from_arrow(t).repartition(blocks)


def _disc(vals, q):
    s = np.sort(vals)
    return s[max(int(np.ceil(q * s.size)) - 1, 0)]


def test_grouped_quantiles_matches_reference(ray_session):
    rng = np.random.default_rng(7)
    n = 5000
    key = rng.integers(0, 37, n).astype(np.int64)
    val = rng.integers(-1000, 1000, n).astype(np.int64)
    t = pa.table({"k": pa.array(key), "v": pa.array(val)})
    qs = (0.1, 0.5, 0.99)
    got = (
        grouped_quantiles(_ds(t), key_col="k", val_col="v", qs=qs,
                          num_buckets=8)
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    assert got["k"].tolist() == sorted(set(key.tolist()))
    for _, row in got.iterrows():
        g = val[key == row["k"]]
        assert row["n"] == g.size
        for q, lab in zip(qs, ("q10", "q50", "q99")):
            assert row[lab] == _disc(g, q), (row["k"], q)


def test_grouped_quantiles_single_and_tiny_groups(ray_session):
    # 1-element groups: every quantile is the element; q=0 clamps to index 0
    t = pa.table({"k": pa.array([1, 2, 2], pa.int64()),
                  "v": pa.array([42, -5, 7], pa.int64())})
    got = (
        grouped_quantiles(_ds(t, blocks=2), key_col="k", val_col="v",
                          qs=(0.0, 1.0), num_buckets=4)
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    assert got.loc[0, ["q0", "q100"]].tolist() == [42, 42]
    assert got.loc[1, ["q0", "q100"]].tolist() == [-5, 7]


def test_grouped_quantiles_bad_args(ray_session):
    t = pa.table({"k": pa.array([1], pa.int64()),
                  "v": pa.array([1], pa.int64())})
    with pytest.raises(ValueError, match="non-empty"):
        grouped_quantiles(_ds(t), key_col="k", val_col="v", qs=())
    with pytest.raises(ValueError, match="collide"):
        grouped_quantiles(_ds(t), key_col="k", val_col="v",
                          qs=(0.501, 0.502))


def test_grouped_quantiles_preagg_parity(ray_session):
    # pre_aggregate=True must be byte-identical to the row-level path,
    # including on skewed repeats and single-element groups
    rng = np.random.default_rng(13)
    n = 4000
    key = rng.integers(0, 25, n).astype(np.int64)
    val = rng.integers(-5, 5, n).astype(np.int64)  # heavy repeats
    key[0], val[0] = 999, 123  # singleton group
    t = pa.table({"k": pa.array(key), "v": pa.array(val)})
    qs = (0.0, 0.25, 0.5, 0.9, 1.0)
    a = (grouped_quantiles(_ds(t), key_col="k", val_col="v", qs=qs,
                           num_buckets=8)
         .to_pandas().sort_values("k").reset_index(drop=True))
    b = (grouped_quantiles(_ds(t), key_col="k", val_col="v", qs=qs,
                           num_buckets=8, pre_aggregate=True)
         .to_pandas().sort_values("k").reset_index(drop=True))
    assert a.equals(b)


@pytest.mark.usefixtures("ray_session")
def test_grouped_regression_and_slope():
    """Sufficient statistics match numpy polyfit-derived sums; slope uses
    exact Python-int cross terms (overflow-proof beyond int64)."""
    import ray.data

    from rayjoin.functions.stats import grouped_regression, regression_slope

    rng = np.random.default_rng(4)
    k = rng.integers(0, 5, 400).astype(np.int64)
    x = rng.integers(0, 4_000_000, 400).astype(np.int64)
    y = (3 * x // 1000 + rng.integers(-50, 50, 400)).astype(np.int64)
    t = pa.table({"k": pa.array(k), "x": pa.array(x), "y": pa.array(y)})
    out = grouped_regression(ray.data.from_arrow(t).repartition(4),
                             key_col="k", x_col="x", y_col="y").to_pandas()
    out = out.sort_values("k").reset_index(drop=True)
    for _, row in out.iterrows():
        m = k == row.k
        assert row.n == m.sum()
        assert row.sum_x == x[m].sum() and row.sum_y == y[m].sum()
        assert row.sum_xx == (x[m] * x[m]).sum() and row.sum_xy == (x[m] * y[m]).sum()
    st = regression_slope(pa.Table.from_pandas(out))
    sl = st["slope"].to_pylist()
    for i, row in out.iterrows():
        m = k == row.k
        exp = np.polyfit(x[m].astype(float), y[m].astype(float), 1)[0]
        assert abs(sl[i] - exp) < 1e-6 * max(abs(exp), 1)
    # overflow guard: cross terms beyond int64 stay exact via Python ints
    stats = pa.table({
        "k": pa.array([1], pa.int64()), "n": pa.array([3_000_000_000], pa.int64()),
        "sum_x": pa.array([4_000_000_000], pa.int64()),
        "sum_y": pa.array([5_000_000_000], pa.int64()),
        "sum_xx": pa.array([8_000_000_000], pa.int64()),
        "sum_xy": pa.array([7_000_000_000], pa.int64()),
    })
    r = regression_slope(stats)
    n, a, b, c, d = 3_000_000_000, 4_000_000_000, 5_000_000_000, 8_000_000_000, 7_000_000_000
    assert r["slope"].to_pylist()[0] == (n * d - a * b) / (n * c - a * a)


def _brute_skyline(X, maximize):
    Y = X * np.where(maximize, 1.0, -1.0)
    keep = []
    for i in range(len(Y)):
        dom = ((Y >= Y[i]).all(axis=1) & (Y > Y[i]).any(axis=1)).any()
        if not dom:
            keep.append(i)
    return set(keep)


def _sky_table(A):
    d = A.shape[1]
    cols = {f"c{i}": pa.array(A[:, i]) for i in range(d)}
    cols["rid"] = pa.array(np.arange(len(A)), pa.int64())
    return pa.table(cols)


def test_skyline_vs_bruteforce(ray_session):
    from rayjoin.functions.stats import skyline

    rng = np.random.default_rng(7)
    for n, d, corr in [(3000, 2, 0.0), (2000, 3, 0.0), (1500, 3, -0.9)]:
        A = rng.normal(size=(n, d))
        if corr:
            A[:, 1] = corr * A[:, 0] + (1 - abs(corr)) * A[:, 1]
        A = np.round(A, 3)  # induce duplicates and per-column ties
        maxi = [True] * (d - 1) + [False]
        out = skyline(_ds(_sky_table(A), 6),
                      cols=[f"c{i}" for i in range(d)],
                      maximize=maxi).to_pandas()
        assert set(out.rid.astype(int)) == _brute_skyline(A, np.array(maxi))


def test_skyline_duplicates_all_survive(ray_session):
    from rayjoin.functions.stats import skyline

    # three byte-equal frontier points + one dominated point
    A = np.array([[5.0, 5.0], [5.0, 5.0], [5.0, 5.0], [1.0, 1.0]])
    out = skyline(_ds(_sky_table(A), 2), cols=["c0", "c1"],
                  maximize=[True, True]).to_pandas()
    assert sorted(out.rid.astype(int)) == [0, 1, 2]


def test_skyline_cap_raises_on_anticorrelated(ray_session):
    from rayjoin.functions.stats import skyline

    # a pure diagonal: every point is on the frontier, cap must fire loudly
    n = 64
    A = np.stack([np.arange(n, dtype=np.float64),
                  -np.arange(n, dtype=np.float64)], axis=1)
    with pytest.raises(ValueError, match="cap"):
        skyline(_ds(_sky_table(A), 4), cols=["c0", "c1"],
                maximize=[True, True], cap=8, shrink_rounds=2)
    ok = skyline(_ds(_sky_table(A), 4), cols=["c0", "c1"],
                 maximize=[True, True]).to_pandas()
    assert len(ok) == n

    with pytest.raises(ValueError, match="maximize"):
        skyline(_ds(_sky_table(A), 1), cols=["c0"], maximize=[True, False])


def test_rrf_fuse_vs_python_reference(ray_session):
    from rayjoin.functions.stats import rrf_fuse

    rng = np.random.default_rng(13)
    n = 500
    ids = np.arange(n, dtype=np.int64)
    a = rng.permutation(n).astype(np.int64)
    b = rng.permutation(n).astype(np.int64)
    # pack tiebreak-free unique keys directly
    t = pa.table({"rid": pa.array(ids), "ka": pa.array(a), "kb": pa.array(b)})
    out = rrf_fuse(_ds(t, 5), rank_cols=["ka", "kb"]).to_pandas()

    ra = np.argsort(np.argsort(a)) + 1  # rank of each row under key a
    rb = np.argsort(np.argsort(b)) + 1
    want = 1_000_000 // (60 + ra) + 1_000_000 // (60 + rb)
    got = out.sort_values("rid").rrf.to_numpy()
    assert np.array_equal(got, want)

    with pytest.raises(ValueError):
        rrf_fuse(_ds(t, 1), rank_cols=[])
    with pytest.raises(ValueError, match="distinct"):
        rrf_fuse(_ds(t, 1), rank_cols=["ka"], max_distinct=10)


def test_grouped_mad_vs_bruteforce_both_tiers(ray_session):
    from rayjoin.functions.stats import grouped_mad

    rng = np.random.default_rng(21)
    n = 4000
    key = rng.integers(0, 29, n).astype(np.int64)
    val = rng.integers(-500, 500, n).astype(np.int64)
    t = pa.table({"k": pa.array(key), "v": pa.array(val)})

    got = (grouped_mad(_ds(t), key_col="k", val_col="v")
           .to_pandas().sort_values("k").reset_index(drop=True))
    # forced hash-join tier must produce the identical table
    forced = (grouped_mad(_ds(t), key_col="k", val_col="v",
                          broadcast_rows=0)
              .to_pandas().sort_values("k").reset_index(drop=True))
    assert got.astype("int64").equals(forced.astype("int64"))

    assert got["k"].tolist() == sorted(set(key.tolist()))
    for _, row in got.iterrows():
        g = val[key == row["k"]]
        med = _disc(g, 0.5)
        assert row["n"] == g.size
        assert row["med"] == med
        assert row["mad"] == _disc(np.abs(g - med), 0.5), row["k"]


def test_mad_outliers_vs_bruteforce_both_tiers(ray_session):
    from rayjoin.functions.stats import mad_outliers

    rng = np.random.default_rng(5)
    n = 3000
    key = rng.integers(0, 17, n).astype(np.int64)
    # heavy-tailed: a tight core plus ~3% far spikes so MAD stays small
    # while real outliers exist
    val = rng.integers(-50, 50, n).astype(np.int64)
    spikes = rng.random(n) < 0.03
    val[spikes] *= 100
    rid = np.arange(n, dtype=np.int64)
    t = pa.table({"rid": pa.array(rid), "k": pa.array(key),
                  "v": pa.array(val)})

    got = (mad_outliers(_ds(t), key_col="k", val_col="v", k_milli=3000)
           .to_pandas().sort_values("rid").reset_index(drop=True))
    forced = (mad_outliers(_ds(t), key_col="k", val_col="v", k_milli=3000,
                           broadcast_rows=0)
              .to_pandas().sort_values("rid").reset_index(drop=True))
    assert got.astype("int64").equals(
        forced[got.columns].astype("int64"))

    want = set()
    for kk in np.unique(key):
        g = val[key == kk]
        med = _disc(g, 0.5)
        mad = _disc(np.abs(g - med), 0.5)
        for r, v in zip(rid[key == kk], g):
            if 1000 * abs(int(v) - int(med)) > 3000 * int(mad):
                want.add(int(r))
    assert set(got["rid"].tolist()) == want
    assert want  # the fixture actually flags something


def test_rollup_sums_vs_pandas_oracle(ray_session):
    import pandas as pd
    import ray.data

    from rayjoin.functions.stats import rollup_sums

    rng = np.random.default_rng(9)
    n = 5000
    cat = np.array(["a", "b", "c"])[rng.integers(0, 3, n)]
    bk = rng.integers(0, 6, n).astype(np.int64)
    vm = rng.integers(-1000, 1000, n).astype(np.int64)
    t = pa.table({"cat": pa.array(cat.tolist(), pa.string()),
                  "bk": pa.array(bk), "vm": pa.array(vm)})
    out = rollup_sums(_ds(t, 6), cat_col="cat", bucket_col="bk",
                      vm_col="vm").to_pandas()
    got = {(r.cat, int(r.bk)): (int(r.n), int(r.sum_vm))
           for r in out.itertuples()}

    df = pd.DataFrame({"cat": cat, "bk": bk, "vm": vm})
    want = {}
    g2 = df.groupby(["cat", "bk"])["vm"].agg(["count", "sum"])
    for (c, b), row in g2.iterrows():
        want[(c, int(b))] = (int(row["count"]), int(row["sum"]))
    g1 = df.groupby("cat")["vm"].agg(["count", "sum"])
    for c, row in g1.iterrows():
        want[(c, -1)] = (int(row["count"]), int(row["sum"]))
    want[("ALL", -1)] = (n, int(vm.sum()))
    assert got == want


def test_grouped_mode_vs_pandas_oracle(ray_session):
    import pandas as pd

    from rayjoin.functions.stats import grouped_mode

    rng = np.random.default_rng(31)
    n = 4000
    key = rng.integers(0, 50, n).astype(np.int64)
    cat = np.array(["zz", "ab", "aa", "b"])[rng.integers(0, 4, n)]
    t = pa.table({"k": pa.array(key),
                  "c": pa.array(cat.tolist(), pa.string())})
    out = grouped_mode(_ds(t, 6), key_col="k", cat_col="c",
                       num_buckets=9).to_pandas()
    got = {int(r.k): (r.top, int(r.n)) for r in out.itertuples()}

    df = pd.DataFrame({"k": key, "c": cat})
    want = {}
    for kk, grp in df.groupby("k"):
        vc = grp["c"].value_counts()
        top_n = int(vc.max())
        # tie-break: smallest category string among the max-count ones
        top = min(c for c, v in vc.items() if v == top_n)
        want[int(kk)] = (top, top_n)
    assert got == want


def test_profile_columns_exact(ray_session):
    import ray.data

    from rayjoin.functions.stats import profile_columns

    t = pa.table({
        "a": pa.array([3, 1, 2, 2, None, 7], pa.int64()),
        "s": pa.array(["b", "", None, "b", "aa", "z"], pa.string()),
        "allnull": pa.array([None] * 6, pa.int64()),
    })
    out = (profile_columns(ray.data.from_arrow(t).repartition(3),
                           ["a", "s", "allnull"])
           .to_pandas().set_index("col_name"))
    a = out.loc["a"]
    assert (a.n_rows, a.n_null, a.n_distinct, a.min_i, a.max_i) == (6, 1, 4, 1, 7)
    assert a.min_s is None  # string lane empty for int columns
    s = out.loc["s"]
    assert (s.n_rows, s.n_null, s.n_distinct, s.min_s, s.max_s) == (6, 1, 4, "", "z")
    nn = out.loc["allnull"]
    assert (nn.n_rows, nn.n_null, nn.n_distinct) == (6, 6, 0)


@pytest.mark.parametrize("preagg", [False, True])
def test_grouped_weighted_quantiles_vs_brute(ray_session, preagg):
    import ray.data

    from rayjoin.functions.stats import grouped_quantiles

    rng = np.random.default_rng(41)
    n = 2000
    key = rng.integers(0, 30, n).astype(np.int64)
    val = rng.integers(-50, 50, n).astype(np.int64)
    wt = rng.integers(1, 10, n).astype(np.int64)
    ds = ray.data.from_arrow(pa.table({
        "k": pa.array(key), "v": pa.array(val), "w": pa.array(wt)})
    ).repartition(4)
    out = (grouped_quantiles(ds, key_col="k", val_col="v", qs=(0.25, 0.5, 0.9),
                             weight_col="w", pre_aggregate=preagg)
           .to_pandas().set_index("k").sort_index())

    import math
    for k in np.unique(key):
        m = key == k
        order = np.argsort(val[m], kind="stable")
        v, w = val[m][order], wt[m][order]
        cw = np.cumsum(w)
        W = int(cw[-1])
        assert out.loc[k, "n"] == W
        for q, lab in ((0.25, "q25"), (0.5, "q50"), (0.9, "q90")):
            rank = min(max(math.ceil(q * W), 1), W)
            assert out.loc[k, lab] == v[np.searchsorted(cw, rank)], (k, lab)


def test_grouped_weighted_quantiles_rejects_nonpositive(ray_session):
    import ray.data

    from rayjoin.functions.stats import grouped_quantiles

    ds = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 1], pa.int64()), "v": pa.array([1, 2], pa.int64()),
        "w": pa.array([1, 0], pa.int64())}))
    with pytest.raises(Exception, match="strictly positive"):
        grouped_quantiles(ds, key_col="k", val_col="v",
                          weight_col="w").materialize()
