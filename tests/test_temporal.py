"""As-of and band joins vs brute-force numpy oracles, including timestamp
ties, empty sides, and bin-boundary cases."""

import numpy as np
import pyarrow as pa
import pytest

from rayjoin.functions.temporal import asof_join, band_join


def _mk_ds(tbl):
    import ray.data

    return ray.data.from_arrow(tbl)


def _events(rng, n, n_keys, ts_lo=0, ts_hi=10_000, tie_frac=0.0):
    ts = rng.integers(ts_lo, ts_hi, n)
    if tie_frac:
        # force duplicate timestamps within and across keys
        dup = rng.random(n) < tie_frac
        ts[dup] = rng.choice(ts[: max(1, n // 4)], dup.sum())
    return pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "user_id": pa.array(rng.integers(0, n_keys, n).astype(np.int64)),
            "ts": pa.array(ts.astype("datetime64[us]"), pa.timestamp("us")),
            "value": pa.array(rng.random(n)),
        }
    )


def _asof_brute(left, right, strict=True):
    """Per left row: right row with same key, max ts < (<=) left ts,
    ties by max event_id.  Returns matched right event_id or -1."""
    lk = left["user_id"].to_numpy()
    lt = left["ts"].cast(pa.int64()).to_numpy()
    rk = right["user_id"].to_numpy()
    rt = right["ts"].cast(pa.int64()).to_numpy()
    rid = right["event_id"].to_numpy()
    out = np.full(lk.size, -1, np.int64)
    for i in range(lk.size):
        ok = (rk == lk[i]) & ((rt < lt[i]) if strict else (rt <= lt[i]))
        if ok.any():
            cand = np.flatnonzero(ok)
            best = cand[np.lexsort((rid[cand], rt[cand]))][-1]
            out[i] = rid[best]
    return out


@pytest.mark.parametrize("strict,tie_frac", [(True, 0.0), (True, 0.5), (False, 0.5)])
def test_asof_join_matches_brute(ray_session, strict, tie_frac):
    rng = np.random.default_rng(7 if strict else 11)
    left = _events(rng, 400, 12, tie_frac=tie_frac)
    right = _events(rng, 300, 12, tie_frac=tie_frac)
    got = (
        asof_join(
            _mk_ds(left), _mk_ds(right), key_col="user_id",
            left_cols={"event_id": "event_id", "ts": "ts"},
            right_cols={"event_id": "match_id", "ts": "match_ts"},
            right_tiebreak_col="event_id", strict=strict, num_buckets=8,
        )
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert len(got) == left.num_rows
    want = _asof_brute(left, right, strict=strict)
    got_match = got["match_id"].fillna(-1).astype(np.int64).to_numpy()
    assert (got_match == want).all()
    # matched ts column equals the matched right row's ts
    rid_to_ts = dict(
        zip(right["event_id"].to_numpy(), right["ts"].cast(pa.int64()).to_numpy())
    )
    for mid, mts in zip(got_match, got["match_ts"]):
        if mid >= 0:
            assert int(pa.scalar(mts).cast(pa.int64()).as_py()) == rid_to_ts[mid]
        else:
            assert mts is None or mts != mts  # NaT


def test_asof_join_empty_right(ray_session):
    rng = np.random.default_rng(3)
    left = _events(rng, 50, 4)
    right = _events(rng, 40, 4).filter(pa.array([False] * 40))
    got = asof_join(
        _mk_ds(left), _mk_ds(right), key_col="user_id",
        left_cols={"event_id": "event_id"},
        right_cols={"event_id": "match_id"},
        right_tiebreak_col="event_id", num_buckets=4,
    ).to_pandas()
    assert len(got) == 50 and got["match_id"].isna().all()


def _band_brute(left, right, lo, hi):
    lk = left["user_id"].to_numpy()
    lt = left["ts"].cast(pa.int64()).to_numpy()
    lid = left["event_id"].to_numpy()
    rk = right["user_id"].to_numpy()
    rt = right["ts"].cast(pa.int64()).to_numpy()
    rid = right["event_id"].to_numpy()
    pairs = set()
    for i in range(lk.size):
        ok = (rk == lk[i]) & (rt - lt[i] >= lo) & (rt - lt[i] < hi)
        for j in np.flatnonzero(ok):
            pairs.add((int(lid[i]), int(rid[j])))
    return pairs


@pytest.mark.parametrize("lo,hi", [(0, 500), (-250, 250), (100, 101), (-7, 1000)])
def test_band_join_matches_brute(ray_session, lo, hi):
    rng = np.random.default_rng(lo + hi)
    left = _events(rng, 300, 6, ts_hi=4000, tie_frac=0.3)
    right = _events(rng, 300, 6, ts_hi=4000, tie_frac=0.3)
    got = band_join(
        _mk_ds(left), _mk_ds(right), key_col="user_id",
        lower_us=lo, upper_us=hi,
        left_cols={"event_id": "a_id"},
        right_cols={"event_id": "b_id"}, num_buckets=8,
    ).to_pandas()
    got_pairs = set(zip(got["a_id"].astype(int), got["b_id"].astype(int)))
    assert len(got) == len(got_pairs), "duplicate pairs emitted"
    assert got_pairs == _band_brute(left, right, lo, hi)


def test_band_join_no_matches(ray_session):
    rng = np.random.default_rng(5)
    left = _events(rng, 30, 3, ts_lo=0, ts_hi=10)
    right = _events(rng, 30, 3, ts_lo=1_000_000, ts_hi=1_000_010)
    got = band_join(
        _mk_ds(left), _mk_ds(right), key_col="user_id",
        lower_us=0, upper_us=100,
        left_cols={"event_id": "a_id"},
        right_cols={"event_id": "b_id"}, num_buckets=4,
    ).to_pandas()
    assert len(got) == 0


def test_interval_join_vs_bruteforce(ray_session):
    import ray.data

    from rayjoin.functions.temporal import interval_join

    rng = np.random.default_rng(3)
    na, nb = 400, 350
    cell = 1000  # small cell so most intervals span several cells

    def mk(n, seed_off):
        s = rng.integers(0, 20_000, n).astype(np.int64)
        dur = rng.integers(0, 5_000, n).astype(np.int64)  # 0-length allowed
        ids = np.arange(n, dtype=np.int64) + seed_off
        return ids, s, s + dur

    ida, sa, ea = mk(na, 0)
    idb, sb, eb = mk(nb, 10_000)

    def ds_of(ids, s, e):
        return ray.data.from_arrow(pa.table({
            "id": pa.array(ids), "start_us": pa.array(s),
            "end_us": pa.array(e)})).repartition(4)

    out = interval_join(ds_of(ida, sa, ea), ds_of(idb, sb, eb),
                        cell_us=cell, num_buckets=13).to_pandas()
    got = set(zip(out["id_a"].tolist(), out["id_b"].tolist()))

    want = set()
    for i in range(na):
        hit = (sb <= ea[i]) & (eb >= sa[i])
        for j in np.flatnonzero(hit):
            want.add((int(ida[i]), int(idb[j])))
    assert got == want
    assert len(out) == len(got)  # reference-cell dedup: no pair twice
    assert want  # fixture overlaps exist

    # Ray wraps the UDF's ValueError in RayTaskError — match the message
    with pytest.raises(Exception, match="end < start"):
        interval_join(ds_of(ida[:2], sa[:2], sa[:2] - 1),
                      ds_of(idb[:2], sb[:2], eb[:2]),
                      cell_us=cell).materialize()

    # duration variant: same pairs plus exact overlap lengths
    out_d = interval_join(ds_of(ida, sa, ea), ds_of(idb, sb, eb),
                          cell_us=cell, num_buckets=13,
                          duration_col="ov_us").to_pandas()
    got_d = {(r.id_a, r.id_b): r.ov_us for r in out_d.itertuples()}
    assert set(got_d) == want
    sa_by = {int(i): (int(s), int(e)) for i, s, e in zip(ida, sa, ea)}
    sb_by = {int(i): (int(s), int(e)) for i, s, e in zip(idb, sb, eb)}
    for (i, j), ov in got_d.items():
        (s1, e1), (s2, e2) = sa_by[i], sb_by[j]
        assert ov == min(e1, e2) - max(s1, s2) >= 0
