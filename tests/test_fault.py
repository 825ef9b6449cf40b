"""Fault injection: kill a worker process mid-pipeline and assert the job
still produces the exact expected output (north rule: resumes mid-shuffle
after actor loss).  Ray Data's lineage-based task retry is the mechanism;
these tests prove OUR stages are retry-safe — deterministic, side-effect
free, no per-worker hidden state — so a retried attempt reproduces the
lost block bit-for-bit.

The kill is ``os._exit(1)`` guarded by an O_EXCL marker file: the first
worker to reach the stage dies without any cleanup (like a lost node);
retried attempts see the marker and proceed.  Kill closures are defined
INSIDE each test so cloudpickle ships them by value (workers can't import
the test module)."""

import os

import numpy as np
import pyarrow as pa
import pytest


def _make_killer(marker: str):
    """Build a by-value-picklable kill-once callable."""

    def kill_once():
        try:
            fd = os.open(marker, os.O_CREAT | os.O_EXCL)
        except FileExistsError:
            return
        os.close(fd)
        os._exit(1)

    return kill_once


@pytest.mark.usefixtures("ray_session")
def test_map_stage_survives_worker_kill(tmp_path):
    import ray.data

    kill_once = _make_killer(str(tmp_path / "map_killed"))

    def double(t: pa.Table) -> pa.Table:
        kill_once()
        v = np.asarray(t["id"].combine_chunks(), np.int64)
        return pa.table({"id": t["id"], "twice": pa.array(v * 2, pa.int64())})

    n = 50_000
    out = (
        ray.data.range(n, override_num_blocks=16)
        .map_batches(double, batch_format="pyarrow")
        .to_pandas()
        .sort_values("id")
    )
    assert os.path.exists(str(tmp_path / "map_killed"))  # the kill happened
    assert len(out) == n
    assert (out["twice"].to_numpy() == out["id"].to_numpy() * 2).all()


@pytest.mark.usefixtures("ray_session")
def test_groupby_shuffle_survives_reduce_side_kill(tmp_path):
    """Kill INSIDE a map_groups reducer — after the all-to-all exchange has
    started consuming shuffled blocks — and assert the grouped aggregate is
    still exact (the mid-shuffle case)."""
    import ray.data

    kill_once = _make_killer(str(tmp_path / "reduce_killed"))

    def per_group(t: pa.Table) -> pa.Table:
        kill_once()
        k = np.asarray(t["key"].combine_chunks(), np.int64)
        v = np.asarray(t["val"].combine_chunks(), np.int64)
        return pa.table({"key": pa.array(k[:1], pa.int64()),
                         "total": pa.array([int(v.sum())], pa.int64())})

    n = 20_000
    ids = np.arange(n, dtype=np.int64)
    t = pa.table({"key": pa.array(ids % 32), "val": pa.array(ids)})
    out = (
        ray.data.from_arrow(t)
        .repartition(8)
        .groupby("key")
        .map_groups(per_group, batch_format="pyarrow")
        .to_pandas()
        .sort_values("key")
    )
    assert os.path.exists(str(tmp_path / "reduce_killed"))
    exp = {k: int(ids[ids % 32 == k].sum()) for k in range(32)}
    assert dict(zip(out["key"], out["total"])) == exp


@pytest.mark.usefixtures("ray_session")
def test_partitioned_join_survives_worker_kill(tmp_path):
    """The engine's own wide path: PBSM partitioned spatial join with a
    worker killed on the big side mid-flow still matches the broadcast
    plan's rows exactly."""
    import ray.data

    from rayjoin.config import Interaction
    from rayjoin.fixtures import mixed_random
    from rayjoin.geom.encode import geoms_to_table
    from rayjoin.join.broadcast import SpatialIndex
    from rayjoin.join.partitioned import partitioned_spatial_join

    small = geoms_to_table(mixed_random(60, seed=21))
    big = geoms_to_table(mixed_random(400, seed=22))
    exp = SpatialIndex(small).spatial_join(
        ray.data.from_arrow(big), Interaction.INTERSECTS
    ).to_pandas()

    kill_once = _make_killer(str(tmp_path / "probe_killed"))

    def pass_through(t: pa.Table) -> pa.Table:
        kill_once()
        return t

    big_ds = ray.data.from_arrow(big).map_batches(pass_through,
                                                  batch_format="pyarrow")
    got = partitioned_spatial_join(
        big_ds, ray.data.from_arrow(small), Interaction.INTERSECTS
    ).to_pandas()
    assert os.path.exists(str(tmp_path / "probe_killed"))
    key = lambda df: sorted(map(tuple, df[sorted(df.columns)].values))
    assert key(got) == key(exp)


@pytest.mark.usefixtures("ray_session")
def test_duplicated_windows_survives_worker_kill(tmp_path, monkeypatch):
    """Kill a worker during the exact-substring pass-B candidate scan; the
    two-pass pipeline (pre-aggregated counts -> broadcast dup set ->
    rescan -> bucketed verify) must still produce the exact counts."""
    import ray.data

    from rayjoin.functions import dedup as D
    from rayjoin.functions.dedup import duplicated_windows

    kill_once = _make_killer(str(tmp_path / "substr_killed"))

    # wrap _flat_windows so one pass-B worker dies mid-scan (by-value pickle)
    orig = D._flat_windows

    rng = np.random.default_rng(17)
    W = 12
    docs = ["".join(rng.choice(list("abcdef"), 60)) for _ in range(400)]
    docs += docs[:20]  # exact twins -> every window of those docs is dup
    ids = list(range(len(docs)))
    t = pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(docs)})

    from collections import Counter

    wins = Counter(s[p:p + W] for s in docs for p in range(len(s) - W + 1))
    exp = {}
    for i, s in zip(ids, docs):
        c = sum(1 for p in range(len(s) - W + 1) if wins[s[p:p + W]] >= 2)
        if c:
            exp[i] = c

    def flaky_flat_windows(texts, k=5):
        kill_once()
        return orig(texts, k)

    monkeypatch.setattr(D, "_flat_windows", flaky_flat_windows)
    out = duplicated_windows(
        ray.data.from_arrow(t).repartition(8), window=W
    ).to_pandas()
    assert os.path.exists(str(tmp_path / "substr_killed"))
    assert dict(zip(out.doc_id, out.n_dup_windows)) == exp
