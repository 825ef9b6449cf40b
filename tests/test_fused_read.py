"""Fused per-shard parquet execution (sources/fused.py): output equality
with the Dataset-form read_parquet().map_batches(fn) pipeline, in both
streaming and write-through modes."""

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq


def _shards(tmp_path, n_files=6, rows_per=100):
    d = str(tmp_path / "in")
    os.makedirs(d)
    for i in range(n_files):
        base = i * rows_per
        t = pa.table({
            "k": pa.array(range(base, base + rows_per), pa.int64()),
            "v": pa.array([float(x % 7) for x in range(base, base + rows_per)],
                          pa.float64()),
            "junk": pa.array(["x"] * rows_per, pa.string()),
        })
        pq.write_table(t, os.path.join(d, f"s-{i:03d}.parquet"))
    return d


def _make_fn():
    # defined per-call so cloudpickle ships it by VALUE (workers cannot
    # import the test module — same pattern as test_fault.py)
    def fn(t: pa.Table) -> pa.Table:
        keep = t.filter(pc.greater(t["v"], 2.0))
        return pa.table({
            "k2": pc.multiply(keep["k"], 2),
            "cents": pc.cast(pc.floor(pc.multiply(keep["v"], 100.0)),
                             pa.int64()),
        })
    return fn


def test_fused_matches_dataset_form(ray_session, tmp_path):
    import ray.data

    from rayjoin.sources.fused import map_parquet_shards

    d = _shards(tmp_path)
    got = (
        map_parquet_shards(d, _make_fn(), columns=["k", "v"])
        .to_pandas().sort_values("k2").reset_index(drop=True)
    )
    want = (
        ray.data.read_parquet(d, columns=["k", "v"])
        .map_batches(_make_fn(), batch_format="pyarrow")
        .to_pandas().sort_values("k2").reset_index(drop=True)
    )
    assert got.equals(want)


def test_fused_write_through(ray_session, tmp_path):
    from rayjoin.sources.fused import map_parquet_shards

    d = _shards(tmp_path)
    out = str(tmp_path / "out")
    acct = map_parquet_shards(d, _make_fn(), columns=["k", "v"],
                              write_dir=out).to_pandas()
    # one same-named output shard per input shard
    assert sorted(os.path.basename(p) for p in acct["path"]) == sorted(
        f for f in os.listdir(d) if f.endswith(".parquet"))
    # written rows == accounting rows == streaming-mode rows
    written = sum(pq.ParquetFile(os.path.join(out, f)).metadata.num_rows
                  for f in os.listdir(out))
    assert written == int(acct["rows"].sum())
    got = map_parquet_shards(d, _make_fn(), columns=["k", "v"]).count()
    assert written == got


def test_fused_single_file_and_list(ray_session, tmp_path):
    from rayjoin.sources.fused import map_parquet_shards

    d = _shards(tmp_path, n_files=3)
    files = sorted(os.path.join(d, f) for f in os.listdir(d))
    one = map_parquet_shards(files[0], _make_fn(), columns=["k", "v"]).count()
    lst = map_parquet_shards(files, _make_fn(), columns=["k", "v"]).count()
    assert lst == map_parquet_shards(d, _make_fn(), columns=["k", "v"]).count()
    assert 0 < one < lst
