"""Fused per-shard parquet execution: decode -> transform [-> encode]
inside ONE task per file, so the decoded bulk data never crosses the
object store.

Why this exists (measured, BASELINE.md round-5): Ray Data never fuses the
Read operator into downstream maps — ``read_parquet(...).map_batches(fn)``
memcpys every decoded block into plasma and back out.  On a multi-node
cluster that cost scales with nodes; on any single machine it contends on
one memory controller (the round-5 I/O-inclusive scaling measurement:
0.47 efficiency at 8->32 CPUs for the Dataset form vs 0.86 for this fused
form on the identical pipeline).  When the per-shard transform is
reductive (filter, project, aggregate) or write-through (shard in ->
shard out), fusing the decode into the transform task removes that
round-trip entirely while keeping Ray Data's scheduling, streaming
backpressure and lineage-based retry (tasks are deterministic functions
of their path list).

Contract notes:
- ``fn`` receives one decoded ``pa.Table`` per FILE (column-pruned) and
  returns a ``pa.Table``.  With ``write_dir`` set, fn's output is written
  as the same-named shard and only (path, rows) metadata returns upstream
  — the resumable-job shape (one idempotent output per input shard).
- Shard files ARE the parallelism: 100 TB as 4 files won't scale — the
  writer side of this engine emits many shards (stages/sink.py, job.py)
  precisely so readers fan out.
"""

from __future__ import annotations

import os


def _list_parquet(path_or_paths) -> list:
    if isinstance(path_or_paths, (list, tuple)):
        return list(path_or_paths)
    if os.path.isdir(path_or_paths):
        return sorted(
            os.path.join(path_or_paths, f)
            for f in os.listdir(path_or_paths)
            if f.endswith(".parquet")
        )
    return [path_or_paths]


def map_parquet_shards(path_or_paths, fn, *, columns=None,
                       write_dir: str | None = None):
    """One fused task per parquet shard: read (column-pruned) -> ``fn`` ->
    either return fn's table (streams into the Dataset) or, with
    ``write_dir``, write it as the same-named output shard and return only
    (path, rows) accounting rows.

    Returns a ``ray.data.Dataset`` of fn outputs (or of accounting rows in
    write-through mode)."""
    import pyarrow as pa
    import ray.data

    files = _list_parquet(path_or_paths)
    if write_dir is not None:
        os.makedirs(write_dir, exist_ok=True)

    def per_shard(batch: pa.Table):
        import pyarrow.parquet as pq

        for path in batch["path"].to_pylist():
            t = fn(pq.read_table(path, columns=columns))
            if write_dir is None:
                yield t
            else:
                out = os.path.join(write_dir, os.path.basename(path))
                pq.write_table(t, out)
                yield pa.table({
                    "path": pa.array([out], pa.string()),
                    "rows": pa.array([t.num_rows], pa.int64()),
                })

    items = [{"path": f} for f in files]
    return ray.data.from_items(items, override_num_blocks=max(1, len(items))) \
        .map_batches(per_shard, batch_format="pyarrow", batch_size=1)
