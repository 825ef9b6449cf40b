"""Checkpoint manifests + resumable partitioned output (north_rule scope).

A run writes its output as one parquet directory PER PARTITION plus a
manifest line per completed partition (lineage: partition id, input
fingerprint, row count, content hash, wall seconds, rows/sec).  Writes are
atomic (temp dir -> rename), so a crashed run leaves either a complete
partition + manifest line or nothing.  ``resume`` skips partitions whose
manifest entries are complete — the mid-shuffle resume story is that
partitions are independent cells/key-ranges (see rayjoin.join.partitioned),
so re-running only the missing ones reproduces the full output.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
from dataclasses import dataclass, field
from typing import Callable, Dict, List

import pyarrow as pa
import pyarrow.parquet as pq


@dataclass
class ManifestEntry:
    partition: str
    rows: int
    content_hash: str
    seconds: float
    rows_per_sec: float
    input_fingerprint: str = ""
    extra: dict = field(default_factory=dict)


class CheckpointManifest:
    """Append-only JSONL manifest; one line per completed partition."""

    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        self.path = os.path.join(out_dir, "_manifest.jsonl")
        os.makedirs(out_dir, exist_ok=True)

    def completed(self) -> Dict[str, dict]:
        done = {}
        if os.path.exists(self.path):
            with open(self.path) as f:
                for line in f:
                    line = line.strip()
                    if line:
                        rec = json.loads(line)
                        done[rec["partition"]] = rec
        # only trust entries whose data directory still exists
        return {
            p: rec
            for p, rec in done.items()
            if os.path.isdir(os.path.join(self.out_dir, f"part={p}"))
        }

    def record(self, entry: ManifestEntry) -> None:
        with open(self.path, "a") as f:
            f.write(json.dumps(entry.__dict__) + "\n")
            f.flush()
            os.fsync(f.fileno())


def _table_hash(t: pa.Table) -> str:
    """Order-insensitive content hash of a table (sorted row digests)."""
    if t.num_rows == 0:
        return hashlib.sha256(b"empty").hexdigest()[:16]
    cols = sorted(t.column_names)
    rows = [
        hashlib.sha256(repr(tup).encode()).digest()
        for tup in zip(*[t.column(c).to_pylist() for c in cols])
    ]
    rows.sort()
    h = hashlib.sha256()
    for r in rows:
        h.update(r)
    return h.hexdigest()[:16]


def run_partitioned(
    out_dir: str,
    partitions: List[str],
    compute: Callable[[str], pa.Table],
    input_fingerprint: Callable[[str], str] = lambda p: "",
) -> Dict[str, dict]:
    """Execute ``compute(partition)`` for every partition not already
    complete; write atomically; return the full manifest.

    This is the driver-side orchestration for resumable jobs: each partition
    is typically itself a Ray Data pipeline over one input shard/key range.
    """
    manifest = CheckpointManifest(out_dir)
    done = manifest.completed()
    for part in partitions:
        if part in done:
            continue
        t0 = time.time()
        table = compute(part)
        part_dir = os.path.join(out_dir, f"part={part}")
        tmp_dir = part_dir + ".tmp"
        if os.path.isdir(tmp_dir):
            shutil.rmtree(tmp_dir)
        os.makedirs(tmp_dir)
        pq.write_table(table, os.path.join(tmp_dir, "data.parquet"))
        if os.path.isdir(part_dir):  # stale dir from a crashed run: replace
            shutil.rmtree(part_dir)
        os.replace(tmp_dir, part_dir)
        dt = time.time() - t0
        entry = ManifestEntry(
            partition=part,
            rows=table.num_rows,
            content_hash=_table_hash(table),
            seconds=round(dt, 3),
            rows_per_sec=round(table.num_rows / dt, 1) if dt > 0 else 0.0,
            input_fingerprint=input_fingerprint(part),
        )
        manifest.record(entry)
        done[part] = entry.__dict__
    return manifest.completed()


def read_output(out_dir: str) -> pa.Table:
    manifest = CheckpointManifest(out_dir)
    parts = sorted(manifest.completed())
    tables = [
        pq.read_table(os.path.join(out_dir, f"part={p}", "data.parquet")) for p in parts
    ]
    return pa.concat_tables(tables) if tables else pa.table({})
