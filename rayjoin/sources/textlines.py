"""Line-oriented source formats: JSONL and CSV.

A web corpus rarely arrives as parquet — crawls land as newline-delimited
JSON (one document per line) and logs as CSV.  This module gives the
engine those two ingest surfaces with the same scale shape as the parquet
path:

- WRITERS are one Ray task per shard (the resumable-job shape: a 100 TB
  export is a fleet of independent shard tasks, each encoding its slice
  worker-locally; at gate scale each task re-reads the small parquet with
  pruned columns and keeps its hash residue).
- READERS are plain ``ray.data.read_json`` / ``read_csv`` — pyarrow's
  block-level JSON/CSV decoders, streaming one task per file shard.

Round-trip fidelity notes (pinned by tests/gate rows):
- JSONL: UTF-8 text survives exactly (json escapes control chars; pyarrow
  reads them back); int64 ids survive exactly.
- CSV: only int64 + string columns are written (floats are pre-floored to
  integer cents at EXPORT time, timestamps to int64 micros) — decimal
  float round-trips are a format hazard, so the export surface refuses
  them by construction rather than hoping the writer picked 17 digits.
"""

from __future__ import annotations

import os

JSONL_COLUMNS = ["doc_id", "lang", "text"]
CSV_COLUMNS = ["event_id", "ts_us", "user_id", "event_type", "value_cents"]


def _marker(outdir: str, tag: str) -> str:
    return os.path.join(outdir, f".complete_{tag}")


def _source_fp(path: str) -> str:
    """Input fingerprint for the idempotence marker: a regenerated source
    (same path, new contents) must invalidate the export.  Files hash by
    (size, mtime); a directory source hashes its sorted parquet ENTRIES'
    (name, size, mtime) — the directory's own stat doesn't change when a
    shard is rewritten in place."""
    import hashlib

    def one(p):
        st = os.stat(p)
        return f"{os.path.basename(p)}:{st.st_size}:{int(st.st_mtime)}"

    if os.path.isdir(path):
        parts = sorted(
            one(os.path.join(path, f)) for f in os.listdir(path)
            if f.endswith(".parquet")
        )
    else:
        parts = [one(path)]
    return hashlib.sha256("|".join(parts).encode()).hexdigest()[:12]


def write_jsonl_shards(sf_dir: str, outdir: str, num_shards: int = 8) -> str:
    """Export ``documents`` (doc_id, lang, text) as ``num_shards`` JSONL
    shards, one Ray task per shard (task i keeps rows with
    ``doc_id % num_shards == i``).  Idempotent per (sf_dir, num_shards):
    a completion marker (keyed on the SOURCE fingerprint too — a
    regenerated documents.parquet invalidates it) skips the rewrite so
    gate reruns are read-only."""
    import ray

    tag = (f"{os.path.basename(os.path.normpath(sf_dir))}_{num_shards}_"
           f"{_source_fp(os.path.join(sf_dir, 'documents.parquet'))}")
    if os.path.exists(_marker(outdir, tag)):
        return outdir
    import shutil

    shutil.rmtree(outdir, ignore_errors=True)
    os.makedirs(outdir)

    @ray.remote
    def shard(i: int) -> int:
        import pandas as pd
        import pyarrow.parquet as pq

        t = pq.read_table(f"{sf_dir}/documents.parquet", columns=JSONL_COLUMNS)
        mask = (t["doc_id"].to_numpy() % num_shards) == i
        if not mask.any():
            return 0  # pyarrow.json rejects empty files — skip the shard
        df = t.to_pandas()[mask]
        # lines=True -> one JSON object per row; pandas escapes correctly
        df.to_json(os.path.join(outdir, f"part-{i:05d}.jsonl"),
                   orient="records", lines=True, force_ascii=False)
        return int(mask.sum())

    ray.get([shard.remote(i) for i in range(num_shards)])
    open(_marker(outdir, tag), "w").close()
    return outdir


def read_documents_jsonl(indir: str):
    """Stream the JSONL export back: one read task per shard file.  An
    all-empty export (writer skips empty shards) reads back as a zero-row
    dataset with the pinned schema, not a reader error."""
    import pyarrow as pa
    import ray.data

    files = sorted(
        os.path.join(indir, f) for f in os.listdir(indir)
        if f.endswith(".jsonl")
    )
    if not files:
        return ray.data.from_arrow(pa.table({
            "doc_id": pa.array([], pa.int64()),
            "lang": pa.array([], pa.string()),
            "text": pa.array([], pa.string()),
        }))
    return ray.data.read_json(files)


def write_csv_shards(sf_dir: str, outdir: str, num_shards: int = 8) -> str:
    """Export ``events`` as CSV shards, one Ray task per shard.  Floats
    are floored to integer cents and timestamps cast to int64 micros AT
    EXPORT (see module docstring); strings are quoted by the writer, so
    embedded commas/newlines survive.  The completion marker is keyed on
    the source fingerprint (like the JSONL writer)."""
    import ray

    tag = (f"{os.path.basename(os.path.normpath(sf_dir))}_{num_shards}_"
           f"{_source_fp(os.path.join(sf_dir, 'events.parquet'))}")
    if os.path.exists(_marker(outdir, tag)):
        return outdir
    import shutil

    shutil.rmtree(outdir, ignore_errors=True)
    os.makedirs(outdir)

    @ray.remote
    def shard(i: int) -> int:
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.csv as pacsv
        import pyarrow.parquet as pq

        t = pq.read_table(f"{sf_dir}/events.parquet",
                          columns=["event_id", "ts", "user_id", "event_type",
                                   "value"])
        mask = (t["event_id"].to_numpy() % num_shards) == i
        t = t.filter(pa.array(mask))
        out = pa.table({
            "event_id": t["event_id"],
            "ts_us": pc.cast(t["ts"], pa.int64()),
            "user_id": t["user_id"],
            "event_type": t["event_type"],
            "value_cents": pc.cast(
                pc.floor(pc.multiply(t["value"], 100.0)), pa.int64()),
        })
        pacsv.write_csv(out, os.path.join(outdir, f"part-{i:05d}.csv"))
        return out.num_rows

    ray.get([shard.remote(i) for i in range(num_shards)])
    open(_marker(outdir, tag), "w").close()
    return outdir


def read_events_csv(indir: str):
    """Stream the CSV export back: one read task per shard file, with an
    EXPLICIT column schema (int64/string) — inference on an empty or
    all-null shard would drift types between shards."""
    import pyarrow as pa
    import pyarrow.csv as pacsv
    import ray.data

    files = sorted(
        os.path.join(indir, f) for f in os.listdir(indir)
        if f.endswith(".csv")
    )
    if not files:
        return ray.data.from_arrow(pa.table({
            "event_id": pa.array([], pa.int64()),
            "ts_us": pa.array([], pa.int64()),
            "user_id": pa.array([], pa.int64()),
            "event_type": pa.array([], pa.string()),
            "value_cents": pa.array([], pa.int64()),
        }))
    convert = pacsv.ConvertOptions(column_types={
        "event_id": pa.int64(), "ts_us": pa.int64(), "user_id": pa.int64(),
        "event_type": pa.string(), "value_cents": pa.int64(),
    })
    return ray.data.read_csv(files, convert_options=convert)
