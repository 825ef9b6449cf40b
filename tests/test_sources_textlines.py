"""JSONL / CSV source round-trips (sources/textlines.py): the exported
shards, streamed back through ray.data.read_json / read_csv, must equal
the original parquet table EXACTLY (every id, tag, text byte, timestamp
micro) — content fidelity, not just aggregates (the gate rows
`jsonl_source`/`csv_source` hash the same full tables vs DuckDB)."""

import shutil

import pyarrow.compute as pc
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _sorted_pdf(ds, key):
    df = ds.to_pandas()
    return df.sort_values(key).reset_index(drop=True)


def test_jsonl_roundtrip_exact(ray_session, tmp_path):
    from rayjoin.sources.textlines import (read_documents_jsonl,
                                           write_jsonl_shards)

    out = str(tmp_path / "jsonl")
    write_jsonl_shards(SF, out, num_shards=4)
    got = _sorted_pdf(read_documents_jsonl(out), "doc_id")
    want = (
        pq.read_table(f"{SF}/documents.parquet",
                      columns=["doc_id", "lang", "text"])
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    got = got[["doc_id", "lang", "text"]]
    assert got.equals(want)


def test_jsonl_writer_idempotent(ray_session, tmp_path):
    from rayjoin.sources.textlines import write_jsonl_shards

    out = str(tmp_path / "jsonl")
    write_jsonl_shards(SF, out, num_shards=4)
    import os

    mtimes = {f: os.path.getmtime(os.path.join(out, f)) for f in os.listdir(out)}
    write_jsonl_shards(SF, out, num_shards=4)  # marker short-circuits
    assert mtimes == {
        f: os.path.getmtime(os.path.join(out, f)) for f in os.listdir(out)
    }


def test_csv_roundtrip_exact(ray_session, tmp_path):
    import pyarrow as pa

    from rayjoin.sources.textlines import read_events_csv, write_csv_shards

    out = str(tmp_path / "csv")
    write_csv_shards(SF, out, num_shards=4)
    got = _sorted_pdf(read_events_csv(out), "event_id")
    t = pq.read_table(f"{SF}/events.parquet",
                      columns=["event_id", "ts", "user_id", "event_type",
                               "value"])
    want = pa.table({
        "event_id": t["event_id"],
        "ts_us": pc.cast(t["ts"], pa.int64()),
        "user_id": t["user_id"],
        "event_type": t["event_type"],
        "value_cents": pc.cast(pc.floor(pc.multiply(t["value"], 100.0)),
                               pa.int64()),
    }).to_pandas().sort_values("event_id").reset_index(drop=True)
    assert got[list(want.columns)].equals(want)


def test_jsonl_sparse_shards_skip_empty(ray_session, tmp_path):
    """num_shards > populated residues: empty shards are skipped (pyarrow
    json rejects empty files) and the round trip still returns every row."""
    import os

    from rayjoin.sources.textlines import (read_documents_jsonl,
                                           write_jsonl_shards)

    out = str(tmp_path / "jsonl1024")
    write_jsonl_shards(SF, out, num_shards=1024)
    n_rows = pq.ParquetFile(f"{SF}/documents.parquet").metadata.num_rows
    files = [f for f in os.listdir(out) if f.endswith(".jsonl")]
    assert len(files) < 1024  # more shards than rows -> some skipped
    assert read_documents_jsonl(out).count() == n_rows
