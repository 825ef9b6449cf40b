"""Checkpoint manifest: atomic writes, resume skips complete partitions,
lineage records, identical output after crash+resume."""

import json
import os

import pyarrow as pa
import pytest

from rayjoin.checkpoint import CheckpointManifest, read_output, run_partitioned


def _compute_factory(log):
    def compute(part: str) -> pa.Table:
        log.append(part)
        n = int(part) + 1
        return pa.table({"k": pa.array(list(range(n)), pa.int64()),
                         "part": pa.array([part] * n)})

    return compute


def test_resume_skips_completed(tmp_path):
    out = str(tmp_path / "job")
    parts = [str(i) for i in range(5)]
    log1 = []
    boom = {"at": "3"}

    def failing(part):
        if part == boom["at"]:
            raise RuntimeError("simulated crash")
        return _compute_factory(log1)(part)

    with pytest.raises(RuntimeError):
        run_partitioned(out, parts, failing)
    assert log1 == ["0", "1", "2"]  # 3 crashed, 4 never ran
    done = CheckpointManifest(out).completed()
    assert sorted(done) == ["0", "1", "2"]

    # resume: only the missing partitions run
    log2 = []
    manifest = run_partitioned(out, parts, _compute_factory(log2))
    assert log2 == ["3", "4"]
    assert sorted(manifest) == parts

    # lineage fields present and sane
    rec = manifest["2"]
    assert rec["rows"] == 3 and rec["content_hash"] and rec["rows_per_sec"] >= 0

    # full output equals a clean one-shot run
    t = read_output(out)
    clean = str(tmp_path / "clean")
    run_partitioned(clean, parts, _compute_factory([]))
    t2 = read_output(clean)
    assert sorted(t.to_pylist(), key=str) == sorted(t2.to_pylist(), key=str)


def test_rerun_is_noop(tmp_path):
    out = str(tmp_path / "job2")
    parts = [str(i) for i in range(3)]
    log = []
    run_partitioned(out, parts, _compute_factory(log))
    assert log == parts
    log2 = []
    run_partitioned(out, parts, _compute_factory(log2))
    assert log2 == []  # everything already complete


def test_manifest_distrusts_missing_dirs(tmp_path):
    out = str(tmp_path / "job3")
    parts = ["0", "1"]
    run_partitioned(out, parts, _compute_factory([]))
    # delete a partition directory behind the manifest's back
    import shutil

    shutil.rmtree(os.path.join(out, "part=1"))
    done = CheckpointManifest(out).completed()
    assert sorted(done) == ["0"]
    # resume recomputes it
    log = []
    run_partitioned(out, parts, _compute_factory(log))
    assert log == ["1"]
