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


def test_fingerprint_change_triggers_recompute(tmp_path):
    """A completed partition whose input fingerprint changed is re-run on
    resume instead of silently returning stale data (ADVICE r1)."""
    out = str(tmp_path / "job4")
    parts = ["0", "1"]
    log1 = []
    run_partitioned(out, parts, _compute_factory(log1), lambda p: f"v1:{p}")
    assert log1 == parts
    # same fingerprint -> no-op
    log2 = []
    run_partitioned(out, parts, _compute_factory(log2), lambda p: f"v1:{p}")
    assert log2 == []
    # changed fingerprint for one partition -> only that one recomputes
    log3 = []
    run_partitioned(out, parts, _compute_factory(log3),
                    lambda p: f"v2:{p}" if p == "1" else f"v1:{p}")
    assert log3 == ["1"]
    done = CheckpointManifest(out).completed()
    assert done["1"]["input_fingerprint"] == "v2:1"
    assert done["0"]["input_fingerprint"] == "v1:0"


def test_concurrent_run_matches_sequential(tmp_path):
    out_a = str(tmp_path / "seq")
    out_b = str(tmp_path / "conc")
    parts = [str(i) for i in range(8)]
    run_partitioned(out_a, parts, _compute_factory([]))
    run_partitioned(out_b, parts, _compute_factory([]), max_concurrency=4)
    ta, tb = read_output(out_a), read_output(out_b)
    assert sorted(ta.to_pylist(), key=str) == sorted(tb.to_pylist(), key=str)
    da = CheckpointManifest(out_a).completed()
    db = CheckpointManifest(out_b).completed()
    assert {p: d["content_hash"] for p, d in da.items()} == {
        p: d["content_hash"] for p, d in db.items()
    }


def test_table_hash_large_string_matches_string():
    """large_string offsets are int64 — reading them as int32 silently
    corrupted every row digest (round-2 review finding)."""
    import pyarrow as pa

    from rayjoin.checkpoint import _table_hash

    rows = {"k": [1, 2, 3], "s": ["hello", "world", ""]}
    t1 = pa.table({"k": pa.array(rows["k"]), "s": pa.array(rows["s"])})
    t2 = pa.table({"k": pa.array(rows["k"]), "s": pa.array(rows["s"], pa.large_string())})
    assert _table_hash(t1) == _table_hash(t2)
    t3 = pa.table({"k": pa.array(rows["k"]), "s": pa.array(["hello", "worlx", ""], pa.large_string())})
    assert _table_hash(t1) != _table_hash(t3)


def test_table_hash_detects_single_cell_corruption():
    """VERDICT r4 #7: the per-cell digest folds TWO independent checksums
    (crc32 low word, adler32^len high word); a single-cell corruption must
    flip the table hash — including a crafted pair of strings with EQUAL
    crc32 (found by seeded birthday search), which only the second hash
    distinguishes."""
    import zlib

    import numpy as np
    import pyarrow as pa

    from rayjoin.checkpoint import _string_digest, _table_hash

    rng = np.random.default_rng(13)
    n = 2000
    ints = rng.integers(-10**9, 10**9, n)
    strs = ["row-%d-%x" % (i, i * 2654435761 % 2**32) for i in range(n)]
    flts = rng.normal(size=n)
    base = pa.table({"i": pa.array(ints), "s": pa.array(strs),
                     "f": pa.array(flts)})
    h0 = _table_hash(base)
    # flip one cell per column type
    for col, idx, new in (("i", 137, -12345), ("s", 999, "row-999-CORRUPT"),
                          ("f", 42, 1e-300)):
        d = {c: list(base[c].to_pylist()) for c in base.column_names}
        d[col][idx] = new
        assert _table_hash(pa.table(d)) != h0, (col, idx)

    # crc32-colliding pair (birthday search over seeded random strings):
    # the low 32 bits of the digest agree, so only the adler32 word can
    # tell them apart — this pins that the second hash is actually folded in
    seen = {}
    pair = None
    rng2 = np.random.default_rng(7)
    for i in range(300_000):
        s = rng2.bytes(8)
        c = zlib.crc32(s)
        if c in seen and seen[c] != s:
            pair = (seen[c], s)
            break
        seen[c] = s
    assert pair is not None, "no crc32 collision found; enlarge the search"
    assert zlib.crc32(pair[0]) == zlib.crc32(pair[1])
    # binary arrays run the same digest code over the raw colliding bytes
    da = _string_digest(pa.array([pair[0]], pa.binary()))[0]
    db = _string_digest(pa.array([pair[1]], pa.binary()))[0]
    assert int(da) & 0xFFFFFFFF == int(db) & 0xFFFFFFFF  # crc32 words agree
    assert da != db  # adler32^len upper word distinguishes them


@pytest.mark.usefixtures("ray_session")
def test_corpus_checkpoint_resume(tmp_path, monkeypatch):
    """VERDICT r4 #4: build_corpus(checkpoint_dir=...) resumes a killed run
    recomputing ONLY the missing stages — the dedup shuffle never re-runs —
    and the resumed output is identical to an uncheckpointed run."""
    import pyarrow.dataset as pads

    import rayjoin.functions.dedup as dedup_mod
    import rayjoin.sources.pages as pages_mod
    from rayjoin.pipelines import corpus

    sf = "/root/testdata/sf0.001"
    out_a = str(tmp_path / "plain")
    out_b = str(tmp_path / "ckpt_out")
    ck = str(tmp_path / "ck")

    base = corpus.build_corpus(sf, out_a)

    def read_all(d):
        t = pads.dataset(d, format="parquet", partitioning="hive").to_table()
        df = t.to_pandas()
        # part_key is PHYSICAL layout: the sampled range partitioner is
        # seeded but block-layout-dependent (random_sample draws per block),
        # so two runs over differently-blocked inputs may split ranges
        # differently while the row CONTENT is identical
        df = df[sorted(c for c in df.columns if c != "part_key")]
        return df.sort_values("doc_id").reset_index(drop=True)

    real_drop = dedup_mod.near_dup_drop_list
    real_pages = pages_mod.pages_from_documents

    def boom(*a, **k):
        raise RuntimeError("simulated mid-run kill")

    # run 1 dies in the dedup stage, AFTER the filtered checkpoint landed
    monkeypatch.setattr(dedup_mod, "near_dup_drop_list", boom)
    with pytest.raises(RuntimeError, match="simulated"):
        corpus.build_corpus(sf, out_b, checkpoint_dir=ck)
    monkeypatch.setattr(dedup_mod, "near_dup_drop_list", real_drop)

    # run 2 resumes: the filter pipeline must NOT re-execute (poisoned), the
    # dedup stage runs for real, output == the uncheckpointed run
    def no_pages(*a, **k):
        raise AssertionError("filtered stage recomputed on resume")

    monkeypatch.setattr(pages_mod, "pages_from_documents", no_pages)
    m = corpus.build_corpus(sf, out_b, checkpoint_dir=ck)
    assert m["resumed_stages"] == ["filtered"]
    assert (m["rows_filtered"], m["rows_dropped_dups"], m["rows_written"]) == (
        base["rows_filtered"], base["rows_dropped_dups"], base["rows_written"])
    import pandas as pd

    pd.testing.assert_frame_equal(read_all(out_a), read_all(out_b))

    # run 3: everything complete -> all three stages resume, the expensive
    # stages stay poisoned to PROVE nothing re-executes
    monkeypatch.setattr(dedup_mod, "near_dup_drop_list", boom)
    m2 = corpus.build_corpus(sf, out_b, checkpoint_dir=ck)
    assert sorted(m2["resumed_stages"]) == ["drop", "filtered", "sink"]
    assert m2["rows_written"] == base["rows_written"]

    # run 4: a changed parameter invalidates downstream fingerprints only —
    # filtered still resumes, drop + sink recompute
    monkeypatch.setattr(dedup_mod, "near_dup_drop_list", real_drop)
    m3 = corpus.build_corpus(sf, out_b, checkpoint_dir=ck,
                             dedup_threshold=0.9)
    assert m3["resumed_stages"] == ["filtered"]
    monkeypatch.setattr(pages_mod, "pages_from_documents", real_pages)
