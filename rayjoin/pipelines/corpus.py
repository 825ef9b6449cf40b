"""End-to-end web-corpus pipeline (the north-star composition in one call):

    pages -> geocode(url) -> tile assign -> quality + language filters ->
    MinHash near-dup drop -> Hilbert-range partitioned parquet

Every stage is one of the engine's tested operators; the composition
demonstrates that a training-data pipeline over Common-Crawl-style pages
runs as a single streaming Dataset program with exactly two wide
operations: the dedup pair shuffle inside ``near_dup_drop_list`` and the
final partitioned write.  The ``text`` column rides through byte-identical
end to end (the north-rule invariant; tested).

    python -m rayjoin.pipelines.corpus --sf-dir /root/testdata/sf0.001 \
        --out /tmp/corpus
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time

import numpy as np
import pyarrow as pa


def _fp(*parts) -> str:
    """Stage fingerprint: inputs + parameters, order-significant."""
    return hashlib.sha256("|".join(map(str, parts)).encode()).hexdigest()[:16]


def _file_fp(path: str) -> str:
    """Input fingerprint.  For a DIRECTORY input (sharded parquet), hash
    the sorted entries' (name, size, mtime): POSIX directory mtime changes
    only on entry create/delete/rename, so a shard rewritten in place
    would otherwise sail through as 'unchanged' and a resumed run would
    silently reuse a stale checkpoint (review finding r5)."""
    if os.path.isdir(path):
        parts = []
        for f in sorted(os.listdir(path)):
            p = os.path.join(path, f)
            if os.path.isfile(p):
                st = os.stat(p)
                parts.append(f"{f}:{st.st_size}:{int(st.st_mtime)}")
        return f"{path}:[{'|'.join(parts)}]"
    st = os.stat(path)
    return f"{path}:{st.st_size}:{int(st.st_mtime)}"


def _footer_rows(dir_path: str) -> int:
    """Row count from parquet FOOTER metadata only (no data scan)."""
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    return sum(
        pq.ParquetFile(p).metadata.num_rows
        for p in pads.dataset(dir_path, format="parquet").files
    )


def _stage_dataset(manifest, ckpt_dir: str, name: str, fp: str, producer,
                   resumed: list):
    """Resume-or-compute one Dataset-valued stage (VERDICT r4 #4).

    A complete manifest entry with a matching fingerprint + intact
    ``part={name}`` directory short-circuits to a parquet read-back (the
    stage's shuffle never re-runs); otherwise ``producer()`` streams to a
    temp dir which is atomically renamed into place before the manifest
    line lands — a kill at ANY point leaves either a complete checkpoint or
    a recomputable stage, never a half-read one.  Returns (Dataset, rows).
    """
    import ray.data

    from ..checkpoint import ManifestEntry

    part_dir = os.path.join(ckpt_dir, f"part={name}")
    done = manifest.completed().get(name)
    if done is not None and done.get("input_fingerprint") == fp:
        resumed.append(name)
        return ray.data.read_parquet(part_dir), int(done["rows"])
    t0 = time.time()
    ds = producer()
    tmp = part_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    ds.write_parquet(tmp)
    if not any(f.endswith(".parquet") for f in os.listdir(tmp)):
        # empty stage output: pin the schema so read-back still answers.
        # Metadata-only schema probe — fetch_if_missing would re-execute
        # the (possibly expensive) upstream just to learn an empty schema.
        import pyarrow.parquet as pq

        sch = None
        try:
            s = ds.schema(fetch_if_missing=False)
            if s is not None:
                sch = s.base_schema if hasattr(s, "base_schema") else s
        except Exception:
            pass
        pq.write_table(sch.empty_table() if sch is not None else pa.table({}),
                       os.path.join(tmp, "empty.parquet"))
    rows = _footer_rows(tmp)
    if os.path.isdir(part_dir):  # stale dir from a crashed/changed run
        shutil.rmtree(part_dir)
    os.replace(tmp, part_dir)
    dt = time.time() - t0
    manifest.record(ManifestEntry(
        partition=name, rows=rows, content_hash="", seconds=round(dt, 3),
        rows_per_sec=round(rows / dt, 1) if dt > 0 else 0.0,
        input_fingerprint=fp,
    ))
    return ray.data.read_parquet(part_dir), rows


def build_corpus(sf_dir: str, out_dir: str, *, resolution: int = 10,
                 num_partitions: int = 8, min_tokens: int = 5,
                 min_mean_token_len_milli: int = 2000,
                 keep_langs: tuple = ("en", "de", "fr", "es", "pt", "zh"),
                 dedup_threshold: float = 0.8, seed: int = 42,
                 broadcast_drop_rows: int = 5_000_000,
                 substr_cut_window: int | None = None,
                 checkpoint_dir: str | None = None) -> dict:
    """Run the composed pipeline; returns a metrics dict (counts per stage,
    wall seconds, partition layout).

    ``checkpoint_dir`` turns on per-stage resumability (VERDICT r4 #4): the
    ``filtered`` corpus and the near-dup ``drop`` list (the expensive dedup
    shuffle) each checkpoint to fingerprinted parquet + a manifest line, and
    the partitioned sink records a completion line — so a killed run,
    re-invoked with the same arguments, recomputes ONLY the stages whose
    checkpoints are missing or whose inputs/parameters changed.  Row content
    is identical to an uncheckpointed run (tested); only the part_key
    LAYOUT may differ, because the sampled range partitioner draws per
    block and the checkpointed read-back blocks differently."""
    import ray
    import ray.data

    from ..functions.dedup import near_dup_drop_list
    from ..functions.text import quality_score
    from ..sources.pages import pages_from_documents
    from ..stages.geocode import geocode_from_url
    from ..stages.sink import write_hilbert_partitioned
    from ..stages.tiles import tile_assign

    t0 = time.time()
    langs = set(keep_langs)

    def keep_quality(t: pa.Table) -> pa.Table:
        q = quality_score(t.select(["doc_id", "text"]))
        mean_ok = np.asarray(q["mean_token_len_milli"], dtype=np.int64) >= min_mean_token_len_milli
        tok_ok = np.asarray(q["n_tokens"], dtype=np.int64) >= min_tokens
        lang_ok = np.asarray(
            pa.compute.is_in(t["lang"].combine_chunks(), value_set=pa.array(sorted(langs)))
        )
        return t.filter(pa.array(mean_ok & tok_ok & lang_ok, pa.bool_()))

    def make_filtered():
        pages = pages_from_documents(sf_dir)
        geo = tile_assign(
            pages.map_batches(geocode_from_url, batch_format="pyarrow"),
            resolution=resolution,
        )
        return geo.map_batches(keep_quality, batch_format="pyarrow")

    # near-dup drop list over the SURVIVING docs (bounded pair graph).
    # On a dup-heavy corpus the list is O(corpus), so it must never land on
    # the driver as Python rows (VERDICT r2 #2): below the broadcast
    # threshold it travels object-store -> numpy via to_arrow_refs (no
    # per-row Python); above it the drop becomes a distributed hash
    # anti-join and the ids never aggregate anywhere.
    def make_drop(filtered):
        return near_dup_drop_list(
            filtered.select_columns(["doc_id", "text"]), threshold=dedup_threshold
        )

    resumed: list = []
    manifest = None
    fp_filtered = fp_drop = ""
    if checkpoint_dir is not None:
        from ..checkpoint import CheckpointManifest

        manifest = CheckpointManifest(checkpoint_dir)
        fp_filtered = _fp(
            "filtered", _file_fp(f"{sf_dir}/documents.parquet"), resolution,
            min_tokens, min_mean_token_len_milli, sorted(langs),
        )
        filtered, n_filtered = _stage_dataset(
            manifest, checkpoint_dir, "filtered", fp_filtered,
            make_filtered, resumed,
        )
        fp_drop = _fp("drop", fp_filtered, dedup_threshold)
        drop, n_drop = _stage_dataset(
            manifest, checkpoint_dir, "drop", fp_drop,
            lambda: make_drop(filtered), resumed,
        )
    else:
        filtered = make_filtered().materialize()
        n_filtered = filtered.count()
        drop = make_drop(filtered).materialize()
        n_drop = drop.count()

    if n_drop <= broadcast_drop_rows:
        arrays = [
            t.column("doc_id").combine_chunks().to_numpy(zero_copy_only=False)
            for t in ray.get(drop.to_arrow_refs())
            if t.num_rows
        ]
        drop_ids = (
            np.sort(np.concatenate(arrays).astype(np.int64))
            if arrays
            else np.empty(0, np.int64)
        )
        ref = ray.put(drop_ids)

        def drop_dups(t: pa.Table) -> pa.Table:
            ids = np.asarray(t["doc_id"].combine_chunks(), dtype=np.int64)
            d = ray.get(ref)
            pos = np.searchsorted(d, ids)
            pos[pos >= d.size] = 0
            hit = (d[pos] == ids) if d.size else np.zeros(ids.size, bool)
            return t.filter(pa.array(~hit, pa.bool_()))

        kept = filtered.map_batches(drop_dups, batch_format="pyarrow")
    else:
        from ..functions.dedup import _num_join_partitions

        kept = filtered.join(
            drop, "left_anti", _num_join_partitions(filtered, drop), on=("doc_id",)
        )
    drop_count = int(n_drop)
    # hilbert_id is re-derived at the sink's partitioning resolution
    out_cols = ["doc_id", "url", "lat", "lon", "tile_id", "lang", "text"]
    kept = kept.map_batches(lambda t: t.select(out_cols), batch_format="pyarrow")
    if substr_cut_window:
        # opt-in ExactSubstr stage: duplicated cross-doc byte ranges cut
        # into an ADDITIONAL text_cut column — `text` itself stays
        # byte-identical (the north-rule invariant holds regardless).
        # ONE materialization serves ranges, cut and the sink (VERDICT r4
        # #6: the old shape joined cut_text back onto a SECOND full-corpus
        # copy); passthrough rides every output column through the single
        # cut join.
        from ..functions.dedup import apply_cut_ranges, duplicated_ranges

        kept = kept.materialize()
        ranges = duplicated_ranges(kept.select_columns(["doc_id", "text"]),
                                   window=substr_cut_window)
        kept = apply_cut_ranges(kept, ranges, passthrough=True).map_batches(
            lambda t: t.select(out_cols + ["cut_text"]).rename_columns(
                out_cols + ["text_cut"]),
            batch_format="pyarrow",
        )
    import pyarrow.parquet as pq

    def do_sink():
        # a crashed partitioned write leaves partial part_key dirs, and
        # write_parquet APPENDS new uuid-named files — so a redo must clean
        # the partition dirs first or rows would double
        if os.path.isdir(out_dir):
            for d in os.listdir(out_dir):
                if d.startswith("part_key="):
                    shutil.rmtree(os.path.join(out_dir, d))
        b = write_hilbert_partitioned(
            kept, out_dir, num_partitions=num_partitions, resolution=12,
            seed=seed,
        )
        # written-row count from parquet FOOTER metadata only — re-reading
        # the whole output to count it would be a second full pass
        # (VERDICT r2 #2)
        return b, _footer_rows(out_dir)

    if manifest is not None:
        from ..checkpoint import ManifestEntry

        fp_sink = _fp("sink", fp_drop, num_partitions, seed,
                      substr_cut_window, out_dir)
        sink_ckpt = os.path.join(checkpoint_dir, "part=sink")
        done = manifest.completed().get("sink")
        have_out = os.path.isdir(out_dir) and any(
            d.startswith("part_key=") for d in os.listdir(out_dir)
        )
        if done is not None and done.get("input_fingerprint") == fp_sink and have_out:
            resumed.append("sink")
            bounds = np.asarray(
                pq.read_table(os.path.join(sink_ckpt, "bounds.parquet"))["bound"]
            )
            written = int(done["rows"])
        else:
            ts = time.time()
            bounds, written = do_sink()
            tmp = sink_ckpt + ".tmp"
            shutil.rmtree(tmp, ignore_errors=True)
            os.makedirs(tmp)
            pq.write_table(
                pa.table({"bound": pa.array(np.asarray(bounds))}),
                os.path.join(tmp, "bounds.parquet"),
            )
            if os.path.isdir(sink_ckpt):
                shutil.rmtree(sink_ckpt)
            os.replace(tmp, sink_ckpt)
            dts = time.time() - ts
            manifest.record(ManifestEntry(
                partition="sink", rows=written, content_hash="",
                seconds=round(dts, 3),
                rows_per_sec=round(written / dts, 1) if dts > 0 else 0.0,
                input_fingerprint=fp_sink,
            ))
    else:
        bounds, written = do_sink()
    dt = time.time() - t0
    return {
        "pipeline": "corpus",
        "sf_dir": sf_dir,
        "out_dir": out_dir,
        "rows_filtered": n_filtered,
        "rows_dropped_dups": drop_count,
        "rows_written": written,
        "partitions": int(bounds.size + 1),
        "wall_sec": round(dt, 3),
        "resumed_stages": resumed,
    }


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--out", required=True)
    ap.add_argument("--num-cpus", type=int, default=None)
    ap.add_argument("--substr-cut-window", type=int, default=None,
                    help="add a text_cut column with duplicated byte ranges "
                         "of this window length excised (ExactSubstr stage)")
    ap.add_argument("--checkpoint-dir", default=None,
                    help="per-stage resumable checkpoints: a killed run "
                         "re-invoked with the same args recomputes only the "
                         "missing stages (the dedup shuffle is never redone)")
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        kwargs = dict(include_dashboard=False, ignore_reinit_error=True,
                      logging_level="ERROR")
        if args.num_cpus:
            kwargs["num_cpus"] = args.num_cpus
        ray.init(address="local", **kwargs)
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    print(json.dumps(build_corpus(args.sf_dir, args.out,
                                  substr_cut_window=args.substr_cut_window,
                                  checkpoint_dir=args.checkpoint_dir)))
    ray.shutdown()


if __name__ == "__main__":
    main()
