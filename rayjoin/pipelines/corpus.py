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

import json
import time

import numpy as np
import pyarrow as pa


def build_corpus(sf_dir: str, out_dir: str, *, resolution: int = 10,
                 num_partitions: int = 8, min_tokens: int = 5,
                 min_mean_token_len_milli: int = 2000,
                 keep_langs: tuple = ("en", "de", "fr", "es", "pt", "zh"),
                 dedup_threshold: float = 0.8, seed: int = 42,
                 broadcast_drop_rows: int = 5_000_000,
                 substr_cut_window: int | None = None) -> dict:
    """Run the composed pipeline; returns a metrics dict (counts per stage,
    wall seconds, partition layout)."""
    import ray
    import ray.data

    from ..functions.dedup import near_dup_drop_list
    from ..functions.text import quality_score
    from ..sources.pages import pages_from_documents
    from ..stages.geocode import geocode_from_url
    from ..stages.sink import write_hilbert_partitioned
    from ..stages.tiles import tile_assign

    t0 = time.time()
    pages = pages_from_documents(sf_dir)
    geo = tile_assign(
        pages.map_batches(geocode_from_url, batch_format="pyarrow"),
        resolution=resolution,
    )

    langs = set(keep_langs)

    def keep_quality(t: pa.Table) -> pa.Table:
        q = quality_score(t.select(["doc_id", "text"]))
        mean_ok = np.asarray(q["mean_token_len_milli"], dtype=np.int64) >= min_mean_token_len_milli
        tok_ok = np.asarray(q["n_tokens"], dtype=np.int64) >= min_tokens
        lang_ok = np.asarray(
            pa.compute.is_in(t["lang"].combine_chunks(), value_set=pa.array(sorted(langs)))
        )
        return t.filter(pa.array(mean_ok & tok_ok & lang_ok, pa.bool_()))

    filtered = geo.map_batches(keep_quality, batch_format="pyarrow").materialize()
    n_filtered = filtered.count()

    # near-dup drop list over the SURVIVING docs (bounded pair graph).
    # On a dup-heavy corpus the list is O(corpus), so it must never land on
    # the driver as Python rows (VERDICT r2 #2): below the broadcast
    # threshold it travels object-store -> numpy via to_arrow_refs (no
    # per-row Python); above it the drop becomes a distributed hash
    # anti-join and the ids never aggregate anywhere.
    drop = near_dup_drop_list(
        filtered.select_columns(["doc_id", "text"]), threshold=dedup_threshold
    ).materialize()
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
    bounds = write_hilbert_partitioned(
        kept, out_dir, num_partitions=num_partitions, resolution=12, seed=seed
    )
    # written-row count from parquet FOOTER metadata only — re-reading the
    # whole output to count it would be a second full pass (VERDICT r2 #2)
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    written = sum(
        pq.ParquetFile(p).metadata.num_rows
        for p in pads.dataset(out_dir, format="parquet").files
    )
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
                                  substr_cut_window=args.substr_cut_window)))
    ray.shutdown()


if __name__ == "__main__":
    main()
