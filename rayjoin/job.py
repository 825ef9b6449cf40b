"""Job entry point for ``ray job submit`` (north_rule: the whole pipeline
runs as a submitted job, resumable from its checkpoint manifest).

    ray job submit --working-dir /root/repo -- \
        python -m rayjoin.job --sf-dir /root/testdata/sf0.001 --out /tmp/geotile_job

Pipeline per shard (the resumable unit = a row-range shard of the pages
corpus): pages -> geocode(url) -> tile assign (quadtree + Hilbert) ->
point-in-region spatial join (broadcast STR index) -> per-shard parquet +
manifest line with lineage and throughput.  Re-running the same command
skips complete shards (rayjoin.checkpoint); a final rollup prints one JSON
metrics line.

Local smoke (no job server in this sandbox): ``python -m rayjoin.job ...``
starts a local Ray session itself.
"""

from __future__ import annotations

import argparse
import json
import time


def _shard_table(sf_dir: str, shard: int, n_shards: int, synth_rows: int = 0):
    if synth_rows:
        # synthesized Common-Crawl-shaped corpus shard (scale demo mode):
        # deterministic per shard, independent of shard count boundaries
        from rayjoin.sources.pages import synth_pages

        per = (synth_rows + n_shards - 1) // n_shards
        lo = shard * per
        n = max(min(synth_rows - lo, per), 0)
        t = synth_pages(n, seed=1000 + shard)
        import pyarrow.compute as pc

        return (
            t.select(["doc_id", "text", "lang"])
            .set_column(0, "doc_id", pc.add(t["doc_id"], lo))
        )
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"])
    per = (t.num_rows + n_shards - 1) // n_shards
    return t.slice(shard * per, per)


def run_job(sf_dir: str, out_dir: str, resolution: int = 10, shards: int = 8,
            synth_rows: int = 0):
    import numpy as np
    import pyarrow as pa
    import ray
    import ray.data

    from rayjoin.checkpoint import run_partitioned
    from rayjoin.config import Interaction
    from rayjoin.join.broadcast import SpatialIndex
    from rayjoin.pipelines.gate import rects_geom_table, tris_geom_table
    from rayjoin.sources.pages import _pages_batch
    from rayjoin.stages.geocode import geocode_from_url
    from rayjoin.stages.tiles import TileAssign

    # region layer: supplier rects + part triangles (ids disjoint)
    tris = tris_geom_table(sf_dir)
    tris = tris.set_column(0, "row_id", pa.compute.add(tris["row_id"], 1_000_000))
    regions = pa.concat_tables([rects_geom_table(sf_dir), tris], promote_options="default")
    idx = SpatialIndex(regions)
    tiler = TileAssign(resolution=resolution)

    def compute(part: str) -> pa.Table:
        shard = int(part)
        src = _shard_table(sf_dir, shard, shards, synth_rows)
        pages = _pages_batch(src)
        geo = tiler(geocode_from_url(pages))
        from rayjoin.geom.encode import points_geom

        pts = points_geom(
            np.asarray(geo["doc_id"].combine_chunks(), dtype=np.int64),
            np.asarray(geo["lon"].combine_chunks(), dtype=np.float64),
            np.asarray(geo["lat"].combine_chunks(), dtype=np.float64),
        )
        big = ray.data.from_arrow(pts)
        joined = idx.spatial_join(big, Interaction.CONTAINS)
        jt = pa.concat_tables(
            [t for t in ray.get(joined.to_arrow_refs()) if t.num_rows] or
            [pa.table({"big_row_id": pa.array([], pa.int64()),
                       "small_row_id": pa.array([], pa.int64())})]
        )
        # emit per-page tile assignment + region hits (text NOT carried into
        # the join shuffle — byte identity is preserved in the tiles output)
        tiles = geo.select(["doc_id", "url", "lat", "lon", "tile_id", "hilbert_id", "text"])
        hits = jt.rename_columns(["doc_id", "region_id"])
        merged = tiles.join(hits, keys=["doc_id"], join_type="left outer")
        return merged.sort_by("doc_id")

    def fingerprint(part: str) -> str:
        return f"{sf_dir}/documents.parquet[{part}/{shards}]"

    t0 = time.time()
    manifest = run_partitioned(out_dir, [str(i) for i in range(shards)], compute, fingerprint)
    dt = time.time() - t0
    total_rows = sum(m["rows"] for m in manifest.values())
    out = {
        "job": "geotile",
        "sf_dir": sf_dir,
        "out_dir": out_dir,
        "shards": len(manifest),
        "rows": total_rows,
        "wall_sec": round(dt, 3),
        "rows_per_sec": round(total_rows / dt) if dt > 0 else None,
        "complete": len(manifest) == shards,
    }
    print(json.dumps(out))
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--out", required=True)
    ap.add_argument("--resolution", type=int, default=10)
    ap.add_argument("--shards", type=int, default=8)
    ap.add_argument("--num-cpus", type=int, default=None)
    ap.add_argument("--synth-rows", type=int, default=0,
                    help="synthesize an N-row pages corpus instead of reading documents.parquet")
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        # under `ray job submit` the address env connects us to the cluster;
        # standalone we bring up a local session
        kwargs = dict(include_dashboard=False, ignore_reinit_error=True,
                      logging_level="ERROR")
        if args.num_cpus:
            kwargs["num_cpus"] = args.num_cpus
        ray.init(address="local", **kwargs)
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    run_job(args.sf_dir, args.out, args.resolution, args.shards, args.synth_rows)
    ray.shutdown()


if __name__ == "__main__":
    main()
