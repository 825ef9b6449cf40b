"""Partitioned parquet sink: the scale output layout (engine guidance: one
output directory per key range so a rerun can skip finished work).

``write_hilbert_partitioned`` lays a geocoded dataset out as
``out_dir/part_key=K/*.parquet`` with K from the sampled Hilbert range
partitioner — spatially compact ranges, skew-balanced by equi-depth
boundaries.  Returns the range boundaries (the manifest of the layout).
"""

from __future__ import annotations

import numpy as np

from .partition import hilbert_partitioned


def write_hilbert_partitioned(ds, out_dir: str, num_partitions: int = 16,
                              resolution: int = 12, lat_col: str = "lat",
                              lon_col: str = "lon", seed: int = 42) -> np.ndarray:
    parts, bounds = hilbert_partitioned(
        ds, num_partitions, resolution, lat_col, lon_col, seed
    )
    parts.write_parquet(out_dir, partition_cols=["part_key"])
    return bounds


ZONEMAP_NAME = "_zonemap.parquet"


def build_zone_manifest(out_dir: str, lat_col: str = "lat",
                        lon_col: str = "lon"):
    """Zone-map manifest over a ``write_hilbert_partitioned`` layout: one
    row per ``part_key=K`` directory with [min, max] of lat/lon plus row
    and file counts, derived from parquet FOOTER statistics only (no data
    scan — the Hilbert layout is what makes these zone maps tight: each
    partition is a spatially compact curve range).  One Ray task per
    partition directory, so manifest build is O(files/partition) per task
    and O(partitions) driver-side.  Writes ``out_dir/_zonemap.parquet``
    and returns the manifest as a pa.Table."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    part_dirs = sorted(
        d for d in os.listdir(out_dir)
        if d.startswith("part_key=") and os.path.isdir(os.path.join(out_dir, d))
    )

    @ray.remote
    def _scan_part(root: str, d: str):
        key = int(d.split("=", 1)[1])
        lat_lo = lon_lo = float("inf")
        lat_hi = lon_hi = float("-inf")
        rows = files = 0
        for f in sorted(os.listdir(os.path.join(root, d))):
            if not f.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(root, d, f)).metadata
            files += 1
            rows += md.num_rows
            names = {md.schema.column(i).name: i for i in range(md.num_columns)}
            for rg in range(md.num_row_groups):
                for col, is_lat in ((lat_col, True), (lon_col, False)):
                    st = md.row_group(rg).column(names[col]).statistics
                    if st is None or not st.has_min_max:
                        raise ValueError(
                            f"zone manifest: no footer min/max for {col} in {d}/{f}")
                    if is_lat:
                        lat_lo = min(lat_lo, st.min)
                        lat_hi = max(lat_hi, st.max)
                    else:
                        lon_lo = min(lon_lo, st.min)
                        lon_hi = max(lon_hi, st.max)
        return (key, lat_lo, lat_hi, lon_lo, lon_hi, rows, files)

    recs = ray.get([_scan_part.remote(out_dir, d) for d in part_dirs])
    recs = [r for r in recs if r[6] > 0]
    recs.sort()
    cols = list(zip(*recs)) if recs else [[]] * 7
    manifest = pa.table({
        "part_key": pa.array(cols[0], pa.int64()),
        "lat_min": pa.array(cols[1], pa.float64()),
        "lat_max": pa.array(cols[2], pa.float64()),
        "lon_min": pa.array(cols[3], pa.float64()),
        "lon_max": pa.array(cols[4], pa.float64()),
        "rows": pa.array(cols[5], pa.int64()),
        "files": pa.array(cols[6], pa.int64()),
    })
    pq.write_table(manifest, f"{out_dir}/{ZONEMAP_NAME}")
    return manifest


def prune_partitions(manifest, lat_lo: float, lat_hi: float,
                     lon_lo: float, lon_hi: float) -> list:
    """part_keys whose zone [lat_min,lat_max]x[lon_min,lon_max] intersects
    the CLOSED query box (bbox-overlap, same inclusive convention as the
    engine's candidate generation)."""
    import pyarrow.compute as pc

    keep = pc.and_(
        pc.and_(pc.less_equal(manifest["lat_min"], lat_hi),
                pc.greater_equal(manifest["lat_max"], lat_lo)),
        pc.and_(pc.less_equal(manifest["lon_min"], lon_hi),
                pc.greater_equal(manifest["lon_max"], lon_lo)),
    )
    return manifest.filter(keep)["part_key"].to_pylist()


def read_bbox_pruned(out_dir: str, lat_lo: float, lat_hi: float,
                     lon_lo: float, lon_hi: float, columns=None,
                     lat_col: str = "lat", lon_col: str = "lon"):
    """Spatial predicate pushdown at the READ: consult the zone-map
    manifest, scan ONLY the partition directories whose bounds intersect
    the query box, then apply the exact residual filter per batch.  Rows
    returned are exactly those with lat/lon inside the closed box — the
    pruning is a pure I/O optimization (pytest pins selected < total and
    result == full-scan-and-filter).  At 100 TB this is the difference
    between touching a city's partitions and scanning the planet."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray.data

    manifest = pq.read_table(f"{out_dir}/{ZONEMAP_NAME}")
    keys = prune_partitions(manifest, lat_lo, lat_hi, lon_lo, lon_hi)
    read_cols = None
    if columns is not None:
        read_cols = sorted(set(columns) | {lat_col, lon_col})

    def residual(t: pa.Table) -> pa.Table:
        lat = np.asarray(t[lat_col].combine_chunks(), dtype=np.float64)
        lon = np.asarray(t[lon_col].combine_chunks(), dtype=np.float64)
        m = (lat >= lat_lo) & (lat <= lat_hi) & (lon >= lon_lo) & (lon <= lon_hi)
        out = t.filter(pa.array(m))
        return out.select(columns) if columns is not None else out

    if not keys:
        # empty cover: build a zero-row dataset with the right schema from
        # a footer (empty blocks BYPASS map UDFs, so a limit(0)+residual
        # chain would surface a column-less frame)
        import os

        first = manifest["part_key"][0].as_py() if manifest.num_rows else None
        if first is None:
            raise ValueError(f"read_bbox_pruned: empty layout at {out_dir}")
        pdir = os.path.join(out_dir, f"part_key={first}")
        f0 = next(f for f in sorted(os.listdir(pdir)) if f.endswith(".parquet"))
        schema = pq.read_schema(os.path.join(pdir, f0))
        out_names = columns if columns is not None else schema.names
        empty = pa.table({c: pa.array([], schema.field(c).type) for c in out_names})
        return ray.data.from_arrow(empty)
    import os

    # read_parquet accepts a single directory but a LIST must be files —
    # expand each selected partition dir (bounded by the pruned count)
    paths = [
        os.path.join(out_dir, f"part_key={k}", f)
        for k in keys
        for f in sorted(os.listdir(os.path.join(out_dir, f"part_key={k}")))
        if f.endswith(".parquet")
    ]
    ds = ray.data.read_parquet(paths, columns=read_cols)
    return ds.map_batches(residual, batch_format="pyarrow")
