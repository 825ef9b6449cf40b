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
