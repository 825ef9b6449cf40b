"""rayjoin — a Ray-Data-native spatial-join + tiling engine.

Built from scratch on ray.data.Dataset / map_batches / actor pools, with the
join semantics of the reference crate msalib/spatial-join (see SURVEY.md):

- spatial joins (Intersects / Within / Contains) over six 2-D euclidean
  geometry types (point, line, linestring, polygon, rect, triangle),
- proximity maps (inclusive distance-threshold joins emitting distances),
- kNN joins (new engine scope; ties broken by (distance, small_row_id)),
- geocoding + hierarchical quadtree/Hilbert tiling for Common-Crawl-style
  Parquet page corpora,
- skew-aware spatial partitioning (sampled Hilbert ranges, hot-cell split),
- checkpoint manifests with per-partition lineage.

Reference semantics: /root/reference/src/{index.rs,relates_impl.rs,gen.py}.
"""

from .config import Config, Interaction, SpatialJoinError

__all__ = ["Config", "Interaction", "SpatialJoinError"]
