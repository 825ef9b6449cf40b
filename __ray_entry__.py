"""Driver contract for the graft builder (Ray Data target).

``entry()`` — flagship geotile pipeline on sf0.001.
``queries()`` — one entry per implemented operator (SURVEY.md §2 + the
training-data ops); each callable takes ``sf_dir``.
``oracle_sql()`` — DuckDB-equivalent SQL for every SQL-expressible query
(identical IEEE expressions; see rayjoin/pipelines/gate.py).

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

SF_SMOKE = "/root/testdata/sf0.001"


def entry() -> Any:
    """Flagship: pages -> geocode(url) -> tile-assign -> point-in-region
    spatial join -> per-region counts."""
    import ray.data
    from ray.data.aggregate import Count

    from rayjoin.config import Interaction
    from rayjoin.join.broadcast import SpatialIndex
    from rayjoin.pipelines.gate import rects_geom_table, tris_geom_table
    from rayjoin.sources.pages import pages_from_documents
    from rayjoin.stages.geocode import geocode_from_url
    from rayjoin.stages.tiles import tile_assign

    import numpy as np
    import pyarrow as pa

    pages = pages_from_documents(SF_SMOKE)
    geo = pages.map_batches(geocode_from_url, batch_format="pyarrow")
    geo = tile_assign(geo, resolution=10)

    def to_points(t: pa.Table) -> pa.Table:
        from rayjoin.geom.encode import points_geom

        lon = np.asarray(t["lon"].combine_chunks(), dtype=np.float64)
        lat = np.asarray(t["lat"].combine_chunks(), dtype=np.float64)
        ids = np.asarray(t["doc_id"].combine_chunks(), dtype=np.int64)
        return points_geom(ids, lon, lat)

    points = geo.map_batches(to_points, batch_format="pyarrow")
    # region layer: supplier rects + part triangles (deterministic);
    # triangle row_ids offset to keep region identities disjoint
    tris = tris_geom_table(SF_SMOKE)
    tris = tris.set_column(
        0, "row_id", pa.compute.add(tris["row_id"], 1_000_000)
    )
    regions = pa.concat_tables([rects_geom_table(SF_SMOKE), tris], promote_options="default")
    idx = SpatialIndex(regions)
    joined = idx.spatial_join(points, Interaction.CONTAINS)
    return joined.groupby("small_row_id").aggregate(Count(alias_name="n_docs"))


def queries() -> dict[str, Callable[[str], Any]]:
    from rayjoin.pipelines.gate import build_queries

    q, _ = build_queries()
    return q


def oracle_sql() -> dict[str, str]:
    from rayjoin.pipelines.gate import build_queries

    _, o = build_queries()
    return o
