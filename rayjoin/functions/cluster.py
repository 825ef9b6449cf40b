"""Density clustering over point geometries (exact DBSCAN).

DBSCAN (Ester et al., KDD'96) expressed entirely over the engine's existing
scale primitives — no new shuffle machinery:

  eps-neighborhood edges   -> the PBSM partitioned proximity SELF-join
                              (sampled grid cells, dilated replication,
                              hot-cell salting; rayjoin/join/partitioned.py)
  degree / core points     -> per-batch Arrow pre-aggregation + ONE groupby
                              (the shuffle carries per-block partial counts,
                              not edges)
  core-core components     -> dup_clusters (driver union-find for small pair
                              graphs, distributed pointer doubling —
                              O(log diameter) hash-join rounds — above the
                              row/byte caps)
  border/core assignment   -> one hash join + a min groupby
  noise                    -> one left_anti hash join

Determinism contract (this engine's documented semantics — stricter than the
paper's first-scan-wins labelling, so serial == parallel == SQL):

  * a cluster's id is the MIN row_id among its CORE points;
  * a border point within eps of core points from several clusters joins the
    MIN cluster id (the paper leaves this to scan order);
  * neighborhood counts INCLUDE the point itself (|N_eps(p)| >= min_pts,
    the scikit-learn convention), and the eps test is inclusive (<=),
    matching proximity_map (reference semantics: inclusive max_distance,
    /root/reference/src/lib.rs proximity docs).

Output: one row per input point — (row_id, cluster_id, is_core) with
cluster_id == -1 for noise.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

_OUT_EMPTY = pa.table(
    {
        "row_id": pa.array([], pa.int64()),
        "cluster_id": pa.array([], pa.int64()),
        "is_core": pa.array([], pa.bool_()),
    }
)


def _pin_out(t: pa.Table, is_core: bool) -> pa.Table:
    return pa.table(
        {
            "row_id": t["row_id"].cast(pa.int64()),
            "cluster_id": t["cluster_id"].cast(pa.int64()),
            "is_core": pa.array([is_core] * t.num_rows, pa.bool_()),
        }
    )


def ids_noise_only(pts):
    """All-noise output: every point with cluster_id -1, is_core false."""
    return pts.map_batches(
        lambda t: _pin_out(
            pa.table(
                {"row_id": t["row_id"].cast(pa.int64()),
                 "cluster_id": pa.array([-1] * t.num_rows, pa.int64())}
            ),
            False,
        ),
        batch_format="pyarrow",
    )


def dbscan(points, *, eps: float, min_pts: int, target_cells: int = 256,
           components_method: str = "auto"):
    """Exact DBSCAN over a point geometry table/Dataset (columns
    row_id/geom_type/coords, as built by ``geom.encode.points_geom``).
    row_ids must be unique.  Returns Dataset[row_id, cluster_id, is_core]
    covering EVERY input point (noise rows carry cluster_id == -1).

    ``eps`` is the inclusive neighborhood radius, ``min_pts`` the core
    threshold (self-inclusive).  ``target_cells`` sizes the PBSM grid of the
    eps self-join; ``components_method`` forwards to ``dup_clusters``
    ("auto" | "driver" | "distributed").
    """
    import ray
    import ray.data
    from ray.data.aggregate import Min, Sum

    from ..config import Config
    from ..join.partitioned import partitioned_proximity_map
    from ..util import drop_schemaless_empty_blocks
    from .dedup import _num_join_partitions, dup_clusters

    if min_pts < 1:
        raise ValueError(f"min_pts must be >= 1, got {min_pts}")
    pts = ray.data.from_arrow(points) if isinstance(points, pa.Table) else points
    pts = pts.materialize()

    # 1) eps-neighborhood edge list via the partitioned proximity self-join.
    #    Every point pairs with itself (distance 0), so every point appears
    #    as big_row_id at least once.  Pairs come out in BOTH directions
    #    (each point sits on both sides), which the degree count and the
    #    component edges both want.  map_groups can emit schemaless empty
    #    blocks that would crash the hash joins below — scrub them once.
    edge_schema = pa.table(
        {"big_row_id": pa.array([], pa.int64()),
         "small_row_id": pa.array([], pa.int64())}
    )
    edges = partitioned_proximity_map(
        pts, pts, Config(max_distance=float(eps)), target_cells=target_cells
    ).map_batches(
        lambda t: t.select(["big_row_id", "small_row_id"]),
        batch_format="pyarrow",
    )
    edges = drop_schemaless_empty_blocks(edges, edge_schema)

    # 2) core points: |N_eps(p)| >= min_pts.  Partial count per block, one
    #    tiny groupby over (row_id, cnt) partials.
    def deg_partial(t: pa.Table) -> pa.Table:
        g = t.group_by("big_row_id").aggregate([("big_row_id", "count")])
        return pa.table(
            {"row_id": g["big_row_id"].cast(pa.int64()),
             "cnt": g["big_row_id_count"].cast(pa.int64())}
        )

    mp = pa.scalar(int(min_pts), pa.int64())
    core = (
        edges.map_batches(deg_partial, batch_format="pyarrow")
        .groupby("row_id")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .map_batches(
            lambda t: t.filter(pc.greater_equal(t["cnt"], mp)).select(["row_id"]),
            batch_format="pyarrow",
        )
        .materialize()
    )
    core = drop_schemaless_empty_blocks(
        core, pa.table({"row_id": pa.array([], pa.int64())})
    )

    nparts = _num_join_partitions()

    # No core points -> everything is noise.  (Short-circuit matters beyond
    # taste: a hash join whose right side is an EMPTY dataset shuffles
    # schemaless partition blocks and dies inside acero.)
    if core.count() == 0:
        return ids_noise_only(pts)

    # 3) connected components of core points under the eps relation.  Both
    #    endpoints must be core; self-edges keep singleton-core clusters
    #    alive (a core point whose eps-neighbors are all border).
    core_edges = (
        edges.join(core, "inner", nparts, on=("big_row_id",),
                   right_on=("row_id",))
        .select_columns(["big_row_id", "small_row_id"])
        .join(core, "inner", nparts, on=("small_row_id",),
              right_on=("row_id",))
        .select_columns(["big_row_id", "small_row_id"])
        .map_batches(
            lambda t: pa.table(
                {"id_a": t["big_row_id"].cast(pa.int64()),
                 "id_b": t["small_row_id"].cast(pa.int64())}
            ),
            batch_format="pyarrow",
        )
    )
    comp = dup_clusters(core_edges, method=components_method).materialize()
    # Dataset[doc_id, cluster_id]; cluster_id = MIN core row_id of the
    # component (dup_clusters' label contract).

    # 4) every point within eps of >= 1 core point gets the MIN cluster id
    #    among its core neighbors.  For a core point that min IS its own
    #    component label (its core neighbors share it, and the self-edge
    #    contributes it directly) — so one join covers core AND border.
    assigned = (
        edges.join(comp, "inner", nparts, on=("small_row_id",),
                   right_on=("doc_id",))
        .map_batches(
            lambda t: pa.table(
                {"row_id": t["big_row_id"].cast(pa.int64()),
                 "cluster_id": t["cluster_id"].cast(pa.int64())}
            ),
            batch_format="pyarrow",
        )
        .groupby("row_id")
        .aggregate(Min("cluster_id", alias_name="cluster_id"))
        .materialize()
    )
    assigned = drop_schemaless_empty_blocks(
        assigned,
        pa.table({"row_id": pa.array([], pa.int64()),
                  "cluster_id": pa.array([], pa.int64())}),
    )

    core_out = comp.map_batches(
        lambda t: _pin_out(
            pa.table({"row_id": t["doc_id"], "cluster_id": t["cluster_id"]}),
            True,
        ),
        batch_format="pyarrow",
    )
    border_out = assigned.join(
        core, "left_anti", nparts, on=("row_id",)
    ).map_batches(lambda t: _pin_out(t, False), batch_format="pyarrow")

    # 5) noise: points with no core neighbor at all.
    ids = pts.map_batches(
        lambda t: pa.table({"row_id": t["row_id"].cast(pa.int64())}),
        batch_format="pyarrow",
    )
    noise = ids.join(assigned, "left_anti", nparts, on=("row_id",)).map_batches(
        lambda t: _pin_out(
            pa.table(
                {"row_id": t["row_id"],
                 "cluster_id": pa.array([-1] * t.num_rows, pa.int64())}
            ),
            False,
        ),
        batch_format="pyarrow",
    )

    out = core_out.union(border_out).union(noise)
    return drop_schemaless_empty_blocks(out, _OUT_EMPTY)
