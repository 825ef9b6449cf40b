"""Vectorized geometry measures: area, length/perimeter, centroid.

Engine-added scope (the reference crate computes only relates/distance —
`/root/reference/src/relates_impl.rs` — but any tiling/zonal pipeline needs
measures).  All kernels run over the GeomBatch flat edge arrays with
``np.bincount`` segment sums — zero per-row Python.

Float-op ORDER is part of the contract: crosses are ``sx*ey - ex*sy`` summed
in edge order, areas are ``abs(sum) * 0.5``, single-ring centroids are
``nx / (3.0 * sum)`` — exactly mirrorable in SQL (the ``tri_measures`` gate
row hash-matches a DuckDB shoelace oracle bit-for-bit).

Semantics per kind:
- point: area 0, length 0, centroid = the point
- line/linestring: area 0, length = path length, centroid = length-weighted
  midpoint of segments (vertex mean when total length is 0)
- rect/triangle/polygon: shoelace area (exterior minus |holes|), perimeter =
  sum of ring edge lengths (rings are closed by GeomBatch normalization),
  shoelace centroid (holes subtracted by |area| weight, winding-invariant);
  collapsed rings (signed sum 0) fall back to the vertex mean
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .batch import GeomBatch
from .spec import LINE, LINESTRING

_AREA_KINDS = frozenset((3, 4, 5))  # polygon, rect, triangle


def measures_batch(t: pa.Table) -> pa.Table:
    """row_id, area, length, centroid_x, centroid_y for one geometry batch."""
    gb = GeomBatch.from_arrow(t)
    n = gb.n
    E = gb.edges
    R = gb.ring_edge_off.size - 1
    edge_counts = np.diff(gb.ring_edge_off)
    ring_of_e = np.repeat(np.arange(R, dtype=np.int64), edge_counts)

    cross = E[:, 0] * E[:, 3] - E[:, 2] * E[:, 1]
    dx = E[:, 2] - E[:, 0]
    dy = E[:, 3] - E[:, 1]
    seglen = np.sqrt(dx * dx + dy * dy)  # NOT np.hypot: must match SQL sqrt

    ring_cross = np.bincount(ring_of_e, weights=cross, minlength=R)
    ring_len = np.bincount(ring_of_e, weights=seglen, minlength=R)
    ring_nx = np.bincount(ring_of_e, weights=(E[:, 0] + E[:, 2]) * cross,
                          minlength=R)
    ring_ny = np.bincount(ring_of_e, weights=(E[:, 1] + E[:, 3]) * cross,
                          minlength=R)
    # length-weighted segment midpoints (line/linestring centroids)
    ring_mx = np.bincount(ring_of_e, weights=seglen * ((E[:, 0] + E[:, 2]) * 0.5),
                          minlength=R)
    ring_my = np.bincount(ring_of_e, weights=seglen * ((E[:, 1] + E[:, 3]) * 0.5),
                          minlength=R)

    rings_per_geom = np.diff(gb.geom_ring_off)
    geom_of_r = np.repeat(np.arange(n, dtype=np.int64), rings_per_geom)
    is_exterior = np.zeros(R, dtype=bool)
    is_exterior[gb.geom_ring_off[:-1][rings_per_geom > 0]] = True

    kind = gb.kind.astype(np.int64)
    is_area_geom = (kind == 3) | (kind == 4) | (kind == 5)
    is_path_geom = (kind == LINE) | (kind == LINESTRING)
    area_ring = is_area_geom[geom_of_r]

    ring_area_abs = np.abs(ring_cross) * 0.5
    sgn = np.where(is_exterior, 1.0, -1.0)
    area = np.bincount(geom_of_r, weights=np.where(area_ring, sgn * ring_area_abs, 0.0),
                       minlength=n)
    length = np.bincount(geom_of_r, weights=ring_len, minlength=n)

    # --- centroids ---------------------------------------------------------
    # vertex mean per ring EXCLUDING the closing vertex of closed rings
    # (the degenerate-fallback and the point centroid)
    vert_counts = np.diff(gb.ring_vert_off)
    ring_of_v = np.repeat(np.arange(R, dtype=np.int64), vert_counts)
    closed_ring = area_ring  # tri/rect/poly rings are closed by _build
    # mask the last vertex of each closed ring
    last_v = gb.ring_vert_off[1:] - 1
    vmask = np.ones(gb.xy.shape[0], dtype=bool)
    vmask[last_v[closed_ring & (vert_counts > 1)]] = False
    eff_counts = vert_counts - (closed_ring & (vert_counts > 1)).astype(np.int64)
    vx = np.bincount(ring_of_v[vmask], weights=gb.xy[vmask, 0], minlength=R)
    vy = np.bincount(ring_of_v[vmask], weights=gb.xy[vmask, 1], minlength=R)
    with np.errstate(divide="ignore", invalid="ignore"):
        mean_x = vx / eff_counts
        mean_y = vy / eff_counts
        # shoelace ring centroid (single-ring exact form, SQL-mirrored)
        c_x = ring_nx / (3.0 * ring_cross)
        c_y = ring_ny / (3.0 * ring_cross)
        # path centroid
        p_x = ring_mx / ring_len
        p_y = ring_my / ring_len

    cx = np.full(n, np.nan)
    cy = np.full(n, np.nan)

    # single-ring geometries take their ring value directly (bit-exact path)
    first_ring = gb.geom_ring_off[:-1]
    single = rings_per_geom == 1
    sr = first_ring[single]
    scx = np.where(
        is_area_geom[single],
        np.where(ring_cross[sr] != 0.0, c_x[sr], mean_x[sr]),
        np.where(is_path_geom[single],
                 np.where(ring_len[sr] > 0.0, p_x[sr], mean_x[sr]),
                 mean_x[sr]),  # point: mean of its 1 vertex = the point
    )
    scy = np.where(
        is_area_geom[single],
        np.where(ring_cross[sr] != 0.0, c_y[sr], mean_y[sr]),
        np.where(is_path_geom[single],
                 np.where(ring_len[sr] > 0.0, p_y[sr], mean_y[sr]),
                 mean_y[sr]),
    )
    cx[single] = scx
    cy[single] = scy

    # multi-ring polygons: |area|-weighted, exterior minus holes (vectorized;
    # degenerate geoms fall back to the vertex mean over all their rings)
    multi = np.flatnonzero(~single)
    if multi.size:
        w = np.where(area_ring & (ring_cross != 0.0), sgn * ring_area_abs, 0.0)
        num_x = np.bincount(geom_of_r, weights=np.where(w != 0.0, w * c_x, 0.0),
                            minlength=n)
        num_y = np.bincount(geom_of_r, weights=np.where(w != 0.0, w * c_y, 0.0),
                            minlength=n)
        den = np.bincount(geom_of_r, weights=w, minlength=n)
        gvx = np.bincount(geom_of_r, weights=vx, minlength=n)
        gvy = np.bincount(geom_of_r, weights=vy, minlength=n)
        gvc = np.maximum(np.bincount(geom_of_r, weights=eff_counts.astype(float),
                                     minlength=n), 1.0)
        ok = den[multi] != 0.0
        mv, mb = multi[ok], multi[~ok]
        cx[mv] = num_x[mv] / den[mv]
        cy[mv] = num_y[mv] / den[mv]
        cx[mb] = gvx[mb] / gvc[mb]
        cy[mb] = gvy[mb] / gvc[mb]

    return pa.table(
        {
            "row_id": pa.array(gb.row_id, pa.int64()),
            "area": pa.array(area, pa.float64()),
            "length": pa.array(length, pa.float64()),
            "centroid_x": pa.array(cx, pa.float64()),
            "centroid_y": pa.array(cy, pa.float64()),
        }
    )


def geom_measures(ds):
    """Dataset stage: measures per geometry row (embarrassingly parallel)."""
    return ds.map_batches(measures_batch, batch_format="pyarrow")
