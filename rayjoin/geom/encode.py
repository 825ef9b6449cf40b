"""Arrow geometry encoding.

Wire format (FIXTURES.md §2; chosen in SURVEY.md §1.4 to replace the
reference's ``SplitGeoSeq`` type-partitioned layout,
/root/reference/src/structs.rs:83-91, with Arrow-native columns):

    row_id    int64              -- join-output identity (sequence position in
                                    the reference, /root/reference/src/structs.rs:369-373)
    geom_type int8               -- 0=point 1=line 2=linestring 3=polygon 4=rect 5=triangle
    coords    list<list<double>> -- rings of flat [x0,y0,x1,y1,...]
                                    point     = 1 ring, 1 vertex
                                    line      = 1 ring, 2 vertices
                                    rect      = 1 ring, [xmin,ymin,xmax,ymax]
                                    triangle  = 1 ring, 3 vertices
                                    linestring= 1 ring, >=2 vertices
                                    polygon   = exterior ring first, then holes

This module provides the scalar (driver/test-side) conversions; the
vectorized batch decode lives in ``rayjoin.geom.batch``.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np
import pyarrow as pa

from . import spec
from .spec import LINE, LINESTRING, POINT, POLYGON, RECT, TRIANGLE

GEOM_SCHEMA = pa.schema(
    [
        pa.field("row_id", pa.int64()),
        pa.field("geom_type", pa.int8()),
        pa.field("coords", pa.list_(pa.list_(pa.float64()))),
    ]
)


def pack_single_rings(flat: np.ndarray, ring_len: int) -> pa.ListArray:
    """``coords`` column (list<list<double>>) for n single-ring geometries
    from one flat (n*ring_len,) float64 array — built from numpy offset
    arrays via ``pa.ListArray.from_arrays``, zero per-row Python (the
    VERDICT r1 fix for the ``[[x, y] for ...]`` hot-path comprehensions)."""
    flat = np.ascontiguousarray(flat, dtype=np.float64)
    n = flat.size // ring_len
    inner = pa.ListArray.from_arrays(
        pa.array(np.arange(0, flat.size + 1, ring_len, dtype=np.int32)),
        pa.array(flat, pa.float64()),
    )
    return pa.ListArray.from_arrays(
        pa.array(np.arange(n + 1, dtype=np.int32)), inner
    )


def pack_rings(flat: np.ndarray, ring_len: int, rings_per_geom: int) -> pa.ListArray:
    """``coords`` column for n MULTI-ring geometries (e.g. polygons with
    holes): ``flat`` holds ``rings_per_geom`` consecutive rings of
    ``ring_len`` doubles per geometry (exterior ring first, then holes —
    the module-header layout).  Same zero-per-row-Python construction as
    ``pack_single_rings``."""
    flat = np.ascontiguousarray(flat, dtype=np.float64)
    nrings = flat.size // ring_len
    inner = pa.ListArray.from_arrays(
        pa.array(np.arange(0, flat.size + 1, ring_len, dtype=np.int32)),
        pa.array(flat, pa.float64()),
    )
    return pa.ListArray.from_arrays(
        pa.array(np.arange(0, nrings + 1, rings_per_geom, dtype=np.int32)), inner
    )


def _geom_table(row_id: np.ndarray, geom_type: int, coords: pa.ListArray) -> pa.Table:
    return pa.table(
        {
            "row_id": pa.array(np.asarray(row_id, dtype=np.int64), pa.int64()),
            "geom_type": pa.array(
                np.full(len(coords), geom_type, np.int8), pa.int8()
            ),
            "coords": coords,
        }
    )


def points_geom(row_id: np.ndarray, x: np.ndarray, y: np.ndarray) -> pa.Table:
    """Point geometry table from coordinate arrays (vectorized)."""
    flat = np.empty(2 * len(x), np.float64)
    flat[0::2] = x
    flat[1::2] = y
    return _geom_table(row_id, POINT, pack_single_rings(flat, 2))


def rects_geom(row_id, xmin, ymin, xmax, ymax) -> pa.Table:
    """Rect geometry table ([xmin,ymin,xmax,ymax] ring) from arrays."""
    flat = np.column_stack([xmin, ymin, xmax, ymax]).ravel()
    return _geom_table(row_id, RECT, pack_single_rings(flat, 4))


def lines_geom(row_id, sx, sy, ex, ey) -> pa.Table:
    """Line-segment geometry table ([sx,sy,ex,ey] ring) from arrays."""
    flat = np.column_stack([sx, sy, ex, ey]).ravel()
    return _geom_table(row_id, LINE, pack_single_rings(flat, 4))


def tris_geom(row_id, ax, ay, bx, by, cx, cy) -> pa.Table:
    """Triangle geometry table from vertex arrays."""
    flat = np.column_stack([ax, ay, bx, by, cx, cy]).ravel()
    return _geom_table(row_id, TRIANGLE, pack_single_rings(flat, 6))


def geom_to_rings(g) -> List[List[float]]:
    k = g.kind
    if k == POINT:
        return [[g.x, g.y]]
    if k == LINE:
        return [[g.sx, g.sy, g.ex, g.ey]]
    if k == LINESTRING:
        return [[c for p in g.pts for c in p]]
    if k == POLYGON:
        return [[c for p in ring for c in p] for ring in g.rings()]
    if k == RECT:
        return [[g.xmin, g.ymin, g.xmax, g.ymax]]
    if k == TRIANGLE:
        return [[g.ax, g.ay, g.bx, g.by, g.cx, g.cy]]
    raise AssertionError(f"unknown kind {k}")


def rings_to_geom(geom_type: int, rings: Sequence[Sequence[float]]):
    def pairs(ring):
        return tuple((ring[i], ring[i + 1]) for i in range(0, len(ring), 2))

    if geom_type == POINT:
        (p,) = pairs(rings[0])
        return spec.Point(*p)
    if geom_type == LINE:
        (s, e) = pairs(rings[0])
        return spec.Line(*s, *e)
    if geom_type == LINESTRING:
        return spec.LineString(pairs(rings[0]))
    if geom_type == POLYGON:
        all_rings = [pairs(r) for r in rings]
        return spec.Polygon.new(all_rings[0], all_rings[1:])
    if geom_type == RECT:
        x0, y0, x1, y1 = rings[0]
        return spec.Rect(x0, y0, x1, y1)
    if geom_type == TRIANGLE:
        a, b, c = pairs(rings[0])
        return spec.Triangle(*a, *b, *c)
    raise AssertionError(f"unknown geom_type {geom_type}")


def geoms_to_table(geoms: Sequence, row_ids: Optional[Sequence[int]] = None) -> pa.Table:
    if row_ids is None:
        row_ids = range(len(geoms))
    return pa.table(
        {
            "row_id": pa.array(list(row_ids), pa.int64()),
            "geom_type": pa.array([g.kind for g in geoms], pa.int8()),
            "coords": pa.array([geom_to_rings(g) for g in geoms], pa.list_(pa.list_(pa.float64()))),
        }
    )


def table_to_geoms(table: pa.Table) -> List[Tuple[int, object]]:
    """Decode an Arrow geometry table into [(row_id, spec geometry), ...]."""
    out = []
    row_ids = table.column("row_id").to_pylist()
    types = table.column("geom_type").to_pylist()
    coords = table.column("coords").to_pylist()
    for rid, t, rings in zip(row_ids, types, coords):
        out.append((rid, rings_to_geom(t, rings)))
    return out
