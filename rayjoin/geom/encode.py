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
