"""Vectorized batch validation — the IsSafe checks of the reference
(/root/reference/src/validation.rs) over a GeomBatch.

Raises the same four error conditions with the *row_id* of the offending
geometry (the reference reports the sequence position; row_id is our stable
equivalent, SURVEY.md §1.4).
"""

from __future__ import annotations

import numpy as np

from ..config import BadCoordinateValue, LineStringTooSmall, PolygonExteriorTooSmall
from ..geom.batch import GeomBatch
from ..geom.spec import LINESTRING, POLYGON


def validate_batch(batch: GeomBatch) -> None:
    n = batch.n
    if n == 0:
        return
    # too-small checks first for linestrings (validation.rs:39-43 checks
    # length before coordinates)
    is_ls = batch.kind == LINESTRING
    if is_ls.any():
        ids = np.flatnonzero(is_ls)
        nv = batch.geom_vert_count(ids)
        bad = nv < 2
        if bad.any():
            raise LineStringTooSmall(int(batch.row_id[ids[bad][0]]))
    is_pg = batch.kind == POLYGON
    if is_pg.any():
        ids = np.flatnonzero(is_pg)
        ext = batch.ext_ring(ids)
        ext_nv = batch.ring_vert_off[ext + 1] - batch.ring_vert_off[ext]
        bad = ext_nv < 3
        if bad.any():
            raise PolygonExteriorTooSmall(int(batch.row_id[ids[bad][0]]))
        # any ring with < 2 vertices is reported as BadCoordinateValue
        # (validation.rs:95-102 downcasts ring errors)
        first, nr = batch.rings_of(ids)
        from ..geom.primitives import repeat_expand

        rid, rk = repeat_expand(nr)
        rings = first[rid] + rk
        rv = batch.ring_vert_off[rings + 1] - batch.ring_vert_off[rings]
        bad = rv < 2
        if bad.any():
            raise BadCoordinateValue(int(batch.row_id[ids[rid[bad][0]]]))
    # non-finite coordinates anywhere
    finite = np.isfinite(batch.xy).all(axis=1)
    if not finite.all():
        v = np.flatnonzero(~finite)[0]
        # find owning geometry via ring, then geometry
        r = np.searchsorted(batch.ring_vert_off, v, side="right") - 1
        g = np.searchsorted(batch.geom_ring_off, r, side="right") - 1
        raise BadCoordinateValue(int(batch.row_id[g]))
