"""Flat hexagonal grid binning (the H3-flavored tiling next to the equirect
quadtree in tiles.py and the S2-style cube cells in s2cell.py).

Pointy-top axial hex lattice over (lon, lat) treated as planar (same domain
contract as tiles.py).  Assignment is the standard cube-rounding algorithm
(Amit Patel's hex-grid formulation of the H3/pixel-to-hex mapping) with one
deliberate change: fractional coordinates round via floor(v + 0.5) instead
of banker's rounding, so the SQL twin reproduces every branch bit-exactly
(numpy's np.round half-to-even differs from SQL round's half-away-from-
zero; floor(v + 0.5) is identical everywhere).

Cell ids pack the axial pair: hex_id = (q + 2^20) * 2^21 + (r + 2^20) —
integer arithmetic, SQL-identical.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_OFF = 1 << 20
_PACK = 1 << 21
SQRT3 = float(np.sqrt(3.0))


def hex_qr(lon: np.ndarray, lat: np.ndarray, size: float):
    """(q, r) axial coordinates of the hex containing each point."""
    x = np.asarray(lon, np.float64)
    y = np.asarray(lat, np.float64)
    qf = (SQRT3 / 3.0 * x - y / 3.0) / size
    rf = (2.0 / 3.0 * y) / size
    # cube rounding with floor(v + 0.5) (see module docstring)
    xf, zf = qf, rf
    yf = -xf - zf
    rx = np.floor(xf + 0.5)
    ry = np.floor(yf + 0.5)
    rz = np.floor(zf + 0.5)
    dx = np.abs(rx - xf)
    dy = np.abs(ry - yf)
    dz = np.abs(rz - zf)
    # exclusive branches exactly as the scalar algorithm: fix x when dx is
    # the strict max; else fix z unless dy is strictly larger (the
    # dy == dz tie falls to the z-branch, like the scalar else)
    fix_x = (dx > dy) & (dx > dz)
    fix_z = ~fix_x & ~(dy > dz)
    rx = np.where(fix_x, -ry - rz, rx)
    rz = np.where(fix_z, -rx - ry, rz)
    return rx.astype(np.int64), rz.astype(np.int64)


def hex_pack(q: np.ndarray, r: np.ndarray) -> np.ndarray:
    return (q + _OFF) * _PACK + (r + _OFF)


def hex_unpack(hid: np.ndarray):
    hid = np.asarray(hid, np.int64)
    q = hid // _PACK - _OFF
    r = hid % _PACK - _OFF
    return q, r


def hex_center(hid: np.ndarray, size: float):
    q, r = hex_unpack(hid)
    x = size * SQRT3 * (q + r / 2.0)
    y = size * 1.5 * r
    return x, y


def hex_neighbors(hid: np.ndarray) -> np.ndarray:
    """(n, 6) neighbor ids in fixed axial direction order."""
    q, r = hex_unpack(hid)
    dirs = np.array([(1, 0), (1, -1), (0, -1), (-1, 0), (-1, 1), (0, 1)],
                    np.int64)
    return hex_pack(q[:, None] + dirs[:, 0], r[:, None] + dirs[:, 1])


def kring_offsets(k: int) -> np.ndarray:
    """(m, 2) axial (dq, dr) offsets of the k-ring disc (hex distance <= k,
    self included): 1 + 3k(k+1) cells."""
    if k < 0:
        raise ValueError("k must be >= 0")
    dq, dr = np.meshgrid(np.arange(-k, k + 1), np.arange(-k, k + 1),
                         indexing="ij")
    keep = np.abs(dq + dr) <= k
    return np.stack([dq[keep], dr[keep]], axis=1).astype(np.int64)


def hex_kring_sum(ds, *, size: float = 1.0, k: int = 1,
                  value_col: str = "val", lon_col: str = "lon",
                  lat_col: str = "lat"):
    """K-ring neighborhood sum over the hex grid: for each OCCUPIED cell,
    the sum of ``value_col`` over all points whose cell lies within hex
    distance k (self included), plus the count of occupied cells in that
    disc.  Returns Dataset[hex_id, kring_sum, n_cells].

    100 TB shape: points collapse to per-cell partial sums inside each
    batch before the first groupby, so the shuffle carries at most
    |occupied cells| rows per batch, never points; then each aggregated
    cell SCATTERS its sum to the 1+3k(k+1) disc targets (a map-side
    replicate, like the raster focal_sum stencil — no pairwise join), and
    one final groupby lands the totals.  Occupancy needs no extra join:
    the (0,0) charge doubles as the occupancy marker, so only cells that
    charged themselves survive the filter.
    """
    from ray.data.aggregate import Sum

    offs = kring_offsets(k)

    def partial(t: pa.Table) -> pa.Table:
        lon = np.asarray(t[lon_col].combine_chunks(), dtype=np.float64)
        lat = np.asarray(t[lat_col].combine_chunks(), dtype=np.float64)
        v = np.asarray(t[value_col].combine_chunks(), dtype=np.int64)
        q, r = hex_qr(lon, lat, size)
        hid = hex_pack(q, r)
        uniq, inv = np.unique(hid, return_inverse=True)
        sums = np.zeros(uniq.size, np.int64)
        np.add.at(sums, inv, v)
        return pa.table({"hex_id": pa.array(uniq, pa.int64()),
                         "v": pa.array(sums, pa.int64())})

    cells = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("hex_id").aggregate(Sum("v", alias_name="v")))

    def scatter(t: pa.Table) -> pa.Table:
        hid = np.asarray(t["hex_id"].combine_chunks(), dtype=np.int64)
        v = np.asarray(t["v"].combine_chunks(), dtype=np.int64)
        q, r = hex_unpack(hid)
        tq = (q[:, None] + offs[:, 0]).ravel()
        tr = (r[:, None] + offs[:, 1]).ravel()
        is_self = np.broadcast_to(
            (offs[:, 0] == 0) & (offs[:, 1] == 0), (hid.size, offs.shape[0])
        ).ravel().astype(np.int64)
        return pa.table({
            "hex_id": pa.array(hex_pack(tq, tr), pa.int64()),
            "kring_sum": pa.array(np.repeat(v, offs.shape[0]), pa.int64()),
            "n_cells": pa.array(np.ones(hid.size * offs.shape[0], np.int64),
                                pa.int64()),
            "occ": pa.array(is_self, pa.int64()),
        })

    tot = (cells.map_batches(scatter, batch_format="pyarrow")
           .groupby("hex_id")
           .aggregate(Sum("kring_sum", alias_name="kring_sum"),
                      Sum("n_cells", alias_name="n_cells"),
                      Sum("occ", alias_name="occ")))

    def occupied(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["occ"], 0))
        return t.select(["hex_id", "kring_sum", "n_cells"])

    return tot.map_batches(occupied, batch_format="pyarrow")


def hex_assign(ds, *, size: float = 1.0, lon_col: str = "lon",
               lat_col: str = "lat"):
    """Append hex_q, hex_r, hex_id columns (one stateless map_batches)."""

    def assign(t: pa.Table) -> pa.Table:
        lon = np.asarray(t[lon_col].combine_chunks(), dtype=np.float64)
        lat = np.asarray(t[lat_col].combine_chunks(), dtype=np.float64)
        q, r = hex_qr(lon, lat, size)
        t = t.append_column("hex_q", pa.array(q, pa.int64()))
        t = t.append_column("hex_r", pa.array(r, pa.int64()))
        return t.append_column("hex_id", pa.array(hex_pack(q, r), pa.int64()))

    return ds.map_batches(assign, batch_format="pyarrow")
