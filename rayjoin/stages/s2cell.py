"""S2-style cube-face quadtree cells (from scratch; the north rule names
"H3/S2 tile IDs" and no h3/s2 libs exist in this sandbox — this implements
the published S2 DESIGN: project the sphere onto 6 cube faces, correct the
gnomonic area distortion with S2's quadratic s-t transform, quantize each
face into a 2^level x 2^level grid.  NOT the s2geometry library's bit
layout: cell ids here are ``face * 4^level + morton(i, j)`` with an
explicit ``level`` argument, chosen so a DuckDB oracle can reproduce ids
bit-exactly with CASE + bit-twiddle Morton spreads).

Unlike the equirectangular scheme in stages/tiles.py (cells shrink toward
the poles by 1/cos(lat) — unusable skew for a whole-planet corpus), cube
cells vary in area by at most ~2.1x anywhere on the sphere (the quadratic
transform's bound, per the public S2 docs) — the right tiling key when
geocoded pages cover the globe.

Face frame (self-consistent forward/backward pair):
  axis  = first-wins argmax(|x|, |y|, |z|);  face = axis + (0 if the major
  component >= 0 else 3)
  u, v  = the other two components divided by the SIGNED major component
          (axis x -> (y/x, z/x); y -> (x/y, z/y); z -> (x/z, y/z))
  s     = 0.5*sqrt(1+3u) if u >= 0 else 1 - 0.5*sqrt(1-3u)   (S2 quadratic)
  i     = clamp(floor(s * 2^level), 0, 2^level - 1); j likewise from t(v)

Every float op is ordered identically in the numpy kernels and the SQL
oracle (pipelines/gate.py); cos/sin/sqrt measured bit-identical between
numpy and DuckDB on this platform (both resolve to the system libm), so
the gate hash-match is exact.  A cell-boundary row could in principle
differ by one ulp on a platform with a different libm — the pytest oracle
(scalar reference + round-trip laws) does not depend on that.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

MAX_LEVEL = 15  # morton(i, j) fits 30 bits; 6 * 4^15 < 2^63


def _spread_bits(x: np.ndarray) -> np.ndarray:
    """Interleave zeros between the low 16 bits of x (Morton spread)."""
    x = x.astype(np.int64) & 0xFFFF
    x = (x | (x << 8)) & 0x00FF00FF
    x = (x | (x << 4)) & 0x0F0F0F0F
    x = (x | (x << 2)) & 0x33333333
    return (x | (x << 1)) & 0x55555555


def _compact_bits(x: np.ndarray) -> np.ndarray:
    """Inverse of _spread_bits: gather the even bits."""
    x = x.astype(np.int64) & 0x55555555
    x = (x | (x >> 1)) & 0x33333333
    x = (x | (x >> 2)) & 0x0F0F0F0F
    x = (x | (x >> 4)) & 0x00FF00FF
    return (x | (x >> 8)) & 0x0000FFFF


def _latlon_to_xyz(lat: np.ndarray, lon: np.ndarray):
    phi = np.radians(np.asarray(lat, np.float64))
    lam = np.radians(np.asarray(lon, np.float64))
    cp = np.cos(phi)
    return cp * np.cos(lam), cp * np.sin(lam), np.sin(phi)


def _xyz_to_face_uv(x: np.ndarray, y: np.ndarray, z: np.ndarray):
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    # first-wins argmax, spelled with the same comparisons as the SQL CASE
    is_x = (ax >= ay) & (ax >= az)
    is_y = ~is_x & (ay >= az)
    axis = np.where(is_x, 0, np.where(is_y, 1, 2))
    major = np.where(is_x, x, np.where(is_y, y, z))
    face = axis + np.where(major >= 0, 0, 3)
    # np.where evaluates BOTH branches: a zero in an unselected divisor is
    # expected (e.g. x == 0 on the z faces) — the selected branch never
    # divides by zero because |major| >= 1/sqrt(3) on a unit vector
    with np.errstate(divide="ignore", invalid="ignore"):
        u = np.where(is_x, y / x, np.where(is_y, x / y, x / z))
        v = np.where(is_x, z / x, np.where(is_y, z / y, y / z))
    return face.astype(np.int64), u, v


def _uv_to_st(u: np.ndarray) -> np.ndarray:
    """S2's quadratic projection, area-uniformizing: [-1,1] -> [0,1].
    Monotone continuation outside [-1,1] (used by the neighbor sampler)."""
    return np.where(u >= 0, 0.5 * np.sqrt(1.0 + 3.0 * u),
                    1.0 - 0.5 * np.sqrt(1.0 - 3.0 * u))


def _st_to_uv(s: np.ndarray) -> np.ndarray:
    s = np.asarray(s, np.float64)
    return np.where(s >= 0.5, (4.0 * s * s - 1.0) / 3.0,
                    (1.0 - 4.0 * (1.0 - s) * (1.0 - s)) / 3.0)


def _face_uv_to_xyz(face: np.ndarray, u: np.ndarray, v: np.ndarray):
    """Backward frame: the (unnormalized) direction whose forward projection
    is (face, u, v).  axis x -> (1,u,v); y -> (u,1,v); z -> (u,v,1); each
    times the face sign."""
    axis = face % 3
    sign = np.where(face < 3, 1.0, -1.0)
    one = np.ones_like(u)
    x = np.where(axis == 0, one, u)
    y = np.where(axis == 0, u, np.where(axis == 1, one, v))
    z = np.where(axis == 2, one, v)
    return sign * x, sign * y, sign * z


def xyz_to_s2(x, y, z, level: int) -> np.ndarray:
    face, u, v = _xyz_to_face_uv(x, y, z)
    n = float(1 << level)
    i = np.clip(np.floor(_uv_to_st(u) * n).astype(np.int64), 0, (1 << level) - 1)
    j = np.clip(np.floor(_uv_to_st(v) * n).astype(np.int64), 0, (1 << level) - 1)
    return face * (np.int64(1) << np.int64(2 * level)) + (
        _spread_bits(i) | (_spread_bits(j) << 1)
    )


def latlon_to_s2(lat: np.ndarray, lon: np.ndarray, level: int) -> np.ndarray:
    """Vectorized cell id at ``level`` for lat/lon degrees."""
    if not 0 <= level <= MAX_LEVEL:
        raise ValueError(f"level must be in [0, {MAX_LEVEL}]")
    return xyz_to_s2(*_latlon_to_xyz(lat, lon), level)


def s2_to_face_ij(cell: np.ndarray, level: int):
    cell = np.asarray(cell, np.int64)
    m = cell & ((np.int64(1) << np.int64(2 * level)) - 1)
    face = cell >> np.int64(2 * level)
    return face, _compact_bits(m), _compact_bits(m >> 1)


def s2_cell_center(cell: np.ndarray, level: int):
    """(lat, lon) degrees of cell centers (inverse transform chain)."""
    face, i, j = s2_to_face_ij(cell, level)
    n = float(1 << level)
    u = _st_to_uv((i + 0.5) / n)
    v = _st_to_uv((j + 0.5) / n)
    x, y, z = _face_uv_to_xyz(face, u, v)
    lat = np.degrees(np.arctan2(z, np.hypot(x, y)))
    lon = np.degrees(np.arctan2(y, x))
    return lat, lon


def s2_parent(cell: np.ndarray, level: int, parent_level: int) -> np.ndarray:
    """Ancestor cell: drop the 2 morton bits per level (face preserved)."""
    if parent_level > level:
        raise ValueError("parent_level must be <= level")
    cell = np.asarray(cell, np.int64)
    m = cell & ((np.int64(1) << np.int64(2 * level)) - 1)
    face = cell >> np.int64(2 * level)
    return face * (np.int64(1) << np.int64(2 * parent_level)) + (
        m >> np.int64(2 * (level - parent_level))
    )


def s2_children(cell: int, level: int) -> np.ndarray:
    """The 4 children at level+1 (morton order)."""
    face = cell >> (2 * level)
    m = cell & ((1 << (2 * level)) - 1)
    base = face * (1 << (2 * (level + 1))) + (m << 2)
    return np.arange(4, dtype=np.int64) + base


def s2_edge_neighbors(cell: np.ndarray, level: int) -> np.ndarray:
    """(n, 4) edge-adjacent cells, CROSS-FACE correct: step one cell width
    past each edge midpoint in s-t space, follow the monotone uv
    continuation off the face into 3D, and re-project.  At cube corners
    this lands on the correct diagonal face automatically; no per-face
    adjacency tables (the error-prone part of hand-rolled S2 ports)."""
    cell = np.asarray(cell, np.int64)
    face, i, j = s2_to_face_ij(cell, level)
    n = float(1 << level)
    sc, tc = (i + 0.5) / n, (j + 0.5) / n
    out = np.empty((cell.size, 4), np.int64)
    for col, (ds_, dt_) in enumerate(((-1, 0), (1, 0), (0, -1), (0, 1))):
        u = _st_to_uv(sc + ds_ / n)
        v = _st_to_uv(tc + dt_ / n)
        x, y, z = _face_uv_to_xyz(face, u, v)
        norm = np.sqrt(x * x + y * y + z * z)
        out[:, col] = xyz_to_s2(x / norm, y / norm, z / norm, level)
    return out


def s2_assign(ds, level: int = 12, lat_col: str = "lat", lon_col: str = "lon",
              out_col: str = "s2_cell"):
    """Dataset stage: append the cube-face cell id per row (pure Arrow/numpy
    per batch; embarrassingly parallel — the tiling key for the global
    groupby/shuffle, exactly like tiles.tile_assign but skew-bounded at the
    poles)."""

    def run(t: pa.Table) -> pa.Table:
        lat = np.asarray(t[lat_col].combine_chunks(), np.float64)
        lon = np.asarray(t[lon_col].combine_chunks(), np.float64)
        return t.append_column(out_col, pa.array(latlon_to_s2(lat, lon, level),
                                                 pa.int64()))

    return ds.map_batches(run, batch_format="pyarrow")
