"""Geohash encoding (Niemeyer 2008) — the classic base32 string cell id,
completing the tiling family (equirect quadtree, S2-style cube cells, axial
hex grid, geohash).

Standard bit layout: 5*precision bits, alternating longitude/latitude from
the MOST significant bit (longitude first), then base32 characters from
5-bit groups MSB-first over the alphabet '0123456789bcdefghjkmnpqrstuvwxyz'.
Everything is integer after one floor/clip per axis, so the SQL twin
(Morton bit-spread ladder + substring concat) is bit-exact.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

B32 = b"0123456789bcdefghjkmnpqrstuvwxyz"
_B32_ARR = np.frombuffer(B32, np.uint8)


def geohash_code(lat: np.ndarray, lon: np.ndarray, precision: int = 6) -> np.ndarray:
    """Interleaved integer code (the geohash's 5*precision bits) as int64."""
    nbits = 5 * precision
    if nbits > 60:
        raise ValueError("precision > 12 exceeds int64")
    blon = (nbits + 1) // 2
    blat = nbits // 2
    ix = np.clip(np.floor((np.asarray(lon, np.float64) + 180.0) / 360.0 * (1 << blon)),
                 0, (1 << blon) - 1).astype(np.int64)
    iy = np.clip(np.floor((np.asarray(lat, np.float64) + 90.0) / 180.0 * (1 << blat)),
                 0, (1 << blat) - 1).astype(np.int64)
    code = np.zeros(ix.size, np.int64)
    for b in range(nbits):
        if b % 2 == 0:
            bit = (ix >> (blon - 1 - b // 2)) & 1
        else:
            bit = (iy >> (blat - 1 - b // 2)) & 1
        code = (code << 1) | bit
    return code


def geohash_strings(code: np.ndarray, precision: int = 6) -> pa.Array:
    """Base32 strings from interleaved codes — one (n, P) uint8 gather plus
    a single utf8 Array build (fixed-width offsets), no per-row Python."""
    n = code.size
    mat = np.empty((n, precision), np.uint8)
    for c in range(precision):
        mat[:, c] = _B32_ARR[(code >> (5 * (precision - 1 - c))) & 31]
    offsets = np.arange(0, (n + 1) * precision, precision, dtype=np.int32)
    return pa.Array.from_buffers(
        pa.utf8(), n,
        [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(mat.tobytes())])


def geohash_assign(ds, *, precision: int = 6, lat_col: str = "lat",
                   lon_col: str = "lon"):
    """Append geohash_code (int64) and geohash (string) columns."""

    def assign(t: pa.Table) -> pa.Table:
        lat = np.asarray(t[lat_col].combine_chunks(), dtype=np.float64)
        lon = np.asarray(t[lon_col].combine_chunks(), dtype=np.float64)
        code = geohash_code(lat, lon, precision)
        t = t.append_column("geohash_code", pa.array(code, pa.int64()))
        return t.append_column("geohash", geohash_strings(code, precision))

    return ds.map_batches(assign, batch_format="pyarrow")
