"""Distributed frequency / membership sketches (count-min, Bloom).

Like the HyperLogLog in stats.py, each sketch's STATE is a deterministic
pure function of the input multiset (FNV double hashing, integer counters),
so the gate rows check the sketches bit-exactly against SQL — approximate
operators with exact oracles.

Scale shape: both sketches reduce each batch to a bounded partial (a
<= d*w counter table / <= m bit set) inside ``map_batches``; the only wide
step is a groupby over at most d*w (resp. m) keys, so a 100 TB scan
shuffles kilobytes.  Counters add and bits OR, so shards and lineage
retries compose exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _double_hashes(col, i: int) -> np.ndarray:
    """h_i = h1 + i*h2 (mod 2^64), h1 = fnv1a64(str(v)), h2 = fnv1a64(str(v)+'#').

    Classic Kirsch-Mitzenmacher double hashing: d (resp. k) independent-enough
    hash functions from two FNV passes, and — unlike a seeded family — a
    form DuckDB reproduces exactly with HUGEINT arithmetic."""
    from ..stages.geocode import fnv1a64

    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    s = pc.cast(arr, pa.string())
    h1 = fnv1a64(s)
    if i == 0:
        return h1
    h2 = fnv1a64(pc.binary_join_element_wise(s, "#", ""))
    with np.errstate(over="ignore"):
        return h1 + np.uint64(i) * h2


# --- count-min sketch --------------------------------------------------------


def cms_counts(ds, *, value_col: str, d: int = 4, w: int = 4093):
    """Count-min sketch counters over a column: Dataset[row, col, count]
    (only touched cells appear).  cell(row=i, col) sums the multiplicities
    of every value with (h1 + i*h2) % w == col, so estimates only ever
    OVERcount (pytest-pinned along with the merge property).

    Use a PRIME ``w``/``m``: FNV keeps structured-input differences in the
    low bits, so a power-of-two modulus keeps only the weakly-mixed bits
    (measured: Bloom fp 6.9% vs the ~0.1% theory at m=8192; on-theory at
    the prime 8191).  A prime modulus folds the whole word in, avoiding an
    avalanche finalizer the SQL twin can't express (the _mix64 64x64
    multiply overflows HUGEINT)."""
    from ray.data.aggregate import Sum

    if d < 1 or w < 2:
        raise ValueError("need d >= 1, w >= 2")

    def partial(t: pa.Table) -> pa.Table:
        flat = np.zeros(d * w, np.int64)
        for i in range(d):
            cols = (_double_hashes(t[value_col], i) % np.uint64(w)).astype(np.int64)
            np.add.at(flat, i * w + cols, 1)
        touched = np.flatnonzero(flat)
        return pa.table({
            "row": pa.array(touched // w, pa.int64()),
            "col": pa.array(touched % w, pa.int64()),
            "count": pa.array(flat[touched], pa.int64()),
        })

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["row", "col"])
        .aggregate(Sum("count", alias_name="count"))
    )


def cms_estimate(sketch: pa.Table, values, *, d: int = 4, w: int = 4093) -> np.ndarray:
    """Point estimates (min over rows) from a materialized sketch table —
    the sketch is <= d*w rows, a driver-side lookup by design."""
    flat = np.zeros(d * w, np.int64)
    rows = np.asarray(sketch["row"], dtype=np.int64)
    cols = np.asarray(sketch["col"], dtype=np.int64)
    flat[rows * w + cols] = np.asarray(sketch["count"], dtype=np.int64)
    vals = values if isinstance(values, (pa.Array, pa.ChunkedArray)) else pa.array(values)
    est = np.full(len(vals), np.iinfo(np.int64).max, np.int64)
    for i in range(d):
        c = (_double_hashes(vals, i) % np.uint64(w)).astype(np.int64)
        est = np.minimum(est, flat[i * w + c])
    return est


# --- Bloom filter -------------------------------------------------------------


def bloom_bits(ds, *, value_col: str, m: int = 8191, k: int = 5):
    """The set bits of a Bloom filter over a column: Dataset[bit], distinct.
    bit_i(v) = (h1 + i*h2) % m for i in 0..k-1.  Use a PRIME ``m`` — see
    cms_counts (power-of-two truncation of FNV measured 60x the
    theoretical false-positive rate)."""
    if k < 1 or m < 2:
        raise ValueError("need k >= 1, m >= 2")

    def partial(t: pa.Table) -> pa.Table:
        seen = np.zeros(m, bool)
        for i in range(k):
            seen[(_double_hashes(t[value_col], i) % np.uint64(m)).astype(np.int64)] = True
        return pa.table({"bit": pa.array(np.flatnonzero(seen), pa.int64())})

    from ray.data.aggregate import Count

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bit")
        .aggregate(Count(alias_name="_n"))
        .select_columns(["bit"])
    )


def bloom_blob(bits: pa.Table, *, m: int) -> bytes:
    """Pack a set-bits table into the broadcastable filter: m/8 bytes
    (LSB-first within each byte), tiny next to the key set it summarizes."""
    arr = np.zeros(m, np.uint8)
    arr[np.asarray(bits["bit"], dtype=np.int64)] = 1
    return np.packbits(arr, bitorder="little").tobytes()


def bloom_member(ds, *, value_col: str, blob_ref, m: int = 8191, k: int = 5,
                 out_col: str = "maybe_member"):
    """Broadcast membership stage: adds a bool column, true iff ALL k bits
    are set (no false negatives; false-positive rate ~(1-e^{-kn/m})^k).
    ``blob_ref`` is a ``ray.put`` of ``bloom_blob`` output — shipped once
    per worker, not per batch."""
    import ray

    def probe(t: pa.Table) -> pa.Table:
        blob = ray.get(blob_ref) if isinstance(blob_ref, ray.ObjectRef) else blob_ref
        bits = np.unpackbits(np.frombuffer(blob, np.uint8), bitorder="little")[:m]
        ok = np.ones(len(t), bool)
        for i in range(k):
            c = (_double_hashes(t[value_col], i) % np.uint64(m)).astype(np.int64)
            ok &= bits[c].astype(bool)
        return t.append_column(out_col, pa.array(ok))

    return ds.map_batches(probe, batch_format="pyarrow")
