"""Broadcast-index spatial joins over Ray Data.

The Ray-Data-native equivalent of the reference's build/probe split
(/root/reference/src/index.rs:400-420 build, :477-535 probe): the *small*
side is fully materialized, validated, decoded and STR-indexed ONCE on the
driver, published to the object store with ``ray.put``, and every probe task
reads it zero-copy-ish via ``ray.get`` in the actor constructor.  The *big*
side streams through ``map_batches(ProbeActor, batch_format="pyarrow")`` with
backpressure — no shuffle at all.

This is the fast path whenever the indexed side fits in the object store
(the reference has no other mode: its index always holds the whole small
side in memory, /root/reference/src/lib.rs:196-203).  For two large sides
use ``rayjoin.join.partitioned``.
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np
import pyarrow as pa
import ray

from ..config import Config, Interaction
from ..geom.batch import GeomBatch
from ..geom.relates import relate
from ..state.rtree import STRtree, dilate
from ..stages.validate import validate_batch

JOIN_SCHEMA = pa.schema(
    [pa.field("big_row_id", pa.int64()), pa.field("small_row_id", pa.int64())]
)
PROX_SCHEMA = JOIN_SCHEMA.append(pa.field("distance", pa.float64()))
KNN_SCHEMA = PROX_SCHEMA.append(pa.field("rank", pa.int64()))


def _empty_geom_table() -> pa.Table:
    from ..geom.encode import GEOM_SCHEMA

    return GEOM_SCHEMA.empty_table()


def _to_table(small) -> pa.Table:
    if isinstance(small, (list, tuple)):  # spec geometry sequence (reference style)
        from ..geom.encode import geoms_to_table

        return geoms_to_table(small) if small else _empty_geom_table()
    if isinstance(small, pa.Table):
        return small if small.num_rows or small.num_columns else _empty_geom_table()
    if hasattr(small, "to_arrow_refs"):  # ray.data.Dataset
        refs = small.to_arrow_refs()
        tables = ray.get(refs)
        tables = [t for t in tables if t.num_rows] or [t for t in tables if t.num_columns]
        return pa.concat_tables(tables) if tables else _empty_geom_table()
    raise TypeError(type(small))


class BroadcastIndex:
    """Built small side: GeomBatch + STR tree over max_distance-dilated boxes
    (the ``cheap_buffer`` trick, /root/reference/src/rtrees.rs:159-166)."""

    def __init__(self, small, config: Config = Config(), keep_table: bool = True,
                 radius_col: str | None = None):
        self.config = config
        table = _to_table(small)
        # original-coords table is only needed for *_with_geos outputs;
        # dropping it (keep_table=False) cuts the broadcast payload ~40%
        self.table = table if keep_table else None
        self.batch = GeomBatch.from_arrow(table)
        validate_batch(self.batch)
        if radius_col is not None:
            # per-row proximity radius: each indexed box dilates by ITS OWN
            # radius, and _probe_prox compares d <= radius[s].  Same
            # cheap_buffer trick, one extra float64 per indexed row.
            r = np.asarray(table[radius_col].combine_chunks(), dtype=np.float64)
            if r.size and (not np.isfinite(r).all() or (r < 0).any()):
                from ..config import BadMaxDistance

                bad = np.flatnonzero(~np.isfinite(r) | (r < 0))[0]
                raise BadMaxDistance(float(r[bad]))
            self.radius = r
        else:
            self.radius = None
        self.tree = STRtree(dilate(
            self.batch.bbox,
            self.radius if self.radius is not None else config.max_distance))
        # domain extent for kNN radius scheduling
        if self.batch.n:
            self.extent = (
                float(self.batch.bbox[:, 0].min()),
                float(self.batch.bbox[:, 1].min()),
                float(self.batch.bbox[:, 2].max()),
                float(self.batch.bbox[:, 3].max()),
            )
        else:
            self.extent = (0.0, 0.0, 0.0, 0.0)


def build_index(small, config: Config = Config(), keep_table: bool = True,
                radius_col: str | None = None) -> "ray.ObjectRef":
    """Build + broadcast: one ray.put, read by every probe actor."""
    return ray.put(BroadcastIndex(small, config, keep_table, radius_col))


def _candidates(index: BroadcastIndex, big: GeomBatch):
    """(big_pos, small_pos) candidate positions via inclusive bbox overlap;
    big envelopes are NOT dilated (/root/reference/src/index.rs:143-221)."""
    return index.tree.query(big.bbox)


def _attach_geos(out: pa.Table, index: BroadcastIndex, s_pos: np.ndarray,
                 big_table: pa.Table, q_pos: np.ndarray) -> pa.Table:
    """The *_with_geos variants (/root/reference/src/index.rs:449-475,
    537-599): clone both geometries into each output row."""
    if index.table is None:
        raise ValueError("index built with keep_table=False cannot emit *_with_geos")
    bt = big_table.take(pa.array(q_pos))
    st = index.table.take(pa.array(s_pos))
    out = out.append_column("big_geom_type", bt["geom_type"].combine_chunks())
    out = out.append_column("big_coords", bt["coords"].combine_chunks())
    out = out.append_column("small_geom_type", st["geom_type"].combine_chunks())
    return out.append_column("small_coords", st["coords"].combine_chunks())


def _probe_join(index: BroadcastIndex, big: GeomBatch, interaction: Interaction,
                big_table: pa.Table = None, with_geos: bool = False) -> pa.Table:
    q, s = _candidates(index, big)
    if interaction is Interaction.INTERSECTS:
        keep = relate("intersects", index.batch, s, big, q)
    elif interaction is Interaction.CONTAINS:
        keep = relate("contains", index.batch, s, big, q)
    else:  # WITHIN: big.Contains(small)
        keep = relate("contains", big, q, index.batch, s)
    out = pa.table(
        {
            "big_row_id": pa.array(big.row_id[q[keep]], pa.int64()),
            "small_row_id": pa.array(index.batch.row_id[s[keep]], pa.int64()),
        }
    )
    if with_geos:
        out = _attach_geos(out, index, s[keep], big_table, q[keep])
    return out


def _probe_prox(index: BroadcastIndex, big: GeomBatch, big_table: pa.Table = None,
                with_geos: bool = False) -> pa.Table:
    q, s = _candidates(index, big)
    d = relate("distance", index.batch, s, big, q)
    if not np.isfinite(d).all():
        raise AssertionError("non-finite distance")  # index.rs:436 assert
    # inclusive threshold (index.rs:438); per-row radius when the index was
    # built with radius_col, else the scalar Config.max_distance
    thr = index.radius[s] if index.radius is not None else index.config.max_distance
    keep = d <= thr
    out = pa.table(
        {
            "big_row_id": pa.array(big.row_id[q[keep]], pa.int64()),
            "small_row_id": pa.array(index.batch.row_id[s[keep]], pa.int64()),
            "distance": pa.array(d[keep], pa.float64()),
        }
    )
    if with_geos:
        out = _attach_geos(out, index, s[keep], big_table, q[keep])
    return out


def _probe_knn(index: BroadcastIndex, big: GeomBatch, k: int, max_distance: float) -> pa.Table:
    """Expanding-radius kNN: per big geometry, the k nearest smalls ordered
    by (distance, small_row_id) — deterministic ties (SURVEY.md §7(d))."""
    nb = big.n
    ns = index.batch.n
    if nb == 0 or ns == 0 or k <= 0:
        return KNN_SCHEMA.empty_table()
    x0, y0, x1, y1 = index.extent
    domain_diag = math.sqrt((x1 - x0) ** 2 + (y1 - y0) ** 2) or 1.0
    # initial radius: expected k-neighborhood from average density
    r = max(domain_diag * math.sqrt(min(1.0, (k + 1) / max(ns, 1))) * 0.5, domain_diag * 1e-6)
    r = min(r, max_distance) if math.isfinite(max_distance) else r
    pending = np.arange(nb, dtype=np.int64)
    out_b, out_s, out_d = [], [], []
    # pending-distance cache (VERDICT r2 #7): each doubling round re-queries
    # the tree, and the new candidate set is a SUPERSET of the last round's
    # for every still-pending big — so distances already computed are looked
    # up by packed (big, small) key instead of re-running the (possibly
    # polygon-pair-expensive) distance kernel.  Keys are kept sorted; the
    # cache holds only candidates of still-pending bigs.
    cache_key = np.empty(0, np.int64)
    cache_d = np.empty(0, np.float64)
    while pending.size:
        qb = big.bbox[pending].copy()
        qb[:, 0] -= r
        qb[:, 1] -= r
        qb[:, 2] += r
        qb[:, 3] += r
        q, s = index.tree.query(qb)
        bglob = pending[q]
        key = bglob * np.int64(ns) + s
        d = np.empty(key.size, np.float64)
        if cache_key.size:
            pos = np.minimum(np.searchsorted(cache_key, key), cache_key.size - 1)
            hit = cache_key[pos] == key
            d[hit] = cache_d[pos[hit]]
        else:
            hit = np.zeros(key.size, dtype=bool)
        miss = ~hit
        if miss.any():
            d[miss] = relate("distance", index.batch, s[miss], big, bglob[miss])
        # a big geometry is exhausted when its dilated query box covers the
        # whole small-side extent (every small was a candidate) or the
        # radius reached the distance cap; for those, only the cap filters
        covered = (
            (qb[:, 0] <= x0) & (qb[:, 1] <= y0) & (qb[:, 2] >= x1) & (qb[:, 3] >= y1)
        ) | bool(math.isfinite(max_distance) and r >= max_distance)
        ok = np.where(covered[q], d <= max_distance, d <= min(r, max_distance))
        qq, ss, dd = q[ok], s[ok], d[ok]
        # per-big count of in-radius hits
        cnt = np.bincount(qq, minlength=pending.size)
        done = (cnt >= k) | covered
        if done.any():
            sel = np.flatnonzero(done)
            m = done[qq]
            b_pos = pending[qq[m]]
            order = np.lexsort((index.batch.row_id[ss[m]], dd[m], b_pos))
            b_sorted = b_pos[order]
            # rank within group
            uniq, start_idx, counts = np.unique(b_sorted, return_index=True, return_counts=True)
            rank = np.arange(b_sorted.size) - np.repeat(start_idx, counts)
            keep = rank < k
            out_b.append(b_sorted[keep])
            out_s.append(ss[m][order][keep])
            out_d.append(dd[m][order][keep])
        nd = ~done[q]
        if nd.any() and not done.all():
            ck, cd = key[nd], d[nd]
            o = np.argsort(ck, kind="stable")
            cache_key, cache_d = ck[o], cd[o]
        else:
            cache_key = np.empty(0, np.int64)
            cache_d = np.empty(0, np.float64)
        pending = pending[~done]
        r *= 2.0
    b = np.concatenate(out_b) if out_b else np.empty(0, np.int64)
    s = np.concatenate(out_s) if out_s else np.empty(0, np.int64)
    d = np.concatenate(out_d) if out_d else np.empty(0, np.float64)
    # rank column recomputed globally per big (groups are contiguous per append)
    order = np.lexsort((index.batch.row_id[s] if s.size else s, d, big.row_id[b] if b.size else b))
    b, s, d = b[order], s[order], d[order]
    if b.size:
        bb = big.row_id[b]
        change = np.concatenate([[True], bb[1:] != bb[:-1]])
        starts = np.flatnonzero(change)
        counts = np.diff(np.concatenate([starts, [bb.size]]))
        rank = np.arange(bb.size) - np.repeat(starts, counts)
    else:
        rank = np.empty(0, np.int64)
    return pa.table(
        {
            "big_row_id": pa.array(big.row_id[b] if b.size else np.empty(0, np.int64), pa.int64()),
            "small_row_id": pa.array(
                index.batch.row_id[s] if s.size else np.empty(0, np.int64), pa.int64()
            ),
            "distance": pa.array(d, pa.float64()),
            "rank": pa.array(rank, pa.int64()),
        }
    )


# Per-worker deserialized-index cache: stateless probe *tasks* reuse worker
# processes, so the broadcast index is fetched + deserialized once per worker
# instead of once per actor-pool spin-up (actor pools cost seconds of startup
# per pipeline execution; plain tasks reuse Ray's prestarted workers).
_INDEX_CACHE: dict = {}


def _get_index(index_ref) -> BroadcastIndex:
    key = index_ref.hex()
    idx = _INDEX_CACHE.get(key)
    if idx is None:
        idx = ray.get(index_ref)
        _INDEX_CACHE.clear()  # hold at most one (bounded worker heap)
        _INDEX_CACHE[key] = idx
    return idx


def _run_probe(index: BroadcastIndex, batch: pa.Table, mode: str,
               interaction: Optional[Interaction], k: int, max_distance: float,
               with_geos: bool = False) -> pa.Table:
    big = GeomBatch.from_arrow(batch)
    validate_batch(big)
    if mode == "join":
        return _probe_join(index, big, interaction, batch, with_geos)
    if mode == "prox":
        return _probe_prox(index, big, batch, with_geos)
    if mode == "knn":
        return _probe_knn(index, big, k, max_distance)
    raise ValueError(mode)


def probe_fn(batch: pa.Table, *, index_ref, mode: str, interaction=None, k: int = 0,
             max_distance: float = float("inf"), with_geos: bool = False) -> pa.Table:
    """Stateless probe task body (default execution mode)."""
    return _run_probe(_get_index(index_ref), batch, mode, interaction, k, max_distance,
                      with_geos)


class ProbeActor:
    """Stateful probe stage (actor-pool variant): fetch the broadcast index
    once per actor (__init__), stream Arrow batches through __call__.  Use
    when the pipeline benefits from a pinned pool (e.g. very large indexes
    where per-worker caching would duplicate memory across many workers)."""

    def __init__(self, index_ref, mode: str, interaction: Optional[Interaction] = None,
                 k: int = 0, max_distance: float = float("inf"), with_geos: bool = False):
        self.index: BroadcastIndex = ray.get(index_ref)
        self.mode = mode
        self.interaction = interaction
        self.k = k
        self.max_distance = max_distance
        self.with_geos = with_geos

    def __call__(self, batch: pa.Table) -> pa.Table:
        return _run_probe(self.index, batch, self.mode, self.interaction, self.k,
                          self.max_distance, self.with_geos)


class SpatialIndex:
    """Public API mirroring the reference (/root/reference/src/lib.rs:229-258):
    ``Config`` + small side in, join methods out — but each method returns a
    lazy ``ray.data.Dataset`` instead of an iterator."""

    def __init__(self, small, config: Config = Config(), concurrency: int | None = None,
                 batch_size: int = 8192, use_actors: bool = False, keep_table: bool = True,
                 radius_col: str | None = None):
        self.config = config
        self.concurrency = concurrency
        self.batch_size = batch_size
        self.use_actors = use_actors
        self.index_ref = build_index(small, config, keep_table, radius_col)

    def _probe(self, big, **kwargs):
        if isinstance(big, (list, tuple, pa.Table)):
            import ray.data

            big = ray.data.from_arrow(_to_table(big))
        if self.use_actors:
            return big.map_batches(
                ProbeActor,
                fn_constructor_kwargs={"index_ref": self.index_ref, **kwargs},
                batch_format="pyarrow",
                batch_size=self.batch_size,
                concurrency=self.concurrency or 4,
                num_cpus=1,
            )
        return big.map_batches(
            probe_fn,
            fn_kwargs={"index_ref": self.index_ref, **kwargs},
            batch_format="pyarrow",
            batch_size=self.batch_size,
            num_cpus=1,
        )

    def spatial_join(self, big, interaction: Interaction):
        """Dataset[big_row_id, small_row_id]; semantics index.rs:497-534."""
        return self._probe(big, mode="join", interaction=interaction)

    def spatial_join_with_geos(self, big, interaction: Interaction):
        """Same + both geometry payloads (index.rs:537-599)."""
        return self._probe(big, mode="join", interaction=interaction, with_geos=True)

    def proximity_map(self, big):
        """Dataset[big_row_id, small_row_id, distance]; inclusive threshold."""
        return self._probe(big, mode="prox")

    def proximity_map_with_geos(self, big):
        """Same + both geometry payloads (index.rs:449-475)."""
        return self._probe(big, mode="prox", with_geos=True)

    def knn_join(self, big, k: int, max_distance: float = float("inf")):
        """Dataset[big_row_id, small_row_id, distance, rank]; new engine scope
        (BASELINE.json north_rule); ties (distance, small_row_id)."""
        return self._probe(big, mode="knn", k=k, max_distance=max_distance)
