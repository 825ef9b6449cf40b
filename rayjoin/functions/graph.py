"""Web-graph operators: deterministic link-graph synthesis + PageRank.

PageRank here is FIXED-POINT INTEGER: ranks are int64 micro-units, each
iteration is

    rank'(v) = T + sum over in-edges (u,v) of (rank(u) * 85) // (100 * outdeg(u))

with constant integer teleport T = (r0 * 15) // 100.  Floor division and
integer sums are associative/commutative and identical in DuckDB, so a
k-iteration PageRank — the canonical "needs a real engine" webgraph job —
gate-checks BIT-EXACTLY against a chained-CTE SQL twin, no float tolerance.

Scale shape: each iteration is one hash join (edges x ranks on src) plus one
groupby-sum over (dst contribution ∪ per-node teleport) — 2 shuffles per
iteration, no driver state, no broadcast of the rank vector.  On a real
cluster you'd hash-partition edges by src ONCE and co-partition ranks to
make the join shuffle-free; Ray Data's join re-partitions per call, which
this accepts in exchange for zero custom actors (documented trade-off).

Overflow: a node's rank is bounded by the total mass ~ n_nodes * r0, and the
per-edge product multiplies by 85 — keep n_nodes * r0 * 85 < 2^63 (the
default r0=1e9 is safe to ~10^8 nodes; shrink r0 as n grows).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def synth_link_graph(sf_dir: str, *, deg_mod: int = 3, target_div: int = 1):
    """Deterministic doc->doc link graph over the documents table:
    outdeg(i) = 1 + fnv(str(i)) % deg_mod, the j-th target is
    fnv(str(i) + '>' + str(j)) % max(n // target_div, 1).  Self-loops and
    duplicate targets are kept (multi-edges contribute once per edge — same
    rule in the SQL twin).  ``target_div > 1`` concentrates targets into a
    denser core (used by the triangle gate row so the count is non-vacuous).
    Returns (edges Dataset[src, dst, outdeg], n_nodes)."""
    import ray.data

    from ..stages.geocode import fnv1a64

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    n = docs.count()  # metadata-backed for parquet: no execution
    tgt_mod = max(n // target_div, 1)

    def edges(t: pa.Table) -> pa.Table:
        src = np.asarray(t["doc_id"].combine_chunks(), dtype=np.int64)
        s = pc.cast(pa.array(src), pa.string())
        outdeg = 1 + (fnv1a64(s) % np.uint64(deg_mod)).astype(np.int64)
        srcs, dsts, degs = [], [], []
        for j in range(deg_mod):
            live = outdeg > j
            tgt = pc.binary_join_element_wise(
                pc.cast(pa.array(src[live]), pa.string()), ">", str(j), ""
            )
            dsts.append((fnv1a64(tgt) % np.uint64(tgt_mod)).astype(np.int64))
            srcs.append(src[live])
            degs.append(outdeg[live])
        return pa.table({
            "src": pa.array(np.concatenate(srcs), pa.int64()),
            "dst": pa.array(np.concatenate(dsts), pa.int64()),
            "outdeg": pa.array(np.concatenate(degs), pa.int64()),
        })

    return docs.map_batches(edges, batch_format="pyarrow"), n


def pagerank_int(edges, *, n_nodes: int, iters: int = 3, r0: int = 10**9,
                 broadcast_threshold: int = 50_000_000):
    """k iterations of integer PageRank over Dataset[src, dst, outdeg].
    Nodes are 0..n_nodes-1; returns Dataset[node, rank].

    Two plans, bit-identical results (pytest-pinned parity):
    - n_nodes <= broadcast_threshold: the rank vector is a ray.put numpy
      array per iteration (one map + one sparse groupby, no join); driver
      memory O(n_nodes), bounded by the threshold (~400 MB at 50M).
    - beyond: per-iteration hash join — O(1) driver memory at any n."""
    if iters < 1:
        raise ValueError("need iters >= 1")
    if n_nodes <= broadcast_threshold:
        return _pagerank_broadcast(edges, n_nodes=n_nodes, iters=iters, r0=r0)
    return _pagerank_join(edges, n_nodes=n_nodes, iters=iters, r0=r0)


def _pagerank_broadcast(edges, *, n_nodes: int, iters: int, r0: int):
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    tele = (r0 * 15) // 100
    ranks = np.full(n_nodes, r0, np.int64)
    for _ in range(iters):
        ref = ray.put(ranks)

        def contrib(t: pa.Table, ref=ref) -> pa.Table:
            r = ray.get(ref)
            src = np.asarray(t["src"].combine_chunks(), dtype=np.int64)
            dst = np.asarray(t["dst"].combine_chunks(), dtype=np.int64)
            deg = np.asarray(t["outdeg"].combine_chunks(), dtype=np.int64)
            part = (r[src] * 85) // (100 * deg)
            # pre-aggregate per batch on the COMPACT touched-dst set:
            # int64 adds (np.bincount's float weights would round > 2^53)
            uniq, inv = np.unique(dst, return_inverse=True)
            agg = np.zeros(uniq.size, np.int64)
            np.add.at(agg, inv, part)
            return pa.table({"node": pa.array(uniq, pa.int64()),
                             "part": pa.array(agg, pa.int64())})

        sums = (
            edges.map_batches(contrib, batch_format="pyarrow")
            .groupby("node")
            .aggregate(Sum("part", alias_name="part"))
        )
        new = np.full(n_nodes, tele, np.int64)
        for tbl in ray.get(sums.to_arrow_refs()):
            if tbl.num_rows:
                new[np.asarray(tbl["node"], dtype=np.int64)] += np.asarray(
                    tbl["part"], dtype=np.int64)
        ranks = new
    out = pa.table({"node": pa.array(np.arange(n_nodes), pa.int64()),
                    "rank": pa.array(ranks, pa.int64())})
    return ray.data.from_arrow(out)


def _pagerank_join(edges, *, n_nodes: int, iters: int, r0: int):
    import ray.data
    from ray.data.aggregate import Sum

    from .dedup import _num_join_partitions

    tele = (r0 * 15) // 100
    nparts = _num_join_partitions()

    def init(t: pa.Table) -> pa.Table:
        return pa.table({"node": t["id"],
                         "rank": pa.repeat(pa.scalar(r0, pa.int64()), len(t))})

    nodes = ray.data.range(n_nodes)
    ranks = nodes.map_batches(init, batch_format="pyarrow")

    def contrib(t: pa.Table) -> pa.Table:
        r = np.asarray(t["rank"].combine_chunks(), dtype=np.int64)
        d = np.asarray(t["outdeg"].combine_chunks(), dtype=np.int64)
        part = (r * 85) // (100 * d)
        return pa.table({"node": t["dst"].combine_chunks(),
                         "part": pa.array(part, pa.int64())})

    def teleport(t: pa.Table) -> pa.Table:
        return pa.table({"node": t["id"],
                         "part": pa.repeat(pa.scalar(tele, pa.int64()), len(t))})

    tele_ds = nodes.map_batches(teleport, batch_format="pyarrow")
    for _ in range(iters):
        j = edges.join(ranks, "inner", nparts, on=("src",), right_on=("node",))
        parts = j.map_batches(contrib, batch_format="pyarrow")
        ranks = (
            parts.union(tele_ds)
            .groupby("node")
            .aggregate(Sum("part", alias_name="rank"))
        )
    return ranks

def triangle_counts(edges, *, src_col: str = "src", dst_col: str = "dst"):
    """Per-node triangle counts over a directed multigraph — EXACT, via the
    degree-oriented "forward" algorithm (Schank & Wagner 2005; the same
    orientation trick as Latapy's compact-forward): simple undirected graph
    = distinct {min,max} pairs minus self-loops, each edge oriented from
    lower (degree, node) rank to higher, wedges enumerated only from each
    node's OUT-neighbors and closed with one more hash join.

    Why this shape at 100 TB: orientation bounds every node's out-degree by
    O(sqrt(m)) on any graph, so the wedge join emits O(m^1.5) rows no matter
    how skewed the in-degrees are — a hub with 10^8 followers contributes
    no wedges from its in-edges.  Total: three groupby/join shuffles on the
    edge list plus one on the (smaller) wedge set; per-batch corner counts
    pre-aggregate before the final groupby.  Returns Dataset[node, n_tri]
    for nodes in >= 1 triangle.
    """
    import ray.data
    from ray.data.aggregate import Count, Sum

    from .dedup import _num_join_partitions

    nparts = _num_join_partitions()

    def canon(t: pa.Table) -> pa.Table:
        s = np.asarray(t[src_col].combine_chunks(), dtype=np.int64)
        d = np.asarray(t[dst_col].combine_chunks(), dtype=np.int64)
        m = s != d
        u, v = np.minimum(s[m], d[m]), np.maximum(s[m], d[m])
        tab = pa.table({"u": pa.array(u, pa.int64()), "v": pa.array(v, pa.int64())})
        # local dedup shrinks the distinct shuffle
        return tab.group_by(["u", "v"]).aggregate([]).select(["u", "v"])

    und = (
        edges.map_batches(canon, batch_format="pyarrow")
        .groupby(["u", "v"])
        .aggregate(Count(alias_name="_n"))
        .select_columns(["u", "v"])
        .materialize()
    )

    def ends(t: pa.Table) -> pa.Table:
        both = np.concatenate([
            np.asarray(t["u"].combine_chunks(), dtype=np.int64),
            np.asarray(t["v"].combine_chunks(), dtype=np.int64),
        ])
        uniq, cnt = np.unique(both, return_counts=True)
        return pa.table({"node": pa.array(uniq, pa.int64()),
                         "dcnt": pa.array(cnt.astype(np.int64), pa.int64())})

    deg = (
        und.map_batches(ends, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Sum("dcnt", alias_name="deg"))
        .materialize()
    )

    with_du = und.join(
        deg, "inner", nparts, on=("u",), right_on=("node",)
    ).map_batches(
        lambda t: pa.table({"u": t["u"], "v": t["v"],
                            "du": t["deg"].cast(pa.int64())}),
        batch_format="pyarrow",
    )
    with_both = with_du.join(
        deg, "inner", nparts, on=("v",), right_on=("node",)
    ).map_batches(
        lambda t: pa.table({"u": t["u"], "v": t["v"], "du": t["du"],
                            "dv": t["deg"].cast(pa.int64())}),
        batch_format="pyarrow",
    )

    def orient(t: pa.Table) -> pa.Table:
        u = np.asarray(t["u"].combine_chunks(), dtype=np.int64)
        v = np.asarray(t["v"].combine_chunks(), dtype=np.int64)
        du = np.asarray(t["du"].combine_chunks(), dtype=np.int64)
        dv = np.asarray(t["dv"].combine_chunks(), dtype=np.int64)
        # orient from lower (deg, node) to higher; ties broken by node id
        swap = (dv < du) | ((dv == du) & (v < u))
        a = np.where(swap, v, u)
        b = np.where(swap, u, v)
        db = np.where(swap, du, dv)
        return pa.table({"a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64()),
                         "db": pa.array(db, pa.int64())})

    oriented = with_both.map_batches(orient, batch_format="pyarrow").materialize()

    # wedges: out-neighbor pairs of each apex, enumerated once by rank order
    wedges = oriented.join(
        oriented, "inner", nparts, on=("a",), left_suffix="_l", right_suffix="_r",
    ).map_batches(
        lambda t: _wedge_filter(t), batch_format="pyarrow",
    )
    closed = wedges.join(
        oriented.select_columns(["a", "b"]), "inner", nparts,
        on=("x", "y"), right_on=("a", "b"),
    )

    def corners(t: pa.Table) -> pa.Table:
        allc = np.concatenate([
            np.asarray(t["apex"].combine_chunks(), dtype=np.int64),
            np.asarray(t["x"].combine_chunks(), dtype=np.int64),
            np.asarray(t["y"].combine_chunks(), dtype=np.int64),
        ])
        uniq, cnt = np.unique(allc, return_counts=True)
        return pa.table({"node": pa.array(uniq, pa.int64()),
                         "cnt": pa.array(cnt.astype(np.int64), pa.int64())})

    return (
        closed.map_batches(corners, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Sum("cnt", alias_name="n_tri"))
    )


def _wedge_filter(t: pa.Table) -> pa.Table:
    """Keep out-neighbor pairs in strict rank order: (db_l, b_l) < (db_r, b_r)
    enumerates each unordered wedge exactly once, and the closing edge —
    if the triangle exists — is oriented x->y by construction."""
    bl = np.asarray(t["b_l"].combine_chunks(), dtype=np.int64)
    br = np.asarray(t["b_r"].combine_chunks(), dtype=np.int64)
    dl = np.asarray(t["db_l"].combine_chunks(), dtype=np.int64)
    dr = np.asarray(t["db_r"].combine_chunks(), dtype=np.int64)
    keep = (dl < dr) | ((dl == dr) & (bl < br))
    a = np.asarray(t["a"].combine_chunks(), dtype=np.int64)
    return pa.table({
        "apex": pa.array(a[keep], pa.int64()),
        "x": pa.array(bl[keep], pa.int64()),
        "y": pa.array(br[keep], pa.int64()),
    })
