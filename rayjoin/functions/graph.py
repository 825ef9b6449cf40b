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

def hits_int(edges, *, n_nodes: int, iters: int = 2, h0: int = 1,
             shift: int = 0, broadcast_threshold: int = 50_000_000):
    """k rounds of INTEGER HITS (Kleinberg 1999, hubs & authorities) over
    Dataset[src, dst]; nodes are 0..n_nodes-1.  Each round is

        auth'(v) = (sum over in-edges (u,v) of hub(u))  >> shift
        hub'(u)  = (sum over out-edges (u,v) of auth'(v)) >> shift

    starting from hub = h0 everywhere.  Kleinberg's L2 normalization is a
    positive per-round scalar, so it never changes the RANKING; dropping it
    for a floor right-shift keeps every value int64 and lets the chained-CTE
    SQL twin hash-match bit-exactly (same contract as pagerank_int above).
    Overflow bound: values grow by <= max_indeg * max_outdeg (>> shift) per
    round — keep h0 * (max_indeg * max_outdeg / 2^(2*shift))^iters * n < 2^63.

    Two plans, bit-identical (pytest-pinned parity):
    - n_nodes <= broadcast_threshold: hub/auth vectors ride as ray.put numpy
      arrays (one map + one sparse groupby per half-round, no join).
    - beyond: two hash joins per round, O(1) driver memory; the final
      full-coverage table comes from a zeros base in the last groupby (a
      no-in-edge node has auth 0, a no-out-edge node hub 0).

    Returns Dataset[node, hub, auth].
    """
    if iters < 1:
        raise ValueError("need iters >= 1")
    if n_nodes <= broadcast_threshold:
        return _hits_broadcast(edges, n_nodes=n_nodes, iters=iters, h0=h0,
                               shift=shift)
    return _hits_join(edges, n_nodes=n_nodes, iters=iters, h0=h0, shift=shift)


def _sparse_sum(edges, key_col: str, val, ref_getter):
    """One half-round of the broadcast plan: per-batch int64 partial sums of
    a broadcast vector gathered through ``val`` indices, grouped on the
    compact touched-``key_col`` set, then ONE groupby shuffle of those
    partials."""
    import ray
    from ray.data.aggregate import Sum

    def contrib(t: pa.Table) -> pa.Table:
        vec = ref_getter()
        k = np.asarray(t[key_col].combine_chunks(), dtype=np.int64)
        v = np.asarray(t[val].combine_chunks(), dtype=np.int64)
        part = vec[v]
        uniq, inv = np.unique(k, return_inverse=True)
        agg = np.zeros(uniq.size, np.int64)
        np.add.at(agg, inv, part)
        return pa.table({"node": pa.array(uniq, pa.int64()),
                         "part": pa.array(agg, pa.int64())})

    return (edges.map_batches(contrib, batch_format="pyarrow")
            .groupby("node").aggregate(Sum("part", alias_name="part")))


def _hits_broadcast(edges, *, n_nodes: int, iters: int, h0: int, shift: int):
    import ray
    import ray.data

    hub = np.full(n_nodes, h0, np.int64)
    auth = np.zeros(n_nodes, np.int64)
    for _ in range(iters):
        href = ray.put(hub)
        auth = np.zeros(n_nodes, np.int64)
        sums = _sparse_sum(edges, "dst", "src", lambda r=href: ray.get(r))
        for tbl in ray.get(sums.to_arrow_refs()):
            if tbl.num_rows:
                auth[np.asarray(tbl["node"], dtype=np.int64)] += np.asarray(
                    tbl["part"], dtype=np.int64)
        auth >>= shift
        aref = ray.put(auth)
        hub = np.zeros(n_nodes, np.int64)
        sums = _sparse_sum(edges, "src", "dst", lambda r=aref: ray.get(r))
        for tbl in ray.get(sums.to_arrow_refs()):
            if tbl.num_rows:
                hub[np.asarray(tbl["node"], dtype=np.int64)] += np.asarray(
                    tbl["part"], dtype=np.int64)
        hub >>= shift
    out = pa.table({"node": pa.array(np.arange(n_nodes), pa.int64()),
                    "hub": pa.array(hub, pa.int64()),
                    "auth": pa.array(auth, pa.int64())})
    return ray.data.from_arrow(out)


def _hits_join(edges, *, n_nodes: int, iters: int, h0: int, shift: int):
    import ray.data
    from ray.data.aggregate import Sum

    from ..util import drop_schemaless_empty_blocks
    from .dedup import _num_join_partitions

    nparts = _num_join_partitions()
    nodes = ray.data.range(n_nodes)
    empty = pa.table({"node": pa.array([], pa.int64()),
                      "part": pa.array([], pa.int64())})

    def init(t: pa.Table) -> pa.Table:
        return pa.table({"node": t["id"],
                         "part": pa.repeat(pa.scalar(h0, pa.int64()), len(t))})

    hubs = nodes.map_batches(init, batch_format="pyarrow")
    sh = np.int64(shift)

    def make_half(out_key: str):
        def half(t: pa.Table) -> pa.Table:
            return pa.table({
                "node": t[out_key].combine_chunks(),
                "part": t["part"].combine_chunks(),
            })
        return half

    def shifted(t: pa.Table) -> pa.Table:
        v = np.asarray(t["part"].combine_chunks(), dtype=np.int64) >> sh
        return pa.table({"node": t["node"].combine_chunks(),
                         "part": pa.array(v, pa.int64())})

    # Each half-round MATERIALIZES its node-sized aggregate (O(n_nodes)
    # light rows, never the edge list) so at most ONE Dataset.join operator
    # is live per execution: every join spins up its own aggregator-actor
    # pool, and 2*iters of them stacked in one lazy DAG deadlock a session
    # whose CPU count is below the summed pool sizes (measured: 4 chained
    # joins hang at num_cpus=4; pagerank's 2 survive).  Same per-round
    # barrier discipline as dup_clusters' pointer doubling.  Callers on the
    # join path should pass a materialized ``edges`` so the barrier doesn't
    # recompute the edge pipeline each round (the gate query does).
    auths = None
    for _ in range(iters):
        j = edges.join(hubs, "inner", nparts, on=("src",), right_on=("node",))
        auths = (j.map_batches(make_half("dst"), batch_format="pyarrow")
                 .groupby("node").aggregate(Sum("part", alias_name="part")))
        if shift:
            auths = auths.map_batches(shifted, batch_format="pyarrow")
        auths = drop_schemaless_empty_blocks(auths.materialize(), empty)
        j = edges.join(auths, "inner", nparts, on=("dst",), right_on=("node",))
        hubs = (j.map_batches(make_half("src"), batch_format="pyarrow")
                .groupby("node").aggregate(Sum("part", alias_name="part")))
        if shift:
            hubs = hubs.map_batches(shifted, batch_format="pyarrow")
        hubs = drop_schemaless_empty_blocks(hubs.materialize(), empty)

    def as_hub(t: pa.Table) -> pa.Table:
        z = pa.repeat(pa.scalar(0, pa.int64()), len(t))
        return pa.table({"node": t["node"].combine_chunks(),
                         "hub": t["part"].combine_chunks(), "auth": z})

    def as_auth(t: pa.Table) -> pa.Table:
        z = pa.repeat(pa.scalar(0, pa.int64()), len(t))
        return pa.table({"node": t["node"].combine_chunks(),
                         "hub": z, "auth": t["part"].combine_chunks()})

    def zeros(t: pa.Table) -> pa.Table:
        z = pa.repeat(pa.scalar(0, pa.int64()), len(t))
        return pa.table({"node": t["id"], "hub": z, "auth": z})

    full = (hubs.map_batches(as_hub, batch_format="pyarrow")
            .union(auths.map_batches(as_auth, batch_format="pyarrow"))
            .union(nodes.map_batches(zeros, batch_format="pyarrow")))
    return full.groupby("node").aggregate(
        Sum("hub", alias_name="hub"), Sum("auth", alias_name="auth"))


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
    from ray.data.aggregate import Sum

    closed = _closed_triangles(edges, src_col=src_col, dst_col=dst_col)

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


def _closed_triangles(edges, *, src_col: str, dst_col: str):
    """Shared forward-algorithm core: Dataset[apex, x, y] with one row per
    triangle of the SIMPLE undirected graph (each triangle exactly once;
    apex/x/y in orientation-rank order)."""
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
    return closed.select_columns(["apex", "x", "y"])


def edge_embeddedness(edges, *, src_col: str = "src", dst_col: str = "dst"):
    """Per-edge embeddedness (common-neighbor count) over a directed
    multigraph: for each edge {u, v} of the simple undirected graph, the
    number of nodes w adjacent to BOTH u and v — i.e. the number of
    triangles the edge sits in (Granovetter tie strength / Adamic-Adar
    support numerator).

    Same 100 TB shape as triangle_counts: the shared degree-oriented
    forward core bounds wedge fan-out at O(m^1.5) regardless of hub skew;
    each closed triangle then charges its THREE undirected edges with one
    light (u, v, cnt) row, pre-aggregated per batch before the single final
    groupby.  Returns Dataset[u, v, n_common] (u < v) for edges in >= 1
    triangle.
    """
    from ray.data.aggregate import Sum

    closed = _closed_triangles(edges, src_col=src_col, dst_col=dst_col)

    def charge_edges(t: pa.Table) -> pa.Table:
        a = np.asarray(t["apex"].combine_chunks(), dtype=np.int64)
        x = np.asarray(t["x"].combine_chunks(), dtype=np.int64)
        y = np.asarray(t["y"].combine_chunks(), dtype=np.int64)
        # apex/x/y are rank-ordered, not id-ordered: canonicalize each pair
        p = np.concatenate([a, a, x])
        q = np.concatenate([x, y, y])
        u, v = np.minimum(p, q), np.maximum(p, q)
        pairs = np.stack([u, v], axis=1)
        uniq, cnt = np.unique(pairs, axis=0, return_counts=True)
        return pa.table({"u": pa.array(uniq[:, 0], pa.int64()),
                         "v": pa.array(uniq[:, 1], pa.int64()),
                         "cnt": pa.array(cnt.astype(np.int64), pa.int64())})

    return (
        closed.map_batches(charge_edges, batch_format="pyarrow")
        .groupby(["u", "v"])
        .aggregate(Sum("cnt", alias_name="n_common"))
    )


def keyed_indegree(edges, *, src_key_col: str = "src_key",
                   dst_key_col: str = "dst_key",
                   drop_intra: bool = True):
    """Webgraph-style indegree profile at a coarser key (host, domain,
    bucket): for each distinct destination key, the number of DISTINCT
    referring keys and the total number of referring links.  Intra-key
    edges (src_key == dst_key, e.g. site-internal links) are dropped by
    default, matching how host-level indegree is used for spam/authority
    signals.  Returns Dataset[dst_key, n_ref_keys, n_links].

    100 TB shape — the two-level distinct-aggregation plan: batch-local
    (src_key, dst_key) partial counts prune the first shuffle to
    pair-granularity, a pair groupby finishes exact link counts, then
    batch-local per-dst partials feed the final (much smaller) dst
    groupby.  No row-level distinct ever shuffles.
    """
    from ray.data.aggregate import Count, Sum

    def pair_partial(t: pa.Table) -> pa.Table:
        s = t[src_key_col].combine_chunks()
        d = t[dst_key_col].combine_chunks()
        tab = pa.table({"sk": s, "dk": d})
        if drop_intra:
            tab = tab.filter(pc.invert(pc.equal(tab["sk"], tab["dk"])))
        g = tab.group_by(["sk", "dk"]).aggregate([("sk", "count")])
        return pa.table({"sk": g["sk"], "dk": g["dk"],
                         "n": g["sk_count"].cast(pa.int64())})

    pairs = (edges.map_batches(pair_partial, batch_format="pyarrow")
             .groupby(["sk", "dk"])
             .aggregate(Sum("n", alias_name="n_links")))

    def dst_partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["dk"]).aggregate([("dk", "count"),
                                          ("n_links", "sum")])
        return pa.table({"dst_key": g["dk"],
                         "refs": g["dk_count"].cast(pa.int64()),
                         "links": g["n_links_sum"].cast(pa.int64())})

    return (pairs.map_batches(dst_partial, batch_format="pyarrow")
            .groupby("dst_key")
            .aggregate(Sum("refs", alias_name="n_ref_keys"),
                       Sum("links", alias_name="n_links")))


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


def bfs_hops(edges, sources, *, n_nodes: int, max_rounds: int,
             broadcast_threshold: int = 50_000_000,
             src_col: str = "src", dst_col: str = "dst"):
    """Multi-source BFS over a directed edge list: hop distance from the
    nearest source, the "distance to a seed set" primitive (crawl-frontier
    depth, distance-to-landing-page, k-hop reach).

    Returns Dataset[node, dist] covering ALL nodes 0..n_nodes-1; dist is
    the minimum hop count from any source (0 for the sources themselves),
    -1 for nodes not reached within ``max_rounds`` hops.  ``max_rounds``
    is part of the RESULT CONTRACT (not a tuning knob): the SQL twin's
    recursive CTE carries the same bound, which is what keeps it finite on
    cyclic graphs.

    Two plans, bit-identical (pytest-pinned parity; BFS assigns each node
    exactly one distance, so there are no ties to break):

    - n_nodes <= broadcast_threshold: the frontier rides as a ray.put
      sorted array per round; workers emit per-batch UNIQUE reached dsts,
      the driver owns the O(n_nodes) dist array (bounded by the threshold,
      same contract as _pagerank_broadcast).  One map per round, no joins.
    - beyond: per-round hash joins — frontier x edges (inner on src),
      per-batch dedup + groupby(node) dedup of candidates, then one
      left_anti join against the visited set.  O(1) driver memory; each
      round's labels are materialized so round k+1 never re-executes
      rounds 1..k.  Early exit when a round's frontier is empty.
    """
    import ray

    srcs = np.unique(np.asarray(sources, dtype=np.int64))
    if srcs.size and (srcs.min() < 0 or srcs.max() >= n_nodes):
        raise ValueError("sources outside [0, n_nodes)")
    if max_rounds < 0:
        raise ValueError("max_rounds must be >= 0")
    if n_nodes <= broadcast_threshold:
        return _bfs_broadcast(edges, srcs, n_nodes=n_nodes,
                              max_rounds=max_rounds,
                              src_col=src_col, dst_col=dst_col)
    return _bfs_join(edges, srcs, n_nodes=n_nodes, max_rounds=max_rounds,
                     src_col=src_col, dst_col=dst_col)


def _bfs_broadcast(edges, srcs, *, n_nodes: int, max_rounds: int,
                   src_col: str, dst_col: str):
    import ray
    import ray.data

    dist = np.full(n_nodes, -1, np.int64)
    dist[srcs] = 0
    frontier = srcs
    for r in range(1, max_rounds + 1):
        if frontier.size == 0:
            break
        fref = ray.put(frontier)  # sorted (np.unique / np.flatnonzero)

        def reached(t: pa.Table, fref=fref) -> pa.Table:
            f = ray.get(fref)
            src = np.asarray(t[src_col].combine_chunks(), dtype=np.int64)
            dst = np.asarray(t[dst_col].combine_chunks(), dtype=np.int64)
            pos = np.searchsorted(f, src)
            pos_c = np.minimum(pos, max(f.size - 1, 0))
            hit = f[pos_c] == src if f.size else np.zeros(src.size, bool)
            return pa.table({"node": pa.array(np.unique(dst[hit]), pa.int64())})

        cand_refs = ray.get(
            edges.map_batches(reached, batch_format="pyarrow").to_arrow_refs())
        cand = np.unique(np.concatenate(
            [np.asarray(t["node"], dtype=np.int64) for t in cand_refs]
            + [np.empty(0, np.int64)]))
        new = cand[dist[cand] == -1] if cand.size else cand
        dist[new] = r
        frontier = new
    out = pa.table({"node": pa.array(np.arange(n_nodes), pa.int64()),
                    "dist": pa.array(dist, pa.int64())})
    return ray.data.from_arrow(out)


def _bfs_join(edges, srcs, *, n_nodes: int, max_rounds: int,
              src_col: str, dst_col: str):
    import ray.data

    from ..util import drop_schemaless_empty_blocks
    from .dedup import _num_join_partitions

    nparts = _num_join_partitions()
    node_schema = pa.table({"node": pa.array([], pa.int64())})

    if srcs.size == 0:
        # no sources: everything unreached.  (Short-circuit matters beyond
        # taste — a left_anti join whose right side is an EMPTY dataset
        # shuffles schemaless blocks and dies inside acero.)
        minus1 = pa.scalar(-1, pa.int64())
        return ray.data.range(n_nodes).map_batches(
            lambda t: pa.table({"node": t["id"].cast(pa.int64()),
                                "dist": pa.repeat(minus1, t.num_rows)}),
            batch_format="pyarrow")

    def with_dist(ds, d):
        dd = pa.scalar(int(d), pa.int64())
        return ds.map_batches(
            lambda t: pa.table({"node": t["node"].cast(pa.int64()),
                                "dist": pa.repeat(dd, t.num_rows)}),
            batch_format="pyarrow")

    src_tbl = pa.table({"node": pa.array(srcs, pa.int64())})
    frontier = ray.data.from_arrow(src_tbl).materialize()
    labels = with_dist(frontier, 0).materialize()

    def dedup_nodes(t: pa.Table) -> pa.Table:
        dst = np.asarray(t[dst_col].combine_chunks(), dtype=np.int64)
        return pa.table({"node": pa.array(np.unique(dst), pa.int64())})

    for r in range(1, max_rounds + 1):
        if frontier.count() == 0:
            break
        j = edges.join(frontier, "inner", nparts,
                       on=(src_col,), right_on=("node",))
        cand = (j.map_batches(dedup_nodes, batch_format="pyarrow")
                .groupby("node").count()
                .map_batches(lambda t: t.select(["node"]),
                             batch_format="pyarrow"))
        cand = drop_schemaless_empty_blocks(cand, node_schema)
        new = cand.join(labels, "left_anti", nparts, on=("node",))
        new = drop_schemaless_empty_blocks(new.materialize(), node_schema)
        frontier = new.materialize()
        labels = labels.union(with_dist(frontier, r)).materialize()

    unreached = (
        ray.data.range(n_nodes)
        .map_batches(lambda t: t.rename_columns(["node"]),
                     batch_format="pyarrow")
        .join(labels, "left_anti", nparts, on=("node",)))
    minus1 = pa.scalar(-1, pa.int64())
    unreached = unreached.map_batches(
        lambda t: pa.table({"node": t["node"].cast(pa.int64()),
                            "dist": pa.repeat(minus1, t.num_rows)}),
        batch_format="pyarrow")
    return labels.union(unreached)


_SSSP_INF = np.int64(1) << np.int64(62)


def sssp_hops(edges, sources, *, n_nodes: int, max_rounds: int,
              broadcast_threshold: int = 50_000_000,
              src_col: str = "src", dst_col: str = "dst",
              weight_col: str = "w"):
    """Multi-source WEIGHTED shortest paths (Bellman–Ford rounds) over a
    directed edge list with non-negative int64 weights: dist is the
    minimum total weight over paths of AT MOST ``max_rounds`` edges from
    any source — the hop bound is part of the RESULT CONTRACT (same rule
    as ``bfs_hops``), which keeps the SQL recursive-CTE twin finite on
    cyclic graphs and makes every value exact integer math.

    Returns Dataset[node, dist] covering nodes 0..n_nodes-1, -1 for nodes
    unreached within the bound.  Two plans, identical results:

    - n_nodes <= broadcast_threshold: the improved frontier rides as a
      ray.put (nodes, dists) pair per round; workers relax edges and emit
      per-batch per-dst MIN partials; the driver owns the O(n_nodes) dist
      array.  One map per round, no shuffles.
    - beyond: per-round hash joins — frontier x edges (inner on src),
      per-batch per-dst min partials + groupby(dst) min, then improvement
      detection via one left_anti (fresh nodes) + one inner join (beat the
      incumbent label).  Each round's labels are materialized so round
      k+1 never re-executes rounds 1..k; early exit on an empty frontier.
    """
    srcs = np.unique(np.asarray(sources, dtype=np.int64))
    if srcs.size and (srcs.min() < 0 or srcs.max() >= n_nodes):
        raise ValueError("sources outside [0, n_nodes)")
    if max_rounds < 0:
        raise ValueError("max_rounds must be >= 0")
    if n_nodes <= broadcast_threshold:
        return _sssp_broadcast(edges, srcs, n_nodes=n_nodes,
                               max_rounds=max_rounds, src_col=src_col,
                               dst_col=dst_col, weight_col=weight_col)
    return _sssp_join(edges, srcs, n_nodes=n_nodes, max_rounds=max_rounds,
                      src_col=src_col, dst_col=dst_col, weight_col=weight_col)


def _min_per_dst(dst: np.ndarray, d: np.ndarray):
    """(unique dsts, per-dst min d) via one lexsort — the per-batch partial
    that keeps the relax shuffle tiny (pre-aggregation rule)."""
    order = np.lexsort((d, dst))
    ds_, dd = dst[order], d[order]
    first = np.concatenate([[True], ds_[1:] != ds_[:-1]]) if ds_.size else np.empty(0, bool)
    return ds_[first], dd[first]


def _sssp_broadcast(edges, srcs, *, n_nodes: int, max_rounds: int,
                    src_col: str, dst_col: str, weight_col: str):
    import ray
    import ray.data

    dist = np.full(n_nodes, _SSSP_INF, np.int64)
    dist[srcs] = 0
    f_nodes, f_dist = srcs, np.zeros(srcs.size, np.int64)
    for _ in range(max_rounds):
        if f_nodes.size == 0:
            break
        fref = ray.put((f_nodes, f_dist))  # f_nodes sorted

        def relax(t: pa.Table, fref=fref) -> pa.Table:
            fn, fd = ray.get(fref)
            src = np.asarray(t[src_col].combine_chunks(), dtype=np.int64)
            dst = np.asarray(t[dst_col].combine_chunks(), dtype=np.int64)
            w = np.asarray(t[weight_col].combine_chunks(), dtype=np.int64)
            pos = np.searchsorted(fn, src)
            pos_c = np.minimum(pos, max(fn.size - 1, 0))
            hit = fn[pos_c] == src if fn.size else np.zeros(src.size, bool)
            cand_n, cand_d = _min_per_dst(dst[hit], fd[pos_c[hit]] + w[hit])
            return pa.table({"node": pa.array(cand_n, pa.int64()),
                             "d": pa.array(cand_d, pa.int64())})

        refs = ray.get(
            edges.map_batches(relax, batch_format="pyarrow").to_arrow_refs())
        parts = [t for t in refs if t.num_rows]
        if not parts:
            break
        cat = pa.concat_tables(parts)
        cand_n, cand_d = _min_per_dst(
            np.asarray(cat["node"], dtype=np.int64),
            np.asarray(cat["d"], dtype=np.int64))
        better = cand_d < dist[cand_n]
        f_nodes, f_dist = cand_n[better], cand_d[better]
        dist[f_nodes] = f_dist
    out = pa.table({
        "node": pa.array(np.arange(n_nodes), pa.int64()),
        "dist": pa.array(np.where(dist == _SSSP_INF, -1, dist), pa.int64()),
    })
    return ray.data.from_arrow(out)


def _sssp_join(edges, srcs, *, n_nodes: int, max_rounds: int,
               src_col: str, dst_col: str, weight_col: str):
    import ray.data

    from ..util import drop_schemaless_empty_blocks
    from .dedup import _num_join_partitions

    nparts = _num_join_partitions()
    node_schema = pa.table({"node": pa.array([], pa.int64()),
                            "dist": pa.array([], pa.int64())})
    minus1 = pa.scalar(-1, pa.int64())

    def all_unreached():
        return ray.data.range(n_nodes).map_batches(
            lambda t: pa.table({"node": t["id"].cast(pa.int64()),
                                "dist": pa.repeat(minus1, t.num_rows)}),
            batch_format="pyarrow")

    if srcs.size == 0:
        return all_unreached()

    frontier = ray.data.from_arrow(pa.table({
        "node": pa.array(srcs, pa.int64()),
        "dist": pa.array(np.zeros(srcs.size, np.int64), pa.int64()),
    })).materialize()
    labels = frontier

    def relax_join(t: pa.Table) -> pa.Table:
        dst = np.asarray(t[dst_col].combine_chunks(), dtype=np.int64)
        d = (np.asarray(t["dist"].combine_chunks(), dtype=np.int64)
             + np.asarray(t[weight_col].combine_chunks(), dtype=np.int64))
        cn, cd = _min_per_dst(dst, d)
        return pa.table({"node": pa.array(cn, pa.int64()),
                         "cand": pa.array(cd, pa.int64())})

    from ray.data.aggregate import Min

    for _ in range(max_rounds):
        if frontier.count() == 0:
            break
        j = edges.join(frontier, "inner", nparts,
                       on=(src_col,), right_on=("node",))
        cand = (j.map_batches(relax_join, batch_format="pyarrow")
                .groupby("node").aggregate(Min("cand", alias_name="cand")))
        cand = drop_schemaless_empty_blocks(
            cand.materialize(),
            pa.table({"node": pa.array([], pa.int64()),
                      "cand": pa.array([], pa.int64())}))
        fresh = cand.join(labels, "left_anti", nparts, on=("node",))
        fresh = fresh.map_batches(
            lambda t: pa.table({"node": t["node"].cast(pa.int64()),
                                "dist": t["cand"].cast(pa.int64())}),
            batch_format="pyarrow")
        beat = cand.join(labels, "inner", nparts, on=("node",))

        def improved(t: pa.Table) -> pa.Table:
            keep = pc.less(t["cand"], t["dist"])
            t = t.filter(keep)
            return pa.table({"node": t["node"].cast(pa.int64()),
                             "dist": t["cand"].cast(pa.int64())})

        beat = beat.map_batches(improved, batch_format="pyarrow")
        frontier = drop_schemaless_empty_blocks(
            fresh.union(beat).materialize(), node_schema)
        if frontier.count() == 0:
            break
        labels = (labels.union(frontier)
                  .groupby("node").aggregate(Min("dist", alias_name="dist")))
        labels = drop_schemaless_empty_blocks(labels.materialize(), node_schema)

    unreached = (
        ray.data.range(n_nodes)
        .map_batches(lambda t: t.rename_columns(["node"]),
                     batch_format="pyarrow")
        .join(labels, "left_anti", nparts, on=("node",))
        .map_batches(
            lambda t: pa.table({"node": t["node"].cast(pa.int64()),
                                "dist": pa.repeat(minus1, t.num_rows)}),
            batch_format="pyarrow"))
    return labels.union(unreached)


def simple_undirected_edges(edges, *, n_nodes: int,
                            src_col: str = "src", dst_col: str = "dst"):
    """Collapse a directed multi-edge list into the SIMPLE UNDIRECTED edge
    set: self-loops dropped, (a,b)/(b,a)/repeats collapsed to one canonical
    (u, v) with u < v.  Per-batch local dedup shrinks the shuffle payload;
    one groupby((u, v)) hash shuffle makes it globally distinct.  Returns a
    materialized Dataset[u, v] (callers iterate over it round after round).
    """
    import ray.data
    from ray.data.aggregate import Count

    def canon(t: pa.Table) -> pa.Table:
        a = np.asarray(t[src_col].combine_chunks(), dtype=np.int64)
        b = np.asarray(t[dst_col].combine_chunks(), dtype=np.int64)
        keep = a != b
        a, b = a[keep], b[keep]
        u = np.minimum(a, b)
        v = np.maximum(a, b)
        order = np.lexsort((v, u))
        u, v = u[order], v[order]
        first = np.concatenate([[True], (u[1:] != u[:-1]) | (v[1:] != v[:-1])]) \
            if u.size else np.zeros(0, bool)
        return pa.table({"u": pa.array(u[first], pa.int64()),
                         "v": pa.array(v[first], pa.int64())})

    return (edges.map_batches(canon, batch_format="pyarrow")
            .groupby(["u", "v"]).aggregate(Count(alias_name="_n"))
            .select_columns(["u", "v"])
            .materialize())


def kcore_nodes(edges, *, n_nodes: int, k: int, max_rounds: int,
                broadcast_threshold: int = 50_000_000,
                src_col: str = "src", dst_col: str = "dst"):
    """Bounded-round k-core peeling over a directed edge list viewed as a
    SIMPLE UNDIRECTED graph (self-loops dropped, parallel/reverse edges
    collapsed; degree = number of distinct neighbors).  Round i keeps the
    nodes with >= k surviving neighbors among round i-1's survivors; after
    ``max_rounds`` rounds the survivors are flagged 1, the peeled 0.

    ``max_rounds`` is part of the RESULT CONTRACT exactly like bfs_hops:
    the SQL twin runs the same chained rounds.  Peeling is monotone (the
    alive set only shrinks), so a round that removes nothing is a fixed
    point — the engine early-exits there and any larger bound returns the
    identical table; with max_rounds >= n the result is the true k-core.

    Two plans, bit-identical (pytest-pinned parity; survival is a set
    property, no ties exist):
    - n_nodes <= broadcast_threshold: the alive bitmap is driver-owned;
      each round is one map over the simple edges (both-alive filter +
      per-batch compact degree partials) and one node-sized groupby.
    - beyond: the alive set is a Dataset; each round is two hash joins
      (edges x alive on u, then on v), a degree groupby, and a >= k
      filter, materialized per round (the same per-round barrier as
      _bfs_join / _hits_join: chained join aggregator pools deadlock).

    Returns Dataset[node, in_core] over ALL nodes 0..n_nodes-1.
    """
    if k < 0:
        raise ValueError("need k >= 0")
    if max_rounds < 0:
        raise ValueError("need max_rounds >= 0")
    simple = simple_undirected_edges(edges, n_nodes=n_nodes,
                                     src_col=src_col, dst_col=dst_col)
    if n_nodes <= broadcast_threshold:
        return _kcore_broadcast(simple, n_nodes=n_nodes, k=k,
                                max_rounds=max_rounds)
    return _kcore_join(simple, n_nodes=n_nodes, k=k, max_rounds=max_rounds)


def _kcore_broadcast(simple, *, n_nodes: int, k: int, max_rounds: int):
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    alive = np.ones(n_nodes, bool)
    for _ in range(max_rounds):
        aref = ray.put(alive)

        def deg_parts(t: pa.Table, aref=aref) -> pa.Table:
            a = ray.get(aref)
            u = np.asarray(t["u"].combine_chunks(), dtype=np.int64)
            v = np.asarray(t["v"].combine_chunks(), dtype=np.int64)
            live = a[u] & a[v]
            ends = np.concatenate([u[live], v[live]])
            uniq, counts = np.unique(ends, return_counts=True)
            return pa.table({"node": pa.array(uniq, pa.int64()),
                             "part": pa.array(counts.astype(np.int64),
                                              pa.int64())})

        sums = (simple.map_batches(deg_parts, batch_format="pyarrow")
                .groupby("node").aggregate(Sum("part", alias_name="part")))
        deg = np.zeros(n_nodes, np.int64)
        for tbl in ray.get(sums.to_arrow_refs()):
            if tbl.num_rows:
                deg[np.asarray(tbl["node"], dtype=np.int64)] += np.asarray(
                    tbl["part"], dtype=np.int64)
        new = alive & (deg >= k)
        if np.array_equal(new, alive):
            break
        alive = new
    out = pa.table({"node": pa.array(np.arange(n_nodes), pa.int64()),
                    "in_core": pa.array(alive.astype(np.int64), pa.int64())})
    return ray.data.from_arrow(out)


def _kcore_join(simple, *, n_nodes: int, k: int, max_rounds: int):
    import ray.data
    from ray.data.aggregate import Sum

    from ..util import drop_schemaless_empty_blocks
    from .dedup import _num_join_partitions

    nparts = _num_join_partitions()
    node_schema = pa.table({"node": pa.array([], pa.int64())})
    kk = np.int64(k)

    def all_nodes():
        return ray.data.range(n_nodes).map_batches(
            lambda t: pa.table({"node": t["id"].cast(pa.int64())}),
            batch_format="pyarrow")

    alive = all_nodes().materialize()
    n_alive = n_nodes

    def both_ends(t: pa.Table) -> pa.Table:
        u = np.asarray(t["u"].combine_chunks(), dtype=np.int64)
        v = np.asarray(t["v"].combine_chunks(), dtype=np.int64)
        ends = np.concatenate([u, v])
        uniq, counts = np.unique(ends, return_counts=True)
        return pa.table({"node": pa.array(uniq, pa.int64()),
                         "part": pa.array(counts.astype(np.int64), pa.int64())})

    def ge_k(t: pa.Table) -> pa.Table:
        deg = np.asarray(t["part"].combine_chunks(), dtype=np.int64)
        keep = deg >= kk
        return pa.table({
            "node": pa.array(
                np.asarray(t["node"].combine_chunks(), dtype=np.int64)[keep],
                pa.int64())})

    uv_schema = pa.table({"u": pa.array([], pa.int64()),
                          "v": pa.array([], pa.int64())})

    def select_uv(t: pa.Table) -> pa.Table:
        return t.select(["u", "v"])

    for _ in range(max_rounds):
        if k == 0 or n_alive == 0:
            break
        j = simple.join(alive, "inner", nparts, on=("u",), right_on=("node",))
        # scrub between the chained joins: join #1 emits zero-row blocks
        # with an EMPTY schema, and those reach join #2's acero with
        # "No match for key field v" (zero-row blocks bypass map UDFs, so
        # a schema-pinning map can't fix them)
        j = drop_schemaless_empty_blocks(
            j.map_batches(select_uv, batch_format="pyarrow").materialize(),
            uv_schema)
        j = j.join(alive, "inner", nparts, on=("v",), right_on=("node",))
        new = (j.map_batches(both_ends, batch_format="pyarrow")
               .groupby("node").aggregate(Sum("part", alias_name="part"))
               .map_batches(ge_k, batch_format="pyarrow"))
        new = drop_schemaless_empty_blocks(new.materialize(), node_schema)
        n_new = new.count()
        if n_new == n_alive:
            break
        alive, n_alive = new, n_new

    one = pa.scalar(1, pa.int64())
    zero = pa.scalar(0, pa.int64())
    if n_alive == 0:
        # left_anti against an EMPTY right side shuffles schemaless blocks
        # and dies inside acero (same short-circuit as _bfs_join's no-source
        # path): emit the all-zeros table directly.
        return all_nodes().map_batches(
            lambda t: pa.table({"node": t["node"],
                                "in_core": pa.repeat(zero, t.num_rows)}),
            batch_format="pyarrow")
    ins = alive.map_batches(
        lambda t: pa.table({"node": t["node"].cast(pa.int64()),
                            "in_core": pa.repeat(one, t.num_rows)}),
        batch_format="pyarrow")
    outs = all_nodes().join(alive, "left_anti", nparts, on=("node",))
    outs = outs.map_batches(
        lambda t: pa.table({"node": t["node"].cast(pa.int64()),
                            "in_core": pa.repeat(zero, t.num_rows)}),
        batch_format="pyarrow")
    return ins.union(outs)


def reciprocity_profile(edges, *, src_col: str = "src", dst_col: str = "dst"):
    """Per-node reciprocity profile of the directed SIMPLE graph (self-loops
    and duplicate edges collapsed): out-degree, in-degree, and the number of
    MUTUAL (reciprocated) incident edges — the webgraph link-farm /
    follow-back signal.  Returns Dataset[node, n_out, n_in, n_mutual].

    Two shuffles at any scale: batch-local canonical (u, v, fwd, rev) flag
    partials (group_by max inside the batch) feed one pair groupby that
    OR-combines direction bits; each undirected pair row then charges BOTH
    endpoints with (out, in, mutual) increments, pre-aggregated per batch
    before the final node groupby.  Never joins the edge list to itself.
    """
    from ray.data.aggregate import Max, Sum

    def canon_flags(t: pa.Table) -> pa.Table:
        s = np.asarray(t[src_col].combine_chunks(), dtype=np.int64)
        d = np.asarray(t[dst_col].combine_chunks(), dtype=np.int64)
        m = s != d
        s, d = s[m], d[m]
        u, v = np.minimum(s, d), np.maximum(s, d)
        fwd = (s < d).astype(np.int64)
        tab = pa.table({"u": pa.array(u, pa.int64()),
                        "v": pa.array(v, pa.int64()),
                        "f": pa.array(fwd, pa.int64()),
                        "r": pa.array(1 - fwd, pa.int64())})
        g = tab.group_by(["u", "v"]).aggregate([("f", "max"), ("r", "max")])
        return pa.table({"u": g["u"], "v": g["v"],
                         "f": g["f_max"], "r": g["r_max"]})

    pairs = (edges.map_batches(canon_flags, batch_format="pyarrow")
             .groupby(["u", "v"])
             .aggregate(Max("f", alias_name="f"), Max("r", alias_name="r")))

    def charge(t: pa.Table) -> pa.Table:
        u = np.asarray(t["u"].combine_chunks(), dtype=np.int64)
        v = np.asarray(t["v"].combine_chunks(), dtype=np.int64)
        f = np.asarray(t["f"].combine_chunks(), dtype=np.int64)
        r = np.asarray(t["r"].combine_chunks(), dtype=np.int64)
        mu = f * r
        node = np.concatenate([u, v])
        out = np.concatenate([f, r])   # u's out-edge is u->v (fwd); v's is v->u
        inn = np.concatenate([r, f])
        mut = np.concatenate([mu, mu])
        uniq, inv = np.unique(node, return_inverse=True)
        acc = np.zeros((uniq.size, 3), np.int64)
        np.add.at(acc[:, 0], inv, out)
        np.add.at(acc[:, 1], inv, inn)
        np.add.at(acc[:, 2], inv, mut)
        return pa.table({"node": pa.array(uniq, pa.int64()),
                         "o": pa.array(acc[:, 0], pa.int64()),
                         "i": pa.array(acc[:, 1], pa.int64()),
                         "m": pa.array(acc[:, 2], pa.int64())})

    return (pairs.map_batches(charge, batch_format="pyarrow")
            .groupby("node")
            .aggregate(Sum("o", alias_name="n_out"),
                       Sum("i", alias_name="n_in"),
                       Sum("m", alias_name="n_mutual")))
