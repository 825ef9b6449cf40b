"""Distributed exact statistics over keyed columns.

Exact per-group quantiles cannot pre-aggregate (any value can be the
quantile), so the shuffle volume is inherently the pruned (key, value)
projection — two int64 columns, not the input table.  The wide step is one
``groupby(bucket)`` over ``num_buckets`` hash buckets; inside a bucket ALL
keys are reduced with one lexsort + segmented index arithmetic (zero Python
calls per key — the bucketed-merge pattern, see functions/stream.py).

Quantile rule: ``quantile_disc`` semantics — the element at 0-based sorted
index ``max(ceil(q*n) - 1, 0)`` within its group, matching DuckDB exactly so
gate rows hash-MATCH.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def grouped_quantiles(ds, *, key_col: str, val_col: str,
                      qs: tuple[float, ...] = (0.25, 0.5, 0.9),
                      num_buckets: int = 256, pre_aggregate: bool = False,
                      weight_col: str | None = None):
    """Exact per-key quantiles of an int64 value column.

    Returns Dataset[key_col, n, q<pct> per q] — one row per distinct key,
    one ``q25``-style int64 column per requested quantile (pct = round(q*100);
    callers needing finer labels pass distinct rounded percents).

    Keys hash into ``num_buckets`` shuffle buckets; each bucket computes
    every key's quantiles with one lexsort over (key, value) + one vectorized
    gather per q.  At 100 TB the only wide step is the 2-column shuffle;
    buckets are balanced by the avalanche-mixed key hash, and a hot key
    costs its group's sort share, never a Python loop.

    ``pre_aggregate=True`` combines each batch into (key, value, count)
    partials BEFORE the shuffle and computes weighted quantiles from count
    cumsums per bucket — byte-identical output, but shuffle volume drops
    from O(rows) to O(distinct (key, value) pairs per batch).  The right
    mode when the value domain repeats (scores, bucketed sizes, milli
    units); pointless for unique-per-row values.

    ``weight_col`` (int64, strictly positive) computes WEIGHTED quantiles:
    q's value is the smallest v whose cumulative weight over values <= v
    reaches ceil(q * W) within the key (W = the key's total weight; the
    ``n`` output column reports W).  Same bucket/lexsort plan — weights
    ride the shuffle as the ``cnt`` lane, and ``pre_aggregate`` sums them
    per (key, value) partial instead of counting.
    """
    if not qs:
        raise ValueError("qs must be non-empty")
    if any(not (0.0 <= q <= 1.0) for q in qs):
        raise ValueError(f"quantile fractions must be in [0, 1]: {qs}")
    labels = [f"q{round(q * 100)}" for q in qs]
    if len(set(labels)) != len(labels):
        raise ValueError(f"quantile labels collide after rounding: {labels}")
    reserved = {"val", "cnt", "part", "n", *labels}
    if key_col in reserved:
        raise ValueError(f"key_col {key_col!r} collides with an internal column")

    def prep(t: pa.Table) -> pa.Table:
        from ..util import knuth_bucket

        cols = {key_col: t[key_col], "val": pc.cast(t[val_col], pa.int64())}
        if weight_col is not None:
            w = pc.cast(t[weight_col], pa.int64())
            if t.num_rows and pc.min(w).as_py() <= 0:
                raise ValueError("weight_col must be strictly positive")
            cols["cnt"] = w
        t = pa.table(cols)
        if pre_aggregate:
            if weight_col is not None:
                t = t.group_by([key_col, "val"]).aggregate([("cnt", "sum")])
                t = t.select([key_col, "val", "cnt_sum"])
            else:
                t = t.group_by([key_col, "val"]).aggregate([([], "count_all")])
                # select by NAME (key/aggregate column order is a pyarrow
                # implementation detail) before the positional rename
                t = t.select([key_col, "val", "count_all"])
            t = t.rename_columns([key_col, "val", "cnt"])
        key = np.asarray(t[key_col].combine_chunks(), dtype=np.int64)
        part = knuth_bucket(key, num_buckets)
        return t.append_column("part", pa.array(part, pa.int64()))

    empty = pa.table(
        {key_col: pa.array([], pa.int64()),
         "n": pa.array([], pa.int64()),
         **{lab: pa.array([], pa.int64()) for lab in labels}}
    )

    def per_bucket(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty
        key = np.asarray(t[key_col].combine_chunks(), dtype=np.int64)
        val = np.asarray(t["val"].combine_chunks(), dtype=np.int64)
        cnt = (np.asarray(t["cnt"].combine_chunks(), dtype=np.int64)
               if (pre_aggregate or weight_col is not None)
               else np.ones(key.size, np.int64))
        order = np.lexsort((val, key))
        key, val, cnt = key[order], val[order], cnt[order]
        starts = np.flatnonzero(
            np.concatenate([[True], key[1:] != key[:-1]])
        )
        ccum = np.cumsum(cnt)
        base = np.concatenate([[0], ccum[starts[1:] - 1]]) \
            if starts.size > 1 else np.zeros(starts.size, np.int64)
        ends = np.concatenate([starts[1:], [key.size]])
        counts = ccum[ends - 1] - base
        cols = {key_col: pa.array(key[starts], pa.int64()),
                "n": pa.array(counts, pa.int64())}
        for q, lab in zip(qs, labels):
            # quantile_disc: the value whose cumulative count first reaches
            # rank max(ceil(q*n), 1) within the group
            rank = np.ceil(q * counts).astype(np.int64)
            np.clip(rank, 1, counts, out=rank)
            # first sorted position where (ccum - base) >= rank
            pos = np.searchsorted(ccum, base + rank, side="left")
            cols[lab] = pa.array(val[pos], pa.int64())
        return pa.table(cols)

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("part")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def _fold_f64(x: np.ndarray) -> np.ndarray:
    """float64 -> uint64, order-preserving (sign-fold): negatives flip all
    bits, non-negatives set the sign bit.  Monotone, so rank selection can
    run in integer key space.  NaN is NOT ordered — callers must exclude."""
    u = x.view(np.uint64)
    neg = (u >> np.uint64(63)).astype(bool)
    return np.where(neg, ~u, u | np.uint64(1 << 63))


def _unfold_f64(u: np.ndarray) -> np.ndarray:
    neg = ~((u >> np.uint64(63)).astype(bool))
    return np.where(neg, ~u, u & ~np.uint64(1 << 63)).view(np.float64)


def global_quantiles_no_sort(ds, *, value_col: str,
                             qs: tuple[float, ...] = (0.5, 0.9, 0.99),
                             buckets: int = 4096,
                             gather_cap: int = 4_000_000) -> pa.Table:
    """EXACT global quantiles of a float64 column with NO sort and NO data
    shuffle: iterative histogram-refinement selection in folded-bit space.

    Each pass streams the column once (map_batches histogram partials,
    pre-summed per batch; only ``buckets x len(qs)`` int64 counts reach the
    tiny count shuffle), narrows every target rank to one bucket, and
    recurses into it.  Key ranges shrink ``buckets``-fold per pass, so
    <= ceil(64 / log2(buckets)) ~ 6 passes at the default; in practice a
    target resolves earlier, when its surviving population fits
    ``gather_cap`` — then one Ray task gathers just that value range and
    selects the rank exactly (driver stays O(1)).

    Quantile rule: quantile_disc, rank = clip(ceil(q*n), 1, n) over the
    ascending sort — identical to ``grouped_quantiles`` and DuckDB.
    Returns a pa.Table[q_milli, value] (len(qs) rows).  Nulls and NaN are
    rejected loudly: order statistics over unordered values are undefined.
    """
    import math

    import ray
    import ray.data
    from ray.data.aggregate import Sum

    if not qs or any(not (0.0 <= q <= 1.0) for q in qs):
        raise ValueError(f"quantile fractions must be in [0, 1]: {qs}")

    def prep(t: pa.Table) -> pa.Table:
        col = t[value_col]
        if col.null_count:
            raise ValueError("global_quantiles_no_sort: null values present")
        v = np.asarray(pc.cast(col, pa.float64()).combine_chunks(),
                       dtype=np.float64)
        if np.isnan(v).any():
            raise ValueError("global_quantiles_no_sort: NaN values present")
        return pa.table({"k": pa.array(_fold_f64(v), pa.uint64())})

    keys = ds.map_batches(prep, batch_format="pyarrow").materialize()
    n = keys.count()
    if n == 0:
        raise ValueError("global_quantiles_no_sort: empty input")

    # state per target: [lo, hi) key range, 1-based rank within it, pop
    full = (np.uint64(0), np.uint64(0xFFFFFFFFFFFFFFFF))
    targets = []
    for q in qs:
        rank = min(max(math.ceil(q * n), 1), n)
        targets.append({"q": q, "lo": full[0], "hi": full[1],
                        "rank": rank, "pop": n, "value": None})

    @ray.remote(num_cpus=0)
    def _gather_select(lo, hi, rank, *tabs):
        ks = [np.asarray(t["k"].combine_chunks(), dtype=np.uint64)
              for t in tabs if t.num_rows]
        sel = [k[(k >= lo) & (k < hi)] for k in ks]
        allk = (np.concatenate(sel) if sel else np.empty(0, np.uint64))
        return np.partition(allk, rank - 1)[rank - 1]

    key_refs = keys.to_arrow_refs()
    for _pass in range(8):
        active = [t for t in targets if t["value"] is None]
        if not active:
            break
        for t in active:
            # single-key range: every surviving value is this key
            if t["hi"] - t["lo"] <= np.uint64(1):
                t["value"] = t["lo"]
        active = [t for t in targets if t["value"] is None]
        if not active:
            break
        for t in active:
            if t["pop"] <= gather_cap:
                t["value"] = ray.get(_gather_select.remote(
                    t["lo"], t["hi"], t["rank"], *key_refs))
        active = [t for t in targets if t["value"] is None]
        if not active:
            break
        # one histogram pass serving every active target
        edges = []
        for t in active:
            span = t["hi"] - t["lo"]
            width = np.uint64(max(int(span // np.uint64(buckets)), 1))
            e = t["lo"] + width * np.arange(1, buckets, dtype=np.uint64)
            e = e[(e > t["lo"]) & (e < t["hi"])]
            edges.append((t, e))

        edge_list = [e for _, e in edges]
        active_ranges = [(t["lo"], t["hi"]) for t, _ in edges]

        def hist(tab: pa.Table) -> pa.Table:
            k = np.asarray(tab["k"].combine_chunks(), dtype=np.uint64)
            idx_out, cnt_out = [], []
            for ti, e in enumerate(edge_list):
                tgt = active_ranges[ti]
                kk = k[(k >= tgt[0]) & (k < tgt[1])]
                b = np.searchsorted(e, kk, side="right")
                bc = np.bincount(b, minlength=e.size + 1)
                nz = np.flatnonzero(bc)
                idx_out.append(ti * (buckets + 1) + nz)
                cnt_out.append(bc[nz])
            if not idx_out:
                return pa.table({"tb": pa.array([], pa.int64()),
                                 "cnt": pa.array([], pa.int64())})
            return pa.table(
                {"tb": pa.array(np.concatenate(idx_out), pa.int64()),
                 "cnt": pa.array(np.concatenate(cnt_out), pa.int64())}
            )

        parts = (keys.map_batches(hist, batch_format="pyarrow")
                 .groupby("tb").aggregate(Sum("cnt", alias_name="cnt"))
                 .to_pandas())
        tb = parts["tb"].to_numpy()
        cn = parts["cnt"].to_numpy()
        for ti, (t, e) in enumerate(edges):
            m = (tb >= ti * (buckets + 1)) & (tb < (ti + 1) * (buckets + 1))
            counts = np.zeros(e.size + 1, np.int64)
            counts[tb[m] - ti * (buckets + 1)] = cn[m]
            cum = np.cumsum(counts)
            b = int(np.searchsorted(cum, t["rank"], side="left"))
            lo = t["lo"] if b == 0 else e[b - 1]
            hi = t["hi"] if b == e.size else e[b]
            t["rank"] -= int(cum[b - 1]) if b > 0 else 0
            t["lo"], t["hi"], t["pop"] = lo, hi, int(counts[b])

    vals = []
    for t in targets:
        if t["value"] is None:  # defensive: 8 passes always suffice
            t["value"] = ray.get(_gather_select.remote(
                t["lo"], t["hi"], t["rank"], *key_refs))
        vals.append(float(_unfold_f64(np.array([t["value"]],
                                               np.uint64))[0]))
    return pa.table(
        {"q_milli": pa.array([round(q * 1000) for q in qs], pa.int64()),
         "value": pa.array(vals, pa.float64())}
    )


# --- HyperLogLog distinct sketch ---------------------------------------------


def hll_registers(ds, *, value_col: str, p: int = 14):
    """HyperLogLog register table over a column: Dataset[reg, max_rho]
    (only touched registers appear).

    The hash is the shared sampling hash (fnv1a64 of the value as string,
    corpus_ops.id_sample_hash) so the registers are a DETERMINISTIC pure
    function of the value set — bit-exactly reproducible in SQL (the
    ``hll_user_registers`` gate row): register = top ``p`` hash bits, rho =
    leading-zero count of the remaining ``64-p`` bits + 1.  rho's bit length
    comes from ``np.frexp`` (exact for < 2^53; ``log2``+floor misrounds just
    below powers of two).

    Scale shape: each batch reduces to <= 2^p (reg, rho) partials via one
    ``np.maximum.at`` scatter (no sort), and the only wide step is a
    ``groupby(reg).max`` over at most 2^p groups — a ~100 TB scan shuffles
    kilobytes.  Registers merge by max, so shards/retries compose exactly
    (the HLL union property, pytest-pinned along with the estimate error)."""
    from ray.data.aggregate import Max

    from .corpus_ops import id_sample_hash

    if not 4 <= p <= 16:
        raise ValueError("p must be in [4, 16]")
    w = 64 - p

    def partial(t: pa.Table) -> pa.Table:
        h = id_sample_hash(t[value_col])
        reg = (h >> np.uint64(w)).astype(np.int64)
        low = (h & np.uint64((1 << w) - 1)).astype(np.int64)
        _, exp = np.frexp(low.astype(np.float64))  # exact: low < 2^50 <= 2^53
        rho = w - exp + 1  # low == 0 -> exp 0 -> rho w+1
        arr = np.zeros(1 << p, np.int64)
        np.maximum.at(arr, reg, rho)
        touched = np.flatnonzero(arr)
        return pa.table({"reg": pa.array(touched, pa.int64()),
                         "max_rho": pa.array(arr[touched], pa.int64())})

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("reg")
        .aggregate(Max("max_rho", alias_name="max_rho"))
    )


def hll_estimate(registers: pa.Table, *, p: int = 14) -> float:
    """Standard bias-corrected HLL estimate from a register table (small —
    <= 2^p rows — so this is a driver-side reduction).  Linear counting
    below the 2.5m threshold, raw estimate above."""
    m = 1 << p
    reg = np.asarray(registers["reg"], dtype=np.int64)
    rho = np.asarray(registers["max_rho"], dtype=np.int64)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    denom = (m - reg.size) + np.sum(np.exp2(-rho.astype(np.float64)))
    raw = alpha * m * m / denom
    zeros = m - reg.size
    if raw <= 2.5 * m and zeros > 0:
        return m * np.log(m / zeros)
    return float(raw)


def grouped_regression(ds, *, key_col: str, x_col: str, y_col: str):
    """Per-key simple-linear-regression SUFFICIENT STATISTICS — (n, sum_x,
    sum_y, sum_xx, sum_xy) over int64 inputs.  The sums are the regression
    model's exactly-mergeable form (partials add associatively across
    batches / shards / retries — the same merge-law philosophy as the HLL /
    CMS sketch states), so the whole distributed fit gate-checks bit-exactly;
    slope/intercept derive from them downstream (``regression_slope``).

    Scale shape: one vectorized partial per batch (np.unique + scatter-add
    on the touched-key set) then ONE groupby over per-batch partials — the
    shuffle carries rows per (batch, touched key), never per event.

    Caller owns the range contract: inputs must be pre-scaled so that
    n * max(x)^2 stays inside int64 (rebase timestamps to an epoch offset,
    fixed-point values, as the gate row does)."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        k = np.asarray(t[key_col].combine_chunks(), dtype=np.int64)
        x = np.asarray(t[x_col].combine_chunks(), dtype=np.int64)
        y = np.asarray(t[y_col].combine_chunks(), dtype=np.int64)
        uniq, inv = np.unique(k, return_inverse=True)
        out = {key_col: pa.array(uniq, pa.int64())}
        for name, v in (("n", np.ones_like(x)), ("sum_x", x), ("sum_y", y),
                        ("sum_xx", x * x), ("sum_xy", x * y)):
            agg = np.zeros(uniq.size, np.int64)
            np.add.at(agg, inv, v)
            out[name] = pa.array(agg, pa.int64())
        return pa.table(out)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(key_col)
        .aggregate(Sum("n", alias_name="n"),
                   Sum("sum_x", alias_name="sum_x"),
                   Sum("sum_y", alias_name="sum_y"),
                   Sum("sum_xx", alias_name="sum_xx"),
                   Sum("sum_xy", alias_name="sum_xy"))
    )


def regression_slope(stats: pa.Table) -> pa.Table:
    """Derive slope/intercept from grouped_regression output with exact
    integer arithmetic (Python ints: the cross terms n*sum_xy - sum_x*sum_y
    can exceed int64 even when every sum fits).  Small per-key table —
    one column pass, not per-event work."""
    n = stats["n"].to_pylist()
    sx = stats["sum_x"].to_pylist()
    sy = stats["sum_y"].to_pylist()
    sxx = stats["sum_xx"].to_pylist()
    sxy = stats["sum_xy"].to_pylist()
    slope, icept = [], []
    for ni, a, b, c, d in zip(n, sx, sy, sxx, sxy):
        num = ni * d - a * b
        den = ni * c - a * a
        s = num / den if den else float("nan")
        slope.append(s)
        icept.append((b - s * a) / ni if ni else float("nan"))
    return stats.append_column("slope", pa.array(slope, pa.float64())) \
                .append_column("intercept", pa.array(icept, pa.float64()))


def global_rank(ds, *, value_col: str, max_distinct: int = 50_000_000):
    """Exact global RANK() / cumulative count over ``value_col`` WITHOUT a
    global sort: rank = 1 + #rows with a smaller value (SQL RANK() OVER
    (ORDER BY v)), cume_cnt = #rows <= v (COUNT(*) OVER (ORDER BY v) with
    the default RANGE frame) — the primitive under percentile-based
    corpus filtering ("keep the top 10% by quality score").

    Scale shape: per-batch value_counts pre-aggregate, ONE groupby over
    DISTINCT values, a sorted (value -> prefix count) lookup broadcast
    once, then a streaming searchsorted gather per batch.  Shuffle and
    broadcast are O(distinct values) — for fixed-point integer scores
    (this engine's convention) that is bounded regardless of corpus
    size; raises past ``max_distinct`` rather than silently hauling a
    continuous column's full domain to every worker."""
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        vc = t[value_col].combine_chunks().value_counts()
        return pa.table({
            value_col: vc.field("values"),
            "_c": vc.field("counts").cast(pa.int64()),
        })

    dist = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(value_col)
        .aggregate(Sum("_c", alias_name="_c"))
        .materialize()
    )
    n_distinct = dist.count()
    if n_distinct > max_distinct:
        raise ValueError(
            f"global_rank: {n_distinct} distinct values exceeds "
            f"max_distinct={max_distinct}; quantize the column (fixed-point "
            f"scores) or raise the bound")

    def _lookup():
        t = pa.concat_tables([b for b in ray.get(dist.to_arrow_refs())
                              if b.num_rows])
        vals = np.asarray(t[value_col].combine_chunks(), dtype=np.int64)
        cnts = np.asarray(t["_c"].combine_chunks(), dtype=np.int64)
        order = np.argsort(vals)
        vals, cnts = vals[order], cnts[order]
        cume = np.cumsum(cnts)
        return vals, cume

    lut_ref = ray.put(_lookup())

    def attach(t: pa.Table) -> pa.Table:
        vals, cume = ray.get(lut_ref)
        v = np.asarray(t[value_col].combine_chunks(), dtype=np.int64)
        pos = np.searchsorted(vals, v)
        below = np.where(pos > 0, cume[np.maximum(pos - 1, 0)], 0)
        t = t.append_column("rnk", pa.array(below + 1, pa.int64()))
        return t.append_column("cume_cnt", pa.array(cume[pos], pa.int64()))

    return ds.map_batches(attach, batch_format="pyarrow")


def _skyline_block(X: np.ndarray, chunk: int = 2048) -> np.ndarray:
    """Indices of the Pareto frontier of ``X`` (all columns oriented
    MAXIMIZE): rows no other row dominates, where b dominates a iff
    b >= a on every column and b > a on at least one.  Byte-equal rows
    never dominate each other, so duplicates of a frontier point all
    survive — the same semantics as the SQL NOT-EXISTS twin.

    Sorted by column-sum descending so dominators are met early, then each
    chunk is refuted against the surviving frontier and against itself
    with broadcast compares — O(k * |frontier| * d) bytes per chunk, never
    a full k x k matrix."""
    n = X.shape[0]
    if n == 0:
        return np.empty(0, np.int64)
    order = np.argsort(-X.sum(axis=1, dtype=np.float64), kind="stable")
    Xs = X[order]
    sky_rows = []
    sky = np.empty((0, X.shape[1]), X.dtype)
    for s in range(0, n, chunk):
        C = Xs[s:s + chunk]
        alive = np.ones(C.shape[0], bool)
        for t in range(0, sky.shape[0], 4096):
            S = sky[t:t + 4096]
            ge = (S[None, :, :] >= C[:, None, :]).all(axis=2)
            gt = (S[None, :, :] > C[:, None, :]).any(axis=2)
            alive &= ~(ge & gt).any(axis=1)
            if not alive.any():
                break
        if not alive.any():
            continue
        C = C[alive]
        keep_idx = np.flatnonzero(alive)
        ge = (C[None, :, :] >= C[:, None, :]).all(axis=2)
        gt = (C[None, :, :] > C[:, None, :]).any(axis=2)
        dominated = (ge & gt).any(axis=1)
        sel = keep_idx[~dominated]
        sky_rows.append(order[s + sel])
        sky = np.concatenate([sky, C[~dominated]])
    if not sky_rows:
        return np.empty(0, np.int64)
    idx = np.concatenate(sky_rows)
    # a later chunk can dominate earlier survivors (sum order is a
    # heuristic, not a topological guarantee): one exact pass over the
    # collected frontier candidates settles it.
    F = X[idx]
    alive = np.ones(idx.size, bool)
    for t in range(0, idx.size, 4096):
        S = F[t:t + 4096]
        ge = (S[None, :, :] >= F[:, None, :]).all(axis=2)
        gt = (S[None, :, :] > F[:, None, :]).any(axis=2)
        alive &= ~(ge & gt).any(axis=1)
    return np.sort(idx[alive])


def skyline(ds, *, cols, maximize, cap: int = 5_000_000,
            shrink_rounds: int = 3):
    """Distributed Pareto frontier (skyline) over ``cols``: the rows no
    other row dominates (>= everywhere and > somewhere, after orienting
    column i to MAXIMIZE when ``maximize[i]`` else minimize).  Returns the
    surviving rows with their full schema.

    Plan: block-LOCAL skylines first (any globally non-dominated row is
    locally non-dominated, so the filter is lossless); candidates then
    shrink through up to ``shrink_rounds`` coarser local passes (halving
    the partition count each round) until they fit ``cap`` rows, and one
    Ray task computes the exact frontier of the survivors.  On typical
    (even mildly correlated) data the local pass removes ~everything, so
    the exact task sees a tiny set; fully anti-correlated data — where the
    frontier IS the dataset — exceeds ``cap`` and raises rather than
    silently OOMing a worker (same loud-cap contract as the dedup paths).
    """
    import ray
    import ray.data

    if len(cols) != len(maximize) or not cols:
        raise ValueError("need one maximize flag per skyline column")
    sign = np.array([1.0 if m else -1.0 for m in maximize])

    def oriented(t: pa.Table) -> np.ndarray:
        X = np.stack([
            np.asarray(t[c].combine_chunks(), dtype=np.float64)
            for c in cols], axis=1)
        return X * sign

    def local(t: pa.Table) -> pa.Table:
        idx = _skyline_block(oriented(t))
        return t.take(pa.array(idx, pa.int64()))

    cand = ds.map_batches(local, batch_size=None,
                          batch_format="pyarrow").materialize()
    for _ in range(shrink_rounds):
        n = cand.count()
        if n <= cap:
            break
        nb = max(cand.num_blocks() // 2, 1)
        cand = (cand.repartition(nb)
                .map_batches(local, batch_size=None, batch_format="pyarrow")
                .materialize())
    if cand.count() > cap:
        raise ValueError(
            f"skyline candidates ({cand.count()}) exceed cap ({cap}): the "
            "frontier itself is near the data size (anti-correlated "
            "columns); raise cap or reduce dimensions")

    @ray.remote
    def final(tabs):
        tabs = ray.get(list(tabs))
        tabs = [x for x in tabs if x.num_rows]
        if not tabs:
            return None
        t = pa.concat_tables(tabs).combine_chunks()
        idx = _skyline_block(oriented(t))
        return t.take(pa.array(idx, pa.int64()))

    out = ray.get(final.remote(cand.to_arrow_refs()))
    if out is None:
        return cand  # empty in == empty out, schema preserved
    return ray.data.from_arrow(out)


def rrf_fuse(ds, *, rank_cols, k: int = 60, scale: int = 1_000_000,
             max_distinct: int = 50_000_000):
    """Reciprocal Rank Fusion (Cormack, Clarke & Buettcher, SIGIR 2009):
    fuse several rankings of the same rows into one score,
    ``rrf = sum_i scale // (k + rank_i)``, integer-exact so the
    ROW_NUMBER SQL twin hash-matches bit-exactly.

    Each ranking is an int64 column whose ASCENDING order is the ranking;
    callers pack tiebreaks (e.g. the row id) into the key so every value
    is unique and rank == row number.  Same scale shape as global_rank:
    per-ranking distinct-value shuffles (bounded by ``max_distinct``,
    loud failure beyond), sorted prefix-count LUTs broadcast once, one
    streaming attach pass — the raw table never sorts or re-shuffles.

    Returns ``ds`` with an appended int64 ``rrf`` column.
    """
    import ray
    from ray.data.aggregate import Sum

    if not rank_cols:
        raise ValueError("need at least one ranking column")
    kk = np.int64(k)
    sc = np.int64(scale)

    luts = []
    for col in rank_cols:
        def partial(t: pa.Table, col=col) -> pa.Table:
            vc = t[col].combine_chunks().value_counts()
            return pa.table({"v": vc.field("values").cast(pa.int64()),
                             "_c": vc.field("counts").cast(pa.int64())})

        dist = (ds.map_batches(partial, batch_format="pyarrow")
                .groupby("v").aggregate(Sum("_c", alias_name="_c"))
                .materialize())
        if dist.count() > max_distinct:
            raise ValueError(
                f"rrf_fuse: ranking column {col!r} has more than "
                f"{max_distinct} distinct values; pack coarser keys")

        @ray.remote
        def lut(tabs):
            tabs = ray.get(list(tabs))
            t = pa.concat_tables([x for x in tabs if x.num_rows])
            vals = np.asarray(t["v"], dtype=np.int64)
            cnts = np.asarray(t["_c"], dtype=np.int64)
            order = np.argsort(vals)
            return vals[order], np.cumsum(cnts[order])

        luts.append(lut.remote(dist.to_arrow_refs()))

    def attach(t: pa.Table) -> pa.Table:
        tables = ray.get(luts)  # list of refs resolves in one call
        rrf = np.zeros(t.num_rows, np.int64)
        for col, (vals, cume) in zip(rank_cols, tables):
            v = np.asarray(t[col].combine_chunks(), dtype=np.int64)
            pos = np.searchsorted(vals, v)
            rank = np.where(pos > 0, cume[np.maximum(pos - 1, 0)], 0) + 1
            rrf += sc // (kk + rank)
        return t.append_column("rrf", pa.array(rrf, pa.int64()))

    return ds.map_batches(attach, batch_format="pyarrow")


def grouped_mad(ds, *, key_col: str, val_col: str,
                broadcast_rows: int = 20_000_000, num_buckets: int = 256):
    """Per-key MEDIAN and MAD (median absolute deviation) of an int64
    value column — the robust location/scale pair outlier filters use
    where mean/std are skew-poisoned.  quantile_disc semantics throughout
    (grouped_quantiles' contract), so values stay integer-exact.

    Two grouped-quantile passes composed scale-safely: medians (key-sized)
    come back per key, broadcast as sorted arrays up to ``broadcast_rows``
    keys (hash join beyond — the cohort_retention tiering), the residual
    pass re-shuffles |v - med| through the same bucketed-merge quantile
    kernel.

    Returns Dataset[key_col, n, med, mad].
    """
    import ray
    from ray.data.aggregate import Sum

    med = grouped_quantiles(ds, key_col=key_col, val_col=val_col,
                            qs=(0.5,), num_buckets=num_buckets).materialize()

    def _resid_bcast(ref):
        def resid(t: pa.Table) -> pa.Table:
            ks, ms = ray.get(ref)
            k = np.asarray(t[key_col].combine_chunks(), dtype=np.int64)
            v = np.asarray(t[val_col].combine_chunks(), dtype=np.int64)
            m = ms[np.searchsorted(ks, k)]  # every key has a median row
            return pa.table({key_col: pa.array(k, pa.int64()),
                             "_r": pa.array(np.abs(v - m), pa.int64())})
        return resid

    if med.count() <= broadcast_rows:
        @ray.remote
        def prep(tabs):
            tabs = ray.get(list(tabs))
            t = pa.concat_tables([x for x in tabs if x.num_rows])
            k = np.asarray(t[key_col], dtype=np.int64)
            m = np.asarray(t["q50"], dtype=np.int64)
            order = np.argsort(k)
            return k[order], m[order]

        resid = _resid_bcast(prep.remote(med.to_arrow_refs()))
        rds = ds.map_batches(resid, batch_format="pyarrow")
    else:
        from .dedup import _num_join_partitions

        j = ds.join(med, "inner", _num_join_partitions(ds, med),
                    on=(key_col,))

        def resid(t: pa.Table) -> pa.Table:
            k = np.asarray(t[key_col].combine_chunks(), dtype=np.int64)
            v = np.asarray(t[val_col].combine_chunks(), dtype=np.int64)
            m = np.asarray(t["q50"].combine_chunks(), dtype=np.int64)
            return pa.table({key_col: pa.array(k, pa.int64()),
                             "_r": pa.array(np.abs(v - m), pa.int64())})

        rds = j.map_batches(resid, batch_format="pyarrow")

    mad = grouped_quantiles(rds, key_col=key_col, val_col="_r",
                            qs=(0.5,), num_buckets=num_buckets)

    def label_mad(t: pa.Table) -> pa.Table:
        return pa.table({key_col: t[key_col], "n": t["n"],
                         "mad": t["q50"]})

    def label_med(t: pa.Table) -> pa.Table:
        return pa.table({key_col: t[key_col], "med": t["q50"]})

    # scrub before the join: map_batches downstream of the quantile
    # shuffle can emit zero-row schemaless blocks that break acero's
    # key resolution (see util.drop_schemaless_empty_blocks)
    from ..util import drop_schemaless_empty_blocks
    from .dedup import _num_join_partitions

    mad_schema = pa.table({key_col: pa.array([], pa.int64()),
                           "n": pa.array([], pa.int64()),
                           "mad": pa.array([], pa.int64())})
    med_schema = pa.table({key_col: pa.array([], pa.int64()),
                           "med": pa.array([], pa.int64())})
    mad = drop_schemaless_empty_blocks(
        mad.map_batches(label_mad, batch_format="pyarrow").materialize(),
        mad_schema)
    medl = drop_schemaless_empty_blocks(
        med.map_batches(label_med, batch_format="pyarrow").materialize(),
        med_schema)

    out = medl.join(mad, "inner", _num_join_partitions(medl, mad),
                    on=(key_col,))
    return out.select_columns([key_col, "n", "med", "mad"])


def mad_outliers(ds, *, key_col: str, val_col: str, k_milli: int = 3000,
                 broadcast_rows: int = 20_000_000, num_buckets: int = 256):
    """Robust per-key outlier filter: keep rows whose value deviates from
    the key's MEDIAN by strictly more than ``k_milli/1000`` MADs — the
    skew-safe replacement for mean±k·std quality gates (a handful of spam
    megadocs poisons a mean; the median/MAD pair shrugs).

    Integer-exact throughout: the test is ``1000*|v - med| > k_milli*mad``
    over int64, so there is no float tolerance anywhere (mad == 0 degrades
    to "any deviation is an outlier", matching the SQL twin).

    Stats come from :func:`grouped_mad` (two exact grouped-quantile
    shuffles); the row-level pass broadcasts the (key, med, mad) table as
    sorted arrays up to ``broadcast_rows`` keys and hash-joins beyond —
    the same tiering every small-side attach in this repo uses.

    Returns Dataset[input columns..., med, mad] — flagged rows only.
    """
    import ray

    stats = grouped_mad(ds, key_col=key_col, val_col=val_col,
                        broadcast_rows=broadcast_rows,
                        num_buckets=num_buckets).materialize()
    k_milli = int(k_milli)

    if stats.count() <= broadcast_rows:
        @ray.remote
        def prep(*tabs):
            t = pa.concat_tables([x for x in tabs if x.num_rows])
            k = np.asarray(t[key_col], dtype=np.int64)
            order = np.argsort(k)
            return (k[order],
                    np.asarray(t["med"], dtype=np.int64)[order],
                    np.asarray(t["mad"], dtype=np.int64)[order])

        ref = prep.remote(*stats.to_arrow_refs())

        def flag(t: pa.Table) -> pa.Table:
            ks, med, mad = ray.get(ref)
            k = np.asarray(t[key_col].combine_chunks(), dtype=np.int64)
            v = np.asarray(t[val_col].combine_chunks(), dtype=np.int64)
            pos = np.searchsorted(ks, k)  # every key has a stats row
            m, s = med[pos], mad[pos]
            keep = 1000 * np.abs(v - m) > k_milli * s
            out = t.filter(pa.array(keep))
            return (out.append_column("med", pa.array(m[keep], pa.int64()))
                       .append_column("mad", pa.array(s[keep], pa.int64())))

        return ds.map_batches(flag, batch_format="pyarrow")

    from .dedup import _num_join_partitions

    j = ds.join(stats.select_columns([key_col, "med", "mad"]), "inner",
                _num_join_partitions(ds, stats), on=(key_col,))

    def flag_joined(t: pa.Table) -> pa.Table:
        v = np.asarray(t[val_col].combine_chunks(), dtype=np.int64)
        m = np.asarray(t["med"].combine_chunks(), dtype=np.int64)
        s = np.asarray(t["mad"].combine_chunks(), dtype=np.int64)
        return t.filter(pa.array(1000 * np.abs(v - m) > k_milli * s))

    return j.map_batches(flag_joined, batch_format="pyarrow")


def rollup_sums(ds, *, cat_col: str, bucket_col: str, vm_col: str,
                all_label: str = "ALL", sentinel: int = -1):
    """ROLLUP / GROUPING SETS ((cat, bucket), (cat), ()) of count + sum in
    ONE input scan: each batch pre-aggregates to finest-level partials, one
    small shuffle reduces them, and the two coarser levels are derived from
    the FINEST AGGREGATE (never a rescan of the input — at 100 TB the
    input streams once and the re-aggregation runs over a keys-sized
    table).

    Returns Dataset[cat_col, bucket_col, n, sum_vm] with the coarser
    levels encoded as ``all_label`` / ``sentinel`` (the COALESCE encoding
    a SQL GROUPING SETS twin emits).
    """
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        g = (pa.table({cat_col: t[cat_col], bucket_col: t[bucket_col],
                       "vm": t[vm_col]})
             .group_by([cat_col, bucket_col])
             .aggregate([([], "count_all"), ("vm", "sum")]))
        g = g.select([cat_col, bucket_col, "count_all", "vm_sum"])
        return g.rename_columns([cat_col, bucket_col, "n_p", "s_p"])

    fine = (ds.map_batches(partial, batch_format="pyarrow")
            .groupby([cat_col, bucket_col])
            .aggregate(Sum("n_p", alias_name="n"),
                       Sum("s_p", alias_name="sum_vm"))
            .materialize())

    def relabel_l2(t: pa.Table) -> pa.Table:
        return t.select([cat_col, bucket_col, "n", "sum_vm"])

    l2 = fine.map_batches(relabel_l2, batch_format="pyarrow")

    def pre_l1(t: pa.Table) -> pa.Table:
        g = (t.select([cat_col, "n", "sum_vm"])
             .group_by(cat_col).aggregate([("n", "sum"), ("sum_vm", "sum")]))
        g = g.select([cat_col, "n_sum", "sum_vm_sum"])
        return g.rename_columns([cat_col, "n_p", "s_p"])

    def finish_l1(t: pa.Table) -> pa.Table:
        return pa.table({
            cat_col: t[cat_col],
            bucket_col: pa.array(
                np.full(t.num_rows, sentinel, np.int64), pa.int64()),
            "n": t["n"], "sum_vm": t["sum_vm"]})

    l1 = (fine.map_batches(pre_l1, batch_format="pyarrow")
          .groupby(cat_col)
          .aggregate(Sum("n_p", alias_name="n"),
                     Sum("s_p", alias_name="sum_vm"))
          .map_batches(finish_l1, batch_format="pyarrow"))

    def pre_l0(t: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        return pa.table({
            "k": pa.array([0], pa.int64()),
            "n_p": pa.array([_pc.sum(t["n"]).as_py() or 0], pa.int64()),
            "s_p": pa.array([_pc.sum(t["sum_vm"]).as_py() or 0], pa.int64()),
        })

    def finish_l0(t: pa.Table) -> pa.Table:
        return pa.table({
            cat_col: pa.array([all_label] * t.num_rows, pa.string()),
            bucket_col: pa.array(
                np.full(t.num_rows, sentinel, np.int64), pa.int64()),
            "n": t["n"], "sum_vm": t["sum_vm"]})

    l0 = (fine.map_batches(pre_l0, batch_format="pyarrow")
          .groupby("k")
          .aggregate(Sum("n_p", alias_name="n"),
                     Sum("s_p", alias_name="sum_vm"))
          .map_batches(finish_l0, batch_format="pyarrow"))

    return l2.union(l1).union(l0)


def grouped_mode(ds, *, key_col: str, cat_col: str, num_buckets: int = 256):
    """Per-key MODE of a categorical column: the most frequent category,
    ties broken to the lexicographically smallest category — deterministic,
    so a ROW_NUMBER SQL twin hash-matches.

    Pre-aggregates (key, cat) counts inside every batch, reduces them with
    ONE groupby shuffle (the wide step carries counts, not rows), then a
    bucketed argmax resolves every key with one lexsort over
    (key, -count, cat-rank) — no Python per key.

    Returns Dataset[key_col, top, n].
    """
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        g = (pa.table({key_col: t[key_col], "cat": t[cat_col]})
             .group_by([key_col, "cat"]).aggregate([([], "count_all")]))
        return (g.select([key_col, "cat", "count_all"])
                .rename_columns([key_col, "cat", "n_p"]))

    counts = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby([key_col, "cat"])
              .aggregate(Sum("n_p", alias_name="n")))

    def bucketize(t: pa.Table) -> pa.Table:
        from ..util import knuth_bucket

        key = np.asarray(t[key_col].combine_chunks(), dtype=np.int64)
        return t.append_column(
            "part", pa.array(knuth_bucket(key, num_buckets), pa.int64()))

    empty = pa.table({key_col: pa.array([], pa.int64()),
                      "top": pa.array([], pa.string()),
                      "n": pa.array([], pa.int64())})

    def per_bucket(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty
        key = np.asarray(t[key_col].combine_chunks(), dtype=np.int64)
        n = np.asarray(t["n"].combine_chunks(), dtype=np.int64)
        cat = t["cat"].combine_chunks().cast(pa.string())
        # rank categories by byte order so the tie-break is vectorized
        ucat, code = np.unique(np.asarray(cat, dtype=object), return_inverse=True)
        order = np.lexsort((code, -n, key))
        key, n, code = key[order], n[order], code[order]
        starts = np.flatnonzero(np.concatenate([[True], key[1:] != key[:-1]]))
        return pa.table({
            key_col: pa.array(key[starts], pa.int64()),
            "top": pa.array(ucat[code[starts]].tolist(), pa.string()),
            "n": pa.array(n[starts], pa.int64()),
        })

    return (counts.map_batches(bucketize, batch_format="pyarrow")
            .groupby("part").map_groups(per_bucket, batch_format="pyarrow"))


def profile_columns(ds, columns):
    """One-scan data-quality PROFILE of ``columns`` (int64 or string):
    Dataset[col_name, n_rows, n_null, n_distinct, min_i, max_i, min_s,
    max_s] — the ingest-validation primitive (row counts, null rates,
    cardinalities, ranges) every 100 TB pipeline runs before training.

    Typed min/max lanes keep every value native-exact: integer columns
    fill (min_i, max_i) and leave the string lane NULL, string columns the
    reverse — no cross-type casts whose formatting could drift from SQL.
    Plan: per-batch stat partials (8 tiny rows per batch) + per-batch
    DISTINCT (col, value) pairs -> one groupby(col) for the stats, the
    two-level distinct plan (pair groupby, then count) for cardinality,
    then a left_outer join of the two ncols-row results.  The shuffle
    carries only distinct pairs and constant-size partials."""
    import ray.data
    from ray.data.aggregate import Count, Max, Min, Sum

    cols = list(columns)

    def stat_partial(t: pa.Table) -> pa.Table:
        names, nrows, nnull = [], [], []
        min_i, max_i, min_s, max_s = [], [], [], []
        for c in cols:
            col = t[c].combine_chunks()
            names.append(c)
            nrows.append(t.num_rows)
            nnull.append(col.null_count)
            if pa.types.is_integer(col.type):
                mm = pc.min_max(col)
                min_i.append(mm["min"].as_py()); max_i.append(mm["max"].as_py())
                min_s.append(None); max_s.append(None)
            else:
                mm = pc.min_max(col.cast(pa.string()))
                min_s.append(mm["min"].as_py()); max_s.append(mm["max"].as_py())
                min_i.append(None); max_i.append(None)
        return pa.table({
            "col_name": pa.array(names, pa.string()),
            "n_rows": pa.array(nrows, pa.int64()),
            "n_null": pa.array(nnull, pa.int64()),
            "min_i": pa.array(min_i, pa.int64()),
            "max_i": pa.array(max_i, pa.int64()),
            "min_s": pa.array(min_s, pa.string()),
            "max_s": pa.array(max_s, pa.string()),
        })

    stats = (ds.map_batches(stat_partial, batch_format="pyarrow")
             .groupby("col_name").aggregate(
                 Sum("n_rows", alias_name="n_rows"),
                 Sum("n_null", alias_name="n_null"),
                 Min("min_i", alias_name="min_i"),
                 Max("max_i", alias_name="max_i"),
                 Min("min_s", alias_name="min_s"),
                 Max("max_s", alias_name="max_s")))

    def retype(t: pa.Table) -> pa.Table:
        # a block whose min/max lane is ALL null comes out of the aggregate
        # as Arrow's null type, which the hash join refuses as a non-key
        # field — pin the declared lane types
        return pa.table({
            "col_name": t["col_name"].cast(pa.string()),
            "n_rows": t["n_rows"].cast(pa.int64()),
            "n_null": t["n_null"].cast(pa.int64()),
            "min_i": t["min_i"].cast(pa.int64()),
            "max_i": t["max_i"].cast(pa.int64()),
            "min_s": t["min_s"].cast(pa.string()),
            "max_s": t["max_s"].cast(pa.string()),
        })

    stats = stats.map_batches(retype, batch_format="pyarrow")

    def pair_partial(t: pa.Table) -> pa.Table:
        names, vals = [], []
        for c in cols:
            col = pc.drop_null(t[c].combine_chunks())
            v = pc.unique(col.cast(pa.string()))
            vals.append(v)
            names.append(pa.array(np.full(len(v), c, dtype=object), pa.string()))
        return pa.table({"col_name": pa.concat_arrays(names),
                         "v": pa.concat_arrays([v.combine_chunks() if isinstance(v, pa.ChunkedArray) else v for v in vals])})

    pairs = (ds.map_batches(pair_partial, batch_format="pyarrow")
             .groupby(["col_name", "v"]).aggregate(Count(alias_name="_c")))
    distinct = (pairs.map_batches(lambda t: t.select(["col_name"]),
                                  batch_format="pyarrow")
                .groupby("col_name").aggregate(Count(alias_name="n_distinct")))

    joined = stats.join(distinct, "left_outer", 2, on=("col_name",))

    def finish(t: pa.Table) -> pa.Table:
        nd = pc.coalesce(t["n_distinct"], pa.scalar(0, pa.int64()))
        return pa.table({
            "col_name": t["col_name"],
            "n_rows": t["n_rows"].cast(pa.int64()),
            "n_null": t["n_null"].cast(pa.int64()),
            "n_distinct": nd.cast(pa.int64()) if isinstance(nd, (pa.Array, pa.ChunkedArray)) else pa.array([nd.as_py()] * t.num_rows, pa.int64()),
            "min_i": t["min_i"],
            "max_i": t["max_i"],
            "min_s": t["min_s"],
            "max_s": t["max_s"],
        })

    return joined.map_batches(finish, batch_format="pyarrow")
