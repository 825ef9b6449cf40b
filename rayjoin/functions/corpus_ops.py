"""Corpus curation operators for large-scale training-data pipelines:
deterministic stratified sampling, per-key document caps, benchmark
decontamination, and token-budget sequence packing.

All four are streaming ``map_batches`` compositions with at most one wide
operation each; every wide step's partitioning assumption is documented on
the operator.  SQL oracles live in ``rayjoin.pipelines.gate``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def id_sample_hash(id_col) -> np.ndarray:
    """The sampling hash (uint64): fnv1a64 of the id rendered as a string.
    ONE definition shared by ``stratified_sample`` and the exact-k sampler
    (pipelines/gate.py q_sample_exact_k) so the engine and its SQL twin
    (``_sql_fnv("CAST(id AS VARCHAR)")``) cannot drift apart."""
    from ..stages.geocode import fnv1a64

    arr = (id_col.combine_chunks()
           if isinstance(id_col, pa.ChunkedArray) else id_col)
    return fnv1a64(pc.cast(arr, pa.string()))


def stratified_sample(ds, rates: dict, *, mod: int = 1000,
                      id_col: str = "doc_id", strat_col: str = "lang",
                      default_rate: int = 0):
    """Deterministic hash-based stratified sampling: keep a row iff
    ``fnv1a64(str(id)) % mod < rates[stratum]``.

    The keep decision is a pure function of the row (no RNG state, no
    shuffle, no pass over the data to size strata), so the sample is
    reproducible under any partitioning / retry order and the stage is
    embarrassingly parallel — the right shape for downsampling a 100 TB
    corpus where per-stratum rates come from a policy table, not from
    counting.  Rates are per-``mod`` integers (e.g. 500/1000 = 50%).
    Output: the input rows plus ``samp_hash`` (the bucket the row hashed
    to, for auditability).
    """
    strata = sorted(rates)
    rate_np = np.array([rates[s] for s in strata] + [default_rate], np.int64)
    value_set = pa.array(strata, pa.string())

    def keep(t: pa.Table) -> pa.Table:
        h = id_sample_hash(t[id_col])
        bucket = (h % np.uint64(mod)).astype(np.int64)
        idx = pc.index_in(t[strat_col].combine_chunks(), value_set=value_set)
        idx = np.asarray(idx.fill_null(len(strata)), dtype=np.int64)
        m = bucket < rate_np[idx]
        return t.append_column("samp_hash", pa.array(bucket, pa.int64())).filter(
            pa.array(m, pa.bool_())
        )

    return ds.map_batches(keep, batch_format="pyarrow")


def extract_domain(url_col) -> pa.Array:
    """Vectorized host extraction from a URL column (scheme://host/...)."""
    arr = url_col.combine_chunks() if isinstance(url_col, pa.ChunkedArray) else url_col
    s = pc.extract_regex(arr, pattern=r"^[a-z][a-z0-9+.-]*://(?P<host>[^/]+)")
    return pc.struct_field(s, "host")


def cap_per_key(ds, *, key_col: str, cap: int, order_col: str, id_col: str,
                num_buckets: int = 256):
    """Keep the top-``cap`` rows per key, ordered by (``order_col`` DESC,
    ``id_col`` ASC); output gains ``rk`` (1-based rank within key).

    Scale plan: each batch first keeps its LOCAL top-cap per key (the
    global top-cap is a subset of the union of per-batch top-caps), so the
    shuffle moves <= cap rows per (key, batch) instead of every row of hot
    keys.  The wide step is ONE groupby on a hashed key bucket (bounded
    fan-in: ~``num_buckets`` groups regardless of key cardinality — a
    per-key ``map_groups`` would pay ~100us of Python per distinct key),
    with an Arrow multi-column sort + vectorized rank inside each bucket.
    """
    from ..functions.dedup import _mix64
    from ..stages.geocode import fnv1a64
    from ..util import rank_within_sorted_groups

    def rank_within(t: pa.Table) -> tuple:
        """Sort by (key, -order, id); return (sorted table, rank array).
        NULL keys (e.g. an unparseable URL upstream) each rank as their own
        singleton (rk=1, never capped): a per-key cap cannot apply without
        a key, and collapsing nulls into one pseudo-key would silently
        drop all but ``cap`` of them (/code-review r3)."""
        idx = pc.sort_indices(
            t,
            sort_keys=[(key_col, "ascending"), (order_col, "descending"),
                       (id_col, "ascending")],
        )
        t = t.take(idx)
        enc = t[key_col].combine_chunks().dictionary_encode()
        codes = np.asarray(enc.indices.fill_null(-1), dtype=np.int64)
        null = codes < 0
        if null.any():
            # unique negative code per null row -> every null is a singleton
            codes = codes.copy()
            codes[null] = -1 - np.arange(np.count_nonzero(null), dtype=np.int64)
        rk = rank_within_sorted_groups(codes) + 1
        return t, rk

    def local_cap(t: pa.Table) -> pa.Table:
        t, rk = rank_within(t)
        t = t.filter(pa.array(rk <= cap, pa.bool_()))
        h = _mix64(fnv1a64(t[key_col].combine_chunks()))
        return t.append_column(
            "_bucket", pa.array((h % np.uint64(num_buckets)).astype(np.int64), pa.int64())
        )

    def bucket_cap(t: pa.Table) -> pa.Table:
        t, rk = rank_within(t.drop_columns(["_bucket"]))
        t = t.append_column("rk", pa.array(rk, pa.int64()))
        return t.filter(pa.array(rk <= cap, pa.bool_()))

    return (
        ds.map_batches(local_cap, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(bucket_cap, batch_format="pyarrow")
    )


def domain_cap(pages_ds, *, cap: int = 3, url_col: str = "url",
               text_col: str = "text", id_col: str = "doc_id"):
    """Per-domain document cap (the Common-Crawl "no domain dominates"
    rule): keep at most ``cap`` pages per URL host, preferring longer
    text (ties by id).  Output: id, domain, tlen, rk."""

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: t[id_col],
                "domain": extract_domain(t[url_col]),
                "tlen": pc.cast(pc.utf8_length(t[text_col].combine_chunks()), pa.int64()),
            }
        )

    return cap_per_key(
        pages_ds.map_batches(prep, batch_format="pyarrow"),
        key_col="domain", cap=cap, order_col="tlen", id_col=id_col,
    )


def benchmark_ngram_ref(benchmark_ds, *, n: int = 8, text_col: str = "text",
                        max_bytes: int = 2 << 30):
    """Collect the DISTINCT token-``n``-gram hashes of a benchmark corpus
    into one sorted uint64 array in the object store; returns the ObjectRef.

    The benchmark side of decontamination is small BY NATURE (eval sets,
    not the corpus), so a broadcast set is the right physical plan — the
    corpus side then never shuffles at all.  Per-batch distinct hashes are
    computed DISTRIBUTED (map_batches); the final unique+sort of the
    (already-deduplicated) partials runs in a RAY TASK, not the driver,
    and only the ObjectRef comes back.  ``max_bytes`` guards against a
    'benchmark' that is actually corpus-sized."""
    import ray

    from .text import _binary_u64, token_hash_sets

    def partial(t: pa.Table) -> pa.Table:
        blobs, _ = token_hash_sets(t, text_col=text_col, n=n)
        vals, _ = _binary_u64(blobs)
        u = np.unique(vals)
        return pa.table({"h": pa.array(u.view(np.int64), pa.int64())})

    parts = benchmark_ds.map_batches(partial, batch_format="pyarrow").materialize()
    try:
        nbytes = parts.size_bytes()
    except Exception:
        nbytes = None
    if nbytes is not None and nbytes > max_bytes:
        raise ValueError(
            f"benchmark n-gram set is {nbytes >> 20} MiB (> {max_bytes >> 20} MiB); "
            "a corpus-sized 'benchmark' needs the join-based plan, not broadcast"
        )

    @ray.remote
    def merge(*tabs):
        tabs = [t for t in tabs if t.num_rows]
        if not tabs:
            return np.empty(0, np.uint64)
        allv = pa.concat_tables(tabs)["h"].combine_chunks()
        return np.unique(np.asarray(allv, dtype=np.int64).view(np.uint64))

    return merge.remote(*parts.to_arrow_refs())


def decontaminate(docs_ds, bench_ref, *, n: int = 8, id_col: str = "doc_id",
                  text_col: str = "text", keep_clean: bool = False):
    """Flag (or drop) corpus docs sharing any token ``n``-gram with the
    benchmark set referenced by ``bench_ref`` (from ``benchmark_ngram_ref``).

    Default output: the CONTAMINATED docs as (id, n_hits) where n_hits =
    number of DISTINCT contaminated n-grams in the doc; ``keep_clean=True``
    instead returns the clean rows of the input (the filter you compose
    into a pipeline).  Pure streaming: one broadcast array, one searchsorted
    membership test per batch, no shuffle."""
    import ray

    from .text import _binary_u64, token_hash_sets

    def score(t: pa.Table) -> pa.Table:
        bench = ray.get(bench_ref)
        blobs, counts = token_hash_sets(t, text_col=text_col, n=n)
        vals, lens = _binary_u64(blobs)
        if bench.size:
            pos = np.searchsorted(bench, vals)
            pos[pos >= bench.size] = 0
            hit = bench[pos] == vals
        else:
            hit = np.zeros(vals.size, bool)
        doc_of = np.repeat(np.arange(lens.size, dtype=np.int64), lens)
        n_hits = np.bincount(doc_of[hit], minlength=lens.size).astype(np.int64)
        if keep_clean:
            return t.filter(pa.array(n_hits == 0, pa.bool_()))
        out = pa.table(
            {id_col: t[id_col], "n_hits": pa.array(n_hits, pa.int64())}
        )
        return out.filter(pa.array(n_hits > 0, pa.bool_()))

    return docs_ds.map_batches(score, batch_format="pyarrow")


def pack_sequences(docs_ds, *, budget: int = 512, shard_rows: int = 65536,
                   id_col: str = "doc_id", group_col: str = "lang",
                   text_col: str = "text", strategy: str = "next_fit"):
    """Token-budget sequence packing: within each (group, shard) — shard =
    id // shard_rows — docs are assigned to bins whose token totals never
    exceed ``budget`` (a doc longer than the budget gets a bin of its
    own).  Output: id, group, shard, n_tokens, bin_id (0-based within its
    (group, shard)).

    ``strategy``:
    - ``"next_fit"`` (default): docs in id order, appended to the current
      bin until one would overflow it.  Preserves document adjacency
      (neighbouring ids land in the same bin) — the right choice when the
      corpus is ordered (e.g. chunks of the same source document).
    - ``"fold"``: sorted big-small folding, the first-fit-decreasing-class
      heuristic — docs sorted by n_tokens descending; each bin takes the
      largest remaining doc then the longest run of smallest remaining
      docs that still fits.  Higher bin utilization when sizes vary (the
      per-bin waste is ~half the SMALLEST doc instead of ~half the mean);
      gives up adjacency.

    Partitioning assumption (by design): bins NEVER span shards, which is
    what makes packing embarrassingly parallel — each (group, shard) packs
    independently and a global pass ordering 10^11 docs is never needed.
    ``shard_rows`` trades tail waste (one under-full bin per shard) for
    parallelism; at 100 TB with shard_rows=65536 the waste is <0.002%.
    The wide step is one groupby((group, shard)); per-group Python cost is
    one searchsorted per BIN, not per doc (both strategies)."""
    if strategy not in ("next_fit", "fold"):
        raise ValueError(f"unknown packing strategy: {strategy!r}")

    def prep(t: pa.Table) -> pa.Table:
        text = t[text_col].combine_chunks()
        ids = np.asarray(t[id_col].combine_chunks(), dtype=np.int64)
        # token count == separator count + 1 (identical to len(split),
        # including empty strings and runs of spaces) WITHOUT materializing
        # the token lists — this stage only needs the lengths
        ntok = pc.add(pc.count_substring(text, pattern=" "), 1)
        return pa.table(
            {
                id_col: t[id_col],
                group_col: t[group_col],
                "shard": pa.array(ids // shard_rows, pa.int64()),
                "n_tokens": pc.cast(ntok, pa.int64()),
            }
        )

    def pack_group(t: pa.Table) -> pa.Table:
        order = pc.sort_indices(t, sort_keys=[(id_col, "ascending")])
        t = t.take(order)
        ntok = np.asarray(t["n_tokens"].combine_chunks(), dtype=np.int64)
        cum = np.cumsum(ntok)
        starts = []
        s = 0
        while s < ntok.size:
            starts.append(s)
            base = cum[s - 1] if s else 0
            e = int(np.searchsorted(cum, base + budget, side="right"))
            s = max(e, s + 1)
        starts = np.asarray(starts, np.int64)
        bin_id = np.searchsorted(starts, np.arange(ntok.size), side="right") - 1
        return t.append_column("bin_id", pa.array(bin_id, pa.int64()))

    def pack_group_fold(t: pa.Table) -> pa.Table:
        # Descending by n_tokens, id ascending as the deterministic
        # tie-break (groupby delivers rows in arbitrary block order).
        order = pc.sort_indices(
            t, sort_keys=[("n_tokens", "descending"), (id_col, "ascending")]
        )
        t = t.take(order)
        ntok = np.asarray(t["n_tokens"].combine_chunks(), dtype=np.int64)
        n = ntok.size
        # asc[j] = j-th SMALLEST size; desc position b corresponds to asc
        # position n-1-b.  asc_cum makes "longest run of smalls fitting in
        # the residual capacity" one searchsorted.
        asc_cum = np.cumsum(ntok[::-1])
        bin_of_desc = np.empty(n, np.int64)
        b = 0  # next big (desc index)
        c = 0  # smalls consumed (asc index)
        nbins = 0
        while b + c < n:
            cap = budget - int(ntok[b])
            avail = n - 1 - b - c  # smalls left strictly after taking big b
            base = asc_cum[c - 1] if c else 0
            d = int(np.searchsorted(asc_cum, base + cap, side="right")) - c
            d = min(max(d, 0), avail)
            bin_of_desc[b] = nbins
            if d:
                # asc positions [c, c+d) are desc positions [n-c-d, n-c)
                bin_of_desc[n - c - d: n - c] = nbins
            c += d
            b += 1
            nbins += 1
        return t.append_column("bin_id", pa.array(bin_of_desc, pa.int64()))

    packer = pack_group if strategy == "next_fit" else pack_group_fold
    return (
        docs_ds.map_batches(prep, batch_format="pyarrow")
        .groupby([group_col, "shard"])
        .map_groups(packer, batch_format="pyarrow")
    )


# --- PII-style redaction -----------------------------------------------------

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?[0-9][0-9\- ]{7,}[0-9]"
DEFAULT_REDACTIONS = ((EMAIL_RE, "[EMAIL]"), (PHONE_RE, "[PHONE]"))


def mixture_sample(ds, *, key_col: str, id_col: str, target_total: int,
                   temperature: float = 2.0):
    """Temperature-smoothed source mixing (the training-data 'mix sources
    by count^(1/T)' rule): per source s with n_s docs, keep the

        t_s = min(n_s, target_total * w_s // W)      (integer arithmetic)

    docs with the LOWEST sampling hash, where w_s is the smoothed weight
    and W = sum w_s.  Exact-arithmetic temperatures only (a float pow is
    not bit-portable between numpy and SQL):

      T=1   -> w_s = n_s                (proportional)
      T=2   -> w_s = floor(1000*sqrt(n_s))  (sqrt smoothing; sqrt IS
               bit-exact vs libm)
      T=inf -> w_s = 1                  (uniform across sources)

    Per-source counts reach the driver (source cardinality is tiny by
    construction — it is a SOURCE label); doc selection reuses
    ``cap_per_key``'s bounded shuffle with the shared sampling hash, then a
    broadcast per-key limit prunes rk > t_s.  Output keeps ``rk``."""
    import math

    import ray
    import ray.data
    from ray.data.aggregate import Count

    counts = (ds.groupby(key_col).aggregate(Count(alias_name="n"))
              .to_pandas())
    if counts.empty:
        return ds
    n = counts["n"].to_numpy().astype(np.int64)
    if temperature == 1.0:
        w = n.copy()
    elif temperature == 2.0:
        w = np.floor(np.sqrt(n.astype(np.float64)) * 1000.0).astype(np.int64)
    elif math.isinf(temperature):
        w = np.ones_like(n)
    else:
        raise ValueError(
            "mixture_sample supports exact temperatures 1.0, 2.0, inf only "
            f"(got {temperature}): arbitrary T needs pow, which is not "
            "bit-portable")
    W = int(w.sum())
    t = np.minimum(n, (int(target_total) * w) // max(W, 1))
    tmap = dict(zip(counts[key_col].tolist(), t.tolist()))
    ref = ray.put(tmap)

    def hashed(tab: pa.Table) -> pa.Table:
        h = id_sample_hash(tab[id_col])
        return tab.append_column(
            "neg_hash",
            pa.array(-(h % np.uint64(1 << 62)).astype(np.int64), pa.int64()),
        )

    capped = cap_per_key(
        ds.map_batches(hashed, batch_format="pyarrow"),
        key_col=key_col, cap=int(t.max()) if t.size else 0,
        order_col="neg_hash", id_col=id_col,
    )

    def limit_filter(tab: pa.Table) -> pa.Table:
        m = ray.get(ref)
        enc = tab[key_col].combine_chunks().dictionary_encode()
        lim = np.array([m.get(k.as_py(), 0) for k in enc.dictionary],
                       np.int64)  # python over UNIQUE keys only
        per_row = lim[np.asarray(enc.indices, dtype=np.int64)]
        keep = np.asarray(tab["rk"].combine_chunks(), np.int64) <= per_row
        return tab.filter(pa.array(keep, pa.bool_()))

    return capped.map_batches(limit_filter, batch_format="pyarrow")


def doc_line_dedup(ds, *, text_col: str = "text", sep: str = "\n"):
    """WITHIN-document line dedup (the Dolma/CCNet in-doc rule): every
    repeated line inside a document keeps only its FIRST occurrence;
    survivors re-join with ``sep`` in original order.  Doc-local — each doc
    lives in one batch, so there is NO shuffle; one split + dictionary
    encode + lexsort per batch, list rebuild via offset arithmetic (no
    per-row Python).

    Returns Dataset[<passthrough cols>, text, n_lines, n_kept] where text
    is the deduped document (corpus-wide dedup is ``paragraph_dedup``;
    this is its cheap in-document sibling)."""

    def per_batch(t: pa.Table) -> pa.Table:
        text = t[text_col].combine_chunks()
        lines = pc.split_pattern(text, pattern=sep)
        nl = np.asarray(pc.list_value_length(lines), dtype=np.int64)
        flat = lines.flatten()
        enc = flat.dictionary_encode()
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = np.asarray(enc.indices, dtype=np.int64)
        nb = nl.size
        doc = np.repeat(np.arange(nb, dtype=np.int64), nl)
        pos = np.arange(codes.size, dtype=np.int64)
        order = np.lexsort((pos, codes, doc))
        d_s, c_s = doc[order], codes[order]
        first = np.concatenate(
            [[True], (d_s[1:] != d_s[:-1]) | (c_s[1:] != c_s[:-1])]
        ) if d_s.size else np.empty(0, bool)
        keep = np.zeros(codes.size, bool)
        keep[order[first]] = True  # first occurrence in original position
        n_kept = np.bincount(doc[keep], minlength=nb) if doc.size else \
            np.zeros(nb, np.int64)
        new_off = np.concatenate([[0], np.cumsum(n_kept)]).astype(np.int32)
        kept_lines = flat.filter(pa.array(keep, pa.bool_()))
        # binary_join has no large_list kernel — int32 list offsets (a batch
        # with >2^31 kept lines would long since have blown block limits)
        rebuilt = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(new_off, pa.int32()),
                                     pc.cast(kept_lines, pa.string())),
            sep,
        )
        out = t.drop_columns([text_col])
        out = out.append_column(text_col, pc.cast(rebuilt, pa.large_string()))
        out = out.append_column("n_lines", pa.array(nl, pa.int64()))
        return out.append_column("n_kept", pa.array(n_kept, pa.int64()))

    return ds.map_batches(per_batch, batch_format="pyarrow")


def redact_text(ds, *, text_col: str = "text",
                rules: tuple = DEFAULT_REDACTIONS,
                count_col: str = "n_redacted"):
    """PII-style pattern redaction: each (regex, replacement) rule is one
    vectorized RE2 pass over the batch (``pc.replace_substring_regex``
    replaces ALL occurrences; DuckDB twin is ``regexp_replace(..., 'g')`` —
    both engines are RE2, so replacements agree byte-for-byte).  Rules
    apply in order, so later patterns see earlier replacements (document
    rule order when patterns can overlap).  Appends ``count_col`` = total
    matches redacted per row.  Embarrassingly parallel — the right shape
    for scrubbing a 100 TB corpus where per-doc Python would be the
    bottleneck."""

    def run(t: pa.Table) -> pa.Table:
        text = t[text_col].combine_chunks() if isinstance(
            t[text_col], pa.ChunkedArray) else t[text_col]
        total = np.zeros(len(text), np.int64)
        for pattern, repl in rules:
            total += np.asarray(
                pc.count_substring_regex(text, pattern=pattern), dtype=np.int64
            )
            text = pc.replace_substring_regex(text, pattern=pattern,
                                              replacement=repl)
        t = t.drop_columns([text_col])
        t = t.append_column(text_col, text)
        return t.append_column(count_col, pa.array(total, pa.int64()))

    return ds.map_batches(run, batch_format="pyarrow")


def chunk_documents(ds, *, window: int = 64, stride: int = 48,
                    text_col: str = "text", id_col: str = "doc_id"):
    """Split each document into fixed token windows with overlap — the
    standard long-document preparation for LLM training/retrieval (e.g.
    RAG chunking; windows of ``window`` whitespace tokens every ``stride``
    tokens, so consecutive chunks overlap by ``window - stride``).

    Chunk c of a doc covers tokens [c*stride, min(c*stride + window, n));
    chunks exist for every c >= 0 with c*stride < n (an empty text has one
    token — DuckDB ``string_split`` parity — hence exactly one chunk).
    Returns Dataset[id_col, chunk_idx, n_tokens, chunk_text].

    Fully vectorized and doc-local (flat_map shape, zero shuffle): chunk
    texts are BYTE SPANS of the original string gathered straight out of
    the Arrow value buffer (tokens are split on ASCII space, so spans cut
    at code-point boundaries; no re-join, no per-row Python).  Output
    bytes ~= window/stride x input bytes."""
    if window < 1 or stride < 1:
        raise ValueError("chunk_documents: window and stride must be >= 1")

    from ..geom.primitives import repeat_expand

    def chunk(t: pa.Table) -> pa.Table:
        empty = pa.table({
            id_col: pa.array([], pa.int64()),
            "chunk_idx": pa.array([], pa.int64()),
            "n_tokens": pa.array([], pa.int64()),
            "chunk_text": pa.array([], pa.string()),
        })
        if t.num_rows == 0:
            return empty
        text = t[text_col].combine_chunks()
        ids = np.asarray(t[id_col].combine_chunks(), np.int64)
        toks = pc.split_pattern(text, pattern=" ")
        ntok = np.asarray(pc.list_value_length(toks), dtype=np.int64)
        # token byte offsets inside each doc, from the flat token buffer
        flat = pc.list_flatten(toks)
        tlen = np.asarray(pc.binary_length(flat), dtype=np.int64)
        doc_off = np.concatenate([[0], np.cumsum(ntok)])
        # start byte of token k within its doc: cumsum(len+1) reset per doc
        pos = np.concatenate([[0], np.cumsum(tlen + 1)])
        tok_start = pos[:-1] - pos[doc_off[:-1]].repeat(ntok)
        tok_end = tok_start + tlen
        # chunk expansion
        n_chunks = (ntok + stride - 1) // stride
        n_chunks = np.maximum(n_chunks, 1)
        did, cidx = repeat_expand(n_chunks)
        first = cidx * stride
        last = np.minimum(first + window, ntok[did]) - 1  # inclusive
        keep = first < ntok[did]
        did, cidx, first, last = did[keep], cidx[keep], first[keep], last[keep]
        gfirst = doc_off[did] + first
        glast = doc_off[did] + last
        span_a = tok_start[gfirst]
        span_b = tok_end[glast]
        # doc byte starts in the original string buffer
        sbuf = text.buffers()
        s_off_dtype = np.int64 if pa.types.is_large_string(text.type) else np.int32
        s_offsets = np.frombuffer(
            sbuf[1], dtype=s_off_dtype, count=len(text) + 1 + text.offset
        )[text.offset:text.offset + len(text) + 1].astype(np.int64)
        sdata = np.frombuffer(sbuf[2], dtype=np.uint8) if sbuf[2] is not None \
            else np.empty(0, np.uint8)
        abs_a = s_offsets[did] + span_a
        abs_b = s_offsets[did] + span_b
        lens = abs_b - abs_a
        gid, k = repeat_expand(lens)
        starts = np.concatenate([[0], np.cumsum(lens)])
        vals = sdata[abs_a[gid] + k] if lens.sum() else np.empty(0, np.uint8)
        out_text = pa.Array.from_buffers(
            pa.string(), len(lens),
            [None, pa.py_buffer(starts.astype(np.int32).tobytes()),
             pa.py_buffer(vals.tobytes())],
        ) if starts[-1] < 2**31 else pa.array(
            [bytes(vals[starts[i]:starts[i + 1]]).decode("utf-8")
             for i in range(len(lens))], pa.string())
        return pa.table({
            id_col: pa.array(ids[did], pa.int64()),
            "chunk_idx": pa.array(cidx, pa.int64()),
            "n_tokens": pa.array(last - first + 1, pa.int64()),
            "chunk_text": out_text,
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        chunk, batch_format="pyarrow")


def weighted_sample(ds, *, k: int = 100, id_col: str = "doc_id",
                    text_col: str = "text"):
    """Weighted sampling WITHOUT replacement, inclusion probability
    proportional to whitespace-token count (Efraimidis-Spirakis,
    "Weighted random sampling with a reservoir", IPL 2006, Algorithm A) —
    fully deterministic and integer-exact.

    ES draws u_i ~ U(0,1) per item and keeps the k LARGEST keys
    u_i^(1/w_i).  For an integer weight w, u^(1/w) is distributed as the
    MAX of w iid uniforms, so ES's selection is distributionally identical
    to: give every item w independent uniform draws and keep the k items
    whose MINIMUM draw is smallest.  We realize the per-copy draws with
    the Kirsch-Mitzenmacher double hash h_j = h1 + j*h2 (mod 2^64) for
    j in [0, w) — the same family as ``functions/sketch._double_hashes``,
    which DuckDB rebuilds bit-exactly in HUGEINT arithmetic — so the whole
    sampler needs NO ln() and NO float anywhere: selection order is a pure
    integer function of (id, token count), immune to libm differences.

    Weights: w = len(string_split(text, ' ')) >= 1 (empty text has one
    empty token — the repo-wide DuckDB parity convention), so every doc
    has a nonzero chance and the weight needs no separate pass.

    100 TB shape: ONE streaming pass.  The per-block kernel materializes
    w hash values per doc (8 bytes x token count — the same order as the
    token stream already in flight) and reduces with minimum.reduceat;
    each block forwards only its k best (prio, id) rows and the driver
    merges k-row partials.  No corpus-wide sort, no shuffle; the merge
    input is k x num_blocks tiny rows.

    Returns pyarrow Table (id_col, prio_i64, rank): prio_i64 is the
    winning hash in DuckDB's signed-BIGINT view of the uint64 value,
    rank is the dense 0-based selection order (prio ASC, id ASC).
    """
    import ray

    from ..stages.geocode import fnv1a64

    if k < 1:
        raise ValueError("weighted_sample: k must be >= 1")

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "prio": pa.array([], pa.uint64())})
        ids_arr = t[id_col].combine_chunks()
        ids = np.asarray(ids_arr, np.int64)
        s = pc.cast(ids_arr, pa.string())
        h1 = fnv1a64(s)
        h2 = fnv1a64(pc.binary_join_element_wise(s, "#", ""))
        text = pc.fill_null(t[text_col].combine_chunks(), "")
        w = np.asarray(pc.list_value_length(
            pc.split_pattern(text, pattern=" ")), np.int64)
        starts = np.zeros(len(w) + 1, np.int64)
        np.cumsum(w, out=starts[1:])
        j = (np.arange(starts[-1], dtype=np.uint64)
             - np.repeat(starts[:-1].astype(np.uint64), w))
        with np.errstate(over="ignore"):
            draws = np.repeat(h1, w) + j * np.repeat(h2, w)
        prio = np.minimum.reduceat(draws, starts[:-1])
        order = np.lexsort((ids, prio))[:k]
        return pa.table({id_col: pa.array(ids[order], pa.int64()),
                         "prio": pa.array(prio[order], pa.uint64())})

    parts = ds.select_columns([id_col, text_col]).map_batches(
        partial, batch_format="pyarrow", batch_size=None)
    tabs = [t for t in ray.get(parts.to_arrow_refs()) if t.num_rows]
    if not tabs:
        return pa.table({id_col: pa.array([], pa.int64()),
                         "prio_i64": pa.array([], pa.int64()),
                         "rank": pa.array([], pa.int64())})
    t = pa.concat_tables(tabs)
    prio = np.asarray(t["prio"].combine_chunks(), np.uint64)
    ids = np.asarray(t[id_col].combine_chunks(), np.int64)
    order = np.lexsort((ids, prio))[:k]
    return pa.table({
        id_col: pa.array(ids[order], pa.int64()),
        "prio_i64": pa.array(prio[order].view(np.int64), pa.int64()),
        "rank": pa.array(np.arange(len(order), dtype=np.int64), pa.int64()),
    })


DEFAULT_LINE_BLOCKLIST = ("data", "join", "window")


def line_filter(ds, *, text_col: str = "text", sep: str = "\n",
                min_chars: int = 4, blocklist=DEFAULT_LINE_BLOCKLIST,
                max_drop_pct: int = 50):
    """Line-wise corrections (the RefinedWeb/CCNet line-filter shape,
    Penedo et al. 2023 §3.3): drop lines shorter than ``min_chars``
    characters or exactly matching the ``blocklist`` (nav/boilerplate
    tokens); survivors re-join with ``sep`` in original order.  A document
    whose dropped-line share STRICTLY exceeds ``max_drop_pct`` percent is
    flagged ``doc_dropped`` (the "too much of this page was boilerplate"
    whole-doc rule) — flagged, not removed, so callers decide (and the
    gate can check the flag itself).

    Doc-local — no shuffle; one split + vectorized length/set-membership
    masks + offset-arithmetic list rebuild per batch (the doc_line_dedup
    machinery).  The drop-share test is integer-exact:
    (n_lines - n_kept) * 100 > max_drop_pct * n_lines.

    Returns Dataset[<passthrough>, text, n_lines, n_kept, doc_dropped].
    """
    block = pa.array(list(blocklist), pa.string())
    mc = np.int64(min_chars)
    pct = np.int64(max_drop_pct)

    def per_batch(t: pa.Table) -> pa.Table:
        text = t[text_col].combine_chunks()
        lines = pc.split_pattern(text, pattern=sep)
        nl = np.asarray(pc.list_value_length(lines), dtype=np.int64)
        flat = pc.cast(lines.flatten(), pa.string())
        ok = (
            (np.asarray(pc.utf8_length(flat), dtype=np.int64) >= mc)
            & ~pc.is_in(flat, value_set=block).to_numpy(zero_copy_only=False)
        )
        nb = nl.size
        doc = np.repeat(np.arange(nb, dtype=np.int64), nl)
        n_kept = (np.bincount(doc[ok], minlength=nb).astype(np.int64)
                  if doc.size else np.zeros(nb, np.int64))
        new_off = np.concatenate([[0], np.cumsum(n_kept)]).astype(np.int32)
        rebuilt = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(new_off, pa.int32()),
                                     flat.filter(pa.array(ok, pa.bool_()))),
            sep,
        )
        dropped = (nl - n_kept) * np.int64(100) > pct * nl
        out = t.drop_columns([text_col])
        out = out.append_column(text_col, pc.cast(rebuilt, pa.large_string()))
        out = out.append_column("n_lines", pa.array(nl, pa.int64()))
        out = out.append_column("n_kept", pa.array(n_kept, pa.int64()))
        return out.append_column("doc_dropped", pa.array(dropped, pa.bool_()))

    return ds.map_batches(per_batch, batch_format="pyarrow")


def reassemble_chunks(ds, *, window: int = 64, stride: int = 48,
                      id_col: str = "doc_id", text_col: str = "chunk_text",
                      idx_col: str = "chunk_idx", num_buckets: int = 256):
    """EXACT inverse of ``chunk_documents``: rebuild each document from its
    overlapping fixed-token-window chunks.  Chunk 0 contributes all its
    tokens; chunk c >= 1 contributes its tokens from position
    ``window - stride`` on (everything before that is the overlap the
    previous chunk already carried); a trailing chunk fully covered by its
    predecessor contributes nothing.  Round-tripping
    chunk_documents -> reassemble_chunks is byte-identity on any corpus —
    the gate row certifies it against the raw documents table.

    One groupby(hash bucket) shuffle co-locates each doc's chunks; inside
    a bucket everything is byte-span arithmetic on the flat string buffer:
    the per-chunk cut point is the byte after the (window-stride)-th ASCII
    space (one vectorized scan over the buffer), and output docs assemble
    with a single gather — no per-row Python, no token re-join.

    Returns Dataset[id_col, text].
    """
    if window < 1 or stride < 1 or stride > window:
        raise ValueError("reassemble_chunks: need 1 <= stride <= window")
    kdrop_tail = np.int64(window - stride)

    def prep(t: pa.Table) -> pa.Table:
        from ..util import knuth_bucket

        key = np.asarray(t[id_col].combine_chunks(), dtype=np.int64)
        return pa.table({
            id_col: pa.array(key, pa.int64()),
            idx_col: t[idx_col],
            text_col: t[text_col],
            "part": pa.array(knuth_bucket(key, num_buckets), pa.int64()),
        })

    empty = pa.table({id_col: pa.array([], pa.int64()),
                      "text": pa.array([], pa.string())})

    def per_bucket(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty
        doc = np.asarray(t[id_col].combine_chunks(), dtype=np.int64)
        cidx = np.asarray(t[idx_col].combine_chunks(), dtype=np.int64)
        txt = t[text_col].combine_chunks()
        order = np.lexsort((cidx, doc))
        doc, cidx = doc[order], cidx[order]
        txt = txt.take(pa.array(order, pa.int64()))

        bufs = txt.buffers()
        off_dtype = np.int64 if pa.types.is_large_string(txt.type) else np.int32
        offs = np.frombuffer(
            bufs[1], dtype=off_dtype, count=len(txt) + 1 + txt.offset
        )[txt.offset:txt.offset + len(txt) + 1].astype(np.int64)
        buf = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None \
            else np.empty(0, np.uint8)

        ntok = np.asarray(
            pc.count_substring(txt, " "), dtype=np.int64) + 1
        kdrop = np.where(cidx > 0, kdrop_tail, 0)
        ct = np.maximum(ntok - kdrop, 0)  # contributed tokens

        # byte cut point: after the kdrop-th space of each string (rows
        # with ct > 0 and kdrop > 0 are guaranteed that many spaces)
        abs_a = offs[:-1].copy()
        need = (kdrop > 0) & (ct > 0)
        if need.any():
            spaces = np.flatnonzero(buf[offs[0]:offs[-1]] == 32) + offs[0]
            seg = np.searchsorted(offs[1:], spaces, side="right")
            first_in_seg = np.searchsorted(spaces, offs[:-1], side="left")
            rank = np.arange(spaces.size, dtype=np.int64) - first_in_seg[seg]
            hit = need[seg] & (rank == kdrop[seg] - 1)
            abs_a[seg[hit]] = spaces[hit] + 1
        abs_b = offs[1:]

        keep = ct > 0
        new_doc = np.concatenate([[True], doc[1:] != doc[:-1]])
        sep = (keep & ~new_doc).astype(np.int64)
        # a doc's FIRST kept row never takes a separator; chunk 0 always
        # has ct >= 1, so "first kept" == "first row of doc" exactly
        blen = np.where(keep, abs_b - abs_a, 0)
        row_len = blen + sep
        starts = np.concatenate([[0], np.cumsum(row_len)])
        total = int(starts[-1])
        vals = np.empty(total, np.uint8)
        vals[starts[:-1][sep.astype(bool)]] = 32
        from ..geom.primitives import repeat_expand

        gid, k = repeat_expand(blen)
        if gid.size:
            vals[starts[gid] + sep[gid] + k] = buf[abs_a[gid] + k]

        doc_rows = np.flatnonzero(new_doc)
        out_ids = doc[doc_rows]
        doc_offs = np.concatenate([starts[doc_rows], [total]])
        out_text = pa.Array.from_buffers(
            pa.string(), out_ids.size,
            [None, pa.py_buffer(doc_offs.astype(np.int32).tobytes()),
             pa.py_buffer(vals.tobytes())],
        ) if total < 2**31 else pa.array(
            [bytes(vals[doc_offs[i]:doc_offs[i + 1]]).decode("utf-8")
             for i in range(out_ids.size)], pa.string())
        return pa.table({id_col: pa.array(out_ids, pa.int64()),
                         "text": out_text})

    return (ds.map_batches(prep, batch_format="pyarrow")
            .groupby("part").map_groups(per_bucket, batch_format="pyarrow"))


def multiset_diff(a, b, *, text_col: str = "text"):
    """Dataset reconciliation: EXCEPT ALL in BOTH directions in one
    shuffle — for every content hash whose multiplicity differs between
    the two sides, emit (content_hash, n_a, n_b).  The incremental-
    pipeline validation primitive ("did the rerun produce the same
    corpus, and if not, which rows and how many copies?").

    Each batch contributes (hash, n_a, n_b) count partials (side encoded
    as which column carries the count), so the single groupby shuffle is
    distinct-hash-sized, never row-sized; equal-multiplicity hashes are
    filtered out after the reduce.
    """
    from ray.data.aggregate import Sum

    from .dedup import add_content_hash

    def mk_partial(side: str):
        other = "n_b" if side == "n_a" else "n_a"

        def partial(t: pa.Table) -> pa.Table:
            h = add_content_hash(t, text_col=text_col)["content_hash"]
            g = (pa.table({"content_hash": h})
                 .group_by("content_hash").aggregate([([], "count_all")]))
            g = g.select(["content_hash", "count_all"])
            n = g["count_all"].combine_chunks().cast(pa.int64())
            return pa.table({
                "content_hash": g["content_hash"],
                side: n,
                other: pa.array(np.zeros(g.num_rows, np.int64), pa.int64()),
            }).select(["content_hash", "n_a", "n_b"])
        return partial

    both = (a.map_batches(mk_partial("n_a"), batch_format="pyarrow")
            .union(b.map_batches(mk_partial("n_b"), batch_format="pyarrow"))
            .groupby("content_hash")
            .aggregate(Sum("n_a", alias_name="n_a"),
                       Sum("n_b", alias_name="n_b")))

    def keep_diff(t: pa.Table) -> pa.Table:
        return t.filter(pc.invert(pc.equal(t["n_a"], t["n_b"])))

    return both.map_batches(keep_diff, batch_format="pyarrow")
