"""URL canonicalization for web-corpus keys (dedup by canonical URL,
per-domain caps, crawl-frontier joins).

Normalization contract (documented choices, mirrored by the SQL twin):
- scheme and host lowercased; path case PRESERVED (paths are case-sensitive)
- fragment stripped
- default port dropped (http:80, https:443); any other port kept
- empty path -> "/"
- query parameters sorted bytewise (RE2 split on "&", stable sort);
  empty/absent query -> no "?"
- ``domain`` = last two host labels (simplified registrable domain; a real
  public-suffix list is a data file this sandbox doesn't ship — documented)

Fully vectorized: one RE2 extract for the parts, one flatten + lexsort +
list-rebuild for the query params.  No per-row Python.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_URL_RE = (
    r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.\-]*)://(?P<host>[^/:?#]*)"
    r"(?::(?P<port>[0-9]+))?(?P<path>[^?#]*)(?:\?(?P<query>[^#]*))?"
)
_DOM_RE = r"(?P<dom>[^.]+\.[^.]+)$"


def normalize_urls(batch: pa.Table, *, url_col: str = "url",
                   out_col: str = "url_norm",
                   domain_col: str = "domain") -> pa.Table:
    u = batch[url_col].combine_chunks()
    parts = pc.extract_regex(u, _URL_RE)
    if parts.null_count:
        bad = pc.filter(u, pc.is_null(parts))
        raise ValueError(f"unparseable url(s), e.g. {bad[0].as_py()!r}")
    scheme = pc.utf8_lower(pc.struct_field(parts, "scheme"))
    host = pc.utf8_lower(pc.struct_field(parts, "host"))
    port = pc.struct_field(parts, "port")
    path = pc.struct_field(parts, "path")
    query = pc.struct_field(parts, "query")

    default = pc.or_(
        pc.and_(pc.equal(scheme, "http"), pc.equal(port, "80")),
        pc.and_(pc.equal(scheme, "https"), pc.equal(port, "443")),
    )
    keep_port = pc.and_(pc.not_equal(port, ""), pc.invert(default))
    port_part = pc.if_else(keep_port,
                           pc.binary_join_element_wise(":", port, ""), "")
    path_part = pc.if_else(pc.equal(path, ""), "/", path)

    # sort query params: flatten -> (parent, value) lexsort -> rebuild lists
    toks = pc.split_pattern(query, pattern="&")
    lens = np.asarray(pc.list_value_length(toks), dtype=np.int64)
    flat = pc.list_flatten(toks)
    flat = flat.combine_chunks() if isinstance(flat, pa.ChunkedArray) else flat
    obj = flat.to_numpy(zero_copy_only=False).astype(object)
    parent = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    order = np.lexsort((obj, parent))
    offsets = np.empty(len(lens) + 1, np.int64)
    offsets[0] = 0
    np.cumsum(lens, out=offsets[1:])
    sorted_lists = pa.LargeListArray.from_arrays(
        offsets, pa.array(obj[order], pa.string()))
    joined = pc.binary_join(sorted_lists, "&")
    q_part = pc.if_else(pc.equal(query, ""), "",
                        pc.binary_join_element_wise("?", joined, ""))

    norm = pc.binary_join_element_wise(
        scheme, "://", host, port_part, path_part, q_part, "")
    dom = pc.extract_regex(host, _DOM_RE)
    domain = pc.if_else(pc.is_valid(dom), pc.struct_field(dom, "dom"), host)
    return batch.append_column(out_col, norm).append_column(domain_col, domain)


def prefix_match(urls, rules, *, url_col: str = "url",
                 id_col: str = "doc_id", rule_id_col: str = "rule_id",
                 prefix_col: str = "prefix",
                 broadcast_rows: int = 50_000_000,
                 max_lengths: int = 512):
    """LONGEST-prefix rule match: for every url, the rule whose ``prefix``
    is the longest string-prefix of it (ties at equal length — i.e. the
    same prefix string listed twice — resolve to the smallest rule id).
    The blocklist/routing-table join every corpus filter needs; inner
    semantics (unmatched urls drop out).

    Scale plan: the rule table is the SMALL side by nature (even a
    100M-entry blocklist is GBs against a 100 TB corpus) — it broadcasts
    once via ``ray.put`` as per-length sorted dictionaries, and each batch
    resolves every url with one ``pc.utf8_slice_codeunits`` +
    ``pc.index_in`` (Arrow hash lookup) per DISTINCT prefix length,
    longest first, stopping per-url at the first hit.  Rules above
    ``broadcast_rows`` or with more than ``max_lengths`` distinct lengths
    raise loudly (a per-host shuffle tier is the documented growth path,
    not a silent fallback).

    Returns Dataset[id_col, rule_id].
    """
    import ray

    @ray.remote
    def prep(*tabs):
        t = pa.concat_tables([x for x in tabs if x.num_rows])
        pfx = t[prefix_col].combine_chunks().cast(pa.string())
        rid = np.asarray(t[rule_id_col].combine_chunks(), dtype=np.int64)
        # dedup identical prefixes to their min rule id
        d = pa.table({"p": pfx, "r": pa.array(rid, pa.int64())}) \
            .group_by("p").aggregate([("r", "min")])
        pfx = d["p"].combine_chunks()
        rid = np.asarray(d["r_min"].combine_chunks(), dtype=np.int64)
        lens = np.asarray(pc.utf8_length(pfx), dtype=np.int64)
        out = []
        for L in sorted(set(lens.tolist()), reverse=True):
            m = lens == L
            out.append((int(L), pfx.filter(pa.array(m)),
                        rid[m]))
        if len(out) > max_lengths:
            raise ValueError(
                f"prefix_match: {len(out)} distinct prefix lengths "
                f"(> {max_lengths}); add a per-host shuffle tier")
        return out

    n_rules = rules.count()
    if n_rules > broadcast_rows:
        raise ValueError(
            f"prefix_match: rule table has {n_rules} rows "
            f"(> broadcast_rows={broadcast_rows}); add a shuffle tier")
    ref = prep.remote(*rules.to_arrow_refs())

    def match(t: pa.Table) -> pa.Table:
        tables = ray.get(ref)
        url = t[url_col].combine_chunks().cast(pa.string())
        ids = np.asarray(t[id_col].combine_chunks(), dtype=np.int64)
        out = np.full(len(url), -1, np.int64)
        todo = np.ones(len(url), bool)
        for L, pfx_L, rid_L in tables:
            if not todo.any():
                break
            sl = pc.utf8_slice_codeunits(url, 0, L)
            pos = pc.index_in(sl, value_set=pfx_L)
            pos_np = np.asarray(pos.cast(pa.int64()).fill_null(-1),
                                dtype=np.int64)
            hit = (pos_np >= 0) & todo
            out[hit] = rid_L[pos_np[hit]]
            todo &= ~hit
        keep = out >= 0
        return pa.table({id_col: pa.array(ids[keep], pa.int64()),
                         "rule_id": pa.array(out[keep], pa.int64())})

    return urls.map_batches(match, batch_format="pyarrow")
