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
