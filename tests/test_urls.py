"""normalize_urls: every documented rule plus adversarial shapes."""
import pyarrow as pa
import pytest

from rayjoin.functions.urls import normalize_urls


def _norm(urls):
    t = pa.table({"url": pa.array(urls, pa.string())})
    out = normalize_urls(t)
    return out["url_norm"].to_pylist(), out["domain"].to_pylist()


def test_rules():
    urls = [
        "HTTPS://WWW.Example.COM:443/Path/File?b=2&a=1#frag",  # default port, sort, frag
        "http://example.com:80/",                              # http default port
        "http://example.com:8080/x",                           # non-default kept
        "https://example.com:80/x",                            # 80 is NOT https default
        "HTTP://EXAMPLE.ORG",                                  # empty path -> /
        "https://a.b.c.example.net/p?z=1",                     # deep host -> last 2 labels
        "https://localhost/x",                                 # dotless host -> host itself
        "https://e.com/CaseKept/Path",                         # path case preserved
        "https://e.com/x?single",                              # 1-param query untouched
        "https://e.com/x?#only-frag",                          # empty query dropped
    ]
    norm, dom = _norm(urls)
    assert norm == [
        "https://www.example.com/Path/File?a=1&b=2",
        "http://example.com/",
        "http://example.com:8080/x",
        "https://example.com:80/x",
        "http://example.org/",
        "https://a.b.c.example.net/p?z=1",
        "https://localhost/x",
        "https://e.com/CaseKept/Path",
        "https://e.com/x?single",
        "https://e.com/x",
    ]
    assert dom[0] == "example.com"
    assert dom[5] == "example.net"
    assert dom[6] == "localhost"


def test_duplicate_params_stable_sort():
    norm, _ = _norm(["https://e.com/x?b=2&a=9&a=1&b=1"])
    # bytewise sort of the raw param strings
    assert norm == ["https://e.com/x?a=1&a=9&b=1&b=2"]


def test_unparseable_raises():
    with pytest.raises(ValueError, match="unparseable"):
        _norm(["not a url"])


def test_idempotent():
    urls = ["HTTPS://A.B.COM:443/p?c=3&b=2&a=1#z", "http://x.y:80"]
    once, _ = _norm(urls)
    twice, _ = _norm(once)
    assert once == twice


def test_prefix_match_longest_wins(ray_session):
    import ray.data

    from rayjoin.functions.urls import prefix_match

    urls = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "url": pa.array([
            "http://a.example/x/y/z",   # matches /x/ and /x/y (longest)
            "http://a.example/x/q",     # matches /x/ only
            "http://b.example/",        # host-level rule, two ids -> min
            "http://c.example/none",    # no rule
            "http://a.example/x/y",     # exact == prefix boundary
        ], pa.string()),
    })).repartition(2)
    rules = ray.data.from_arrow(pa.table({
        "rule_id": pa.array([10, 11, 20, 21, 30], pa.int64()),
        "prefix": pa.array([
            "http://a.example/x/",
            "http://a.example/x/y",
            "http://b.example/",
            "http://b.example/",        # duplicate prefix, larger id
            "http://zzz.example/",
        ], pa.string()),
    }))
    out = prefix_match(urls, rules).to_pandas()
    got = dict(zip(out["doc_id"].astype(int), out["rule_id"].astype(int)))
    assert got == {1: 11, 2: 10, 3: 20, 5: 11}

    import pytest as _pt
    with _pt.raises(ValueError, match="broadcast_rows"):
        prefix_match(urls, rules, broadcast_rows=2)
