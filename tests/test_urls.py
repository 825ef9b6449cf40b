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
