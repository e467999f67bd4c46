"""Cross-checks engine semantics against the ACTUAL reference package
(imported read-only from /root/reference — used as an oracle, never
copied). Skipped cleanly when the reference isn't present.
"""

from __future__ import annotations

import itertools
import sys

import pytest

REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)

ref = pytest.importorskip("simple_crawler.url_normalisation")
ref_hyperlink = pytest.importorskip("simple_crawler.hyperlink")

from simplecrawler_spark.functions import canonical as C  # noqa: E402

SCHEMES = ["", "http://", "HTTPS://", "ftp://"]
AUTHS = ["", "www.Example.COM", "example.com.", "hello:@ex.com", "@ex.com",
         "a.b.c.co.uk", "HOST.com:8080", "h0.test", "sub-1.h2.example"]
PATHS = ["", "/", "/a/b", "a b", "/x%20y", "/Ünïcode/päth", "/p!@$^&*()",
         "/a%2Fb", "/x~y_z-9.html", "/a/../b", "/a/./b", "/p+q"]
QUERIES = ["", "?a=b", "?z=y&a=b", "?greeting=hi there", "?x=1+2", "?k"]
FRAGS = ["", "#f", "#hello world", "#a+b", "#x:~y"]


def _corpus():
    for s, a, p, q, f in itertools.product(SCHEMES, AUTHS, PATHS, QUERIES, FRAGS):
        if s == "" and a:
            continue  # bare authority without scheme isn't a netloc to urlsplit
        url = f"{s}{a}{p}{q}{f}"
        yield url


def test_normalise_url_parity_corpus():
    n = 0
    for url in _corpus():
        assert C.canon_parts(url)[0] == ref.normalise_url(url), url
        n += 1
    assert n > 1000


def test_component_parity_corpus():
    for url in list(_corpus())[::7]:
        h = ref_hyperlink.make_hyperlink(url)
        _, scheme, authority, host, path, query, fragment = C.canon_parts(url)
        # reference component properties normalise the RAW components —
        # identical to ours since canon_parts splits the rooted raw url
        assert scheme == h.scheme, url
        assert authority == h.authority, url
        assert query == h.query, url
        assert fragment == h.fragment, url


def test_resolve_parity():
    bases = ["https://ex.com/a/b", "http://ex.com", "https://ex.com/a/"]
    hrefs = ["/x", "x", "../y", "//other.com/z", "https://abs.com/w",
             "?q=1", "#f", "", "./", "x/y?a=b#c"]
    for b in bases:
        for h in hrefs:
            got = C.canon_parts(C.resolve_raw(b, h))[0]
            want = str(ref_hyperlink.make_hyperlink(h).join(b))
            assert got == want, (b, h)


def test_trim_parity():
    urls = ["https://E.com/a?x=1#f", "/a?x=1#f", "http://e.com#f", "e?x#f"]
    flags = [dict(query=True, fragment=True), dict(query=True),
             dict(fragment=True), dict(scheme=True), dict(authority=True),
             dict(path=True)]
    for u in urls:
        for fl in flags:
            got = C.canon_parts(C.trim_raw(u, **fl))[0]
            want = str(ref_hyperlink.make_hyperlink(u).trim(**fl))
            assert got == want, (u, fl)


# ---------------------------------------------------------------------------
# Property-based parity (hypothesis): random urls from a grammar that
# covers the fast path, near-misses, and hostile inputs
# ---------------------------------------------------------------------------

try:
    from hypothesis import given, settings, strategies as st

    _scheme = st.sampled_from(["", "http://", "https://", "HTTP://", "ftp://"])
    _label = st.text(alphabet="abcdefghijklmnopqrstuvwxyzABC019-", min_size=1,
                     max_size=8)
    _host = st.lists(_label, min_size=1, max_size=3).map(".".join)
    _hostish = st.one_of(
        _host,
        _host.map(lambda h: h + "."),
        _host.map(lambda h: "user:pw@" + h),
        _host.map(lambda h: h + ":8080"),
    )
    _pathseg = st.text(
        alphabet="abcXYZ019_.~%+- /!$&'()*,;=:@", max_size=12)
    _query = st.one_of(
        st.just(""),
        st.lists(st.tuples(st.text("abz19", min_size=1, max_size=4),
                           st.text("abz19 +&=", max_size=6)),
                 min_size=1, max_size=4)
        .map(lambda kv: "?" + "&".join(f"{k}={v}" for k, v in kv)))
    _frag = st.one_of(st.just(""),
                      st.text("abz19 +:~#", max_size=8).map(lambda f: "#" + f))

    @st.composite
    def _urls(draw):
        s = draw(_scheme)
        h = draw(_hostish) if s else ""
        p = draw(_pathseg)
        if h and p and not p.startswith("/"):
            p = "/" + p
        return f"{s}{h}{p}{draw(_query)}{draw(_frag)}"

    @given(_urls())
    @settings(max_examples=500, deadline=None)
    def test_normalise_url_parity_property(url):
        assert C.canon_parts(url)[0] == ref.normalise_url(url), url

    @given(_urls(), _urls())
    @settings(max_examples=200, deadline=None)
    def test_join_parity_property(base, href):
        h = ref_hyperlink.make_hyperlink(href)
        b = ref_hyperlink.make_hyperlink(base)
        assert C.resolve_raw(base, href) == h.join(b)._input_url or \
            C.canon_parts(C.resolve_raw(base, href))[0] == h.join(b).url

except ImportError:  # pragma: no cover
    pass
