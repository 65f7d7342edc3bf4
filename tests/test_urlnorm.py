"""RFC 3986 URL normalization: pure-twin semantics, Spark==pure property
equivalence, idempotence, and crawl-admission integration (alias links
collapse to one frontier row under --normalize-urls)."""

import datetime as dt

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from graven_spark.functions.urlnorm import normalize_url, normalize_url_py

CASES = {
    "HTTP://Example.COM:80/a/b/../c/./d.html?x=1#frag":
        "http://example.com/a/c/d.html?x=1",
    "https://Host:443/": "https://host/",
    "https://host:8443/x": "https://host:8443/x",  # non-default port kept
    "http://h/a/b/..": "http://h/a/",
    "http://h/a/.": "http://h/a/",
    "http://h/..": "http://h/",
    "http://h": "http://h/",
    "http://h?q=1": "http://h/?q=1",
    "http://h/a//b/./../c": "http://h/a//c",  # '//' NOT collapsed (RFC)
    "http://user@Host:80/p": "http://user@host/p",  # userinfo case kept
    "ftp://H/a/../": "ftp://h/",
    "no-scheme/path": "no-scheme/path",  # pass-through
    "http://h/a#b://c": "http://h/a",
    "x#y://z": "x",  # '://' only inside fragment → strip fragment only
    "http://h/%41?Y=2": "http://h/%41?Y=2",  # percent-encoding untouched
}


def test_pure_twin_cases():
    for url, want in CASES.items():
        assert normalize_url_py(url) == want, url
    assert normalize_url_py(None) is None


def test_pure_twin_idempotent():
    for url in CASES:
        once = normalize_url_py(url)
        assert normalize_url_py(once) == once, url


def test_spark_matches_pure_on_cases(spark):
    df = spark.createDataFrame([(u,) for u in CASES], "url string")
    got = {r.url: r.n
           for r in df.select("url", normalize_url(F.col("url")).alias("n"))
           .collect()}
    assert got == {u: normalize_url_py(u) for u in CASES}


# URL-shaped and adversarial-garbage strings; ASCII only (Python str.lower
# and Java toLowerCase diverge on a handful of Unicode codepoints, and crawl
# URLs at this layer are ASCII by construction).
_frag = st.text(
    alphabet="abXY09Z.:/?#@%&=~-_", min_size=0, max_size=12)
_urlish = st.builds(
    lambda scheme, host, port, path, q: scheme + host + port + path + q,
    st.sampled_from(["http://", "HTTP://", "https://", "Ftp://", "", "x"]),
    st.sampled_from(["Host.COM", "h", "user@H", "a@b@C", ""]),
    st.sampled_from([":80", ":443", ":8080", ""]),
    st.sampled_from(["", "/", "/a/./b/../c", "/a//b/", "/a/..", "/..",
                     "/a/...", "/%41/B"]),
    st.sampled_from(["", "?q=1#f", "#f://x", "?a=/b/../c"]),
)


def test_spark_matches_pure_property(spark):
    # hypothesis can't inject the spark fixture directly; close over it.
    @settings(max_examples=60, deadline=None)
    @given(st.lists(st.one_of(_urlish, _frag), min_size=1, max_size=40,
                    unique=True))
    def prop(urls):
        df = spark.createDataFrame([(u,) for u in urls], "url string")
        got = {r.url: r.n
               for r in df.select("url",
                                  normalize_url(F.col("url")).alias("n"))
               .collect()}
        assert got == {u: normalize_url_py(u) for u in urls}

    prop()


def _alias_pages(spark):
    """Root page links the same child twice — once clean, once via a './'
    dot segment (the reference regex only excludes '..'-prefixed hrefs)."""
    root = "https://n.example.com/maven2/"
    child = root + "a/"
    html_root = ('<html><body><pre><a href="a/">a/</a>  -\n'
                 '<a href="./a/">./a/</a>  -\n</pre></body></html>')
    html_child = ('<html><body><pre>'
                  '<a href="x.jar">x.jar</a>  2024-01-01 00:00  1\n'
                  '</pre></body></html>')
    ddl = "url string, warc_ts timestamp, html binary, text string, lang string"
    pages = spark.createDataFrame(
        [(root, dt.datetime(2024, 1, 1), html_root.encode(), None, None),
         (child, dt.datetime(2024, 1, 1), html_child.encode(), None, None)],
        ddl)
    return root, child, pages


@pytest.mark.parametrize("normalize", [False, True])
def test_crawl_admission_collapses_dot_segment_alias(spark, tmp_path,
                                                     normalize):
    from graven_spark.plans.driver import crawl
    from graven_spark.plans.frontier import CrawlConfig
    from graven_spark.sources.checkpoint import RoundStore

    root, child, pages = _alias_pages(spark)
    pages_path = str(tmp_path / "pages.parquet")
    pd_pages = pages.toPandas()
    pd_pages["warc_ts"] = pd_pages["warc_ts"].astype("datetime64[us]")
    pd_pages.to_parquet(pages_path, index=False)
    seeds = spark.createDataFrame([(0, root)], "seed_rank int, url string")
    state = str(tmp_path / ("norm" if normalize else "raw"))
    crawl(spark, pages_path, seeds, None, state,
          CrawlConfig(normalize_urls=normalize))
    store = RoundStore(state)
    seen = {r.url
            for r in store.read_seen(spark, store.latest_round()).collect()}
    assert root in seen and child in seen
    if normalize:
        # './a/' alias collapsed into 'a/' at admission → fetched once
        assert root + "./a/" not in seen
    else:
        # raw concat admits the alias as a distinct (dead) URL
        assert root + "./a/" in seen
