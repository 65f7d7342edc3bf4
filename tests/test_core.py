"""Unit tests for the shared pure-Python crawl semantics (core.py):
reference-regex parity, text extraction, canonicalization."""

import datetime as dt

from graven_spark.core import (
    canonicalize_url,
    extract_links_py,
    extract_links_strict_py,
    extract_text_py,
    robots_blocked,
    url_host,
    url_path,
)

LISTING = """<html><body><pre>
<a href="../">../</a>
<a href="sub1/" title="sub1/">sub1/</a>          -
<a href="a/b/">a/b/</a>          -
<a href="art-1.0.jar" title="art-1.0.jar">art-1.0.jar</a>  2025-03-04 10:30  12345
<a href="notajar.txt">notajar.txt</a> 2025-03-04 10:30
</pre></body></html>"""


def test_extract_links_document_order_and_groups():
    links = extract_links_py(LISTING)
    assert [(l.href, l.is_dir, l.ts_str) for l in links] == [
        ("sub1/", True, None),
        ("a/b/", True, None),  # multi-segment dir link kept whole
        ("art-1.0.jar", False, "2025-03-04 10:30"),
    ]


def test_parent_link_excluded():
    assert extract_links_py('<a href="../">../</a>') == []


def test_strict_truncates_on_missing_leaf_timestamp():
    html = (
        '<a href="keep/">keep/</a>\n'
        '<a href="bad.jar">bad.jar</a>\n'
        '<a href="lost/">lost/</a>\n'
    )
    links, failed = extract_links_strict_py(html)
    assert failed
    assert [l.href for l in links] == ["keep/"]


def test_extract_text_strips_tags_and_collapses_ws():
    assert extract_text_py(b"<p>a  b</p>\n<div>c</div>") == "a b c"
    assert extract_text_py("<html></html>") == ""


def test_canonicalize_and_urlparts():
    assert canonicalize_url("https://h/x") == "https://h/x/"
    assert canonicalize_url("https://h/x/") == "https://h/x/"
    assert url_host("https://h.example.com/a/b/") == "h.example.com"
    assert url_path("https://h.example.com/a/b/") == "/a/b/"


def test_robots_blocked():
    assert robots_blocked("/maven2/d0s1/x/", ["/maven2/d0s1/"])
    assert not robots_blocked("/maven2/d0s2/", ["/maven2/d0s1/"])
    assert not robots_blocked("/maven2/d0s1/", [])


def test_listing_ts_roundtrip():
    assert dt.datetime.strptime("2025-03-04 10:30", "%Y-%m-%d %H:%M") == dt.datetime(
        2025, 3, 4, 10, 30
    )
