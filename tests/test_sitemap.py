"""Sitemap ingestion: pure parser semantics, Spark plan equivalence with
the pure twin, robots→sitemap seed derivation, CLI integration."""

import datetime as dt

import pandas as pd
import pytest

from graven_spark.functions.sitemap import parse_sitemap

URLSET = b"""<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>https://h.example.com/a</loc><lastmod>2024-01-02</lastmod>
       <changefreq>daily</changefreq><priority>0.8</priority></url>
  <url><loc>https://h.example.com/b</loc></url>
  <url><lastmod>2024-01-01</lastmod></url>
  <url><loc>https://h.example.com/c</loc><priority>7</priority></url>
  <url><loc>https://h.example.com/d</loc><priority>junk</priority></url>
</urlset>"""

INDEX = b"""<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap><loc>https://h.example.com/s1.xml</loc>
           <lastmod>2024-02-01T10:00:00Z</lastmod></sitemap>
  <sitemap><loc>https://h.example.com/s2.xml</loc></sitemap>
</sitemapindex>"""


def test_parse_urlset_document_order_and_defaults():
    p = parse_sitemap(URLSET)
    assert p["kind"] == "urlset" and not p["parse_failed"]
    locs = [e[0] for e in p["entries"]]
    # missing-loc entry dropped; document order preserved
    assert locs == [f"https://h.example.com/{x}" for x in "abcd"]
    by_loc = {e[0]: e for e in p["entries"]}
    assert by_loc["https://h.example.com/a"] == (
        "https://h.example.com/a", "2024-01-02", "daily", 0.8)
    # absent lastmod/changefreq → None; absent/out-of-range/junk priority
    assert by_loc["https://h.example.com/b"][1:] == (None, None, 0.5)
    assert by_loc["https://h.example.com/c"][3] == 1.0  # clamped
    assert by_loc["https://h.example.com/d"][3] == 0.5  # malformed → default


def test_parse_index_and_malformed():
    p = parse_sitemap(INDEX)
    assert p["kind"] == "index" and not p["parse_failed"]
    assert p["entries"] == [
        ("https://h.example.com/s1.xml", "2024-02-01T10:00:00Z", None, None),
        ("https://h.example.com/s2.xml", None, None, None),
    ]
    for junk in (b"not xml at all <", b"", None, b"<html><body>404</body></html>"):
        p = parse_sitemap(junk)
        assert p == {"kind": None, "parse_failed": True, "entries": []}


def _pages(spark, rows):
    ddl = "url string, warc_ts timestamp, html binary, text string, lang string"
    return spark.createDataFrame(
        [(u, dt.datetime(2024, 1, 1), b, None, None) for u, b in rows], ddl)


def test_spark_entries_match_pure_twin(spark):
    from graven_spark.functions.sitemap import entries_from_sitemap_pages

    rows = [("https://h.example.com/sitemap.xml", URLSET),
            ("https://h.example.com/index.xml", INDEX),
            ("https://h.example.com/bad.xml", b"junk <")]
    got = {
        (r.sitemap_url, r.entry_idx): (r.kind, r.parse_failed, r.loc,
                                       r.lastmod, r.changefreq, r.priority)
        for r in entries_from_sitemap_pages(_pages(spark, rows)).collect()
    }
    for u, body in rows:
        p = parse_sitemap(body)
        if not p["entries"]:
            k = (u, None)
            assert got[k][:2] == (p["kind"], p["parse_failed"])
            assert got[k][2:] == (None, None, None, None)
            continue
        for i, e in enumerate(p["entries"]):
            assert got[(u, i)] == (p["kind"], p["parse_failed"]) + e


def test_seeds_from_sitemaps_order_dedup_and_nesting(spark):
    from graven_spark.functions.robots import rules_from_robots_pages
    from graven_spark.functions.sitemap import seeds_from_sitemaps

    child1 = (b'<urlset><url><loc>https://h.example.com/p1</loc></url>'
              b'<url><loc>https://h.example.com/p2</loc></url></urlset>')
    child2 = (b'<urlset><url><loc>https://h.example.com/p2</loc></url>'
              b'<url><loc>https://h.example.com/p3</loc></url></urlset>')
    index = (b'<sitemapindex>'
             b'<sitemap><loc>https://h.example.com/c1.xml</loc></sitemap>'
             b'<sitemap><loc>https://h.example.com/c2.xml</loc></sitemap>'
             b'</sitemapindex>')
    direct = (b'<urlset><url><loc>https://z.example.com/q1</loc></url>'
              b'<url><loc>https://h.example.com/p1</loc></url></urlset>')
    robots_h = b"User-agent: *\nDisallow:\nSitemap: https://h.example.com/idx.xml\n"
    robots_z = b"User-agent: *\nDisallow:\nSitemap: https://z.example.com/d.xml\n"
    pages = _pages(spark, [
        ("https://h.example.com/robots.txt", robots_h),
        ("https://z.example.com/robots.txt", robots_z),
        ("https://h.example.com/idx.xml", index),
        ("https://h.example.com/c1.xml", child1),
        ("https://h.example.com/c2.xml", child2),
        ("https://z.example.com/d.xml", direct),
    ])
    rules = rules_from_robots_pages(pages, "graven")
    got = [(r.url, r.seed_rank)
           for r in seeds_from_sitemaps(pages, rules).collect()]
    # order: (sitemap_url, entry_idx) lexicographic over resolved urlsets —
    # c1 before c2 before d; dup p2 and p1 keep first occurrence; dense ranks
    assert got == [
        ("https://h.example.com/p1", 1),
        ("https://h.example.com/p2", 2),
        ("https://h.example.com/p3", 3),
        ("https://z.example.com/q1", 4),
    ]


def test_cli_sitemap_seeds_end_to_end(spark, tmp_path):
    from graven_spark.__main__ import main
    from graven_spark.sources.synth import generate_graph, mini_specs

    g = generate_graph(mini_specs())
    root = sorted(g.seeds["url"])[0]          # e.g. https://host0.../maven2/
    host = root.split("/")[2]
    extra = [
        ("https://%s/robots.txt" % host,
         b"User-agent: *\nDisallow:\nSitemap: https://%s/sm.xml\n"
         % host.encode()),
        ("https://%s/sm.xml" % host,
         b"<urlset><url><loc>%s</loc></url></urlset>" % root.encode()),
    ]
    extra_df = pd.DataFrame(
        [{"url": u, "warc_ts": dt.datetime(2024, 1, 1), "html": b,
          "text": "", "lang": "en"} for u, b in extra])
    pages = str(tmp_path / "pages.parquet")
    combined = pd.concat([g.pages, extra_df], ignore_index=True)
    combined["warc_ts"] = combined["warc_ts"].astype("datetime64[us]")
    combined.to_parquet(pages, index=False)

    # no --seeds at all: the crawl roots come from the sitemap
    state = str(tmp_path / "state")
    assert main(["crawl", "--pages", pages, "--state", state,
                 "--robots-rfc", "--sitemap-seeds"]) == 0
    from graven_spark.sources.checkpoint import RoundStore

    store = RoundStore(state)
    seen = [r.url for r in store.read_seen(spark, store.latest_round()).collect()]
    # sitemap seeds go through the same trailing-slash canonicalization (P4)
    # as CSV seeds, so the seen set holds the canonical root
    assert root + "/" in seen and len(seen) > 1

    # --sitemap-seeds without --robots-rfc is a usage error
    with pytest.raises(SystemExit):
        main(["crawl", "--pages", pages, "--state", state, "--sitemap-seeds"])
    # neither --seeds nor --sitemap-seeds is a usage error
    with pytest.raises(SystemExit):
        main(["crawl", "--pages", pages, "--state", state])
