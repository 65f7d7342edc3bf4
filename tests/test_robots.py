"""RFC 9309 robots.txt parsing + longest-match gating
(graven_spark/functions/robots.py; the reference has no robots handling —
its politeness is a global request cap, crawler.py:27 — so this is part of
the web-scale frontier surface, not reference parity)."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from graven_spark.functions.robots import (
    gate_robots_rfc,
    parse_robots_txt,
    pattern_to_regex,
    robots_allowed,
    robots_allowed_col,
    rules_from_robots_pages,
)

PAGES_DDL = "url string, warc_ts timestamp, html binary, text string, lang string"

COMPLEX = """\
# comment only
User-agent: googlebot
Disallow: /private/

User-agent: graven
User-agent: otherbot
Allow: /public/*.html$
Disallow: /public/
Crawl-delay: 2.5
Disallow:

User-agent: *
Disallow: /
Sitemap: https://ex.com/sitemap.xml
"""


def test_parse_group_selection_and_rules():
    p = parse_robots_txt(COMPLEX, "graven/1.0")
    assert p["rules"] == [(True, "/public/*.html$"), (False, "/public/")]
    assert p["crawl_delay"] == 2.5
    assert p["sitemaps"] == ["https://ex.com/sitemap.xml"]  # global
    # googlebot gets its own group; unknown agents fall back to *
    assert parse_robots_txt(COMPLEX, "Googlebot-news")["rules"] == [
        (False, "/private/")
    ]
    assert parse_robots_txt(COMPLEX, "randombot")["rules"] == [(False, "/")]
    # longest agent token wins when several match
    two = "User-agent: bot\nDisallow: /a\nUser-agent: megabot\nDisallow: /b\n"
    assert parse_robots_txt(two, "megabot 2.0")["rules"] == [(False, "/b")]


def test_parse_edge_cases():
    # no group for us and no * group -> allow everything
    assert parse_robots_txt("User-agent: x\nDisallow: /\n", "y")["rules"] == []
    # malformed lines and bad crawl-delay are skipped, empty Disallow = no rule
    junk = "nonsense\nUser-agent: *\nCrawl-delay: soon\nDisallow:\n"
    p = parse_robots_txt(junk, "graven")
    assert p["rules"] == [] and p["crawl_delay"] is None
    assert parse_robots_txt("", "graven")["rules"] == []
    assert parse_robots_txt(None, "graven")["rules"] == []


def test_longest_match_precedence_pure():
    rules = parse_robots_txt(COMPLEX, "graven")["rules"]
    assert robots_allowed("/public/a.html", rules) is True      # $-anchored allow
    assert robots_allowed("/public/a.htmlx", rules) is False    # anchor miss
    assert robots_allowed("/public/deep/b.html", rules) is True  # * spans dirs
    assert robots_allowed("/elsewhere", rules) is True          # no rule
    assert robots_allowed("/x", []) is True                     # no robots
    # length tie -> Allow wins (RFC 9309 §2.2.2)
    assert robots_allowed("/x/y", [(False, "/x"), (True, "/x")]) is True
    # longer allow overrides shorter disallow
    assert robots_allowed("/tmp/okra", [(False, "/tmp/*"), (True, "/tmp/ok")]) is True
    assert robots_allowed("/tmp/zzz", [(False, "/tmp/*"), (True, "/tmp/ok")]) is False


def test_pattern_regex_is_python_and_java_safe():
    # the same regex string must compile in Python (oracle) and Java (plan);
    # re.escape never emits backslash-alpha sequences, which is the only
    # class Java's Pattern rejects
    import re

    for pat in ("/a/*.html$", "/x$", "/*", "/a.b+c(d)", "/$weird*$"):
        rx = pattern_to_regex(pat)
        re.compile(rx)
        assert "\\A" not in rx and "\\Z" not in rx


def _rules_df(spark, texts: dict[str, str]):
    rows = [
        (f"https://{h}/robots.txt", dt.datetime(2024, 1, 1), t.encode(), None, None)
        for h, t in sorted(texts.items())
    ]
    return rules_from_robots_pages(
        spark.createDataFrame(rows, PAGES_DDL), "graven"
    )


def test_rules_from_pages_and_jvm_matcher_equivalence(spark):
    texts = {
        "a.example.com": COMPLEX,
        "b.example.com": "User-agent: *\nDisallow: /tmp/*\nAllow: /tmp/ok\n",
        "c.example.com": "User-agent: *\nDisallow: /x\nAllow: /x\n",
    }
    rules_df = _rules_df(spark, texts)
    paths = [
        "/public/a.html", "/public/a.htmlx", "/public/deep/b.html", "/other",
        "/tmp/okra", "/tmp/zzz", "/free", "/x", "/x/y", "/",
    ]
    cand = spark.createDataFrame(
        [(h, p) for h in sorted(texts) for p in paths] + [("nohost.example.com", "/q")],
        "host string, path string",
    )
    got = {
        (r.host, r.path): r.allowed
        for r in cand.join(F.broadcast(rules_df), "host", "left")
        .select("host", "path", robots_allowed_col(F.col("path"), F.col("rules")).alias("allowed"))
        .collect()
    }
    for (host, path), allowed in got.items():
        rules = parse_robots_txt(texts.get(host, ""), "graven")["rules"]
        assert allowed == robots_allowed(path, rules), (host, path)
    assert got[("nohost.example.com", "/q")] is True


def test_rules_table_dedups_per_host_deterministically(spark):
    # two robots rows for one host (e.g. http+https duplicates): the
    # lexicographically-first url's body wins
    rows = [
        ("https://a.example.com/robots.txt", dt.datetime(2024, 1, 1),
         b"User-agent: *\nDisallow: /z\n", None, None),
        ("http://a.example.com/robots.txt", dt.datetime(2024, 1, 1),
         b"User-agent: *\nDisallow: /first\n", None, None),
        ("https://a.example.com/not-robots.html", dt.datetime(2024, 1, 1),
         b"User-agent: *\nDisallow: /ignored\n", None, None),
    ]
    out = rules_from_robots_pages(
        spark.createDataFrame(rows, PAGES_DDL), "graven"
    ).collect()
    assert len(out) == 1
    assert [r.plen for r in out[0].rules] == [len("/first")]


def test_gate_robots_dispatches_on_frame_shape(spark):
    from graven_spark.operators.politeness import gate_robots

    cand = spark.createDataFrame(
        [("a.example.com", "https://a.example.com/tmp/zzz"),
         ("a.example.com", "https://a.example.com/tmp/okra"),
         ("a.example.com", "https://a.example.com/free"),
         ("d.example.com", "https://d.example.com/anything")],
        "host string, url string",
    )
    rfc = _rules_df(
        spark, {"a.example.com": "User-agent: *\nDisallow: /tmp/*\nAllow: /tmp/ok\n"}
    )
    kept = sorted(r.url for r in gate_robots(cand, rfc).collect())
    assert kept == [
        "https://a.example.com/free",
        "https://a.example.com/tmp/okra",
        "https://d.example.com/anything",
    ]
    # legacy prefix shape still goes through the prefix path
    legacy = spark.createDataFrame(
        [("a.example.com", ["/tmp/"])], "host string, disallow_prefixes array<string>"
    )
    kept = sorted(r.url for r in gate_robots(cand, legacy).collect())
    assert kept == [
        "https://a.example.com/free",
        "https://d.example.com/anything",
    ]


def test_cli_crawl_robots_rfc_end_to_end(spark, tmp_path):
    from graven_spark.__main__ import main
    from graven_spark.sources.synth import generate_graph, mini_specs

    g = generate_graph(mini_specs())
    robots_row = pd.DataFrame(
        [{
            "url": "https://host0.example.com/robots.txt",
            "warc_ts": dt.datetime(2024, 1, 1),
            "html": b"User-agent: graven\nDisallow: /maven2/d0s0/\n",
            "text": "", "lang": "en",
        }]
    )
    pages = str(tmp_path / "pages.parquet")
    combined = pd.concat([g.pages, robots_row], ignore_index=True)
    # concat upcasts warc_ts to datetime64[ns]; Spark rejects NANOS parquet
    combined["warc_ts"] = combined["warc_ts"].astype("datetime64[us]")
    combined.to_parquet(pages, index=False)
    seeds_csv = tmp_path / "seeds.csv"
    seeds_csv.write_text("\n".join(g.seeds["url"]) + "\n")

    state = str(tmp_path / "state")
    assert main(["crawl", "--pages", pages, "--seeds", str(seeds_csv),
                 "--state", state, "--robots-rfc"]) == 0
    from graven_spark.sources.checkpoint import RoundStore

    store = RoundStore(state)
    seen = [r.url for r in store.read_seen(spark, store.latest_round()).collect()]
    blocked = [u for u in seen if u.startswith("https://host0.example.com/maven2/d0s0/")]
    assert blocked == [] and len(seen) > 3
    # the same subtree on other hosts is NOT blocked (host-scoped rules)
    assert any("/maven2/d0s0/" in u for u in seen)

    with pytest.raises(SystemExit):
        main(["crawl", "--pages", pages, "--seeds", str(seeds_csv),
              "--state", state, "--robots-rfc", "--robots", pages])


def test_rfc_crawl_delay_drives_round_budget(spark):
    from graven_spark.operators.politeness import rfc_delay_budgets, select_round

    pages = spark.createDataFrame(
        [(f"https://{h}/robots.txt", dt.datetime(2024, 1, 1), t, None, None)
         for h, t in [
             ("slow.example.com", b"User-agent: *\nDisallow:\nCrawl-delay: 5\n"),
             ("huge.example.com", b"User-agent: *\nDisallow:\nCrawl-delay: 99\n"),
             ("free.example.com", b"User-agent: *\nDisallow:\n"),
         ]], PAGES_DDL)
    rules = rules_from_robots_pages(pages, "graven")

    got = {r["host"]: r["_budget"] for r in rfc_delay_budgets(rules, 10.0).collect()}
    # window 10s: delay 5 -> 2/round; delay 99 -> floor 0 -> floored at 1
    assert got == {"slow.example.com": 2, "huge.example.com": 1,
                   "free.example.com": None}

    frontier = spark.createDataFrame(
        [(f"https://{h}/u{i}", h, 0, i, None, i, 0)
         for h in ("slow.example.com", "huge.example.com", "free.example.com")
         for i in range(4)],
        "url string, host string, depth int, priority long, "
        "parent_url string, discovery_idx long, retry_count int")
    sel = select_round(frontier, rules, default_budget=3, n_salts=2,
                       delay_window_s=10.0)
    picked = sorted(r.url for r in sel.filter(F.col("selected")).collect())
    by_host = {h: sum(1 for u in picked if h in u)
               for h in ("slow", "huge", "free")}
    assert by_host == {"slow": 2, "huge": 1, "free": 3}

    # without a delay window the Crawl-delay lines are inert: default rules
    sel0 = select_round(frontier, rules, default_budget=3, n_salts=2)
    assert sel0.filter(F.col("selected")).count() == 9  # 3 hosts x default 3
