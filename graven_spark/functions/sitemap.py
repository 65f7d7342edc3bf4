"""Sitemap-protocol (sitemaps.org XML) ingestion: parse + seed derivation.

The reference crawls one hand-seeded Maven host and has no sitemap notion
(seeds come from the CLI, /root/reference/graven/shared/cli_parser.py:246-259);
a web-scale frontier bootstraps from the sitemaps robots.txt advertises
(``functions/robots.py`` already collects the ``Sitemap:`` lines per RFC
9309 §2.4). Same two-layer design as robots:

- a PURE-PYTHON parser (:func:`parse_sitemap`) — stdlib ElementTree,
  namespace-agnostic, document order preserved — run identically by the
  executor UDF and by the correctness oracle (VALUES twin);
- a SPARK plan (:func:`entries_from_sitemap_pages`): sitemap bodies parse
  ONCE per sitemap URL in an Arrow-batched pandas UDF; entries explode
  with their document position so downstream seed ordering is
  deterministic. Sitemap files are O(#hosts × 50k-entry shards) — tiny
  next to the frontier — so this never shuffles frontier-scale data;
  index files (``<sitemapindex>``) surface as ``kind='index'`` rows whose
  locs are FURTHER sitemap fetches for the caller to resolve (one level,
  matching the protocol's single nesting).

Semantics (sitemaps.org/protocol.html):
- ``<urlset>`` → one entry per ``<url>``: loc (required; entry dropped if
  missing/empty), lastmod (W3C datetime, kept as the raw string — parsing
  to timestamp is the caller's typed step), changefreq, priority (float,
  clamped to [0,1], default 0.5 when absent/malformed);
- ``<sitemapindex>`` → one entry per ``<sitemap>``: loc + lastmod;
- malformed XML → zero entries with ``parse_failed=true`` (a crawler must
  survive junk bodies, never abort the round).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# entry struct carried per sitemap row (document order == array order)
ENTRIES_TYPE = (
    "kind string, parse_failed boolean, "
    "entries array<struct<loc: string, lastmod: string, changefreq: string, "
    "priority: double>>"
)


def _local(tag: str) -> str:
    """Strip the XML namespace: '{ns}url' → 'url'."""
    return tag.rsplit("}", 1)[-1].lower()


def _text(el) -> str:
    return (el.text or "").strip()


def parse_sitemap(body) -> dict:
    """→ ``{kind: 'urlset'|'index'|None, parse_failed: bool,
    entries: [(loc, lastmod, changefreq, priority)]}`` in document order.
    Pure function: the executor UDF and the DuckDB oracle call exactly
    this."""
    if isinstance(body, (bytes, bytearray)):
        body = body.decode("utf-8", "replace")
    try:
        root = ET.fromstring(body or "")
    except ET.ParseError:
        return {"kind": None, "parse_failed": True, "entries": []}
    kind_tag = _local(root.tag)
    if kind_tag == "urlset":
        kind, child_tag = "urlset", "url"
    elif kind_tag == "sitemapindex":
        kind, child_tag = "index", "sitemap"
    else:
        return {"kind": None, "parse_failed": True, "entries": []}
    entries = []
    for child in root:
        if _local(child.tag) != child_tag:
            continue
        fields = {"loc": None, "lastmod": None, "changefreq": None, "priority": None}
        for f in child:
            name = _local(f.tag)
            if name in fields and fields[name] is None:
                fields[name] = _text(f)
        if not fields["loc"]:
            continue  # loc is required; entry without one is dropped
        if kind == "urlset":
            try:
                prio = min(1.0, max(0.0, float(fields["priority"])))
            except (TypeError, ValueError):
                prio = 0.5  # protocol default
        else:
            prio = None  # index rows carry no priority
        entries.append(
            (fields["loc"], fields["lastmod"] or None,
             fields["changefreq"] or None if kind == "urlset" else None, prio)
        )
    return {"kind": kind, "parse_failed": False, "entries": entries}


def entries_from_sitemap_pages(pages, url_col: str = "url", body_col: str = "html"):
    """sitemap page rows → exploded entry rows
    ``(sitemap_url, kind, parse_failed, entry_idx, loc, lastmod,
    changefreq, priority)`` in document order. One Arrow-UDF call per
    sitemap body; the output is seed-sized (O(entries)), so everything
    downstream (ordering, dedup against seen, union into seeds) is
    ordinary JVM-side work."""

    @F.pandas_udf(ENTRIES_TYPE)
    def _parse(body: pd.Series) -> pd.DataFrame:
        out = {"kind": [], "parse_failed": [], "entries": []}
        for b in body:
            p = parse_sitemap(b)
            out["kind"].append(p["kind"])
            out["parse_failed"].append(p["parse_failed"])
            out["entries"].append(p["entries"])
        return pd.DataFrame(out)

    parsed = pages.select(
        F.col(url_col).alias("sitemap_url"), _parse(F.col(body_col)).alias("p")
    )
    return parsed.select(
        "sitemap_url",
        "p.kind",
        "p.parse_failed",
        F.posexplode_outer("p.entries").alias("entry_idx", "e"),
    ).select(
        "sitemap_url",
        "kind",
        "parse_failed",
        F.col("entry_idx").cast("int").alias("entry_idx"),
        F.col("e.loc").alias("loc"),
        F.col("e.lastmod").alias("lastmod"),
        F.col("e.changefreq").alias("changefreq"),
        F.col("e.priority").alias("priority"),
    )


def seeds_from_sitemaps(pages, rules_df, agent_hint: str = "graven"):
    """robots-advertised sitemaps → ordered seed frame ``(url, seed_rank)``.

    ``rules_df`` is the RFC table from ``robots.rules_from_robots_pages``
    (its ``sitemaps`` array holds the advertised URLs). One resolution
    level: index files' locs are looked up back in ``pages`` and parsed
    too (protocol allows exactly one nesting). Seed order is deterministic:
    ``(sitemap_url, entry_idx)`` — advertisement order is host-local so
    lexicographic sitemap_url keeps hosts stable — and duplicate locs keep
    their first occurrence. All joins here are seed-scale; the only
    frontier-scale table (``pages``) is probed with a semi-join on its
    bucketed url column."""
    sm_urls = rules_df.select(
        F.explode("sitemaps").alias("url")
    ).dropDuplicates(["url"])
    direct = entries_from_sitemap_pages(
        pages.join(F.broadcast(sm_urls), "url", "semi")
    )
    # one nesting level: index entries name further sitemaps
    nested_urls = (
        direct.filter(F.col("kind") == "index")
        .select(F.col("loc").alias("url"))
        .dropDuplicates(["url"])
    )
    nested = entries_from_sitemap_pages(
        pages.join(F.broadcast(nested_urls), "url", "semi")
    )
    locs = (
        direct.filter(F.col("kind") == "urlset")
        .unionByName(nested.filter(F.col("kind") == "urlset"))
        .filter(F.col("loc").isNotNull())
    )
    # seed-scale frame: global row_numbers (single-partition sort over
    # O(entries) rows) are fine here
    w_first = (
        locs.withColumn(
            "_pos",
            F.row_number().over(Window.orderBy("sitemap_url", "entry_idx")),
        )
        .withColumn(
            "_dup",
            F.row_number().over(Window.partitionBy("loc").orderBy("_pos")),
        )
        .filter(F.col("_dup") == 1)
        .withColumn("seed_rank", F.row_number().over(Window.orderBy("_pos")))
    )
    return w_first.select(F.col("loc").alias("url"), "seed_rank").orderBy("seed_rank")
