"""Pure-Python crawl semantics shared by the Spark engine, the synthetic-data
generator, and the single-threaded reference oracle.

Keeping these here (no Spark imports) guarantees the three agree by
construction on: the link-extraction regex, HTML→text extraction, URL
canonicalization, and the priority arithmetic that pins the reference's FIFO
(BFS) ordering.

Reference semantics reproduced:
- link regex: ``/root/reference/graven/worker/crawler.py:24-25`` (byte-exact
  same pattern, ``re.finditer`` document order).
- URL absolutization ``child = parent + href``:
  ``/root/reference/graven/worker/crawler.py:74,80``.
- trailing-slash canonicalization of roots:
  ``/root/reference/graven/worker/crawler.py:152,195``.
- listing-timestamp format ``%Y-%m-%d %H:%M``:
  ``/root/reference/graven/worker/crawler.py:91``.
"""

from __future__ import annotations

import hashlib
import re
from dataclasses import dataclass
from urllib.parse import urlsplit

# Byte-exact copy of MAVEN_HTML_REGEX (reference graven/worker/crawler.py:24-25).
# group(1) = child directory href (re-crawled), group(2) = leaf ``*jar`` href
# (recorded, not crawled), group(3) = optional listing timestamp.
LINK_REGEX = re.compile(
    "href=\"(?!\\.\\.)(?:(.*?/)|(.*?jar))\"(?:.*</a>\\s*(\\d{4}-\\d{2}-\\d{2} \\d{2}:\\d{2})|)"
)

LISTING_TS_FORMAT = "%Y-%m-%d %H:%M"  # crawler.py:91
LISTING_TS_SPARK_FORMAT = "yyyy-MM-dd HH:mm"

# Priority arithmetic. A child's schedule priority is
#   priority_base + parent_fifo_rank * PRIORITY_STRIDE + discovery_idx
# where parent_fifo_rank is the parent's 0-based rank (by priority) among the
# URLs fetched in the same round and priority_base is a monotone per-round
# counter. This reproduces the reference's single-threaded FIFO dequeue order
# (queue.Queue, crawler.py:52): earlier-enqueued URLs always carry smaller
# priorities, including politeness-deferred rows which keep their original
# (smaller) priority. 2^20 links per page × 2^43 fetches fits int64.
PRIORITY_STRIDE = 1 << 20
# Seeds occupy priorities [0, PRIORITY_STRIDE); discovered URLs start above.
SEED_PRIORITY_BASE = PRIORITY_STRIDE

_TAG_RE = re.compile(r"<[^>]*>")
_WS_RE = re.compile(r"\s+")


def canonicalize_url(url: str) -> str:
    """Root/seed canonicalization: ensure trailing slash (crawler.py:152,195).

    Applied to seed URLs only — discovered links are used verbatim after
    absolutization, exactly as the reference does.
    """
    return url if url.endswith("/") else url + "/"


def url_host(url: str) -> str:
    """Host component, for politeness grouping (north_rule; the reference is
    single-host so it has no analog — closest is the global request cap,
    crawler.py:27)."""
    return urlsplit(url).netloc


def url_path(url: str) -> str:
    return urlsplit(url).path


def extract_text_py(html: bytes | str) -> str:
    """Deterministic HTML→text extraction.

    The engine-defined golden function: the synthetic ``pages.text`` column is
    produced with it, and the engine's Arrow UDF must be byte-identical per
    url (BASELINE.json input_hint). Tags stripped, whitespace collapsed.
    """
    if isinstance(html, (bytes, bytearray)):
        html = html.decode("utf-8", errors="replace")
    return _WS_RE.sub(" ", _TAG_RE.sub(" ", html)).strip()


@dataclass(frozen=True)
class Link:
    href: str
    is_dir: bool
    ts_str: str | None  # listing timestamp text for leaves, else None


def extract_links_py(html: bytes | str) -> list[Link]:
    """Document-order link extraction with the reference regex
    (crawler.py:62-96 semantics: group1 → dir link, group2 → leaf link with
    optional group3 timestamp; ``../`` excluded by the lookahead)."""
    if isinstance(html, (bytes, bytearray)):
        html = html.decode("utf-8", errors="replace")
    out: list[Link] = []
    for m in LINK_REGEX.finditer(html):
        if m.group(1):
            out.append(Link(m.group(1), True, None))
        elif m.group(2):
            ts = m.group(3)
            out.append(Link(m.group(2), False, ts.strip() if ts else None))
    return out


def extract_links_strict_py(html: bytes | str) -> tuple[list[Link], bool]:
    """Like :func:`extract_links_py` but reproduces the reference's failure
    mode: a leaf ``*jar`` match with no listing timestamp raises inside
    ``_parse_html`` (``match.group(3).strip()`` on None, crawler.py:91), which
    aborts the page's parse — links found *before* the bad match were already
    enqueued/upserted and survive (crawler.py:119-125 catches the error after
    the fact). Returns (links_up_to_failure, parse_failed)."""
    links = extract_links_py(html)
    for i, link in enumerate(links):
        if not link.is_dir and link.ts_str is None:
            return links[:i], True
    return links, False


def stable_hash64(s: str) -> int:
    """Deterministic 64-bit hash (synthetic-data generation + oracle only;
    the Spark hot path uses JVM-side ``xxhash64``)."""
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "big")


def robots_blocked(path: str, disallow_prefixes: list[str] | None) -> bool:
    """robots.txt-style gate: block when the URL path starts with any
    disallowed prefix (north_rule; no reference analog)."""
    if not disallow_prefixes:
        return False
    return any(path.startswith(p) for p in disallow_prefixes)
