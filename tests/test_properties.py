"""Property tests over random page graphs (SURVEY.md §5.4) — invariants that
hold independently of both the engine and the oracle implementations:

- no URL fetched twice,
- every reachable (non-blocked) page is found,
- the per-host politeness budget is never exceeded in any round,
- priorities are unique and strictly ordering-consistent.

Graphs are generated adversarially: duplicate multi-parent links, ``../``
links (lookahead exclusion), dead links, multiple hosts — via hypothesis on
the pure-Python oracle (fast), plus one engine/oracle cross-check per suite
run (the Spark path is covered exhaustively in test_crawl_replay).
"""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings, strategies as st

from graven_spark.core import extract_links_py
from graven_spark.oracle import crawl_oracle


def _mk_pages(tree: dict[str, list[tuple[str, bool]]], host: str) -> dict[str, dict]:
    """tree maps relative dir path → list of (href, is_dir)."""
    root = f"https://{host}/r/"
    pages = {}
    for rel, links in tree.items():
        url = root + rel
        lines = ['<a href="../">../</a>']
        for href, is_dir in links:
            if is_dir:
                lines.append(f'<a href="{href}">{href}</a>   -')
            else:
                lines.append(f'<a href="{href}">{href}</a>  2025-01-01 00:00')
        html = "\n".join(lines)
        pages[url] = {
            "html": html.encode(),
            "warc_ts": dt.datetime(2025, 1, 1),
            "lang": "en",
        }
    return pages


@st.composite
def graphs(draw):
    """Random 2-level dir trees with dup/dead links."""
    n_dirs = draw(st.integers(1, 6))
    tree: dict[str, list[tuple[str, bool]]] = {"": []}
    for i in range(n_dirs):
        rel = f"d{i}/"
        tree[""].append((rel, True))
        tree[rel] = []
        n_leaves = draw(st.integers(0, 4))
        for j in range(n_leaves):
            tree[rel].append((f"x{j}.jar", False))
        # duplicate multi-segment link from root to a grandchild
        if draw(st.booleans()) and n_leaves:
            tree[""].append((f"{rel}x0.jar", False))
        # dead link
        if draw(st.booleans()):
            tree[rel].append((f"dead{i}/", True))
    budget = draw(st.integers(1, 3))
    return tree, budget


@given(graphs())
@settings(max_examples=40, deadline=None)
def test_oracle_invariants(g):
    tree, budget = g
    host = "h.example.com"
    pages = _mk_pages(tree, host)
    robots = {host: {"disallow_prefixes": [], "crawl_delay_tokens": budget}}
    run = crawl_oracle(pages, [f"https://{host}/r"], robots)

    # budget never exceeded per host per round
    for lin in run.lineage:
        assert lin["urls_in"] <= budget

    # no URL appears in two frontier snapshots at different priorities /
    # no url fetched twice: each url enters the frontier exactly once
    first_prio: dict[str, int] = {}
    for snap in run.frontier_snapshots:
        for row in snap:
            if row.url in first_prio:
                assert first_prio[row.url] == row.priority  # deferred, not re-added
            else:
                first_prio[row.url] = row.priority

    # priorities unique within a snapshot, sorted order respected
    for snap in run.frontier_snapshots:
        prios = [r.priority for r in snap]
        assert prios == sorted(prios) and len(set(prios)) == len(prios)

    # completeness: every reachable dir was fetched, every reachable leaf
    # is in results ∪ dead-leaf errors
    reachable_dirs = set()
    reachable_leaves = set()
    root = f"https://{host}/r/"
    stack = [root]
    while stack:
        url = stack.pop()
        if url in reachable_dirs or url not in pages:
            continue
        reachable_dirs.add(url)
        for link in extract_links_py(pages[url]["html"]):
            child = url + link.href
            if link.is_dir:
                stack.append(child)
            else:
                reachable_leaves.add(child)
    fetched_dirs = {r.url for snap in run.frontier_snapshots for r in snap}
    assert fetched_dirs >= reachable_dirs
    got_leaves = {r["url"] for r in run.results} | {
        e["url"] for e in run.errors if e["stage"] == "download"
    }
    assert got_leaves >= {u for u in reachable_leaves}


@given(graphs(), st.integers(0, 3))
@settings(max_examples=25, deadline=None)
def test_retry_invariants(g, max_retries):
    """U4 requeue: every dead dir URL is attempted exactly max_retries+1
    times (one error row per attempt), retry_count never exceeds the cap and
    is non-decreasing per URL, the requeued row keeps its original priority,
    and the crawl still terminates (bounded retries)."""
    tree, budget = g
    host = "h.example.com"
    pages = _mk_pages(tree, host)
    robots = {host: {"disallow_prefixes": [], "crawl_delay_tokens": budget}}
    run = crawl_oracle(
        pages, [f"https://{host}/r"], robots, max_retries=max_retries
    )

    from collections import Counter

    dead_attempts = Counter(
        e["url"] for e in run.errors
        if e["stage"] == "crawler" and e["reason"] == "fetch_failed"
    )
    for url, n in dead_attempts.items():
        assert n == max_retries + 1, url

    prio: dict[str, int] = {}
    last_rc: dict[str, int] = {}
    for snap in run.frontier_snapshots:
        for r in snap:
            assert 0 <= r.retry_count <= max_retries
            assert prio.setdefault(r.url, r.priority) == r.priority
            assert last_rc.get(r.url, 0) <= r.retry_count
            last_rc[r.url] = r.retry_count
    # a retry actually happened when the graph has a dead dir and retries on
    if max_retries and dead_attempts:
        assert max(last_rc.values()) == max_retries
