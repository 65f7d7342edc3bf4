"""Unit tests for the core relational operators: Bloom shards, admission,
first-occurrence dedup, politeness selection, global ranking."""

from __future__ import annotations

from pyspark.sql import functions as F

from graven_spark.operators.bloom import BloomSpec, build_shards, merge_shards, probe
from graven_spark.operators.dedup import admit_new, first_occurrence
from graven_spark.operators.politeness import gate_robots, select_round
from graven_spark.operators.ranking import with_global_rank

SPEC = BloomSpec(n_buckets=4, bits_per_shard=1 << 12, n_hashes=5)


def test_bloom_no_false_negatives(spark):
    urls = spark.createDataFrame([(f"u{i}",) for i in range(500)], "url string")
    shards = build_shards(urls, SPEC)
    probed = probe(urls.select("url"), shards, SPEC)
    assert probed.filter(~F.col("maybe_seen")).count() == 0  # every member hits


def test_bloom_merge_is_union(spark):
    a = spark.createDataFrame([(f"a{i}",) for i in range(100)], "url string")
    b = spark.createDataFrame([(f"b{i}",) for i in range(100)], "url string")
    merged = merge_shards(build_shards(a, SPEC), build_shards(b, SPEC))
    probed = probe(a.union(b), merged, SPEC)
    assert probed.filter(~F.col("maybe_seen")).count() == 0


def test_admit_new_with_and_without_bloom_agree(spark):
    cand = spark.createDataFrame(
        [(f"u{i}", i) for i in range(200)], "url string, priority long"
    )
    seen = spark.createDataFrame(
        [(0, f"u{i}") for i in range(0, 200, 2)], "url_hash long, url string"
    )
    exact = {r.url for r in admit_new(cand, seen).collect()}
    shards = build_shards(seen, SPEC)
    with_bloom = {r.url for r in admit_new(cand, seen, shards, SPEC).collect()}
    assert exact == with_bloom == {f"u{i}" for i in range(1, 200, 2)}


def test_first_occurrence_keeps_min_priority(spark):
    df = spark.createDataFrame(
        [("u", 5, "a"), ("u", 2, "b"), ("v", 9, "c")],
        "url string, priority long, tag string",
    )
    got = {r.url: (r.priority, r.tag) for r in first_occurrence(df).collect()}
    assert got == {"u": (2, "b"), "v": (9, "c")}


def _frontier(spark, rows):
    return spark.createDataFrame(
        rows,
        "url string, host string, depth int, priority bigint, "
        "parent_url string, discovery_idx int, retry_count int",
    )


def test_select_round_budget_and_order(spark):
    rows = [
        (f"https://h1/x{i}/", "h1", 0, i, None, 0, 0) for i in range(10)
    ] + [(f"https://h2/y{i}/", "h2", 0, 100 + i, None, 0, 0) for i in range(3)]
    frontier = _frontier(spark, rows)
    robots = spark.createDataFrame(
        [("h1", [], 4), ("h2", [], 2)],
        "host string, disallow_prefixes array<string>, crawl_delay_tokens int",
    )
    flagged = select_round(frontier, robots, n_salts=3)
    sel = {r.url for r in flagged.filter("selected").collect()}
    # per host: budget-many smallest priorities
    assert sel == {f"https://h1/x{i}/" for i in range(4)} | {
        "https://h2/y0/", "https://h2/y1/"
    }
    assert flagged.count() == 13  # nothing lost


def test_select_round_salt_count_invariant(spark):
    """n_salts is a pure performance knob: the selected set is identical at
    every salt count (the salted window only PRUNES candidates above the
    k-th priority; the exact per-host selection runs after)."""
    rows = [
        (f"https://mega/x{i}/", "mega", 0, (i * 37) % 101, None, 0, 0)
        for i in range(60)
    ] + [(f"https://h{i}/y/", f"h{i}", 0, i, None, 0, 0) for i in range(5)]
    frontier = _frontier(spark, rows)
    robots = spark.createDataFrame(
        [("mega", [], 7)],
        "host string, disallow_prefixes array<string>, crawl_delay_tokens int",
    )
    base = None
    for n_salts in (1, 4, 16):
        sel = {r.url for r in select_round(frontier, robots, n_salts=n_salts)
               .filter("selected").collect()}
        base = sel if base is None else base
        assert sel == base
    assert len(base) == 12  # mega budget 7 + 5 singleton hosts


def test_gate_robots_prefix(spark):
    cand = spark.createDataFrame(
        [("https://h1/block/a/", "h1"), ("https://h1/ok/", "h1"), ("https://h9/x/", "h9")],
        "url string, host string",
    )
    robots = spark.createDataFrame(
        [("h1", ["/block/"], 5)],
        "host string, disallow_prefixes array<string>, crawl_delay_tokens int",
    )
    got = {r.url for r in gate_robots(cand, robots).collect()}
    assert got == {"https://h1/ok/", "https://h9/x/"}  # unknown host passes


def test_global_rank_dense_and_ordered(spark):
    df = spark.createDataFrame([(i * 7 % 97,) for i in range(97)], "priority long")
    ranked, n, pinned = with_global_rank(df, "priority", "rnk", num_partitions=5)
    rows = sorted((r.priority, r.rnk) for r in ranked.collect())
    assert n == 97
    assert [r[1] for r in rows] == list(range(97))  # rank == sort position
    pinned.unpersist()


def test_probe_jvm_matches_pandas_probe_exactly(spark):
    """The pure-JVM bit-test probe must agree with the vectorized pandas
    probe bit-for-bit on every url (members AND non-members — false
    positives included, since both must test the same numpy-built bit
    positions). A non-power-of-two spec exercises the pandas fallback."""
    from graven_spark.operators.bloom import broadcast_shard_map, probe_jvm
    import numpy as np

    members = spark.createDataFrame(
        [(f"m{i}",) for i in range(400)], "url string")
    shards = build_shards(members, SPEC)
    cand = spark.createDataFrame(
        [(f"m{i}",) for i in range(400)] + [(f"x{i}",) for i in range(2000)],
        "url string")

    shard_map = {
        int(r["bucket"]): np.frombuffer(r["filter"], dtype=np.uint8)
        for r in shards.collect()
    }
    got_jvm = {r.url: r.maybe_seen
               for r in probe_jvm(cand, shard_map, SPEC).collect()}
    # reference: the numpy kernels the builder/pandas probe share, driver-side
    from graven_spark.operators import bloom as B

    hashed = B.with_bloom_hashes(cand, "url", SPEC).collect()
    got_ref = {}
    for r in hashed:
        filt = shard_map.get(int(r.bucket))
        if filt is None:
            got_ref[r.url] = False
            continue
        pos = B._bit_positions(
            np.array([r._h1]), np.array([r._h2]), SPEC)
        got_ref[r.url] = bool(B._test_bits(filt, pos)[0])
    assert got_jvm == got_ref
    assert all(got_jvm[f"m{i}"] for i in range(400))  # no false negatives
    assert broadcast_shard_map is not None  # imported surface stays exported


def test_probe_odd_bits_falls_back_and_finds_members(spark):
    odd = BloomSpec(n_buckets=4, bits_per_shard=3000, n_hashes=5)
    urls = spark.createDataFrame([(f"u{i}",) for i in range(300)], "url string")
    shards = build_shards(urls, odd)
    probed = probe(urls.select("url"), shards, odd)
    assert probed.filter(~F.col("maybe_seen")).count() == 0
