"""Dump formatted physical plans for the engine's hot paths and grep them
for the properties we promise (SURVEY.md §4): parquet filter/column
pushdown, broadcast joins where intended, whole-stage codegen coverage.
Writes PLANS.md at the repo root for review.

Usage: python scripts/explain_plans.py
"""

from __future__ import annotations

import contextlib
import io
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F

from graven_spark.functions.canon import host_of, url_hash
from graven_spark.functions.extract import extract_links
from graven_spark.operators.bloom import BloomSpec, build_shards
from graven_spark.operators.dedup import admit_new, first_occurrence
from graven_spark.operators.politeness import select_round
from graven_spark.operators.textops import exact_dedup
from graven_spark.session import build_session
from graven_spark.sources import synth

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "PLANS.md")
EXTRA_CHECKS: list[tuple[str, bool]] = []


def formatted(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    spark = build_session(master="local[4]", shuffle_partitions=4)
    tmp = tempfile.mkdtemp(prefix="plans_")
    graph = synth.generate_graph(synth.smoke_specs())
    pages_path = os.path.join(tmp, "pages.parquet")
    graph.pages.to_parquet(pages_path, index=False)

    sections: list[tuple[str, str, list[str]]] = []

    # 1. fetch join: pruned pages scan ⋈ broadcast round set
    pages = spark.read.parquet(pages_path).select("url", "html")
    round_set = spark.createDataFrame(
        [(u,) for u in graph.pages.url.head(20)], "url string"
    ).withColumn("priority", F.xxhash64("url"))
    fetch = pages.join(F.broadcast(round_set), "url", "inner").withColumn(
        "ext", extract_links(F.col("html"))
    )
    fetch_plan = formatted(fetch)
    sections.append((
        "Fetch join (pages ⋈ broadcast round set) + JVM link extraction",
        fetch_plan,
        ["BroadcastHashJoin", "ReadSchema: struct<url:string,html:binary>"],
    ))
    EXTRA_CHECKS.append((
        "link extraction is pure Catalyst (round 6): regexp scan + "
        "structural parse, zero Python eval nodes in the fetch path",
        "regexp_extract_all" in fetch_plan
        and "ArrowEval" not in fetch_plan
        and "BatchEvalPython" not in fetch_plan,
    ))

    # 2. pushdown: scheduling-only scan must NOT read html
    sched = spark.read.parquet(pages_path).select("url").filter(
        F.col("url").endswith("/")
    )
    sections.append((
        "Scheduling scan (url only; html must be pruned; filter pushed)",
        formatted(sched),
        ["ReadSchema: struct<url:string>", "PushedFilters"],
    ))

    # 3. seen admission: bloom probe + single anti-join
    cand = (
        spark.createDataFrame([(u,) for u in graph.pages.url.head(50)], "url string")
        .withColumn("priority", url_hash(F.col("url")))
        .withColumn("host", host_of(F.col("url")))
    )
    seen = spark.createDataFrame(
        [(0, u) for u in graph.pages.url.tail(30)], "url_hash long, url string"
    )
    spec = BloomSpec(n_buckets=4, bits_per_shard=1 << 12)
    shards = build_shards(seen, spec)
    adm = admit_new(first_occurrence(cand), seen, shards, spec)
    sections.append((
        "Admission (first-occurrence dedup → bloom probe → single anti-join)",
        formatted(adm),
        # static plan shows SMJ; AQE converts to broadcast at runtime when the
        # seen side is small. min/min_by buffers aren't hash-agg capable, so
        # first_occurrence compiles to SortAggregate BY DESIGN (measured
        # cheapest vs min_by(struct) and vs agg+semi-join-back, which would
        # run the extraction explode twice — see dedup.first_occurrence docs).
        ["LeftAnti", "SortAggregate"],
    ))

    # 3b. ENGINE-PATH admission: a real crawl state (RoundStore with a
    # compacted bucketed seen_full) — the anti-join's seen side must read the
    # bucketed base with NO Exchange and NO Sort. This is the shipped loop,
    # not a bench-only table layout.
    from graven_spark.plans.driver import crawl
    from graven_spark.plans.frontier import CrawlConfig

    seeds = spark.createDataFrame(graph.seeds)
    cfg = CrawlConfig(use_bloom=True, bloom=spec, compact_every=3, seen_buckets=4)
    out = crawl(spark, pages_path, seeds, None, os.path.join(tmp, "state"), cfg)
    store, kf = out.store, out.final_round
    base = store.read_seen_base(spark, kf)
    deltas = store.read_seen_deltas(spark, kf)
    assert base is not None, "compaction must have produced a bucketed base"
    assert deltas is not None, "state must hold post-compaction deltas"
    cand2 = (
        spark.read.parquet(pages_path).select("url")
        .withColumn("priority", url_hash(F.col("url")))
        .withColumn("host", host_of(F.col("url")))
    )
    # At sandbox sizes AQE rightly broadcasts the tiny base (bucketing then
    # "disabled by query planner"). The audit pins the SCALE plan — the one
    # a 10^10-row base gets — by ruling out auto-broadcast for this section.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
    eng = admit_new(
        cand2,
        [base, deltas],
        store.read_shards(spark, kf),
        spec,
        dedup_first=True,
    )
    eng_plan = formatted(eng)
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    n_exchanges = len([ln for ln in eng_plan.splitlines() if ") Exchange" in ln])
    seen_scan_ok = "Bucketed: true" in eng_plan and "SelectedBucketsCount" in eng_plan
    # Expected data movement in the WHOLE admission plan: exactly TWO
    # Exchanges — (1) the candidate set's single hash shuffle on url feeding
    # the base anti-join (round 6 order: join BEFORE dedup), whose
    # url-partitioning and sort order the delta anti-join AND the
    # first-occurrence SortAggregate then REUSE (zero exchange AND zero sort
    # on the bucketed seen base side, no candidate re-shuffle, no second
    # sort for the aggregate), and (2) the small post-compaction delta side.
    tree = eng_plan.split("\n\n(1)")[0].splitlines()
    scan_idx = next(
        i for i, ln in enumerate(tree) if "Scan parquet spark_catalog" in ln
    )
    indent = tree[scan_idx].index("+-")
    parent = next(
        ln for ln in reversed(tree[:scan_idx])
        if ("+-" in ln and ln.index("+-") < indent) or (":-" in ln and ln.index(":-") < indent)
    )
    extra = [
        ("engine admission: bucketed base scan (Bucketed: true + SelectedBucketsCount)", seen_scan_ok),
        (f"engine admission: exactly 2 Exchanges (candidate agg + delta side); got {n_exchanges}", n_exchanges == 2),
        (f"engine admission: base scan's parent is the join, not a Sort (got `{parent.strip()}`)",
         "Sort" not in parent),
    ]
    sections.append((
        "ENGINE admission (RoundStore bucketed seen_full base + deltas)",
        eng_plan,
        ["LeftAnti", "Bucketed: true", "SelectedBucketsCount"],
    ))
    EXTRA_CHECKS.extend(extra)

    # 4. politeness threshold selection
    robots = spark.createDataFrame(
        graph.robots,
        schema="host string, disallow_prefixes array<string>, crawl_delay_tokens int",
    )
    frontier = cand.select(
        "url", "host", F.lit(0).alias("depth"), "priority",
        F.lit(None).cast("string").alias("parent_url"),
        F.lit(0).alias("discovery_idx"), F.lit(0).alias("retry_count"),
    )
    sel = select_round(frontier, robots)
    sections.append((
        "Politeness selection (threshold broadcast join; no frontier shuffle)",
        formatted(sel),
        ["BroadcastHashJoin"],
    ))

    # 5. training op: exact dedup (map-side combinable hash aggregate)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    sections.append((
        "Exact dedup over documents (partial HashAggregate before shuffle)",
        formatted(exact_dedup(docs)),
        ["HashAggregate", "partial_min"],
    ))

    # 6. indexed ANN: the persisted SRP index must answer a query by
    # PARTITION PRUNING (PartitionFilters on srp_bucket) — no re-hash of the
    # table, no full scan; and the plan must stay O(1) in embedding dim
    # (srp_bucket's hyperplanes ride ONE nested-array literal)
    from graven_spark.operators import simsearch

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).head().embedding]
    idx_path = os.path.join(tmp, "srp_idx")
    simsearch.write_srp_index(emb, idx_path, dim=len(qv), n_planes=6)
    ann = simsearch.ann_topk_indexed(spark, idx_path, qv, k=10, n_planes=6)
    ann_plan = formatted(ann)
    sections.append((
        "Indexed ANN (partition-pruned SRP bucket probe)",
        ann_plan,
        ["PartitionFilters", "srp_bucket"],
    ))

    # 7. jar_table winner pick: min over the WHOLE struct (deterministic
    # winner under any row order / host race). Struct-min buffers aren't
    # hash-agg capable so this is a SortAggregate BY DESIGN — still a
    # map-side partial agg + ONE shuffle on high-cardinality jar_id, and
    # measured at 2M rows / 200k jars on local[32] it matches the
    # nondeterministic min_by variant (0.59 s vs 0.58 s): determinism is
    # free (pipeline.jar_table docstring).
    from graven_spark.plans.pipeline import jar_table

    results_like = spark.read.parquet(pages_path).select(
        "url", F.col("warc_ts").alias("publish_ts")
    )
    jt_plan = formatted(jar_table(results_like, "run0"))
    jt_exchanges = len([ln for ln in jt_plan.splitlines() if ") Exchange" in ln])
    EXTRA_CHECKS.append((
        f"jar_table: exactly 1 Exchange (hash on jar_id); got {jt_exchanges}",
        jt_exchanges == 1,
    ))
    sections.append((
        "jar_table winner pick (deterministic min(struct); partial agg + one jar_id shuffle)",
        jt_plan,
        ["SortAggregate", "partial_min"],
    ))

    # 8. nvd_batch_lookup against a BUCKETED cve_ref: the docstring promise
    # (plans/enrich.py nvd_batch_lookup) — the big reference side joins with
    # NO Exchange when cve_ref is stored bucketed by cve_id; only the
    # requested-ids side (which must survive as outer rows) shuffles.
    from graven_spark.plans.enrich import nvd_batch_lookup

    spark.sql("DROP TABLE IF EXISTS plans_cve_ref")
    ref_rows = spark.range(0, 5000).select(
        F.concat(F.lit("CVE-2024-"), F.col("id")).alias("cve_id"),
        F.concat(F.lit("desc-"), F.col("id")).alias("description_en"),
        (F.col("id") % 10).cast("double").alias("base_score"),
        F.array(F.concat(F.lit("CWE-"), (F.col("id") % 700))).alias("cwes"),
    )
    ref_rows.write.mode("overwrite").bucketBy(8, "cve_id").sortBy(
        "cve_id"
    ).saveAsTable("plans_cve_ref")
    ids = spark.range(0, 2000).select(
        F.concat(F.lit("CVE-2024-"), (F.col("id") * 3) % 6000).alias("cve_id")
    )
    prev_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    nvd_plan = formatted(nvd_batch_lookup(ids, spark.table("plans_cve_ref")))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thresh)
    # walk the ref scan's ANCESTOR chain up to the join: no Exchange allowed
    ntree = nvd_plan.split("\n\n(1)")[0].splitlines()
    ref_idx = next(i for i, ln in enumerate(ntree) if "plans_cve_ref" in ln)

    def _marker(ln):
        cands = [p for p in (ln.find("+-"), ln.find(":-")) if p >= 0]
        return min(cands) if cands else None

    cur = _marker(ntree[ref_idx])
    ref_side_clean = True
    for ln in reversed(ntree[:ref_idx]):
        m = _marker(ln)
        if m is None or (cur is not None and m >= cur):
            continue
        if "Join" in ln:
            break
        if "Exchange" in ln:
            ref_side_clean = False
        cur = m
    nvd_bucketed = "Bucketed: true" in nvd_plan
    EXTRA_CHECKS.append((
        "nvd_batch_lookup: bucketed cve_ref scan (Bucketed: true), no Exchange "
        "between the ref scan and the join",
        nvd_bucketed and ref_side_clean,
    ))
    sections.append((
        "NVD batch lookup (requested ids ⋈ bucketed cve_ref; ref side exchange-free)",
        nvd_plan,
        ["SortMergeJoin", "Bucketed: true"],
    ))
    spark.sql("DROP TABLE IF EXISTS plans_cve_ref")

    # -- RFC robots gate: per-URL verdict must stay JVM-side -----------------
    # The Arrow parse UDF belongs to the tiny rules derivation (pinned by
    # localCheckpoint in the CLI); the frontier-scale gate must be a
    # broadcast join + codegen fold with NO Python evaluation node.
    import datetime as _dt

    from graven_spark.functions.robots import (
        gate_robots_rfc,
        rules_from_robots_pages,
    )

    robots_pages = spark.createDataFrame(
        [("https://h0.example.com/robots.txt", _dt.datetime(2024, 1, 1),
          b"User-agent: *\nAllow: /keep/*.html$\nDisallow: /keep/\n",
          None, None)],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    rules = rules_from_robots_pages(robots_pages, "graven").localCheckpoint()
    # host must be a derived column (as in the real frontier) — a literal
    # host constant-folds the join key and degrades to a nested-loop join.
    cand = spark.range(10000).select(
        F.concat(F.lit("https://h0.example.com/keep/p"), F.col("id"))
        .alias("url"),
    ).withColumn("host", host_of(F.col("url")))
    gate_plan = formatted(gate_robots_rfc(cand, rules))
    EXTRA_CHECKS.append((
        "robots RFC gate: BroadcastHashJoin on host, zero Python eval nodes "
        "(ArrowEval/BatchEvalPython) in the per-URL path",
        "BroadcastHashJoin" in gate_plan
        and "EvalPython" not in gate_plan
        and "ArrowEval" not in gate_plan,
    ))
    sections.append((
        "RFC robots gate (candidates ⋈ broadcast rules; JVM-only "
        "longest-match fold)",
        gate_plan,
        ["BroadcastHashJoin"],
    ))

    # -- RFC 3986 normalization: pure codegen, no Python eval nodes ----------
    from graven_spark.functions.urlnorm import normalize_url

    norm_plan = formatted(
        cand.select(normalize_url(F.col("url")).alias("url"))
    )
    EXTRA_CHECKS.append((
        "url normalization: zero Python eval nodes (the dot-segment fold is "
        "a JVM higher-order aggregate)",
        "EvalPython" not in norm_plan and "ArrowEval" not in norm_plan,
    ))
    sections.append((
        "RFC 3986 URL normalization (admission-path column expression)",
        norm_plan,
        ["Project"],
    ))

    # -- content-dedup extraction: UDF above the per-body aggregate ----------
    from graven_spark.functions.extract import dedup_body_extract, extract_text

    body_df = spark.range(10000).select(
        F.concat(F.lit("https://h0.example.com/p"), F.col("id")).alias("url"),
        F.encode((F.col("id") % 7).cast("string"), "utf-8").alias("html"),
    ).withColumn("body_sha", F.sha2(F.col("html"), 256))
    dedup_plan = formatted(dedup_body_extract(body_df, extract_text, "text"))
    EXTRA_CHECKS.append((
        "content-dedup extraction: JVM extraction (round 6: regexp "
        "expressions, no Python eval node at all) runs above first(html) per "
        "body_sha (map-side partial_first keeps the shuffle at one body per "
        "hash/partition); join-back keys on body_sha with NO forced "
        "broadcast (distinct side unbounded — AQE broadcasts iff small)",
        "regexp_replace" in dedup_plan
        and "ArrowEval" not in dedup_plan
        and "BatchEvalPython" not in dedup_plan
        and "partial_first" in dedup_plan
        and "body_sha" in dedup_plan,
    ))
    sections.append((
        "Content-dedup extraction (--dedup-content: one UDF call per "
        "distinct body, join back to URLs on body_sha)",
        dedup_plan,
        ["partial_first"],
    ))

    # -- composed corpus prep: one plan, no cartesian, bucketed near-dup ----
    from graven_spark.operators.textops import corpus_prepare

    docs_df = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("the quick text number "), F.col("id").cast("string"))
        .alias("text"),
    )
    emb_df = spark.range(2000).select(
        F.col("id").alias("vec_id"),
        F.array(*[(F.col("id") * (i + 1) % 17).cast("float") / 17.0
                  for i in range(8)]).alias("embedding"),
    )
    corpus_plan = formatted(corpus_prepare(docs_df, emb_df, dim=8, n_planes=4))
    EXTRA_CHECKS.append((
        "corpus_prepare composition: zero CartesianProduct/BroadcastNestedLoop "
        "(the near-dup candidate join is keyed on the SRP bucket), exact-dedup "
        "partial min is map-side, zero Python eval nodes (every gate is JVM)",
        "CartesianProduct" not in corpus_plan
        and "BroadcastNestedLoop" not in corpus_plan
        and "partial_min" in corpus_plan
        and "ArrowEval" not in corpus_plan
        and "BatchEvalPython" not in corpus_plan,
    ))
    sections.append((
        "Composed corpus prep (exact dedup → lang/quality gates → "
        "embedding near-dup drop → token counts, one plan)",
        corpus_plan,
        ["partial_min"],
    ))

    lines = ["# PLANS — physical-plan evidence for the hot paths",
             "",
             "Generated by `python scripts/explain_plans.py`. Each section lists",
             "the properties asserted (✅/❌ checked mechanically below the plan).",
             ""]
    ok = True
    for title, plan, checks in sections:
        lines.append(f"## {title}\n")
        lines.append("```\n" + plan.strip()[:6000] + "\n```\n")
        for c in checks:
            hit = c in plan
            ok = ok and hit
            lines.append(f"- {'✅' if hit else '❌'} contains `{c}`")
        lines.append("")
    if EXTRA_CHECKS:
        lines.append("## Structural checks (engine-path admission)\n")
        for desc, hit in EXTRA_CHECKS:
            ok = ok and hit
            lines.append(f"- {'✅' if hit else '❌'} {desc}")
        lines.append("")
    with open(OUT, "w") as f:
        f.write("\n".join(lines))
    print(f"PLANS.md written; all checks {'PASS' if ok else 'FAIL'}")


if __name__ == "__main__":
    main()
