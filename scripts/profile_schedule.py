"""Per-stage scaling profile of the schedule job: where does parallel
efficiency die between local[8] and local[32]?"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F

import bench
from graven_spark.functions.canon import host_of, url_hash
from graven_spark.functions.extract import extract_links
from graven_spark.operators.dedup import admit_new, first_occurrence
from graven_spark.operators.politeness import select_round
from graven_spark.operators.ranking import with_global_rank
from graven_spark.session import build_session

TIMES = int(os.environ.get("SPARK_GRAFT_SCALE_TIMES", "8"))


def profile(master: str) -> dict[str, float]:
    spark = build_session(master=master, app_name=f"profile_{master}")
    cache = bench.SCALE_CACHE_DIR
    pages_path = os.path.join(cache, "pages")
    workdir = tempfile.mkdtemp(prefix="prof_")
    seen_path, shards_path = bench.prepare_seen(spark, pages_path, workdir, TIMES)
    out: dict[str, float] = {}

    def timed(name, df):
        t0 = time.time()
        n = df.count()
        out[name] = round(time.time() - t0, 2)
        print(f"  {master} {name}: {out[name]}s (n={n})", flush=True)

    pages = bench._load_pages(spark, pages_path, TIMES)
    frontier = (
        pages.select("url").filter(F.col("url").endswith("/"))
        .select("url", host_of(F.col("url")).alias("host"), F.lit(0).alias("depth"),
                url_hash(F.col("url")).alias("priority"),
                F.lit(None).cast("string").alias("parent_url"),
                F.lit(0).alias("discovery_idx"), F.lit(0).alias("retry_count"))
    )
    timed("scan_frontier", frontier)
    flagged = select_round(frontier, None)
    selected = flagged.filter(F.col("selected")).drop("selected")
    timed("politeness", selected)
    t0 = time.time()
    ranked, _, _pinned = with_global_rank(selected, "priority", "fifo_rank")
    ranked_n = ranked.count()
    out["rank"] = round(time.time() - t0, 2)
    print(f"  {master} rank: {out['rank']}s (n={ranked_n})", flush=True)
    fetched = (
        bench._load_pages(spark, pages_path, TIMES).select("url", "html")
        .join(ranked.hint("shuffle_hash"), "url", "inner")
        .withColumn("ext", extract_links(F.col("html"))).drop("html")
    )
    timed("fetch_extract", fetched)
    links = fetched.select(F.col("url").alias("parent_url"), F.col("fifo_rank"),
                           F.posexplode(F.col("ext.links")).alias("discovery_idx", "link"))
    cand = links.select(
        F.concat(F.col("parent_url"), F.col("link.href")).alias("url"),
        (F.col("fifo_rank") * (1 << 20) + F.col("discovery_idx")).alias("priority"),
        F.col("link.is_dir").alias("is_dir"),
    ).withColumn("host", host_of(F.col("url")))
    timed("explode_cand", cand)
    timed("dedup", first_occurrence(cand))
    seen = spark.read.parquet(seen_path)
    shards = spark.read.parquet(shards_path)
    # engine shape: probe → dedup → anti-join in one admission call
    timed("admit", admit_new(cand, seen, shards, bench.BLOOM, dedup_first=True))
    timed("admit_exact_only", admit_new(cand, seen, dedup_first=True))
    spark.stop()
    return out


if __name__ == "__main__":
    masters = sys.argv[1:] or ["local[8]", "local[32]"]
    res = {m: profile(m) for m in masters}
    if len(res) == 2:
        a, b = list(res)
        print(f"\n{'stage':20s} {a:>10s} {b:>10s} speedup")
        for k in res[a]:
            sp = res[a][k] / max(res[b][k], 1e-9)
            print(f"{k:20s} {res[a][k]:10.2f} {res[b][k]:10.2f} {sp:6.2f}x")
