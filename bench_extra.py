"""Round-6 optimization-side benchmarks and profilers.

bench.py is frozen for measurement (the driver times the round with the
round-start copy); everything exploratory lives here instead:

- ``--profile-crawl``: run the bench's full_crawl once with event logs and
  print per-job wall time grouped by call site — finds where the 6-round
  BFS spends its time (actions, writes, counts).
- ``--profile-schedule``: the bench's mega schedule_job against the
  bucketed t32 tables with event logs → per-stage wall/task-sec/GC table.
- ``--micros``: noop-sink isolation of the 8 headline queries (best of 3).

Usage: python bench_extra.py --profile-crawl|--profile-schedule|--micros
"""

from __future__ import annotations

import glob
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import bench  # noqa: E402
from graven_spark.session import build_session  # noqa: E402


def _evlog_session(tag: str, evdir: str, master: str = "local[32]"):
    wh = bench.ensure_scale_tables(int(os.environ.get("SPARK_GRAFT_SCALE_TIMES", "32")))
    return bench.scale_session(
        master, wh, tag,
        extra={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evdir,
            "spark.eventLog.compress": "false",
        },
    )


def _parse_events(evdir: str):
    jobs, stages, task_time = [], [], {}
    files = [p for p in glob.glob(f"{evdir}/**", recursive=True) if os.path.isfile(p)]
    for path in files:
        for line in open(path, errors="ignore"):
            try:
                ev = json.loads(line)
            except Exception:
                continue
            if not isinstance(ev, dict):
                continue
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                props = ev.get("Properties") or {}
                jobs.append({
                    "id": ev["Job ID"], "sub": ev["Submission Time"],
                    "desc": props.get("spark.job.description")
                            or (ev.get("Stage Infos") or [{}])[-1].get("Stage Name", "?").split("\n")[0],
                    "end": None,
                })
            elif e == "SparkListenerJobEnd":
                for j in jobs:
                    if j["id"] == ev["Job ID"]:
                        j["end"] = ev["Completion Time"]
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sub = si.get("Submission Time", 0)
                comp = si.get("Completion Time", sub)
                stages.append({
                    "id": si["Stage ID"],
                    "name": si["Stage Name"].split("\n")[0][:70],
                    "wall_s": round((comp - sub) / 1000, 2),
                    "tasks": si["Number of Tasks"],
                })
            elif e == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                m = ev.get("Task Metrics") or {}
                t = task_time.setdefault(sid, [0.0, 0.0, 0.0])
                t[0] += m.get("Executor Run Time", 0) / 1000
                t[2] += m.get("JVM GC Time", 0) / 1000
                ti = ev.get("Task Info", {})
                dur = (ti.get("Finish Time", 0) - ti.get("Launch Time", 0)) / 1000
                t[1] = max(t[1], dur)
    return jobs, stages, task_time


def _label_phases(spark) -> None:
    """Monkeypatch job descriptions onto the crawl's action sites so the
    event-log profile attributes wall time to phases (profiling only)."""
    from pyspark.sql import DataFrame

    from graven_spark.operators import bloom, ranking
    from graven_spark.sources.checkpoint import RoundStore

    sc = spark.sparkContext

    orig_write = RoundStore.write

    def write(self, k, name, df):
        sc.setJobDescription(f"store.write:{name}")
        try:
            return orig_write(self, k, name, df)
        finally:
            sc.setJobDescription(None)
    RoundStore.write = write

    orig_probe = bloom.probe

    def probe(*a, **kw):
        sc.setJobDescription("bloom.probe_collect")
        try:
            return orig_probe(*a, **kw)
        finally:
            sc.setJobDescription(None)
    bloom.probe = probe
    import graven_spark.operators.dedup as dedup_mod
    dedup_mod.probe = probe

    orig_rank = ranking.with_global_rank

    def with_global_rank(*a, **kw):
        sc.setJobDescription("ranking.stats+counts")
        try:
            return orig_rank(*a, **kw)
        finally:
            sc.setJobDescription(None)
    ranking.with_global_rank = with_global_rank
    import graven_spark.plans.frontier as frontier_mod
    frontier_mod.with_global_rank = with_global_rank

    orig_lck = DataFrame.localCheckpoint

    def localCheckpoint(self, eager=True):
        sc.setJobDescription("localCheckpoint")
        try:
            return orig_lck(self, eager)
        finally:
            sc.setJobDescription(None)
    DataFrame.localCheckpoint = localCheckpoint

    orig_count = DataFrame.count

    def count(self):
        import traceback
        site = next((f"{os.path.basename(fr.filename)}:{fr.lineno}"
                     for fr in reversed(traceback.extract_stack())
                     if "graven_spark" in fr.filename or "bench" in os.path.basename(fr.filename)), "?")
        sc.setJobDescription(f"count@{site}")
        try:
            return orig_count(self)
        finally:
            sc.setJobDescription(None)
    DataFrame.count = count

    orig_first = DataFrame.first

    def first(self):
        sc.setJobDescription("ranking.stats_first")
        try:
            return orig_first(self)
        finally:
            sc.setJobDescription(None)
    DataFrame.first = first

    orig_compact = RoundStore.maybe_compact_seen

    def maybe_compact_seen(self, spark_, k):
        sc.setJobDescription("compact_seen")
        try:
            return orig_compact(self, spark_, k)
        finally:
            sc.setJobDescription(None)
    RoundStore.maybe_compact_seen = maybe_compact_seen


def profile_crawl() -> None:
    evdir = tempfile.mkdtemp(prefix="evlog_crawl_")
    spark = _evlog_session("prof_crawl", evdir)
    _label_phases(spark)
    cache = bench.ensure_bench_graph(spark)
    workdir = tempfile.mkdtemp(prefix="prof_crawl_")
    stats = bench.full_crawl(spark, cache, workdir, warm=True)
    print("crawl stats:", stats)
    spark.stop()
    jobs, stages, task_time = _parse_events(evdir)
    # group jobs by description/callsite
    agg: dict[str, list[float]] = {}
    for j in jobs:
        if j["end"] is None:
            continue
        agg.setdefault(j["desc"], []).append((j["end"] - j["sub"]) / 1000)
    rows = sorted(agg.items(), key=lambda kv: -sum(kv[1]))
    total = sum(sum(v) for _, v in rows)
    print(f"\n=== full_crawl (warm+timed runs): {len(jobs)} jobs, "
          f"sum job wall {total:.1f}s ===")
    for desc, vals in rows[:30]:
        print(f"  {sum(vals):7.2f}s  n={len(vals):4d}  avg={sum(vals)/len(vals):6.3f}s  {desc[:90]}")
    stages.sort(key=lambda s: -s["wall_s"])
    print("\n=== slowest stages ===")
    for s in stages[:20]:
        tt = task_time.get(s["id"], [0, 0, 0])
        print(f"  {s['wall_s']:6.2f}s tasksec={tt[0]:7.1f} gc={tt[2]:5.1f} "
              f"maxtask={tt[1]:5.2f}s tasks={s['tasks']:4d} [{s['id']}] {s['name']}")


def profile_schedule() -> None:
    evdir = tempfile.mkdtemp(prefix="evlog_sched_")
    spark = _evlog_session("prof_sched", evdir)
    wh = bench.ensure_scale_tables(int(os.environ.get("SPARK_GRAFT_SCALE_TIMES", "32")))
    shards = os.path.join(wh, "shards")
    robots = os.path.join(bench.SCALE_CACHE_DIR, "robots.parquet")
    # warm once (uncounted via marker on time)
    bench.schedule_job(spark, "pages_b", "seen_b", shards, robots_path=robots)
    marker = time.time() * 1000
    t0 = time.time()
    n = bench.schedule_job(spark, "pages_b", "seen_b", shards, robots_path=robots)
    wall = time.time() - t0
    spark.stop()
    jobs, stages, task_time = _parse_events(evdir)
    stages = [s for s in stages if s["id"] in task_time]
    print(f"\n=== schedule_job timed run: wall {wall:.2f}s, admitted {n} ===")
    # keep only stages submitted after the marker: re-parse with sub times
    _, all_stages, _ = jobs, stages, task_time
    stages.sort(key=lambda s: -s["wall_s"])
    for s in stages[:25]:
        tt = task_time.get(s["id"], [0, 0, 0])
        print(f"  {s['wall_s']:6.2f}s tasksec={tt[0]:7.1f} gc={tt[2]:5.1f} "
              f"maxtask={tt[1]:5.2f}s tasks={s['tasks']:4d} [{s['id']}] {s['name']}")


def micros(n_trials: int = 3) -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    wh = bench.ensure_scale_tables(int(os.environ.get("SPARK_GRAFT_SCALE_TIMES", "32")))
    spark = bench.scale_session("local[32]", wh, "micros")
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    out = {}
    for name in bench.HEADLINE_QUERIES:
        best = None
        for _ in range(n_trials):
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        out[name] = round(best, 3)
        print(f"  {name}: {out[name]}s")
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    if "--profile-crawl" in sys.argv:
        profile_crawl()
    elif "--profile-schedule" in sys.argv:
        profile_schedule()
    elif "--micros" in sys.argv:
        micros()
    else:
        print(__doc__)
