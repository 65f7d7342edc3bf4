"""Per-stage profile of the EXACT bench schedule job (bucketed warehouse
tables, pinned shuffle partitions) at one parallelism level — run it under
``taskset`` at two levels to see which stage loses scaling:

    taskset -c 0-7  python scripts/profile_wh.py 8
    taskset -c 0-31 python scripts/profile_wh.py 32

Prints each stage's wall, task-time sum, max task, GC, and the covered
wall — the same event-log methodology as stage_profile.py but on the
measure_schedule job (pages_b/seen_b bucketed tables) the BENCH/BASELINE.md
scaling numbers come from.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import bench


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    times = int(os.environ.get("SPARK_GRAFT_SCALE_TIMES", "32"))
    wh = bench.ensure_scale_tables(times)
    evdir = tempfile.mkdtemp(prefix=f"evlog_wh{n}_")
    spark = bench.scale_session(
        f"local[{n}]", wh, f"prof{n}",
        extra={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evdir,
            "spark.eventLog.compress": "false",
        },
    )
    shards = os.path.join(wh, "shards")
    robots = os.path.join(bench.SCALE_CACHE_DIR, "robots.parquet")
    # warm (JIT, python workers, catalog); marker separates the timed run
    bench.schedule_job(spark, "pages_b", "seen_b", shards, robots_path=robots)
    marker = time.time() * 1000
    t0 = time.time()
    bench.schedule_job(spark, "pages_b", "seen_b", shards, robots_path=robots)
    wall = time.time() - t0
    spark.stop()

    stages, task_time = [], {}
    for path in [p for p in glob.glob(f"{evdir}/**", recursive=True) if os.path.isfile(p)]:
        for line in open(path, errors="ignore"):
            try:
                ev = json.loads(line)
            except Exception:
                continue
            if not isinstance(ev, dict):
                continue
            if ev.get("Event") == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sub = si.get("Submission Time", 0)
                if sub < marker:
                    continue
                comp = si.get("Completion Time", sub)
                stages.append({
                    "id": si["Stage ID"],
                    "name": si["Stage Name"].split("\n")[0][:70],
                    "wall_s": round((comp - sub) / 1000, 2),
                    "sub": sub, "comp": comp,
                    "tasks": si["Number of Tasks"],
                })
            elif ev.get("Event") == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                m = ev.get("Task Metrics") or {}
                t = task_time.setdefault(sid, [0.0, 0.0, 0.0])
                t[0] += m.get("Executor Run Time", 0) / 1000
                t[2] += m.get("JVM GC Time", 0) / 1000
                ti = ev.get("Task Info", {})
                t[1] = max(t[1], (ti.get("Finish Time", 0) - ti.get("Launch Time", 0)) / 1000)
    total_task = sum(
        v[0] for k, v in task_time.items() if any(s["id"] == k for s in stages)
    )
    stages.sort(key=lambda s: -s["wall_s"])
    print(f"\n=== local[{n}] timed run: wall {wall:.2f}s | "
          f"task-sec {total_task:.0f} ({total_task / wall:.1f} cores busy avg) ===")
    for s in stages[:14]:
        tt = task_time.get(s["id"], [0, 0, 0])
        print(f"  {s['wall_s']:7.2f}s tasksec={tt[0]:7.1f} gc={tt[2]:5.1f} "
              f"maxtask={tt[1]:5.1f}s tasks={s['tasks']:4d} [{s['id']}] {s['name']}")


if __name__ == "__main__":
    main()
