"""Exact per-stage profile of the schedule job via Spark event logs.
Runs the job once per master, then prints each stage's wall duration,
task-time sum, and max-task skew — finds serial bottlenecks precisely."""

from __future__ import annotations

import glob
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import bench
from graven_spark.session import build_session

TIMES = int(os.environ.get("SPARK_GRAFT_SCALE_TIMES", "8"))


def run(master: str):
    evdir = tempfile.mkdtemp(prefix="evlog_")
    spark = build_session(
        master=master,
        app_name=f"stageprof_{master}",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evdir,
            "spark.eventLog.compress": "false",
        },
    )
    cache = bench.SCALE_CACHE_DIR
    pages_path = os.path.join(cache, "pages")
    workdir = tempfile.mkdtemp(prefix="sp_")
    seen_path, shards_path = bench.prepare_seen(spark, pages_path, workdir, TIMES)
    marker = 0  # no warm-up: profile the cold job, all stages kept
    t0 = time.time()
    bench.schedule_job(spark, pages_path, seen_path, shards_path, TIMES)
    wall = time.time() - t0
    spark.stop()

    stages = []
    task_time: dict[int, list[float]] = {}
    files = [p for p in glob.glob(f"{evdir}/**", recursive=True) if os.path.isfile(p)]
    for path in files:
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
                    continue  # warm-up stages
                comp = si.get("Completion Time", sub)
                stages.append(
                    {
                        "id": si["Stage ID"],
                        "name": si["Stage Name"].split("\n")[0][:60],
                        "wall_s": round((comp - sub) / 1000, 2),
                        "sub": sub, "comp": comp,
                        "tasks": si["Number of Tasks"],
                    }
                )
            elif ev.get("Event") == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                m = ev.get("Task Metrics") or {}
                task_time.setdefault(sid, [0.0, 0.0, 0.0])
                task_time[sid][0] += m.get("Executor Run Time", 0) / 1000
                task_time[sid][2] += m.get("JVM GC Time", 0) / 1000
                ti = ev.get("Task Info", {})
                dur = (ti.get("Finish Time", 0) - ti.get("Launch Time", 0)) / 1000
                task_time[sid][1] = max(task_time[sid][1], dur)
    # stage-coverage: wall covered by at least one running stage
    iv = sorted((s["sub"], s["comp"]) for s in stages)
    covered, cur_s, cur_e = 0, None, None
    for s_, e_ in iv:
        if cur_s is None:
            cur_s, cur_e = s_, e_
        elif s_ <= cur_e:
            cur_e = max(cur_e, e_)
        else:
            covered += cur_e - cur_s
            cur_s, cur_e = s_, e_
    if cur_s is not None:
        covered += cur_e - cur_s
    total_task = sum(v[0] for v in task_time.values())
    stages.sort(key=lambda s: -s["wall_s"])
    print(f"\n=== {master}: wall {wall:.1f}s | stage-covered {covered/1000:.1f}s | "
          f"task-sec {total_task:.0f} ({total_task/wall:.1f} cores busy avg) ===")
    total_gc = sum(v[2] for v in task_time.values())
    print(f"    total GC task-sec: {total_gc:.0f}")
    for s in stages[:12]:
        tt = task_time.get(s["id"], [0, 0, 0])
        print(f"  {s['wall_s']:7.2f}s  tasksec={tt[0]:7.1f} gc={tt[2]:6.1f} maxtask={tt[1]:5.1f}s "
              f"tasks={s['tasks']:4d} [{s['id']}] {s['name']}")
    return wall


if __name__ == "__main__":
    masters = sys.argv[1:] or ["local[32]", "local[8]"]
    for m in masters:
        run(m)
