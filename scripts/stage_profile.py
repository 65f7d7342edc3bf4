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
                        "tasks": si["Number of Tasks"],
                    }
                )
    stages.sort(key=lambda s: -s["wall_s"])
    print(f"\n=== {master}: wall {wall:.1f}s, {len(stages)} stages ===")
    for s in stages[:14]:
        print(f"  {s['wall_s']:7.2f}s  tasks={s['tasks']:4d}  [{s['id']}] {s['name']}")
    return wall


if __name__ == "__main__":
    masters = sys.argv[1:] or ["local[32]", "local[8]"]
    for m in masters:
        run(m)
