#!/usr/bin/env python3
"""Summarize a Spark event log: per-job wall time with job descriptions,
and the slowest stages (duration, tasks, max/median task skew).

Usage: python3 tools/evlog.py <eventlog-file> [topN]
"""
import json
import sys

path = sys.argv[1]
top = int(sys.argv[2]) if len(sys.argv) > 2 else 15

jobs = {}
stages = {}
for line in open(path):
    try:
        e = json.loads(line)
    except json.JSONDecodeError:
        continue
    k = e.get("Event")
    if k == "SparkListenerJobStart":
        jobs[e["Job ID"]] = {
            "t0": e["Submission Time"],
            "desc": (e.get("Properties") or {}).get(
                "spark.job.description", "")[:80],
            "stages": [s["Stage ID"] for s in e.get("Stage Infos", [])],
        }
    elif k == "SparkListenerJobEnd":
        j = jobs.get(e["Job ID"])
        if j:
            j["dur"] = (e["Completion Time"] - j["t0"]) / 1000.0
    elif k == "SparkListenerStageCompleted":
        si = e["Stage Info"]
        sub = si.get("Submission Time")
        comp = si.get("Completion Time")
        # merge, don't replace: TaskEnd events precede StageCompleted in
        # the log and have already accumulated task_durs for this stage
        st = stages.setdefault(si["Stage ID"], {})
        st.update({
            "name": si.get("Stage Name", "")[:70],
            "dur": (comp - sub) / 1000.0 if sub and comp else 0.0,
            "tasks": si.get("Number of Tasks", 0),
        })
    elif k == "SparkListenerTaskEnd":
        sid = e["Stage ID"]
        st = stages.setdefault(sid, {"name": "?", "dur": 0.0, "tasks": 0})
        ti = e.get("Task Info", {})
        d = (ti.get("Finish Time", 0) - ti.get("Launch Time", 0)) / 1000.0
        st.setdefault("task_durs", []).append(d)

print(f"== jobs: {len(jobs)}, total job wall "
      f"{sum(j.get('dur', 0) for j in jobs.values()):.2f}s ==")
for jid, j in sorted(jobs.items(), key=lambda x: -x[1].get("dur", 0))[:top]:
    print(f"job {jid:4d} {j.get('dur', 0):7.2f}s  stages={j['stages']}  "
          f"{j['desc']}")
print(f"\n== slowest stages ==")
for sid, s in sorted(stages.items(), key=lambda x: -x[1].get("dur", 0))[:top]:
    durs = sorted(s.get("task_durs", []))
    mx = durs[-1] if durs else 0
    md = durs[len(durs) // 2] if durs else 0
    print(f"stage {sid:4d} {s.get('dur', 0):7.2f}s tasks={s.get('tasks', 0):4d} "
          f"taskmax={mx:6.2f}s taskmed={md:6.2f}s  {s.get('name', '?')}")
