#!/usr/bin/env python3
"""Summarize a Spark event log: per-job and per-stage wall times, task
counts, and I/O metrics — the stage-level evidence the (disabled) UI would
show, for ProbeOne runs launched with
SPARK_GRAFT_EXTRA_JAVA_OPTS="-Dspark.eventLog.enabled=true
-Dspark.eventLog.dir=<dir>".

Usage: evparse.py <eventlog-file> [minStageSec]
"""
import json, sys, collections

path = sys.argv[1]
min_sec = float(sys.argv[2]) if len(sys.argv) > 2 else 0.5

stages = {}
jobs = {}
stage_to_job = {}
for line in open(path, errors="replace"):
    try:
        e = json.loads(line)
    except json.JSONDecodeError:
        continue
    ev = e.get("Event")
    if ev == "SparkListenerJobStart":
        jid = e["Job ID"]
        jobs[jid] = {
            "t0": e["Submission Time"], "t1": None,
            "desc": (e.get("Properties") or {}).get(
                "spark.job.description", "")[:80],
            "stages": [s["Stage ID"] for s in e["Stage Infos"]],
        }
        for s in e["Stage Infos"]:
            stage_to_job[s["Stage ID"]] = jid
    elif ev == "SparkListenerJobEnd":
        if e["Job ID"] in jobs:
            jobs[e["Job ID"]]["t1"] = e["Completion Time"]
    elif ev == "SparkListenerStageCompleted":
        si = e["Stage Info"]
        sid = si["Stage ID"]
        t0 = si.get("Submission Time")
        t1 = si.get("Completion Time")
        stages[sid] = {
            "name": si["Stage Name"][:100],
            "tasks": si["Number of Tasks"],
            "sec": (t1 - t0) / 1000.0 if t0 and t1 else 0.0,
        }

print(f"{'job':>4} {'sec':>8}  stages  desc")
for jid, j in sorted(jobs.items()):
    if j["t1"] is None:
        continue
    sec = (j["t1"] - j["t0"]) / 1000.0
    if sec < min_sec:
        continue
    print(f"{jid:>4} {sec:8.2f}  {str(j['stages'])[:28]:28s} {j['desc']}")

print(f"\n{'stage':>6} {'sec':>8} {'tasks':>6}  name")
for sid, s in sorted(stages.items(), key=lambda kv: -kv[1]["sec"]):
    if s["sec"] < min_sec:
        continue
    print(f"{sid:>6} {s['sec']:8.2f} {s['tasks']:>6}  {s['name']}")
total_job = sum((j["t1"] - j["t0"]) / 1000.0
                for j in jobs.values() if j["t1"])
print(f"\njobs: {len(jobs)}  sum job wall: {total_job:.1f}s  "
      f"stages: {len(stages)}")
