#!/usr/bin/env python3
"""Dev-only event-log digest: per job-description (bench:<query>),
count jobs and sum job wall time; optionally list per-job durations.

    python3 tools/evlog.py /tmp/sparklogs1 [-q QUERY] [-v]

Reads every event file under the directory (including rollover dirs
eventlog_v2_*/events_*), correlates SparkListenerJobStart/JobEnd by
job id, and groups by the spark.job.description property set by
graft.Bench (guide §1.5 labels).
"""
import json, os, sys, argparse
from collections import defaultdict

ap = argparse.ArgumentParser()
ap.add_argument("dir")
ap.add_argument("-q", default=None, help="only this description substring")
ap.add_argument("-v", action="store_true", help="per-job lines")
args = ap.parse_args()

files = []
for root, _, names in os.walk(args.dir):
    for n in names:
        if n.startswith("events_") or n.startswith("app-") or \
           n.startswith("local-"):
            files.append(os.path.join(root, n))

jobs = {}
for f in files:
    with open(f, errors="replace") as fh:
        for line in fh:
            try:
                e = json.loads(line)
            except json.JSONDecodeError:
                continue
            ev = e.get("Event")
            if ev == "SparkListenerJobStart":
                jid = e["Job ID"]
                desc = (e.get("Properties") or {}).get(
                    "spark.job.description", "")
                jobs[jid] = {"desc": desc, "t0": e["Submission Time"],
                             "stages": len(e.get("Stage IDs", []))}
            elif ev == "SparkListenerJobEnd":
                jid = e["Job ID"]
                if jid in jobs:
                    jobs[jid]["t1"] = e["Completion Time"]

agg = defaultdict(lambda: [0, 0.0, 0])
for jid, j in sorted(jobs.items()):
    if "t1" not in j:
        continue
    d = j["desc"]
    if args.q and args.q not in d:
        continue
    dur = (j["t1"] - j["t0"]) / 1e3
    agg[d][0] += 1
    agg[d][1] += dur
    agg[d][2] += j["stages"]
    if args.v:
        print(f"  job {jid:4d}  {dur:8.3f}s  stages={j['stages']:3d}  {d}")

print(f"{'jobs':>5} {'sum_s':>9} {'stages':>7}  description")
for d, (n, s, st) in sorted(agg.items(), key=lambda kv: -kv[1][1]):
    print(f"{n:5d} {s:9.2f} {st:7d}  {d or '(none)'}")
