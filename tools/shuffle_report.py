#!/usr/bin/env python3
"""Aggregate shuffle data-plane evidence from Spark event logs.

Usage: shuffle_report.py <eventlog-file-or-dir> [...]

For each application log (plain, .zst, or rolling eventlog_v2 dirs),
sums per-stage task metrics and prints stages with shuffle activity:
remote vs local shuffle bytes read, shuffle bytes written, and the
executor hosts that ran tasks. REMOTE bytes > 0 between executors on
different hosts is the network data plane actually moving bytes —
the number the co-hosted smoke could never produce (host-local reads
bypass the wire).
"""
import json
import os
import sys
from collections import defaultdict


def lines(path):
    if path.endswith((".zst", ".zstd")):
        import subprocess
        p = subprocess.Popen(["zstd", "-dc", path],
                             stdout=subprocess.PIPE)
        yield from p.stdout
        p.wait()
    else:
        with open(path, "rb") as f:
            yield from f


def app_files(target):
    if os.path.isdir(target):
        if os.path.basename(target).startswith("eventlog_v2"):
            for n in sorted(os.listdir(target)):
                if n.startswith("events_"):
                    yield os.path.join(target, n)
        else:
            for n in sorted(os.listdir(target)):
                yield from app_files(os.path.join(target, n))
    else:
        yield target


def main():
    stages = defaultdict(lambda: defaultdict(int))
    names = {}
    hosts = defaultdict(set)
    apps = 0
    for target in sys.argv[1:]:
        for path in app_files(target):
            apps += 1
            for raw in lines(path):
                if not raw.strip():
                    continue
                try:
                    ev = json.loads(raw)
                except json.JSONDecodeError:
                    continue
                et = ev.get("Event")
                if et == "SparkListenerStageSubmitted":
                    si = ev["Stage Info"]
                    names[si["Stage ID"]] = si.get("Stage Name", "")
                elif et == "SparkListenerTaskEnd":
                    sid = ev["Stage ID"]
                    ti = ev.get("Task Info") or {}
                    hosts[sid].add(ti.get("Host", "?"))
                    m = ev.get("Task Metrics") or {}
                    sr = m.get("Shuffle Read Metrics") or {}
                    sw = m.get("Shuffle Write Metrics") or {}
                    agg = stages[sid]
                    agg["remote"] += sr.get("Remote Bytes Read", 0)
                    agg["local"] += sr.get("Local Bytes Read", 0)
                    agg["written"] += sw.get("Shuffle Bytes Written", 0)
                    agg["tasks"] += 1
    tot = defaultdict(int)
    print(f"{'stage':>6} {'tasks':>5} {'remote_rd':>12} {'local_rd':>12} "
          f"{'written':>12}  hosts / name")
    for sid in sorted(stages):
        a = stages[sid]
        for k in ("remote", "local", "written"):
            tot[k] += a[k]
        if a["remote"] or a["local"] or a["written"]:
            name = names.get(sid, "")[:60]
            print(f"{sid:>6} {a['tasks']:>5} {a['remote']:>12} "
                  f"{a['local']:>12} {a['written']:>12}  "
                  f"{','.join(sorted(hosts[sid]))} / {name}")
    n_stages = len(stages)
    pct = (100.0 * tot["remote"] / (tot["remote"] + tot["local"])
           if tot["remote"] + tot["local"] else 0.0)
    print(f"\napps={apps} stages={n_stages} "
          f"remote_read={tot['remote']} local_read={tot['local']} "
          f"written={tot['written']} remote_share={pct:.1f}%")


if __name__ == "__main__":
    main()
