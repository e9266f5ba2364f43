#!/usr/bin/env python3
"""Spill evidence from Spark event logs under memory pressure.

Usage: spill_report.py <eventlog-file-or-dir> [...]

Sums per-stage memory/disk bytes spilled and peak execution memory from
task metrics, prints the spilling stages and a JSON totals line — the
artifact the memory-pressure drill records next to its green run.
Reuses shuffle_report's log readers (plain, .zst, eventlog_v2 dirs).
"""
import json
import sys
from collections import defaultdict

from shuffle_report import app_files, lines


def main():
    stages = defaultdict(lambda: defaultdict(int))
    names = {}
    for target in sys.argv[1:]:
        for f in app_files(target):
            for raw in lines(f):
                try:
                    e = json.loads(raw)
                except Exception:
                    continue
                ev = e.get("Event", "")
                if ev == "SparkListenerTaskEnd":
                    sid = e.get("Stage ID")
                    m = e.get("Task Metrics") or {}
                    st = stages[sid]
                    st["mem_spilled"] += m.get("Memory Bytes Spilled", 0)
                    st["disk_spilled"] += m.get("Disk Bytes Spilled", 0)
                    st["peak_exec_mem"] = max(
                        st["peak_exec_mem"],
                        m.get("Peak Execution Memory", 0))
                    st["tasks"] += 1
                elif ev == "SparkListenerStageSubmitted":
                    si = e.get("Stage Info", {})
                    names[si.get("Stage ID")] = si.get("Stage Name", "")[:60]
    spilling = {s: d for s, d in stages.items() if d["disk_spilled"] > 0}
    for s in sorted(spilling):
        d = spilling[s]
        print(f"stage {s:>5} tasks={d['tasks']:>3} "
              f"mem_spilled={d['mem_spilled']:>12,} "
              f"disk_spilled={d['disk_spilled']:>12,}  {names.get(s, '')}",
              file=sys.stderr)
    total = {
        "stages_total": len(stages),
        "stages_spilling": len(spilling),
        "memory_bytes_spilled": sum(d["mem_spilled"]
                                    for d in stages.values()),
        "disk_bytes_spilled": sum(d["disk_spilled"]
                                  for d in stages.values()),
        "max_peak_exec_mem": max(
            (d["peak_exec_mem"] for d in stages.values()), default=0),
    }
    print(json.dumps(total))


if __name__ == "__main__":
    main()
