#!/usr/bin/env python3
"""Recovery evidence from a Spark event log after fault injection.

Usage: fault_report.py <eventlog-file-or-dir> [...]

Prints one JSON object: task-end reasons (FetchFailed /
ExecutorLostFailure / Resubmitted are the retry machinery firing),
stage re-attempts (stage ids that ran with attempt > 0 — lost-shuffle
recomputation), executors removed with reasons, and the hosts that ran
tasks. Reuses shuffle_report's log readers (plain, .zst, eventlog_v2).
"""
import json
import sys
from collections import defaultdict

from shuffle_report import app_files, lines


def main():
    reasons = defaultdict(int)
    stage_attempts = defaultdict(set)   # stage id -> attempt ids seen
    execs_removed = []
    hosts = set()
    resubmitted_stages = set()
    for target in sys.argv[1:]:
        for f in app_files(target):
            for raw in lines(f):
                try:
                    e = json.loads(raw)
                except Exception:
                    continue
                ev = e.get("Event", "")
                if ev == "SparkListenerTaskEnd":
                    reasons[e.get("Task End Reason", {})
                             .get("Reason", "?")] += 1
                    hosts.add(e.get("Task Info", {}).get("Host", "?"))
                elif ev == "SparkListenerStageSubmitted":
                    si = e.get("Stage Info", {})
                    stage_attempts[si.get("Stage ID")].add(
                        si.get("Stage Attempt ID", 0))
                elif ev == "SparkListenerStageExecutorMetrics":
                    pass
                elif ev == "SparkListenerExecutorRemoved":
                    execs_removed.append(e.get("Removed Reason", "?"))
                elif ev == "SparkListenerUnschedulableTaskSetAdded":
                    pass
    for sid, atts in stage_attempts.items():
        if len(atts) > 1 or any(a > 0 for a in atts):
            resubmitted_stages.add(sid)
    out = {
        "task_end_reasons": dict(sorted(reasons.items())),
        "stages_total": len(stage_attempts),
        "stages_reattempted": sorted(resubmitted_stages),
        "executors_removed": execs_removed,
        "task_hosts": sorted(hosts),
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
