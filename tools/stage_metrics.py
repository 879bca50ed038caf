#!/usr/bin/env python3
"""Per-stage task-metric summaries from Spark event logs.

Used by bench_scaling.py to EVIDENCE (not assert) where wall-clock goes at
each parallelism level: per-stage sums of executor run time, JVM GC time,
shuffle read/write bytes, spill, and the max task time (skew indicator).
If the summed task time is ~equal across core counts but per-task time
inflates at high counts, the wall is host contention (memory bandwidth /
shuffle disk / GC), not the plan -- exactly the claim the round-1 verdict
asked to be proven rather than asserted.

Usage:
  python tools/stage_metrics.py <event-log-file> [t0_ms t1_ms]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path


def parse_event_log(path: str, window: tuple[float, float] | None = None) -> list[dict]:
    """Aggregate TaskEnd metrics per stage; optionally keep only stages
    submitted inside [t0_ms, t1_ms] (the bench's timed section)."""
    p = Path(path)
    if not p.exists():  # Spark may still hold the .inprogress name
        alt = Path(str(path) + ".inprogress")
        if alt.exists():
            p = alt
    stages: dict[int, dict] = {}
    submitted: dict[int, float] = {}
    names: dict[int, str] = {}
    with open(p, encoding="utf-8") as fh:
        for line in fh:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            kind = ev.get("Event")
            if kind == "SparkListenerStageSubmitted":
                si = ev["Stage Info"]
                submitted[si["Stage ID"]] = si.get("Submission Time", 0)
                names[si["Stage ID"]] = si.get("Stage Name", "")
            elif kind == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                tm = ev.get("Task Metrics") or {}
                s = stages.setdefault(
                    sid,
                    {
                        "stage": sid,
                        "tasks": 0,
                        "run_ms": 0,
                        "gc_ms": 0,
                        "max_task_ms": 0,
                        "input_mb": 0.0,
                        "shuffle_read_mb": 0.0,
                        "shuffle_write_mb": 0.0,
                        "spill_mb": 0.0,
                    },
                )
                run = tm.get("Executor Run Time", 0)
                s["tasks"] += 1
                s["run_ms"] += run
                s["gc_ms"] += tm.get("JVM GC Time", 0)
                s["max_task_ms"] = max(s["max_task_ms"], run)
                s["input_mb"] += (tm.get("Input Metrics") or {}).get(
                    "Bytes Read", 0
                ) / 1e6
                srm = tm.get("Shuffle Read Metrics") or {}
                s["shuffle_read_mb"] += (
                    srm.get("Remote Bytes Read", 0) + srm.get("Local Bytes Read", 0)
                ) / 1e6
                s["shuffle_write_mb"] += (tm.get("Shuffle Write Metrics") or {}).get(
                    "Shuffle Bytes Written", 0
                ) / 1e6
                s["spill_mb"] += (
                    tm.get("Memory Bytes Spilled", 0) + tm.get("Disk Bytes Spilled", 0)
                ) / 1e6
    out = []
    for sid, s in sorted(stages.items()):
        if window is not None:
            sub = submitted.get(sid, 0)
            if not (window[0] <= sub <= window[1]):
                continue
        s["name"] = names.get(sid, "")[:60]
        for k in ("input_mb", "shuffle_read_mb", "shuffle_write_mb", "spill_mb"):
            s[k] = round(s[k], 1)
        out.append(s)
    return out


def totals(stages: list[dict]) -> dict:
    t = {
        k: sum(s[k] for s in stages)
        for k in ("tasks", "run_ms", "gc_ms", "shuffle_read_mb", "shuffle_write_mb", "spill_mb")
    }
    t["gc_share"] = round(t["gc_ms"] / t["run_ms"], 4) if t["run_ms"] else 0.0
    for k in ("shuffle_read_mb", "shuffle_write_mb", "spill_mb"):
        t[k] = round(t[k], 1)
    return t


def main() -> int:
    path = sys.argv[1]
    window = None
    if len(sys.argv) >= 4:
        window = (float(sys.argv[2]), float(sys.argv[3]))
    stages = parse_event_log(path, window)
    print(json.dumps({"stages": stages, "totals": totals(stages)}, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
