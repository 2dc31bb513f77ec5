"""Summarize a Spark event log: per-job/stage walls, task parallelism,
and the idle gaps between stages — for hunting serial floors in the
crawl loop. Usage: python tools/analyze_eventlog.py <eventlog file>
"""

from __future__ import annotations

import json
import sys
from collections import defaultdict


def _iter_lines(path):
    """Accept a flat event-log file OR a directory; uncompressed JSON
    only. Directory handling (r5 ADVICE fix): an event-log DIR can
    hold logs from MANY applications (crawl_probe never clears it), and
    concatenating them collides stage/job ids across apps and silently
    corrupts the census — so when ``path`` contains several app logs
    (flat ``local-*``/``app-*`` files or ``eventlog_v2_*`` rolling
    dirs), only the NEWEST application's log is read. A single app's
    rolling dir (``events_*`` parts inside) is still read whole."""
    import os

    if os.path.isdir(path):
        entries = [
            os.path.join(path, n)
            for n in os.listdir(path)
            if not n.startswith("appstatus_") and not n.endswith((".zstd", ".crc"))
        ]
        apps = [
            e
            for e in entries
            if os.path.basename(e).startswith("eventlog_v2_")
            or (os.path.isfile(e) and not os.path.basename(e).startswith("events_"))
        ]
        if apps:
            # several application logs → newest app only
            newest = max(apps, key=os.path.getmtime)
            yield from _iter_lines(newest)
            return
        for root, _, names in os.walk(path):
            for f in sorted(names):
                if f.startswith("appstatus_") or f.endswith((".zstd", ".crc")):
                    continue
                yield from open(os.path.join(root, f))
    else:
        yield from open(path)


def main() -> None:
    path = sys.argv[1]
    stages = {}  # (stageId, attempt) -> dict
    tasks = defaultdict(list)  # stageId -> [(launch, finish)]
    jobs = {}
    app_start = app_end = None
    for line in _iter_lines(path):
        try:
            ev = json.loads(line)
        except ValueError:
            continue
        t = ev.get("Event")
        if t == "SparkListenerApplicationStart":
            app_start = ev["Timestamp"]
        elif t == "SparkListenerApplicationEnd":
            app_end = ev["Timestamp"]
        elif t == "SparkListenerJobStart":
            jobs[ev["Job ID"]] = {
                "start": ev["Submission Time"],
                "stages": [s["Stage ID"] for s in ev["Stage Infos"]],
                "ntasks": sum(s["Number of Tasks"] for s in ev["Stage Infos"]),
            }
        elif t == "SparkListenerJobEnd":
            if ev["Job ID"] in jobs:
                jobs[ev["Job ID"]]["end"] = ev["Completion Time"]
        elif t == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            stages[si["Stage ID"]] = {
                "name": si["Stage Name"].split("\n")[0][:70],
                "ntasks": si["Number of Tasks"],
                "submit": si.get("Submission Time"),
                "complete": si.get("Completion Time"),
            }
        elif t == "SparkListenerTaskEnd":
            ti = ev["Task Info"]
            tasks[ev["Stage ID"]].append((ti["Launch Time"], ti["Finish Time"]))

    if not app_start:
        print("no application start event")
        return
    # busy-cores timeline from task intervals
    events = []
    for st in tasks.values():
        for a, b in st:
            events.append((a, 1))
            events.append((b, -1))
    events.sort()
    busy_time = 0.0  # integral of busy cores dt
    idle0 = 0.0  # wall time with ZERO running tasks
    cur = 0
    prev = app_start
    end = app_end or max(b for st in tasks.values() for _, b in st)
    for ts, d in events:
        dt = (ts - prev) / 1000.0
        busy_time += cur * dt
        if cur == 0:
            idle0 += dt
        cur += d
        prev = ts
    wall = (end - app_start) / 1000.0
    print(f"wall {wall:.1f}s  task-busy {busy_time:.0f} core-s  "
          f"avg busy cores {busy_time / wall:.1f}  zero-task wall {idle0:.1f}s")
    print(f"jobs {len(jobs)}  stages {len(stages)}")

    # top jobs by wall
    jl = sorted(jobs.items(), key=lambda kv: kv[1].get("end", 0) - kv[1]["start"], reverse=True)
    print("\ntop jobs (wall sec, ntasks):")
    for jid, j in jl[:25]:
        if "end" not in j:
            continue
        w = (j["end"] - j["start"]) / 1000.0
        # busy cores within this job's window
        print(f"  job {jid:>3}  {w:7.2f}s  ntasks={j['ntasks']:>5}  stages={j['stages']}")

    # per-stage parallelism for the big stages
    print("\ntop stages (wall sec, ntasks, avg busy cores in window):")
    sl = sorted(
        [s for s in stages.items() if s[1]["submit"] and s[1]["complete"]],
        key=lambda kv: kv[1]["complete"] - kv[1]["submit"],
        reverse=True,
    )
    for sid, s in sl[:25]:
        w = (s["complete"] - s["submit"]) / 1000.0
        tt = sum(b - a for a, b in tasks.get(sid, [])) / 1000.0
        print(
            f"  stage {sid:>3}  {w:7.2f}s  ntasks={s['ntasks']:>5}  "
            f"busy={tt / w if w > 0 else 0:5.1f}  {s['name']}"
        )

    # task-time skew per multi-task stage: max/median task duration.
    # This is the hot-host evidence metric (north rule: "salted
    # repartitioning to defuse hot-host skew") — a stage whose max
    # task runs ≫ its median is serialized on one skewed partition.
    skewed = []
    for sid, ts in tasks.items():
        if len(ts) < 4:
            continue  # single/few-task stages have no skew story
        durs = sorted((b - a) / 1000.0 for a, b in ts)
        med = durs[len(durs) // 2]
        if med <= 0.005:
            continue  # sub-5ms medians are all scheduler noise
        skewed.append((durs[-1] / med, durs[-1], med, len(durs), sid))
    skewed.sort(reverse=True)
    if skewed:
        worst = skewed[0][0]
        agg = max(
            (r for r in skewed if stages.get(r[4], {}).get("ntasks", 0) >= 16),
            default=None,
        )
        print("\ntask skew (max/median task sec) — worst multi-task stages:")
        for ratio, mx, med, n, sid in skewed[:10]:
            name = stages.get(sid, {}).get("name", "?")
            print(
                f"  stage {sid:>3}  ratio={ratio:5.2f}  max={mx:6.3f}s  "
                f"median={med:6.3f}s  ntasks={n:>4}  {name}"
            )
        print(
            f"\nSKEW_SUMMARY {json.dumps({'worst_ratio': round(worst, 2), 'worst_wide_ratio': round(agg[0], 2) if agg else None})}"
        )


if __name__ == "__main__":
    main()
