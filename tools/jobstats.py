#!/usr/bin/env python3
"""Per-query job profile from a Spark event log.

Usage: python3 tools/jobstats.py /tmp/spark-events/<app-id> [--jobs]

Groups SparkListenerJobStart/JobEnd events by the job description
(graft.Bench sets it to the query name around each timed query) and
prints, per description: job count, summed job wall time, and the
driver "gap" time inside that description's span not covered by any
job (planning, codegen, artifact metadata I/O, commit protocol).
With --jobs, also prints each job's duration and first stage name.

This is the guide-§1 empirical loop for a 265-query bench where the
Spark UI is disabled: it answers "is the time in jobs (executor work)
or between jobs (driver work)" per query.
"""
import json
import sys
from collections import defaultdict


def main() -> None:
    path = sys.argv[1]
    show_jobs = "--jobs" in sys.argv
    jobs = {}          # jobId -> dict(desc, t0, t1, stages)
    desc_span = {}     # desc -> [first t0, last t1]
    with open(path, encoding="utf-8", errors="replace") as fh:
        for line in fh:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                jid = ev["Job ID"]
                props = ev.get("Properties") or {}
                desc = props.get("spark.job.description", "<none>")
                stages = [s.get("Stage Name", "") for s in
                          ev.get("Stage Infos", [])]
                jobs[jid] = {"desc": desc, "t0": ev["Submission Time"],
                             "t1": None, "stages": stages}
            elif e == "SparkListenerJobEnd":
                jid = ev["Job ID"]
                if jid in jobs:
                    jobs[jid]["t1"] = ev["Completion Time"]
    agg = defaultdict(lambda: [0, 0.0])  # desc -> [n, job_secs]
    for j in jobs.values():
        if j["t1"] is None:
            continue
        d = j["desc"]
        agg[d][0] += 1
        agg[d][1] += (j["t1"] - j["t0"]) / 1e3
        sp = desc_span.setdefault(d, [j["t0"], j["t1"]])
        sp[0] = min(sp[0], j["t0"])
        sp[1] = max(sp[1], j["t1"])
    rows = []
    for d, (n, secs) in agg.items():
        span = (desc_span[d][1] - desc_span[d][0]) / 1e3
        rows.append((span, d, n, secs))
    rows.sort(reverse=True)
    print(f"{'span_s':>8} {'jobs_s':>8} {'gap_s':>8} {'n':>4}  description")
    for span, d, n, secs in rows:
        print(f"{span:8.2f} {secs:8.2f} {span - secs:8.2f} {n:4d}  {d}")
    if show_jobs:
        print()
        for jid in sorted(jobs):
            j = jobs[jid]
            if j["t1"] is None:
                continue
            dur = (j["t1"] - j["t0"]) / 1e3
            head = j["stages"][-1] if j["stages"] else ""
            print(f"job {jid:4d} {dur:7.3f}s  [{j['desc']}]  {head[:90]}")


if __name__ == "__main__":
    main()
