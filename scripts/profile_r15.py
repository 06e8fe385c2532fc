"""Focused A/B profiler for the r15 optimization round.

Times registered queries through the noop sink (guide §1.4) in one
session — one untimed warm run (codegen/JIT), then N timed runs — with
per-query job groups and an event log, so per-job wall time and
inter-job driver/Catalyst gaps can be attributed (guide §1.5).

    python scripts/profile_r15.py q_stream_session q_text_dsir \
        --sf /root/testdata/sf0.1 --runs 3 [--jobs]

``--jobs`` parses the event log afterwards and prints the per-job
breakdown (submit->complete wall, gap since previous job) per query.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("queries", nargs="+")
    p.add_argument("--sf", default="/root/testdata/sf0.1")
    p.add_argument("--runs", type=int, default=3)
    p.add_argument("--jobs", action="store_true",
                   help="parse event log for per-job breakdown")
    args = p.parse_args(argv)

    from flink_kmeans_clustering_spark.scratch import scratch_dir
    from flink_kmeans_clustering_spark.session import get_spark

    evdir = scratch_dir("profile_evlog_")
    spark = get_spark(
        app_name="profile-r15",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{evdir}",
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )

    def _w(b):
        for x in b:
            yield x

    spark.range(2).mapInPandas(_w, schema="id long").count()

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    results: dict[str, list[float]] = {}
    sc = spark.sparkContext
    for name in args.queries:
        q = qs[name]
        sc.setJobGroup(f"{name}:warm", name)
        q(spark, args.sf).write.format("noop").mode("overwrite").save()
        runs = []
        for i in range(args.runs):
            sc.setJobGroup(f"{name}:run{i}", name)
            t0 = time.perf_counter()
            q(spark, args.sf).write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
        results[name] = runs
        print(f"{name}: runs={runs} median={sorted(runs)[len(runs)//2]}",
              flush=True)
        spark.catalog.clearCache()

    app_id = sc.applicationId
    spark.stop()
    print(json.dumps(results))

    if args.jobs:
        import glob as _glob

        cands = _glob.glob(os.path.join(evdir, f"*{app_id}*"))
        if not cands:
            cands = _glob.glob(os.path.join(evdir, "*"))
        path = cands[0]
        if os.path.isdir(path):  # Spark 4 rolling event log layout
            parts = sorted(_glob.glob(os.path.join(path, "events_*")))
            lines = [ln for p in parts for ln in open(p)]
        else:
            lines = list(open(path))
        print(f"eventlog: {path} ({len(lines)} lines)")
        jobs = {}  # id -> dict
        stage_owner = {}  # stage id -> job id
        if True:
            for line in lines:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                e = ev.get("Event")
                if e == "SparkListenerJobStart":
                    props = ev.get("Properties") or {}
                    jobs[ev["Job ID"]] = {
                        "t0": ev["Submission Time"],
                        "group": props.get("spark.jobGroup.id", ""),
                        "desc": (props.get("spark.job.description") or "")[:60],
                        "stages": len(ev.get("Stage IDs", [])),
                        "stage_info": [],
                    }
                    for sid in ev.get("Stage IDs", []):
                        stage_owner[sid] = ev["Job ID"]
                elif e == "SparkListenerJobEnd":
                    if ev["Job ID"] in jobs:
                        jobs[ev["Job ID"]]["t1"] = ev["Completion Time"]
                elif e == "SparkListenerStageCompleted":
                    si = ev.get("Stage Info", {})
                    sid = si.get("Stage ID")
                    jid = stage_owner.get(sid)
                    if jid in jobs and si.get("Completion Time"):
                        jobs[jid]["stage_info"].append(
                            (
                                sid,
                                si.get("Number of Tasks"),
                                (si["Completion Time"]
                                 - si.get("Submission Time",
                                          si["Completion Time"])) / 1000,
                            )
                        )
        prev_end = None
        for jid in sorted(jobs):
            j = jobs[jid]
            if "t1" not in j:
                continue
            gap = (j["t0"] - prev_end) if prev_end is not None else 0
            stag = " ".join(
                f"s{sid}:{n}t/{w:.2f}s"
                for sid, n, w in sorted(j["stage_info"])
            )
            print(
                f"job {jid:4d} {j['group']:<40} "
                f"wall={(j['t1']-j['t0'])/1000:7.3f}s gap={gap/1000:7.3f}s "
                f"[{stag}]"
            )
            prev_end = j["t1"]
    return 0


if __name__ == "__main__":
    sys.exit(main())
