"""Profile ONE registered query: per-job wall times from the event log.

Usage:
    python scripts/profile_query.py <query_name> [reps]

Runs the query `reps` times (default 2: cold + warm) with the Spark
event log enabled, then prints each job's duration, description, and
stage/task counts — the tool for attributing a toy-scale query's cost to
fixed machinery (job count) vs per-row compute (task time).
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    name = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    log_dir = "/tmp/spark-events-profile"
    os.makedirs(log_dir, exist_ok=True)
    for f in glob.glob(os.path.join(log_dir, "*")):
        os.remove(f)

    from hogflare_spark import plans
    from hogflare_spark.functions.caching import unpersist_all
    from hogflare_spark.session import get_spark

    plans.load_all()
    spark = get_spark(
        app_name=f"profile-{name}",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": log_dir,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    # warm the python worker pool like bench.py does
    spark.range(spark.sparkContext.defaultParallelism * 4).repartition(
        spark.sparkContext.defaultParallelism
    ).mapInPandas(lambda it: it, "id long").count()

    import gc

    for rep in range(reps):
        spark.catalog.clearCache()
        unpersist_all()
        gc.collect()
        spark.sparkContext.setJobDescription(f"{name} rep{rep}")
        t0 = time.time()
        df = plans.QUERIES[name](spark, sf_dir)
        df.collect()
        print(f"rep {rep}: {time.time() - t0:.3f}s", file=sys.stderr)
    spark.stop()

    # parse the event log
    files = glob.glob(os.path.join(log_dir, "*"))
    assert files, "no event log written"
    path = max(files, key=os.path.getmtime)
    if os.path.isdir(path):  # eventlog v2 writes a rolling directory
        inner = [
            f
            for f in glob.glob(os.path.join(path, "*"))
            if os.path.basename(f).startswith("events_")
        ]
        path = max(inner, key=os.path.getmtime)
    opener = gzip.open if path.endswith(".gz") else open
    jobs = {}
    stage_info = {}
    with opener(path, "rt") as fh:
        for line in fh:
            try:
                ev = json.loads(line)
            except Exception:
                continue
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                jid = ev["Job ID"]
                jobs[jid] = {
                    "start": ev["Submission Time"],
                    "desc": ev.get("Properties", {}).get(
                        "spark.job.description", ""
                    ),
                    "stages": [s["Stage ID"] for s in ev.get("Stage Infos", [])],
                    "ntasks": sum(
                        s.get("Number of Tasks", 0)
                        for s in ev.get("Stage Infos", [])
                    ),
                }
            elif e == "SparkListenerJobEnd":
                jid = ev["Job ID"]
                if jid in jobs:
                    jobs[jid]["end"] = ev["Completion Time"]
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                stage_info[si["Stage ID"]] = {
                    "name": si.get("Stage Name", "")[:60],
                    "ntasks": si.get("Number of Tasks", 0),
                }

    print(f"\n=== {name}: {len(jobs)} jobs ===")
    prev_end = None
    for jid in sorted(jobs):
        j = jobs[jid]
        dur = (j.get("end", j["start"]) - j["start"]) / 1000.0
        gap = "" if prev_end is None else f" gap={ (j['start'] - prev_end) / 1000.0:.2f}s"
        prev_end = j.get("end", j["start"])
        stages = ",".join(
            f"{s}:{stage_info.get(s, {}).get('ntasks', '?')}t" for s in j["stages"]
        )
        print(
            f"job {jid:3d} {dur:7.2f}s{gap:12s} tasks={j['ntasks']:4d} "
            f"[{stages[:70]}] {j['desc'][:60]}"
        )


if __name__ == "__main__":
    main()
