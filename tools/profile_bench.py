"""Per-stage profiler for the headline bench queries (guide §1).

Runs each headline query exactly like bench.py (noop sink, share-group
cache semantics) in a session with event logging on, then parses the
event log into per-query job/stage breakdowns: wall time, task count,
executor run time, shuffle bytes.  Also records driver-side plan
construction time (fn() call) separately from execution.

Usage:  python tools/profile_bench.py [query ...]   (default: all)
Output: /tmp/profile_r14/<query>.json + a summary table on stdout.
"""

from __future__ import annotations

import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EVENT_DIR = "/tmp/spark-events-r14"


def main() -> None:
    os.makedirs(EVENT_DIR, exist_ok=True)
    os.makedirs("/tmp/profile_r14", exist_ok=True)
    os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import SparkSession

    from rc_scanner_spark.session import RUNTIME_CONF, tune

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("profile-r14")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", EVENT_DIR)
        # r14 session 2: this sandbox image has neither a zstd binary
        # nor the zstandard module — write the event log uncompressed.
        .config("spark.eventLog.compress", "false")
    )
    for k, v in RUNTIME_CONF.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    tune(spark)

    from bench import HEADLINE, _share_group
    from rc_scanner_spark.operators.dedup import release_caches
    from rc_scanner_spark.queries import build_registry

    registry = build_registry()
    sf_dir = os.environ["SPARK_GRAFT_SF_DIR"]

    # warm-up (same as bench)
    registry["scan_verb"].fn(spark, sf_dir).count()
    spark.sql("SELECT lower('MÜller straße 你好 Ω'), upper('ñoño')").collect()

    wanted = sys.argv[1:] or HEADLINE
    # Headline names keep the bench's order + share-group cache
    # semantics; any other registry name is profiled standalone
    # (cache cleared before it) after the headline ones.
    ordered = [n for n in HEADLINE if n in wanted] + [
        n for n in wanted if n not in HEADLINE
    ]
    results = {}
    # Two passes; only the second is recorded (Q:: description), so
    # one-time costs (codegen compile, schema inference) are excluded
    # and the numbers match the bench's min/median regime.
    for pass_no in (1, 2):
        for i, name in enumerate(ordered):
            if not (
                i
                and ordered[i - 1] in HEADLINE
                and name in HEADLINE
                and _share_group(ordered[i - 1]) == _share_group(name)
            ):
                spark.catalog.clearCache()
                release_caches()
            if pass_no == 2:
                spark.sparkContext.setJobDescription(f"Q::{name}")
            t0 = time.perf_counter()
            df = registry[name].fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            spark.sparkContext.setJobDescription(None)
            results[name] = {
                "build_s": round(t1 - t0, 3),
                "exec_s": round(t2 - t1, 3),
            }

    app_id = spark.sparkContext.applicationId
    spark.stop()

    # ---- parse the event log (plain file, or Spark-4 rolling dir) ----
    log_path = os.path.join(EVENT_DIR, app_id)
    if not os.path.exists(log_path):
        log_path = os.path.join(EVENT_DIR, f"eventlog_v2_{app_id}")
    if os.path.isdir(log_path):
        parts = sorted(
            os.path.join(log_path, p)
            for p in os.listdir(log_path)
            if p.startswith("events_")
        )
    else:
        parts = [log_path]
    lines = []
    for p in parts:
        if p.endswith(".zstd"):
            import subprocess

            raw = subprocess.run(
                ["zstd", "-dc", p], capture_output=True, check=True
            ).stdout.decode()
            lines.extend(raw.splitlines())
        else:
            with open(p) as f:
                lines.extend(f)
    jobs = {}  # jobId -> {desc, t0, t1, stageIds}
    stages = {}  # stageId -> metrics
    if True:
        for line in lines:
            ev = json.loads(line)
            et = ev.get("Event")
            if et == "SparkListenerJobStart":
                desc = ev.get("Properties", {}).get("spark.job.description", "")
                jobs[ev["Job ID"]] = {
                    "desc": desc,
                    "t0": ev["Submission Time"],
                    "stages": [s["Stage ID"] for s in ev["Stage Infos"]],
                }
            elif et == "SparkListenerJobEnd":
                if ev["Job ID"] in jobs:
                    jobs[ev["Job ID"]]["t1"] = ev["Completion Time"]
            elif et == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                agg = stages.setdefault(si["Stage ID"], {})
                agg.update(
                    {
                        "name": si["Stage Name"].split("\n")[0],
                        "tasks": si["Number of Tasks"],
                        "t0": si.get("Submission Time"),
                        "t1": si.get("Completion Time"),
                    }
                )
            elif et == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                m = ev.get("Task Metrics") or {}
                agg = stages.setdefault(sid, {})
                agg["run_ms"] = agg.get("run_ms", 0) + m.get("Executor Run Time", 0)
                agg["cpu_ms"] = agg.get("cpu_ms", 0) + m.get(
                    "Executor CPU Time", 0
                ) // 1_000_000
                agg["deser_ms"] = agg.get("deser_ms", 0) + m.get(
                    "Executor Deserialize Time", 0
                )
                srm = m.get("Shuffle Read Metrics") or {}
                agg["sh_read"] = (
                    agg.get("sh_read", 0)
                    + srm.get("Local Bytes Read", 0)
                    + srm.get("Remote Bytes Read", 0)
                )
                agg["fetch_ms"] = agg.get("fetch_ms", 0) + srm.get(
                    "Fetch Wait Time", 0
                )
                swm = m.get("Shuffle Write Metrics") or {}
                agg["sh_write"] = agg.get("sh_write", 0) + swm.get(
                    "Shuffle Bytes Written", 0
                )

    per_query = defaultdict(lambda: {"jobs": 0, "job_ms": 0, "stages": []})
    for jid in sorted(jobs):
        j = jobs[jid]
        desc = j.get("desc") or ""
        if not desc.startswith("Q::"):
            continue
        q = desc[3:]
        pq = per_query[q]
        pq["jobs"] += 1
        pq["job_ms"] += j.get("t1", j["t0"]) - j["t0"]
        for sid in j["stages"]:
            s = stages.get(sid)
            if s and s.get("t0") is not None:
                pq["stages"].append(
                    {
                        "id": sid,
                        "name": s.get("name", "?"),
                        "tasks": s.get("tasks", 0),
                        "wall_ms": (s.get("t1") or s["t0"]) - s["t0"],
                        "run_ms": s.get("run_ms", 0),
                        "cpu_ms": s.get("cpu_ms", 0),
                        "deser_ms": s.get("deser_ms", 0),
                        "sh_read_kb": s.get("sh_read", 0) // 1024,
                        "sh_write_kb": s.get("sh_write", 0) // 1024,
                        "fetch_ms": s.get("fetch_ms", 0),
                    }
                )

    for q, info in results.items():
        pq = per_query.get(q, {})
        info.update(
            {
                "jobs": pq.get("jobs", 0),
                "job_ms": pq.get("job_ms", 0),
                "n_stages": len(pq.get("stages", [])),
                "stage_wall_ms": sum(s["wall_ms"] for s in pq.get("stages", [])),
                "stages": sorted(
                    pq.get("stages", []), key=lambda s: -s["wall_ms"]
                ),
            }
        )
        with open(f"/tmp/profile_r14/{q}.json", "w") as f:
            json.dump(info, f, indent=1)

    print(
        f"{'query':28s} {'build':>6s} {'exec':>6s} {'jobs':>4s} "
        f"{'#stg':>4s} {'stgwall':>7s}"
    )
    for q, info in results.items():
        print(
            f"{q:28s} {info['build_s']:6.3f} {info['exec_s']:6.3f} "
            f"{info['jobs']:4d} {info['n_stages']:4d} {info['stage_wall_ms']:7d}"
        )


if __name__ == "__main__":
    main()
