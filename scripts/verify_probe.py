"""Stage-level breakdown of the prefix-family verify pass at sf1:
shuffle bytes, task time, GC time per stage — is the 69 s verify
disk/shuffle-bound (which would explain the flat 8->32 core scaling)?

Usage: SPARK_GRAFT_CPUS=32 python scripts/verify_probe.py [dict|strings]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/tmp/pgstream_scale/sf1"
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
EVDIR = "/tmp/verify_probe_events"


def main() -> None:
    transport = sys.argv[1] if len(sys.argv) > 1 else "strings"
    shutil.rmtree(EVDIR, ignore_errors=True)
    os.makedirs(EVDIR, exist_ok=True)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("verify-probe")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.files.maxPartitionBytes", "8m")
        .config("spark.sql.files.openCostInBytes", "1m")
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
        .config("spark.ui.enabled", "false")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", EVDIR)
        .config("spark.eventLog.compress", "false")
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
        )
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pgstream_spark.operators.dedup import (
        prefix_filter_candidates,
        verify_candidate_pairs,
    )

    spark.range(1000).selectExpr("sum(id)").collect()
    d = spark.read.parquet(f"{SF}/documents.parquet")

    cand, sh = prefix_filter_candidates(
        d, "doc_id", "text", n=3, threshold=0.6, return_shingles=True
    )
    cand = cand.persist()
    t0 = time.perf_counter()
    n_cand = cand.count()
    t_cand = round(time.perf_counter() - t0, 2)
    print(f"  candidates: {n_cand} in {t_cand}s", file=sys.stderr)

    pairs = verify_candidate_pairs(
        cand, d, "doc_id", "text", n=3, threshold=0.6,
        transport=transport, shingles_exploded=sh,
    )
    spark.sparkContext.setJobDescription("VERIFY")
    t0 = time.perf_counter()
    pairs.write.format("noop").mode("overwrite").save()
    t_verify = round(time.perf_counter() - t0, 2)
    print(f"  verify[{transport}]: {t_verify}s", file=sys.stderr)
    spark.stop()

    # parse the event log: per-stage totals
    import glob

    stages: dict[int, dict] = {}
    paths = [
        p
        for p in glob.glob(f"{EVDIR}/*/events_*") + glob.glob(f"{EVDIR}/*")
        if os.path.isfile(p)
    ]
    for path in paths:
        with open(path) as fh:
            for line in fh:
                try:
                    ev = json.loads(line)
                except ValueError:
                    continue
                if ev.get("Event") == "SparkListenerStageCompleted":
                    si = ev["Stage Info"]
                    st = stages.setdefault(si["Stage ID"], {})
                    st["name"] = si["Stage Name"].split()[0]
                    st["wall_s"] = round(
                        (si["Completion Time"] - si["Submission Time"]) / 1000,
                        2,
                    )
                    st["tasks"] = si["Number of Tasks"]
                elif ev.get("Event") == "SparkListenerTaskEnd":
                    sid = ev["Stage ID"]
                    m = ev.get("Task Metrics") or {}
                    st = stages.setdefault(sid, {})
                    st["task_ms"] = st.get("task_ms", 0) + m.get(
                        "Executor Run Time", 0
                    )
                    st["gc_ms"] = st.get("gc_ms", 0) + m.get("JVM GC Time", 0)
                    st["cpu_ms"] = st.get("cpu_ms", 0) + m.get(
                        "Executor CPU Time", 0
                    ) // 1_000_000
                    sr = m.get("Shuffle Read Metrics") or {}
                    sw = m.get("Shuffle Write Metrics") or {}
                    st["sh_read_mb"] = st.get("sh_read_mb", 0) + (
                        sr.get("Local Bytes Read", 0)
                        + sr.get("Remote Bytes Read", 0)
                    ) // (1 << 20)
                    st["fetch_wait_ms"] = st.get("fetch_wait_ms", 0) + sr.get(
                        "Fetch Wait Time", 0
                    )
                    st["sh_write_mb"] = st.get("sh_write_mb", 0) + sw.get(
                        "Shuffle Bytes Written", 0
                    ) // (1 << 20)
                    st["spill_mb"] = st.get("spill_mb", 0) + m.get(
                        "Disk Bytes Spilled", 0
                    ) // (1 << 20)

    big = sorted(
        (s for s in stages.values() if s.get("wall_s", 0) > 0.5),
        key=lambda s: -s["wall_s"],
    )
    print(f"{'stage':<12} {'wall':>6} {'tasks':>5} {'taskT':>7} {'cpu':>7} "
          f"{'gc':>6} {'shR_MB':>7} {'shW_MB':>7} {'spill':>6} {'fetchW':>7}")
    for s in big[:15]:
        print(
            f"{s.get('name', '?'):<12} {s.get('wall_s', 0):>6} "
            f"{s.get('tasks', 0):>5} {s.get('task_ms', 0) / 1000:>7.1f} "
            f"{s.get('cpu_ms', 0) / 1000:>7.1f} "
            f"{s.get('gc_ms', 0) / 1000:>6.1f} {s.get('sh_read_mb', 0):>7} "
            f"{s.get('sh_write_mb', 0):>7} {s.get('spill_mb', 0):>6} "
            f"{s.get('fetch_wait_ms', 0) / 1000:>7.1f}"
        )
    print(json.dumps({"transport": transport, "cpus": int(CPUS),
                      "n_cand": n_cand, "t_cand": t_cand,
                      "t_verify": t_verify}))


if __name__ == "__main__":
    main()
