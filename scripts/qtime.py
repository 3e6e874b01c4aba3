"""Ad-hoc single-query timer for ANY registry entry (bench.py's `only`
mode covers headline names only; the sweep can't be filtered).  Mirrors
the bench session conf and per-query protocol exactly (noop sink, cache
clear, GC between passes) so numbers are comparable to BENCH_LOCAL.

Usage:
    python scripts/qtime.py [-n PASSES] <query> [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    args = sys.argv[1:]
    passes = 2
    if args and args[0] == "-n":
        passes = int(args[1])
        args = args[2:]
    names = args

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("qtime")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "8m")
        .config("spark.sql.files.openCostInBytes", "1m")
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    os.environ.setdefault("SPARK_GRAFT_S6_BATCH", "1000")

    from pgstream_spark.inventory import QUERIES

    spark.range(1000).selectExpr("sum(id)").collect()

    best: dict[str, float] = {}
    for p in range(passes):
        for name in names:
            spark.sparkContext.setJobDescription(f"qtime:{name}")
            t0 = time.perf_counter()
            QUERIES[name](spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = round(time.perf_counter() - t0, 3)
            print(f"  pass{p + 1} {name}: {dt}s", flush=True)
            if name not in best or dt < best[name]:
                best[name] = dt
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
    for name in names:
        print(f"BEST {name}: {best[name]}s")
    spark.stop()


if __name__ == "__main__":
    main()
