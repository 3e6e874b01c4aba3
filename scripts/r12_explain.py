"""Capture .explain("formatted") for named inventory queries into
plans/r12/<name>_<tag>.txt — the before/after evidence files for the
round-12 optimization log (OPTIMIZATION_r12.md).

VERDICT r11 item 2: the r11 version silently committed "EXPLAIN FAILED"
stack traces as evidence when the SparkContext had died mid-batch.  This
version FAILS LOUDLY: any capture error aborts the whole run with a
non-zero exit and writes NOTHING for that query, so a garbage file can
never be cited as a plan diff.

Usage:
    python scripts/r12_explain.py <tag> <query> [query ...]

Building each DataFrame costs analysis/optimization only (plus the
bounded build-time jobs a few operators run, e.g. as-of hot-key
detection) — no full execution.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    if len(sys.argv) < 3:
        print("usage: r12_explain.py <tag> <query> [query ...]", file=sys.stderr)
        sys.exit(2)
    tag = sys.argv[1]
    names = sys.argv[2:]

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("r12-explain")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "8m")
        .config("spark.sql.files.openCostInBytes", "1m")
        # bench.py parity
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
        .config("spark.ui.enabled", "false")
        # sf1 captures: a few operators run bounded plan-construction
        # jobs (eager persist+count of shared tiers), which OOM the 1 g
        # default heap on the 10x corpus
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
        )
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pgstream_spark.inventory import QUERIES

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    outdir = os.path.join(here, "plans", "r12")
    os.makedirs(outdir, exist_ok=True)

    for name in names:
        if name not in QUERIES:
            print(f"FATAL: {name} not in registry", file=sys.stderr)
            sys.exit(1)
        # fail loudly: no try/except — a dead SparkContext or a broken
        # query must abort the capture run, never write a garbage file
        df = QUERIES[name](spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        text = buf.getvalue()
        if "== Physical Plan ==" not in text:
            print(f"FATAL: {name}: no physical plan in explain output",
                  file=sys.stderr)
            sys.exit(1)
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(text)
        print(f"  wrote {path} ({len(text)} bytes)", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
