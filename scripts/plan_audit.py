"""Bulk plan audit over the whole registry (round-11 close sweep):
build every queries() DataFrame and flag plan smells without executing
anything heavy (construction may run the few bounded build-time jobs
some operators declare, e.g. centroid training samples).

Flags:
  CARTESIAN  — CartesianProduct / BroadcastNestedLoopJoin with a
               non-single-row side is suspicious (single-row scalar
               attaches are the accepted pattern and reported `nlj-ok`)
  PYROW      — BatchEvalPython (row-at-a-time Python UDF; the repo
               contract is Arrow-only Python)
  SORTAGG+EXPAND — SortAggregate directly over Expand (the l54
               demotion pathology)

Usage: python scripts/plan_audit.py [query ...]
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("plan-audit")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "8m")
        .config("spark.sql.files.openCostInBytes", "1m")
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    os.environ.setdefault("SPARK_GRAFT_S6_BATCH", "1000")

    from pgstream_spark.inventory import QUERIES

    names = sys.argv[1:] or list(QUERIES)
    flagged = 0
    for name in names:
        try:
            df = QUERIES[name](spark, SF_DIR)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            txt = buf.getvalue()
        except Exception as e:  # noqa: BLE001 — audit must keep going
            print(f"ERROR {name}: {type(e).__name__}: {str(e)[:120]}")
            flagged += 1
            continue
        smells = []
        if "CartesianProduct" in txt:
            smells.append("CARTESIAN")
        if "BatchEvalPython" in txt:
            smells.append("PYROW")
        lines = txt.splitlines()
        for i, ln in enumerate(lines):
            if "Expand" in ln and any(
                "SortAggregate" in p for p in lines[max(0, i - 3) : i]
            ):
                smells.append("SORTAGG+EXPAND")
                break
        # BroadcastNestedLoopJoin: fine when one side is a one-row
        # aggregate (scalar attach); flag otherwise for human review
        if "BroadcastNestedLoopJoin" in txt:
            smells.append("nlj-review")
        if smells:
            print(f"FLAG {name}: {','.join(smells)}")
            flagged += 1
        spark.catalog.clearCache()
    print(f"audited {len(names)} queries, {flagged} flagged")
    spark.stop()


if __name__ == "__main__":
    main()
