"""Phase attribution for the prefix family (l55/l87b) at sf1 — which
phase fails to scale 8→32 cores (VERDICT r11 item 6: the two ≈1-ratio
heavy entries must be explained or fixed).

Phases, timed as incremental actions in one session (caches persist
across phases exactly as they do inside one query execution):

  A. candidates    — prefix_filter_candidates noop (sh persist + df
                     table + per-doc prefix build + self-join + distinct)
  B. verify        — verify_candidate_pairs over the cached sh/pre
                     (array rebuild via collect_list + score join)
  C. cc            — dedup_clusters over the persisted verified pairs
  D. rank          — l55's survivor ranking over the persisted clusters

Usage: SPARK_GRAFT_CPUS=8|32 python scripts/prefix_phase_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/tmp/pgstream_scale/sf1"
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    from pyspark.sql import SparkSession, Window
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("prefix-phase-probe")
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
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
        )
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pgstream_spark.operators.dedup import (
        dedup_clusters,
        prefix_filter_candidates,
        verify_candidate_pairs,
    )
    from pgstream_spark.operators.textstats import quality_score

    spark.range(1000).selectExpr("sum(id)").collect()
    d = spark.read.parquet(f"{SF}/documents.parquet")

    out: dict[str, float] = {"cpus": int(CPUS)}

    def noop(df, label):
        spark.sparkContext.setJobDescription(label)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        dt = round(time.perf_counter() - t0, 2)
        out[label] = dt
        print(f"  {label}: {dt}s", file=sys.stderr)

    t_all0 = time.perf_counter()
    cand, sh = prefix_filter_candidates(
        d, "doc_id", "text", n=3, threshold=0.6, return_shingles=True
    )
    noop(cand, "A_candidates")

    pairs = verify_candidate_pairs(
        cand, d, "doc_id", "text", n=3, threshold=0.6,
        shingles_exploded=sh,
    ).persist()
    spark.sparkContext.setJobDescription("B_verify")
    t0 = time.perf_counter()
    n_pairs = pairs.count()
    out["B_verify"] = round(time.perf_counter() - t0, 2)
    out["n_pairs"] = n_pairs
    print(f"  B_verify: {out['B_verify']}s ({n_pairs} pairs)", file=sys.stderr)

    clusters = dedup_clusters(pairs).persist()
    spark.sparkContext.setJobDescription("C_cc")
    t0 = time.perf_counter()
    n_nodes = clusters.count()
    out["C_cc"] = round(time.perf_counter() - t0, 2)
    out["n_nodes"] = n_nodes
    print(f"  C_cc: {out['C_cc']}s ({n_nodes} nodes)", file=sys.stderr)

    docs = (
        d.select("doc_id")
        .join(clusters, F.col("doc_id") == F.col("node"), "left")
        .select("doc_id", F.coalesce("cluster", "doc_id").alias("cluster"))
    )
    qs = quality_score(d).select("doc_id", "quality")
    ranked = docs.join(qs, "doc_id").withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("cluster").orderBy(
                F.col("quality").desc(), F.col("doc_id").asc()
            )
        ),
    )
    final = ranked.filter(F.col("rn") == 1).select(
        "doc_id", "cluster", F.round("quality", 6).alias("quality")
    )
    noop(final, "D_rank")
    out["total"] = round(time.perf_counter() - t_all0, 2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
