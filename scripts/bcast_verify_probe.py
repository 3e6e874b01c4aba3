"""Probe: broadcast the per-doc shingle-array table in the verify
score join (both attaches map-side; candidate pairs never carry arrays
through an exchange).  Compare vs the shuffle-attach baseline at sf1.

Usage: SPARK_GRAFT_CPUS=32 python scripts/bcast_verify_probe.py [dict|strings]
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
    transport = sys.argv[1] if len(sys.argv) > 1 else "strings"

    from pyspark.sql import SparkSession, Window
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("bcast-verify-probe")
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

    from pgstream_spark.operators.dedup import prefix_filter_candidates

    spark.range(1000).selectExpr("sum(id)").collect()
    d = spark.read.parquet(f"{SF}/documents.parquet")

    threshold = 0.6
    cand, sh_ex = prefix_filter_candidates(
        d, "doc_id", "text", n=3, threshold=threshold, return_shingles=True
    )
    cand = cand.persist()
    n_cand = cand.count()

    if transport == "strings":
        sh = (
            sh_ex.groupBy("__id")
            .agg(F.collect_list("__sh").alias("__vsh"))
            .withColumnRenamed("__id", "__vid")
        )
    else:
        NB = 4096
        sh_rows = sh_ex.select(
            F.col("__id").alias("__vid"), F.col("__sh").alias("__vs")
        )
        shingle_ids = (
            sh_rows.select("__vs")
            .distinct()
            .withColumn("__b", F.pmod(F.xxhash64("__vs"), F.lit(NB)))
            .withColumn(
                "__sid",
                F.row_number()
                .over(Window.partitionBy("__b").orderBy("__vs"))
                .cast("bigint")
                * NB
                + F.col("__b"),
            )
            .drop("__b")
        )
        sh = (
            d.select(F.col("doc_id").alias("__vid"))
            .join(
                sh_rows.join(shingle_ids, "__vs")
                .groupBy("__vid")
                .agg(F.collect_list("__sid").alias("__vsh")),
                "__vid",
                "left",
            )
            .withColumn(
                "__vsh", F.coalesce("__vsh", F.array().cast("array<bigint>"))
            )
        )

    sh = sh.withColumn("__vn", F.size("__vsh")).persist()
    sh.count()
    joined = (
        cand.join(
            F.broadcast(sh.withColumnRenamed("__vid", "id_a")), "id_a"
        )
        .withColumnRenamed("__vsh", "__sha")
        .withColumnRenamed("__vn", "__na")
        .join(F.broadcast(sh.withColumnRenamed("__vid", "id_b")), "id_b")
        .withColumnRenamed("__vsh", "__shb")
        .withColumnRenamed("__vn", "__nb")
    )
    inter = F.size(F.array_intersect("__sha", "__shb"))
    union = F.col("__na") + F.col("__nb") - inter
    pairs = (
        joined.withColumn("jaccard", inter / union)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    spark.sparkContext.setJobDescription("VERIFY-BCAST")
    t0 = time.perf_counter()
    pairs.write.format("noop").mode("overwrite").save()
    t_verify = round(time.perf_counter() - t0, 2)
    print(json.dumps({
        "mode": "bcast", "transport": transport, "cpus": int(CPUS),
        "n_cand": n_cand, "t_verify": t_verify,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
