"""Prototype: aggregated positional bound (PPJoin family) for
prefix_filter_candidates — measures how many of the sf1 candidates the
tighter pair-level bound prunes, and the end-to-end effect on verify.

The bound: group the prefix-token join rows per (id_a, id_b); with
c = number of matched prefix tokens and la/lb = MAX matched (0-based)
position per side, every common token NOT matched in both prefixes has
global rarity rank after the LAST matched token (both arrays are sorted
by the same global order), hence sits at positions > la in A and > lb
in B.  So |A∩B| <= c + min(sz_a-1-la, sz_b-1-lb); prune when that is
below the Jaccard intersection threshold alpha = ceil(t/(1+t)*(sz_a+sz_b)).

Usage: SPARK_GRAFT_CPUS=32 python scripts/ppjoin_bound_probe.py [dict|strings]
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

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("ppjoin-bound-probe")
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
        _spread,
        shingles_col,
        tokens_col,
        verify_candidate_pairs,
    )

    spark.range(1000).selectExpr("sum(id)").collect()
    d = spark.read.parquet(f"{SF}/documents.parquet")

    threshold, n = 0.6, 3
    tm = round(threshold * 1_000_000)
    id_col, text_col = "doc_id", "text"

    sh = _spread(d, id_col).select(
        F.col(id_col).alias("__id"),
        F.explode(shingles_col(tokens_col(F.col(text_col)), n)).alias("__sh"),
    )
    sh = sh.persist()
    freq = sh.groupBy("__sh").agg(F.count(F.lit(1)).alias("__df"))
    per_doc = (
        sh.join(freq, "__sh")
        .groupBy("__id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("__df"), F.col("__sh")))
            ).alias("__sorted"),
            F.count(F.lit(1)).alias("__sz"),
        )
    )
    plen = F.greatest(
        F.lit(1),
        F.least(
            F.col("__sz"),
            F.col("__sz") - F.expr(f"({tm} * __sz) DIV 1000000") + 1,
        ),
    )
    pre = per_doc.select(
        "__id",
        "__sz",
        F.posexplode(
            F.transform(
                F.slice("__sorted", F.lit(1), plen), lambda s: s["__sh"]
            )
        ).alias("__pos", "__sh"),
    )
    pre = pre.persist()
    pre.count()

    alpha = (
        f"(CAST({tm} AS BIGINT) * (a.__sz + b.__sz) "
        f"+ {1_000_000 + tm - 1}) DIV {1_000_000 + tm}"
    )
    t0 = time.perf_counter()
    cand = (
        pre.alias("a")
        .join(pre.alias("b"), "__sh")
        .filter(
            (F.col("a.__id") < F.col("b.__id"))
            & (
                F.least("a.__sz", "b.__sz") * 1_000_000
                >= F.lit(tm) * F.greatest("a.__sz", "b.__sz")
            )
        )
        .groupBy(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            F.col("a.__sz").alias("__sza"),
            F.col("b.__sz").alias("__szb"),
        )
        .agg(
            F.count(F.lit(1)).alias("__c"),
            F.max("a.__pos").alias("__la"),
            F.max("b.__pos").alias("__lb"),
        )
        .filter(
            F.col("__c")
            + F.least(
                F.col("__sza") - 1 - F.col("__la"),
                F.col("__szb") - 1 - F.col("__lb"),
            )
            >= F.expr(
                f"(CAST({tm} AS BIGINT) * (__sza + __szb) "
                f"+ {1_000_000 + tm - 1}) DIV {1_000_000 + tm}"
            )
        )
        .select("id_a", "id_b")
    )
    cand = cand.persist()
    n_cand = cand.count()
    t_cand = round(time.perf_counter() - t0, 2)
    print(f"  candidates(aggbound): {n_cand} in {t_cand}s", file=sys.stderr)

    pairs = verify_candidate_pairs(
        cand, d, id_col, text_col, n=n, threshold=threshold,
        transport=transport, shingles_exploded=sh,
    )
    spark.sparkContext.setJobDescription("VERIFY")
    t0 = time.perf_counter()
    n_pairs = pairs.count()
    t_verify = round(time.perf_counter() - t0, 2)
    print(json.dumps({
        "transport": transport, "cpus": int(CPUS), "n_cand": n_cand,
        "t_cand": t_cand, "n_pairs": n_pairs, "t_verify": t_verify,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
