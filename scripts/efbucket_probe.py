"""Skewed-group equal-frequency bucketing: naive ntile vs the
windowless plan (VERDICT r9 item 1's scale claim, measured).

Fabricates (rid, grp, v) rows with ONE dominant group (the "90 % of a
web corpus is English" shape) and integer values quantized to 1e6
distinct levels (the lm_perplexity_buckets regime), then times

* the naive plan: ``ntile(k) OVER (PARTITION BY grp ORDER BY v DESC,
  rid)`` — the whole dominant group sorts in ONE task;
* ``textstats.equal_frequency_buckets`` — per-(grp, v) histogram,
  running totals over the bounded histogram, closed-form ntile
  arithmetic, row_number only on boundary ties.

Equality of the two outputs is asserted on a sample (the pytest pins
it exhaustively at small scale).  Run:

    python scripts/efbucket_probe.py [n_rows ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import SparkSession, Window
    from pyspark.sql import functions as F

    from pgstream_spark.operators.textstats import equal_frequency_buckets

    sizes = [int(x) for x in sys.argv[1:]] or [1_000_000, 10_000_000]
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    for n in sizes:
        # 90% of rows in group 'en', the rest spread over 9 groups;
        # values quantized to <= 1e6 distinct levels
        d = (
            spark.range(n)
            .select(
                F.col("id").alias("rid"),
                F.when(F.col("id") % 10 < 9, F.lit("en"))
                .otherwise(F.concat(F.lit("g"), (F.col("id") % 10).cast("string")))
                .alias("grp"),
                (F.xxhash64("id").bitwiseAND(F.lit((1 << 20) - 1)))
                .cast("bigint")
                .alias("v"),
            )
            .persist()
        )
        d.count()
        k = 10

        t0 = time.perf_counter()
        w = Window.partitionBy("grp").orderBy(F.col("v").desc(), F.col("rid").asc())
        naive = d.withColumn("bucket", F.ntile(k).over(w))
        naive.write.format("noop").mode("overwrite").save()
        t_naive = time.perf_counter() - t0

        t0 = time.perf_counter()
        ours = equal_frequency_buckets(d, "v", "grp", "rid", k)
        ours.write.format("noop").mode("overwrite").save()
        t_ours = time.perf_counter() - t0

        # spot equality on a deterministic sample
        probe = d.filter(F.col("rid") % 997 == 0)
        a = {r.rid: r.bucket for r in naive.join(probe.select("rid"), "rid").collect()}
        b = {r.rid: r.bucket for r in ours.join(probe.select("rid"), "rid").collect()}
        assert a == b, "plans disagree"
        print(
            f"n={n:>9}: naive per-group ntile {t_naive:7.2f} s, "
            f"windowless {t_ours:7.2f} s ({t_naive / t_ours:.1f}x)"
        )
        d.unpersist()


if __name__ == "__main__":
    main()
