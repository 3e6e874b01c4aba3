"""Perceptual near-dup tier scale probe: does the banded signature
join stay LINEAR when the corpus grows but near-dup family sizes stay
bounded (the real-corpus regime), and what do saturated buckets cost
(the documented failure mode)?

Synthesizes N 16×16 P6 images JVM-side (the l102 md5-block recipe) in
families of FIXED size F (group = id DIV F; odd members perturb one
block — a true near-dup), then times

* ``sig``   — dhash_signatures (codec decode + numpy kernel, mapInPandas)
* ``pairs`` — dhash_candidate_pairs at hamming ≤ 3 (banded join,
  distinct, signature join-back, bit_count verify)

at N and 10N.  With F fixed, candidate fan-out is Σ_bucket |bucket|²
≈ N·F — linear in N; the probe asserts the measured pair count scales
~10× and prints walls.  A second arm runs ONE saturated family
(F = N/10) to show the quadratic blow-up the docstring warns about —
the reason exact dedup runs before perceptual banding.

Usage: python scripts/perceptual_probe.py [N] (default 5000)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from pgstream_spark.operators.multimodal import (  # noqa: E402
    dhash_candidate_pairs,
    dhash_signatures,
)


def synth(spark, n: int, family: int):
    d = spark.range(n).select(F.col("id").alias("doc_id"))
    blocks = []
    for b in range(48):
        if b < 47:
            kcol = (F.col("doc_id") / family).cast("long").cast("string")
        else:
            kcol = F.when(
                F.col("doc_id") % 2 == 0,
                (F.col("doc_id") / family).cast("long").cast("string"),
            ).otherwise(F.col("doc_id").cast("string"))
        blocks.append(
            F.unhex(F.md5(F.concat(F.lit("pp:"), kcol, F.lit(f":{b}"))))
        )
    payload = F.concat(F.lit(bytearray(b"P6\n16 16\n255\n")), *blocks)
    return d.select(
        "doc_id", payload.alias("payload")
    ).repartition(spark.sparkContext.defaultParallelism)


def run(spark, n: int, family: int) -> dict:
    imgs = synth(spark, n, family)
    t0 = time.perf_counter()
    sigs = dhash_signatures(imgs, "payload", "doc_id").persist()
    n_sigs = sigs.count()
    t_sig = time.perf_counter() - t0
    t0 = time.perf_counter()
    n_pairs = dhash_candidate_pairs(sigs, max_hamming=3).count()
    t_pairs = time.perf_counter() - t0
    sigs.unpersist()
    return {
        "n": n,
        "family": family,
        "sigs": n_sigs,
        "sig_s": round(t_sig, 2),
        "pairs": n_pairs,
        "pairs_s": round(t_pairs, 2),
    }


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "8g")
        .appName("perceptual_probe")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    run(spark, 500, 20)  # warm the JVM + Python workers out of the timings
    out = {
        "bounded_1x": run(spark, n, 20),
        "bounded_10x": run(spark, 10 * n, 20),
        # capped: the saturated arm's OUTPUT is quadratic in family
        # size (that is the point); past ~5k it materializes tens of
        # millions of pairs and the demonstration needs no more rows
        "saturated": run(spark, min(n, 5000), max(min(n, 5000) // 10, 2)),
    }
    # the law the probe exists to verify, machine-checked: with family
    # size fixed, banded fan-out is linear in corpus size — ~10x pairs
    # for 10x assets.  NOT exactly 10x: per-family pair counts differ
    # (each odd member's hamming distance depends on the md5 of its own
    # doc_id block, so some odd members fall outside hamming ≤ 3), and
    # the 10N run adds NEW families whose counts need not average the
    # same as the first N/F families' — so assert linearity within 5%.
    ratio = out["bounded_10x"]["pairs"] / max(out["bounded_1x"]["pairs"], 1)
    assert 9.5 <= ratio <= 10.5, (ratio, out)
    # and the saturated arm IS the quadratic failure mode: far more
    # pairs per asset than the bounded regime
    assert (
        out["saturated"]["pairs"] * out["bounded_1x"]["n"]
        > 5 * out["bounded_1x"]["pairs"] * out["saturated"]["n"]
    ), out
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
