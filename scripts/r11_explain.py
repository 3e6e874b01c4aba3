"""Capture .explain("formatted") for named inventory queries into
plans/r11/<name>_<tag>.txt — the before/after evidence files for the
round-11 optimization log (OPTIMIZATION_r11.md).

Usage:
    python scripts/r11_explain.py <tag> [query ...]

With no query list, captures the bench HEADLINE set plus the top sweep
offenders named in OPTIMIZATION_r11.md.  Building each DataFrame costs
analysis/optimization only (plus the bounded build-time jobs a few
operators run, e.g. centroid-training samples) — no full execution.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

DEFAULT = [
    # bench HEADLINE
    "l2b_minhash_lsh", "s1_scan_count", "x1_pandas_kernel", "g1_tpch_q1",
    "g3_count_distinct", "j1_inner_equi", "j4_broadcast_join", "j8_asof_join",
    "j9_interval_join", "w1_rank", "o3_topk_per_group", "t4_tumbling_window",
    "t5_session_window", "l3_vector_topk", "l4b_fingerprint",
    "l4d_quality_score", "g10_tpch_q3_shipping", "g11_tpch_q5_local_supplier",
    "t9_time_rollup", "t15_ohlc_bars", "l26_bm25_scores",
    # top sweep offenders (BENCH_LOCAL sweep_best, round 10)
    "l87b_cluster_split_prefix", "l55_canonical_prefix",
    "l72_dedup_threshold_sweep", "l72b_dedup_threshold_sweep_prefix",
    "l36_ivf_adc", "l36b_ivf_adc_residual", "l3c_embedding_neardup",
    "l52_prefix_filter_join", "l49_triangle_count",
    "l102c_perceptual_families", "l46_embedding_gram", "l29_canonical_docs",
    "l87_cluster_safe_split", "l8_dedup_clusters", "l11_contamination",
    "l27b_hybrid_rrf_ann", "l84_incremental_neardup", "l64_entity_resolution",
    "l75_minhash_calibration", "l35_pq_codes", "l3b_lsh_topk",
]


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or DEFAULT

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("r11-explain")
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
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pgstream_spark.inventory import QUERIES

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    outdir = os.path.join(here, "plans", "r11")
    os.makedirs(outdir, exist_ok=True)

    for name in names:
        if name not in QUERIES:
            print(f"  ?? {name}: not in registry", file=sys.stderr)
            continue
        try:
            df = QUERIES[name](spark, SF_DIR)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as e:  # noqa: BLE001 — capture what we can
            text = f"EXPLAIN FAILED: {type(e).__name__}: {e}\n"
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(text)
        print(f"  wrote {path} ({len(text)} bytes)", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
