"""sf1 scaling probe for the L-ops (VERDICT r1 item 10).

Generates a 10× corpus from sf0.1 under /tmp (testdata is read-only):

* ``documents``: 10 replicas per doc, each with a per-replica suffix —
  every replica cluster is a genuine near-dup family (pairwise 3-gram
  Jaccard ≈ 0.9), so the dedup path is stressed with realistic clusters,
  not disjoint noise.  Output pairs grow linearly in |docs| (cluster size
  is fixed at 10).
* ``embeddings``: 10 replicas with small deterministic Gaussian
  perturbation — near-identical vector families for the ANN path.

Then times selected L queries at sf0.1 and the generated sf1 and prints
one JSON line: {"sf0.1": {...}, "sf1": {...}, "slope": {...}}.

Usage: python scripts/scaleprobe.py [query ...]   (default: l1 l2b l3d l4)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
DST = "/tmp/pgstream_scale/sf1"
REPLICAS = 10
DEFAULT_QUERIES = ["l1_exact_dedup", "l2b_minhash_lsh", "l3d_ivf_topk", "l4_text_stats"]


def generate(spark) -> None:
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(DST, exist_ok=True)
    if not os.path.exists(f"{DST}/documents.parquet"):
        docs = pq.read_table(f"{SRC}/documents.parquet").to_pandas()
        n = len(docs)
        parts = []
        for k in range(REPLICAS):
            p = docs.copy()
            p["doc_id"] = p["doc_id"] + k * n
            # per-replica suffix: replicas of one doc stay ~0.9-Jaccard near-dups
            p["text"] = p["text"] + f" replica{k} marker{k}"
            parts.append(p)
        out = pd.concat(parts, ignore_index=True)
        pq.write_table(pa.Table.from_pandas(out, preserve_index=False),
                       f"{DST}/documents.parquet")

    # events: 10 replicas, ids/users offset per replica, timestamps kept —
    # same 30-day span at 10× density, so time-bucketed operators see the
    # realistic axis (more rows per bucket, not a longer history).  Column
    # surgery stays in pyarrow: the ns-precision ts column must survive
    # byte-identical (pandas would coerce it).
    if not os.path.exists(f"{DST}/events.parquet"):
        ev = pq.read_table(f"{SRC}/events.parquet")
        n_ev = ev.num_rows
        n_users = pa.compute.count_distinct(ev.column("user_id")).as_py()
        eparts_t = []
        for k in range(REPLICAS):
            t = ev.set_column(
                ev.schema.get_field_index("event_id"),
                "event_id",
                pa.compute.add(ev.column("event_id"), k * n_ev),
            )
            t = t.set_column(
                t.schema.get_field_index("user_id"),
                "user_id",
                pa.compute.add(t.column("user_id"), k * n_users),
            )
            eparts_t.append(t)
        pq.write_table(pa.concat_tables(eparts_t), f"{DST}/events.parquet")

    if os.path.exists(f"{DST}/embeddings.parquet"):
        return

    embs = pq.read_table(f"{SRC}/embeddings.parquet").to_pandas()
    m = len(embs)
    rng = np.random.default_rng(11)
    eparts = []
    for k in range(REPLICAS):
        p = embs.copy()
        p["vec_id"] = p["vec_id"] + k * m
        vecs = np.stack(p["embedding"].to_numpy())
        vecs = vecs + rng.normal(0, 0.01, vecs.shape).astype(vecs.dtype)
        p["embedding"] = list(vecs)
        eparts.append(p)
    eout = pd.concat(eparts, ignore_index=True)
    pq.write_table(pa.Table.from_pandas(eout, preserve_index=False),
                   f"{DST}/embeddings.parquet")


def main() -> None:
    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("pgstream_spark-scaleprobe")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.files.maxPartitionBytes", "8m")
        .config("spark.sql.files.openCostInBytes", "1m")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    generate(spark)

    from pgstream_spark.inventory import QUERIES

    names = sys.argv[1:] or DEFAULT_QUERIES
    spark.range(1000).selectExpr("sum(id)").collect()

    result: dict[str, dict[str, float]] = {"sf0.1": {}, "sf1": {}}
    for sf_label, sf_dir in (("sf0.1", SRC), ("sf1", DST)):
        for name in names:
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = round(time.perf_counter() - t0, 2)
            result[sf_label][name] = dt
            print(f"  {sf_label} {name}: {dt}s", file=sys.stderr)
            spark.catalog.clearCache()

    slope = {
        n: round(result["sf1"][n] / result["sf0.1"][n], 2)
        for n in names
        if result["sf0.1"][n] > 0
    }
    print(json.dumps({**result, "slope_vs_10x_data": slope}))
    spark.stop()


if __name__ == "__main__":
    main()
