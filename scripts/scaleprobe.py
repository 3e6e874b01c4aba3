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
       python scripts/scaleprobe.py --decade      (VERDICT r5 item 6)
       python scripts/scaleprobe.py --ann-recall  (VERDICT r7 item 2)

``--ann-recall`` closes the decade probe's quality gap: the round-7
``--decade-ann`` leg proved the WALL-CLOCK law (25× data → 1.6-2.2×
wall) but not that recall@k survives as the corpus densifies.  This
mode samples ~100 query vectors spread across the corpus, computes the
brute-force top-10 TRUTH once per scale (one bounded broadcast leg —
the ``similarity.brute_force_top_k`` oracle shape), and scores each
approximate tier (l3b sign-LSH, l3d IVF, l36 IVF-ADC) at the SAME gate
parameters the wall table used, at 2k / 20k / 500k vectors.

``--decade`` extends the measured scale law ONE MORE DECADE for the
three queries that carry the dedup tier's heaviest shuffles — l2b (LSH
banding), l52 (prefix filter), l69 (first-occurrence join) — timing
them at sf0.1, sf1 AND a generated 500k-doc sf10 in one same-host run.
The sf10 corpus preserves sf1's structural law (near-dup families of
EXACTLY 10) one decade up: 10 outer "corpora" × 10 inner replicas of
the sf0.1 base, where the outer level salts every token with the
corpus index (disjoint shingle/token sets, so no cross-corpus pairs
and no family inflation) and the inner level appends the same
per-replica suffix sf1 uses (pairwise ~0.9 Jaccard).  True pairs thus
grow linearly (50k families × 45), which is the corpus-growth regime
a production dedup pipeline sees — more documents, not bigger
duplicate clusters.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
DST = "/tmp/pgstream_scale/sf1"
DST10 = "/tmp/pgstream_scale/sf10"
REPLICAS = 10
DEFAULT_QUERIES = ["l1_exact_dedup", "l2b_minhash_lsh", "l3d_ivf_topk", "l4_text_stats"]
DECADE_QUERIES = [
    "l2b_minhash_lsh",
    "l52_prefix_filter_join",
    "l69_ngram_novelty",
]
# --decade-ann (VERDICT r6 item 5): the vector tier's scale laws, same
# standard as the dedup trio — sign-LSH bucketed candidates, IVF
# partition-pruned probes, and IVF-PQ/ADC — over a 500k-vector corpus.
DECADE_ANN_QUERIES = [
    "l3b_lsh_topk",
    "l3d_ivf_topk",
    "l36_ivf_adc",
]


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


def generate_sf10() -> None:
    """500k-doc corpus: 10 token-salted disjoint copies of the sf0.1
    base, each carrying sf1's 10-member near-dup families — family size
    stays 10 while the corpus grows 100×, so pair growth stays linear
    (the corpus-growth regime, not the cluster-inflation one)."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(DST10, exist_ok=True)
    path = f"{DST10}/documents.parquet"
    if os.path.exists(path):
        return
    docs = pq.read_table(f"{SRC}/documents.parquet").to_pandas()
    n = len(docs)
    writer = None
    try:
        for j in range(REPLICAS):
            base = docs.copy()
            # outer salt: every token gains the corpus index, so
            # corpora share no tokens/shingles (the family-suffix
            # tokens below are shared but 2-of-~50 — under every
            # similarity threshold and never in a rarity prefix)
            base["text"] = [
                " ".join(f"{w}{j}" for w in t.split())
                for t in base["text"]
            ]
            for k in range(REPLICAS):
                p = base.copy()
                p["doc_id"] = p["doc_id"] + (j * REPLICAS + k) * n
                p["text"] = p["text"] + f" replica{k} marker{k}"
                tbl = pa.Table.from_pandas(p, preserve_index=False)
                if writer is None:
                    writer = pq.ParquetWriter(path, tbl.schema)
                writer.write_table(tbl)
    finally:
        if writer is not None:
            writer.close()


def generate_sf10_embeddings() -> None:
    """500k-vector corpus for the ANN decade leg: 25 outer "corpora"
    (each shifted by its own N(0,1) region offset — corpora occupy
    disjoint regions, so top-k neighborhoods never mix across them) ×
    10 inner near-identical replicas (σ=0.01 perturbation, the same
    family design as the sf1 embeddings) of the 2k sf0.1 base.  Family
    size stays 10 while the corpus grows 250× — the corpus-growth
    regime, matching the documents sf10 design.  250 separate
    ``write_table`` calls → 250 row groups, so the scan stage can use
    every thread (the l69 row-group lesson)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(DST10, exist_ok=True)
    path = f"{DST10}/embeddings.parquet"
    if os.path.exists(path):
        return
    embs = pq.read_table(f"{SRC}/embeddings.parquet").to_pandas()
    m = len(embs)
    base = np.stack(embs["embedding"].to_numpy())
    rng = np.random.default_rng(17)
    writer = None
    try:
        for j in range(25):
            offset = rng.normal(0, 1.0, base.shape[1]).astype(base.dtype)
            corpus = base + offset
            for k in range(REPLICAS):
                p = embs.copy()
                p["vec_id"] = embs["vec_id"] + (j * REPLICAS + k) * m
                p["embedding"] = list(
                    corpus + rng.normal(0, 0.01, base.shape).astype(base.dtype)
                )
                tbl = pa.Table.from_pandas(p, preserve_index=False)
                if writer is None:
                    writer = pq.ParquetWriter(path, tbl.schema)
                writer.write_table(tbl)
    finally:
        if writer is not None:
            writer.close()


def ann_recall(spark, levels, k: int = 10, n_queries: int = 100) -> dict:
    """recall@k of each approximate ANN tier against brute-force truth,
    per scale level.  Query vectors are sampled by a deterministic
    stride over vec_id so they spread across every region/family of the
    generated corpora; truth is computed ONCE per level and each tier's
    predictions join against it (set-intersection recall, the standard
    definition).  Tiers run at the GATE parameters (l3b: m_bits=6,
    tables=6; l3d/l36: n_lists=16, n_probes=4) — the same configuration
    whose wall-clock law the round-7 decade probe measured, so the
    recall and wall tables are directly comparable."""
    import time as _time

    from pyspark.sql import functions as F

    from pgstream_spark.operators.ivf import ivf_adc_top_k, ivf_top_k, train_centroids
    from pgstream_spark.operators.pq import (
        default_codebooks,
        train_residual_codebooks,
    )
    from pgstream_spark.operators.similarity import (
        brute_force_top_k,
        lsh_bucketed_top_k,
    )

    out: dict[str, dict] = {}
    books = default_codebooks(dim=64, m_subspaces=16, n_codes=16)
    for label, sf_dir in levels:
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        n = emb.count()
        step = max(1, n // n_queries)
        queries = (
            emb.filter(F.col("vec_id") % step == 0).limit(n_queries).persist()
        )
        nq = queries.count()
        truth = (
            brute_force_top_k(queries, emb, k=k)
            .select("query_id", "neighbor_id")
            .persist()
        )
        t_truth = truth.count()
        cents = train_centroids(emb, n_lists=16, sample_size=1024)
        # the SCALED configuration: n_lists grows ~sqrt(N) (16 at the 2k
        # gate corpus, ~256 at 500k — the measured recall sweet spot),
        # probe fraction pinned at 1/16, residual-trained codebooks.
        # This is the production IVFPQ recipe (Jégou et al., TPAMI 2011)
        # the round-8 cliff investigation landed (SCALE.md).
        n_lists_s = max(16, int(round((n ** 0.5) / 2.8)))
        cents_s = (
            cents
            if n_lists_s == 16
            else train_centroids(
                emb, n_lists=n_lists_s, sample_size=max(4096, n_lists_s * 4),
                iters=8,
            )
        )
        books_s = train_residual_codebooks(
            emb, cents_s, m_subspaces=16, n_codes=16
        )
        level: dict[str, object] = {
            "n_vectors": n,
            "n_queries": nq,
            "n_lists_scaled": n_lists_s,
        }
        tiers = (
            (
                "l3b_lsh",
                lambda: lsh_bucketed_top_k(
                    queries, emb, k=k, m_bits=6, tables=6, dim=64
                ),
            ),
            ("l3d_ivf", lambda: ivf_top_k(queries, emb, cents, k=k, n_probes=4)),
            (
                "l36_ivf_adc",
                lambda: ivf_adc_top_k(
                    queries, emb, cents, books, k=k, n_probes=4,
                    shortlist=64, residual=False,  # the raw baseline arm
                ),
            ),
            (
                "l36_adc_residual",
                lambda: ivf_adc_top_k(
                    queries, emb, cents, books, k=k, n_probes=4,
                    shortlist=64, residual=True,
                ),
            ),
            (
                "l36_adc_res_scaled",
                lambda: ivf_adc_top_k(
                    queries, emb, cents_s, books_s, k=k,
                    n_probes=max(4, n_lists_s // 16), shortlist=128,
                    residual=True,
                ),
            ),
        )
        for name, fn in tiers:
            t0 = _time.perf_counter()
            pred = fn().select("query_id", "neighbor_id")
            hits = pred.join(truth, ["query_id", "neighbor_id"]).count()
            level[name] = {
                f"recall_at_{k}": round(hits / t_truth, 4),
                "wall_s": round(_time.perf_counter() - t0, 2),
            }
            print(f"  {label} {name}: {level[name]}", file=sys.stderr)
            spark.sparkContext._jvm.System.gc()
        truth.unpersist()
        queries.unpersist()
        out[label] = level
    return out


def skipping_probe(spark) -> dict:
    """VERDICT r8 item 6: the skipping tier's PRUNING LAW, measured —
    files skipped vs files total and wall vs full scan on a replicated
    lineitem corpus at two decades (6M rows / 64 files, 60M rows / 256
    files), plus `metadata_aggregate` timed against the equivalent
    full-scan aggregate and `delete_where`'s touched-file economics.
    Tables are clustered on ``l_orderkey`` (disjoint per-file ranges —
    the layout `write_clustered` exists for) and bloom-indexed on
    ``l_rid``, a HIGH-CARDINALITY unique row id scattered across files
    (each file holds only its own ~n/files ids — min/max spans the
    domain and is useless, the bloom's exact use case; bits sized ~14×
    per-file distincts for ~1 % FPR).  All walls are min-of-2."""
    import shutil

    from pyspark.sql import functions as F

    from pgstream_spark.sinks import write_clustered
    from pgstream_spark.sources.parquet import load_table
    from pgstream_spark.sources.skipping import (
        MANIFEST_NAME,
        add_bloom_sidecar,
        bloom_pruned_parquet,
        delete_where,
        metadata_aggregate,
        pruned_parquet,
        write_stats_manifest,
    )

    out: dict = {}
    base = load_table(spark, SRC, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_quantity", "l_shipdate"
    )
    max_key = base.agg(F.max("l_orderkey")).collect()[0][0]
    for label, reps, n_files, m_bits in (
        ("sf1", 10, 64, 1 << 21),   # ~94k ids/file × 14 bits ≈ 1.3M
        ("sf10", 100, 256, 1 << 22),  # ~234k ids/file × 14 bits ≈ 3.3M
    ):
        tbl = f"/tmp/pgstream_scale/skiptbl_{label}"
        shutil.rmtree(tbl, ignore_errors=True)
        # replicas get disjoint key ranges: corpus GROWS, per-key
        # density stays — the production append regime
        rep = spark.range(reps).selectExpr("id AS __r")
        big = base.crossJoin(F.broadcast(rep)).select(
            (F.col("l_orderkey") + F.col("__r") * (max_key + 1)).alias(
                "l_orderkey"
            ),
            "l_suppkey",
            "l_quantity",
            "l_shipdate",
        )
        # unique-per-row id, UNCORRELATED with the clustered layout:
        # every file gets its own ~n/files ids out of the full domain
        big = big.withColumn(
            "l_rid",
            F.xxhash64("l_orderkey", "l_suppkey", "l_quantity", "l_shipdate"),
        )
        write_clustered(big, tbl, ["l_orderkey"], n_files=n_files)
        t0 = time.perf_counter()
        write_stats_manifest(spark, tbl, ["l_orderkey", "l_rid"])
        out[f"{label}_manifest_build_s"] = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        add_bloom_sidecar(spark, tbl, "l_rid", m_bits=m_bits, k=6)
        out[f"{label}_bloom_build_s"] = round(time.perf_counter() - t0, 2)
        # executor-side build (method="scan"): must emit the same blobs
        # in 1/cores the wall — the 100 TB build path
        t0 = time.perf_counter()
        add_bloom_sidecar(
            spark, tbl, "l_rid", m_bits=m_bits, k=6, method="scan"
        )
        out[f"{label}_bloom_build_scan_s"] = round(
            time.perf_counter() - t0, 2
        )
        lo, hi = 1000, 9999  # ~selective range inside replica 0
        # three REAL scattered ids, drawn from distinct orderkey
        # neighborhoods (so they live in different files)
        probe = [
            r[0]
            for r in spark.read.parquet(tbl)
            .filter(F.col("l_orderkey").isin([5, max_key // 2, max_key - 5]))
            .select("l_rid")
            .limit(3)
            .collect()
        ]

        def _time(fn):
            walls = []
            for _ in range(2):  # min-of-2: strip JIT/IO warm-up noise
                t0 = time.perf_counter()
                r = fn()
                walls.append(time.perf_counter() - t0)
            return r, round(min(walls), 3)

        full, t_full = _time(
            lambda: spark.read.parquet(tbl)
            .filter(F.col("l_orderkey").between(lo, hi))
            .count()
        )
        pr = pruned_parquet(spark, tbl, "l_orderkey", lo, hi)
        pruned, t_pruned = _time(pr.count)
        assert full == pruned, (full, pruned)
        n_total = len(spark.read.parquet(tbl).inputFiles())
        out[f"{label}_range"] = {
            "files_total": n_total,
            "files_read": len(pr.inputFiles()),
            "full_scan_s": t_full,
            "pruned_s": t_pruned,
            "rows": int(full),
        }
        full_in, t_full_in = _time(
            lambda: spark.read.parquet(tbl)
            .filter(F.col("l_rid").isin(probe))
            .count()
        )
        bp = bloom_pruned_parquet(spark, tbl, "l_rid", probe)
        bloom_rows, t_bloom = _time(bp.count)
        assert full_in == bloom_rows, (full_in, bloom_rows)
        out[f"{label}_bloom_point"] = {
            "files_total": n_total,
            "files_read": len(bp.inputFiles()),
            "full_scan_s": t_full_in,
            "bloom_s": t_bloom,
            "rows": int(full_in),
        }
        _, t_meta = _time(lambda: metadata_aggregate(spark, tbl).collect())
        _, t_scan_agg = _time(
            lambda: spark.read.parquet(tbl)
            .agg(
                F.count(F.lit(1)),
                F.count("l_orderkey"),
                F.min("l_orderkey"),
                F.max("l_orderkey"),
                F.count("l_rid"),
                F.min("l_rid"),
                F.max("l_rid"),
            )
            .collect()
        )
        out[f"{label}_metadata_agg"] = {
            "manifest_only_s": t_meta,
            "full_scan_agg_s": t_scan_agg,
        }
        # targeted delete at the END (mutates the table): a one-replica
        # key range — costed at the files containing it
        t0 = time.perf_counter()
        res = delete_where(spark, tbl, "l_orderkey", lower=lo, upper=hi)
        out[f"{label}_delete"] = {
            **res,
            "wall_s": round(time.perf_counter() - t0, 3),
        }
        shutil.rmtree(tbl, ignore_errors=True)  # consumed by the delete
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
    return out


def _driver_mem() -> str:
    """Heap for the single-JVM local session: the env override wins;
    otherwise the mode default (48g for --decade, 8g), CLAMPED to ~60%
    of detected physical RAM so the JVM launches on smaller hosts
    instead of failing opaquely (ADVICE r6)."""
    env = os.environ.get("SPARK_GRAFT_DRIVER_MEM")
    if env:
        return env
    args = sys.argv[1:]
    # vectors are ~250× lighter than the doc corpus (500k × 64 floats),
    # so the ANN leg needs headroom, not the full dedup-probe heap
    want = 48 if "--decade" in args else (
        16 if ("--decade-ann" in args or "--ann-recall" in args) else 8
    )
    try:
        pages = os.sysconf("SC_PHYS_PAGES") * os.sysconf("SC_PAGE_SIZE")
        cap = max(2, int(pages * 0.6 / (1 << 30)))
    except (ValueError, OSError):
        cap = want
    if cap < want:
        print(
            f"  [driver-mem] physical RAM caps heap at {cap}g "
            f"(wanted {want}g); set SPARK_GRAFT_DRIVER_MEM to override",
            file=sys.stderr,
        )
    return f"{min(want, cap)}g"


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
        # single-JVM local mode: driver memory IS the executor heap.
        # The sf10 leg holds a 500k-doc prefix-filter candidate build
        # across 32 threads — 8g OOMs there (observed), so --decade
        # sizes the heap like a real executor fleet would (the
        # per-thread share, ~1.5g, is an ordinary executor profile).
        # ADVICE r6: clamp the default to ~60% of physical RAM so the
        # JVM can still launch on smaller hosts, and name the override
        # knob when the clamp engages.
        .config("spark.driver.memory", _driver_mem())
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    generate(spark)

    from pgstream_spark.inventory import QUERIES

    decade = "--decade" in sys.argv[1:]
    decade_ann = "--decade-ann" in sys.argv[1:]
    ann_rec = "--ann-recall" in sys.argv[1:]
    corescale = "--corescale" in sys.argv[1:]
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    if not names:  # the suites COMPOSE in one invocation
        names = (DECADE_QUERIES if decade else []) + (
            DECADE_ANN_QUERIES if decade_ann else []
        )
        if not names and not ann_rec and "--skipping" not in sys.argv[1:]:
            names = DEFAULT_QUERIES
    levels = [("sf0.1", SRC), ("sf1", DST)]
    if corescale:
        # VERDICT r11 item 6: the c8-vs-c32 scaling probe at sf0.1 is
        # job-overhead-dominated (8 cores BEAT 32); the informative leg
        # is sf1 at two core counts.  This mode times `names` at sf1
        # ONLY, honoring $SPARK_GRAFT_CPUS — the caller runs it once per
        # core count and compares.  The FULL sf1 table set (lineitem +
        # dimensions too, for the TPC-H/funnel entries) comes from
        # sf1diff's builder.
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from sf1diff import generate_full

        generate_full(spark)
        levels = [("sf1", DST)]
    if decade:
        generate_sf10()
    if decade_ann or ann_rec:
        generate_sf10_embeddings()
    if decade or decade_ann:
        levels.append(("sf10", DST10))
    spark.range(1000).selectExpr("sum(id)").collect()

    result: dict[str, dict[str, float]] = {lab: {} for lab, _ in levels}
    for sf_label, sf_dir in levels:
        for name in names:
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = round(time.perf_counter() - t0, 2)
            result[sf_label][name] = dt
            print(f"  {sf_label} {name}: {dt}s", file=sys.stderr)
            spark.catalog.clearCache()
            # drop the finished query's shuffle files NOW (ContextCleaner
            # frees them only after JVM GC) — without this the sf10 legs
            # stack tens of GB of dead shuffle on one local disk and the
            # next query dies spilling (observed: l52 sf10
            # SPILL_OUT_OF_MEMORY "No space left on device" while 54 GB
            # had been free at session start)
            spark.sparkContext._jvm.System.gc()

    out: dict[str, object] = dict(result)
    if "sf0.1" in result:
        out["slope_vs_10x_data"] = {
            n: round(result["sf1"][n] / result["sf0.1"][n], 2)
            for n in names
            if result["sf0.1"][n] > 0
        }
    out["cpus"] = int(cpus)
    if decade or decade_ann:
        out["slope_sf1_to_sf10"] = {
            n: round(result["sf10"][n] / result["sf1"][n], 2)
            for n in names
            if result["sf1"][n] > 0
        }
    if ann_rec:
        out["ann_recall"] = ann_recall(
            spark, [("sf0.1", SRC), ("sf1", DST), ("sf10", DST10)]
        )
    if "--skipping" in sys.argv[1:]:
        out["skipping"] = skipping_probe(spark)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
