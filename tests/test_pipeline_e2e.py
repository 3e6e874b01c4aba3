"""End-to-end curation pipeline — the "switch to this repo" proof.

One test drives the whole training-data path a reference user would run,
on the real sf0.001 tables, asserting cross-stage invariants rather than
per-operator values (those are pinned elsewhere):

    documents
      → quality gate (expect / expect_split: quarantine with reasons)
      → text scoring (stats + quality + compression ratio)
      → near-dup dedup (Jaccard pairs → clusters → best-quality survivor)
      → chunking for context windows
      → deterministic shard export + manifest counts
      → versioned store + release diff

Every stage is the PUBLIC package surface — no inventory internals.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest


@pytest.fixture(scope="module")
def sf_dir():
    return "/root/testdata/sf0.001"


def test_full_curation_pipeline(spark, sf_dir, tmp_path_factory):
    from pgstream_spark.operators.dedup import (
        dedup_clusters,
        ngram_jaccard_pairs,
    )
    from pgstream_spark.operators.packing import chunk_windows
    from pgstream_spark.operators.quality import expect, expect_split
    from pgstream_spark.operators.snapshot import (
        diff_versions,
        write_version,
    )
    from pgstream_spark.operators.textstats import (
        compression_ratio,
        quality_score,
        with_text_stats,
    )
    from pgstream_spark.sinks import export_shards
    from pgstream_spark.sources.parquet import load_table
    from pyspark.sql import Window

    tmp = tmp_path_factory.mktemp("pipeline")
    docs = load_table(spark, sf_dir, "documents")
    n_raw = docs.count()
    assert n_raw > 0

    # -- 1. quality gate ------------------------------------------------
    rules = [
        ("not_null", "text"),
        ("not_null", "doc_id"),
        ("in_range", "n_chars", 1, 10_000_000),
    ]
    report = {r.check: r.passed for r in expect(docs, rules).collect()}
    assert len(report) == 3
    clean, quarantined = expect_split(docs, rules)
    assert clean.count() + quarantined.count() == n_raw

    # -- 2. scoring -----------------------------------------------------
    scored = compression_ratio(quality_score(with_text_stats(clean)))
    row = scored.select("doc_id", "n_tokens", "quality", "zlib_ratio").first()
    assert row.n_tokens > 0 and 0.0 < row.zlib_ratio <= 1.2

    # -- 3. near-dup dedup + canonical survivor -------------------------
    pairs = ngram_jaccard_pairs(clean, "doc_id", "text", n=3, threshold=0.6)
    clusters = dedup_clusters(pairs)
    membership = (
        scored.select("doc_id", "quality")
        .join(clusters, F.col("doc_id") == F.col("node"), "left")
        .select("doc_id", "quality", F.coalesce("cluster", "doc_id").alias("cluster"))
    )
    survivors = (
        membership.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("cluster").orderBy(
                    F.col("quality").desc(), F.col("doc_id").asc()
                )
            ),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    n_survivors = survivors.count()
    n_clusters = membership.select("cluster").distinct().count()
    assert n_survivors == n_clusters  # exactly one survivor per family
    assert n_survivors <= clean.count()

    # -- 4. chunking ----------------------------------------------------
    kept_docs = clean.join(survivors.select("doc_id"), "doc_id")
    chunks = chunk_windows(kept_docs, id_col="doc_id", text_col="text",
                           window=64, stride=48)
    assert chunks.count() >= n_survivors  # every doc yields ≥1 chunk

    # -- 5. deterministic shard export ---------------------------------
    shard_dir = str(tmp / "shards")
    export_shards(kept_docs, shard_dir, n_shards=4, id_col="doc_id")
    back = spark.read.parquet(shard_dir)
    assert back.count() == n_survivors
    assert back.select("shard").distinct().count() <= 4
    # re-export on a different partitioning lands every doc identically
    export_shards(kept_docs.repartition(7), str(tmp / "shards2"), 4, "doc_id")
    a = {(r.doc_id, r.shard) for r in back.select("doc_id", "shard").collect()}
    b = {
        (r.doc_id, r.shard)
        for r in spark.read.parquet(str(tmp / "shards2"))
        .select("doc_id", "shard")
        .collect()
    }
    assert a == b

    # -- 6. versioned release + diff -----------------------------------
    store = str(tmp / "store")
    assert write_version(store, docs.select("doc_id", "text"), "raw") == 1
    assert write_version(store, kept_docs.select("doc_id", "text"), "curated") == 2
    statuses = (
        diff_versions(spark, store, 1, 2)
        .groupBy("status")
        .count()
        .collect()
    )
    by = {r.status: r["count"] for r in statuses}
    assert by.get("removed", 0) == n_raw - n_survivors
    assert by.get("unchanged", 0) == n_survivors
    assert "added" not in by and "modified" not in by
