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


def test_media_curation_pipeline(spark, tmp_path_factory):
    """The MEDIA half of the curation path, end to end on the public
    surface: ingest-validate (quarantine corrupt payloads) → perceptual
    dHash signatures through the real codec → banded near-dup pairs →
    connected-component families → one canonical survivor per family →
    persisted perceptual index an incremental batch probes against.
    Cross-stage invariants: quarantine + clean partition the input;
    every family keeps exactly one survivor; the index probe finds the
    new batch's near-dup against the SURVIVORS, not the removed dups.
    """
    import hashlib

    from pyspark.sql import functions as F

    from pgstream_spark.operators.dedup import dedup_clusters
    from pgstream_spark.operators.multimodal import (
        dhash_candidate_pairs,
        dhash_signatures,
        split_decodable,
    )
    from pgstream_spark.operators.perceptual_index import (
        probe_perceptual_index,
        write_perceptual_index,
    )

    def img(seed):
        body = b"".join(
            hashlib.md5(f"{seed}:{b}".encode()).digest() for b in range(48)
        )
        return b"P6\n16 16\n255\n" + body

    # 3 perceptual families of 3 + one corrupt + one unknown payload
    rows = [(fam * 10 + i, img(f"fam{fam}")) for fam in range(3) for i in range(3)]
    rows += [(90, img("famX")[:30]), (91, b"\x00\x01\x02\x03" * 10)]
    assets = spark.createDataFrame(rows, "asset_id long, payload binary")

    clean, quarantined = split_decodable(assets, "payload")
    clean = clean.persist()
    assert clean.count() == 9 and quarantined.count() == 2
    assert {r.asset_id for r in quarantined.collect()} == {90, 91}

    sigs = dhash_signatures(clean, "payload", "asset_id").persist()
    pairs = dhash_candidate_pairs(sigs, max_hamming=3)
    fams = dedup_clusters(pairs)
    # 3 families of 3 -> 9 member rows, 3 distinct canonicals (min id)
    members = fams.collect()
    assert len(members) == 9
    canon = {r.cluster for r in members}
    assert canon == {0, 10, 20}
    survivors = sigs.join(
        fams.filter(F.col("node") == F.col("cluster")).select(
            F.col("node").alias("id")
        ),
        "id",
    )
    assert {r.id for r in survivors.collect()} == {0, 10, 20}

    # persist the survivors' signatures; a new batch with a fam1
    # near-dup (one block perturbed) must hit survivor 10 only
    idx = str(tmp_path_factory.mktemp("pidx") / "idx")
    write_perceptual_index(survivors, idx, batch_id="release-1")
    newb = spark.createDataFrame(
        [(100, img("fam1")), (101, img("famZ"))],
        "asset_id long, payload binary",
    )
    new_sigs = dhash_signatures(newb, "payload", "asset_id")
    hits = {
        (r.id_new, r.id_indexed): r.hamming
        for r in probe_perceptual_index(spark, idx, new_sigs).collect()
    }
    assert hits == {(100, 10): 0}
    clean.unpersist()
    sigs.unpersist()
