"""Custom DataFrame-level operators.

Everything Spark SQL lacks a single primitive for, implemented as
compositions of built-in operators (shuffle-aware, codegen-friendly) —
never as driver-side loops.
"""

from pgstream_spark.operators.asof import asof_join
from pgstream_spark.operators.interval import interval_join
from pgstream_spark.operators.topk import top_k_per_group
from pgstream_spark.operators.dedup import (
    exact_dedup,
    minhash_signatures,
    minhash_lsh_candidates,
    ngram_containment_pairs,
    ngram_jaccard_pairs,
    simhash_signatures,
    simhash_signatures_md5,
    embedding_neardup_lsh,
    embedding_neardup_lsh_oracle_sql,
    embedding_neardup_pairs,
)
from pgstream_spark.operators.similarity import (
    brute_force_top_k,
    lsh_bucketed_top_k,
    quantize_embeddings,
    with_cosine,
)
from pgstream_spark.operators.ivf import assign_buckets, ivf_top_k, train_centroids
from pgstream_spark.operators.sketch import cms_build, cms_estimate
from pgstream_spark.operators.snapshot import corpus_diff
from pgstream_spark.operators.rollup_time import time_rollup
from pgstream_spark.operators.skew import salted_agg
from pgstream_spark.operators.textstats import (
    with_text_stats,
    language_id,
    quality_score,
    document_fingerprint,
)

__all__ = [
    "asof_join",
    "interval_join",
    "top_k_per_group",
    "exact_dedup",
    "minhash_signatures",
    "minhash_lsh_candidates",
    "ngram_containment_pairs",
    "ngram_jaccard_pairs",
    "simhash_signatures",
    "simhash_signatures_md5",
    "embedding_neardup_lsh",
    "embedding_neardup_lsh_oracle_sql",
    "embedding_neardup_pairs",
    "brute_force_top_k",
    "lsh_bucketed_top_k",
    "quantize_embeddings",
    "with_cosine",
    "train_centroids",
    "assign_buckets",
    "ivf_top_k",
    "cms_build",
    "cms_estimate",
    "corpus_diff",
    "time_rollup",
    "salted_agg",
    "with_text_stats",
    "language_id",
    "quality_score",
    "document_fingerprint",
]
