"""Custom DataFrame-level operators.

Everything Spark SQL lacks a single primitive for, implemented as
compositions of built-in operators (shuffle-aware, codegen-friendly) —
never as driver-side loops.

Cache-lifecycle policy (ADVICE r11): operators persist multi-consumer
intermediates with the default MEMORY_AND_DISK level and, where the
win is scale-dependent, behind a Catalyst-stats cost knee (the shared
256 MiB constants: dedup transport, rollup tiers, asof detection,
triangle/CC broadcast, bigram persist).  Persists whose last consumer
runs INSIDE the operator are unpersisted there (asof detection,
triangle_count's large-regime edge cache, dedup_clusters' per-round
labels); persists referenced by the RETURNED plan cannot be released
before the caller's action and are left to Spark's LRU eviction —
MEMORY_AND_DISK entries are evictable, so a long-lived session
degrades to recompute-on-miss, never to OOM.  Callers that need a hard
release call ``spark.catalog.clearCache()`` between queries (bench.py
and every gate/probe harness in this repo do).
"""

from pgstream_spark.operators.asof import asof_join
from pgstream_spark.operators.interval import interval_coverage, interval_join
from pgstream_spark.operators.topk import top_k_per_group
from pgstream_spark.operators.dedup import (
    exact_dedup,
    prefix_filter_pairs,
    minhash_signatures,
    minhash_lsh_candidates,
    ngram_containment_pairs,
    ngram_jaccard_pairs,
    simhash_signatures,
    simhash_signatures_md5,
    embedding_neardup_lsh,
    embedding_neardup_lsh_oracle_sql,
    embedding_neardup_pairs,
    span_scrub,
)
from pgstream_spark.operators.semdedup import semdedup, semdedup_oracle_sql
from pgstream_spark.operators.similarity import (
    brute_force_top_k,
    lsh_bucketed_top_k,
    quantize_embeddings,
    with_cosine,
)
from pgstream_spark.operators.ivf import (
    ivfpq_query_index,
    write_ivfpq_index,
    assign_buckets,
    ivf_query_index,
    ivf_top_k,
    train_centroids,
    write_ivf_index,
)
from pgstream_spark.operators.ohlc import ohlc_bars, ohlc_rollup
from pgstream_spark.operators.decay import ewma_time_decay
from pgstream_spark.operators.chunked_window import (
    chunked_trailing_agg,
    sessionize_chunked,
)
from pgstream_spark.operators.robust import robust_zscore_stats, weighted_quantiles
from pgstream_spark.operators.rolling import rolling_corr
from pgstream_spark.operators.sessionize import sessionize, transition_matrix
from pgstream_spark.operators.retrieval import (
    bm25_ranks,
    bm25_scores,
    rrf_fusion,
    sparse_cosine_top_k,
)
from pgstream_spark.operators.mixture import weighted_sample_ares
from pgstream_spark.operators.sketch import (
    cms_build,
    cms_estimate,
    kmv_pair_stats,
    kmv_sketch,
)
from pgstream_spark.operators.snapshot import corpus_diff
from pgstream_spark.operators.rollup_time import time_rollup
from pgstream_spark.operators.skew import salted_agg
from pgstream_spark.operators.bloom import bloom_prefilter_join
from pgstream_spark.operators.graph import pagerank_integer, triangle_count
from pgstream_spark.operators.scd2 import point_in_time_join, scd2_history
from pgstream_spark.operators.quality import benford_audit, expect, profile_columns
from pgstream_spark.operators.skyline import pareto_frontier_2d
from pgstream_spark.operators.fuzzy import fuzzy_join
from pgstream_spark.operators.changepoint import cusum_changepoint
from pgstream_spark.operators.seasonal import regularize, seasonal_decompose
from pgstream_spark.operators.basket import frequent_pairs
from pgstream_spark.operators.linalg import gram_upper, pca_from_gram, pca_project
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
    "span_scrub",
    "semdedup",
    "semdedup_oracle_sql",
    "brute_force_top_k",
    "lsh_bucketed_top_k",
    "quantize_embeddings",
    "with_cosine",
    "train_centroids",
    "assign_buckets",
    "ivf_top_k",
    "write_ivfpq_index",
    "ivfpq_query_index",
    "write_ivf_index",
    "ivf_query_index",
    "ohlc_bars",
    "ohlc_rollup",
    "ewma_time_decay",
    "chunked_trailing_agg",
    "sessionize_chunked",
    "robust_zscore_stats",
    "weighted_quantiles",
    "rolling_corr",
    "sessionize",
    "transition_matrix",
    "interval_coverage",
    "cusum_changepoint",
    "regularize",
    "seasonal_decompose",
    "frequent_pairs",
    "kmv_sketch",
    "kmv_pair_stats",
    "benford_audit",
    "profile_columns",
    "prefix_filter_pairs",
    "bm25_scores",
    "bm25_ranks",
    "rrf_fusion",
    "weighted_sample_ares",
    "cms_build",
    "cms_estimate",
    "corpus_diff",
    "time_rollup",
    "salted_agg",
    "bloom_prefilter_join",
    "pagerank_integer",
    "triangle_count",
    "sparse_cosine_top_k",
    "scd2_history",
    "point_in_time_join",
    "expect",
    "pareto_frontier_2d",
    "fuzzy_join",
    "gram_upper",
    "pca_from_gram",
    "pca_project",
    "with_text_stats",
    "language_id",
    "quality_score",
    "document_fingerprint",
]
