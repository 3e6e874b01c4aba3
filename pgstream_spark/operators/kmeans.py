"""Distributed k-means refinement over an embedding column.

`ivf.train_centroids` runs Lloyd's on a bounded driver-side sample — the
right recipe for IVF bucketing, but the sample ceiling caps centroid
quality. This module refines those (or any) centroids against the FULL
corpus with distributed Lloyd iterations:

* **assign** — map-only: each vector's nearest-by-L2 centroid, computed
  JVM-side. ``argmin_c |v-c|²`` = ``argmax_c (v·c − |c|²/2)``, so the
  scorer is one higher-order dot fold per centroid plus a constant bias —
  the same literal-centroid shape as `ivf.assign_buckets` (which scores
  raw dots, the cosine/IVF semantics); no shuffle.
* **update** — `posexplode` the vectors and partially aggregate per
  (cluster, dimension): with map-side combine the shuffle carries at most
  ``k × dim`` rows per map task, and the driver collects exactly
  ``k × dim`` sum rows to rebuild the next iteration's literals — bounded
  regardless of corpus size (the same contract as IVF's training sample).

Centroid sums ride the scaled-integer path, so the update is independent
of partitioning and reduction order — refined centroids are
bit-identical run-to-run on any cluster layout, which double sums cannot
guarantee.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["nearest_l2_centroid_col", "kmeans_refine", "cluster_sizes"]

_SCALE = 1_000_000  # 1e-6 centroid resolution; |coord|·rows ≤ ~9e12 safe


def nearest_l2_centroid_col(vec_col: str, centroids: np.ndarray) -> Column:
    """Index of the L2-nearest centroid as a JVM-side expression.

    ``|v-c|²`` is minimized where ``v·c − |c|²/2`` is maximized, so each
    centroid costs one dot fold and a literal bias; argmax via struct-max
    over (score, index). No Python in the path.

    Built as ONE generated-SQL ``F.expr`` (the ivf._nearest_centroid_col
    rationale: k × dim literal cells at one py4j round-trip each made
    DataFrame construction the dominant driver cost; the parsed tree —
    same fold order, same (score, idx) struct max — is identical, so
    assignments are bit-identical).
    """
    from pgstream_spark.operators.ivf import _darr, _dlit

    structs = ",".join(
        "named_struct('score',"
        f"aggregate(zip_with(`{vec_col}`,{_darr(c)},"
        "(a,b)->cast(a as double)*b),0.0D,(acc,v)->acc+v)"
        f"-{_dlit(0.5 * (c * c).sum())},"
        f"'idx',{i})"
        for i, c in enumerate(centroids)
    )
    return F.expr(f"array_max(array({structs})).idx")


def _assigned(corpus: DataFrame, centroids: np.ndarray, vec_col: str) -> DataFrame:
    return corpus.select(
        F.col(vec_col).alias("__v"),
        nearest_l2_centroid_col(vec_col, centroids).alias("cluster"),
    )


def kmeans_refine(
    corpus: DataFrame,
    centroids: np.ndarray,
    vec_col: str = "embedding",
    iters: int = 2,
) -> np.ndarray:
    """Refine ``centroids`` with ``iters`` full-corpus Lloyd iterations.

    Returns the refined (k, dim) float64 matrix. Empty clusters keep
    their previous centroid (standard Lloyd's fallback). Cost per
    iteration: one map-only assignment pass + one k×dim-wide aggregate.
    """
    cents = np.asarray(centroids, dtype="float64").copy()
    k, dim = cents.shape
    for _ in range(iters):
        sums = (
            _assigned(corpus, cents, vec_col)
            .select("cluster", F.posexplode(F.col("__v").cast("array<double>")))
            .select(
                "cluster",
                "pos",
                F.round(F.col("col") * _SCALE).cast("bigint").alias("sv"),
            )
            .groupBy("cluster", "pos")
            .agg(F.sum("sv").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        new = cents.copy()
        counts = np.zeros(k, dtype="int64")
        acc = np.zeros((k, dim), dtype="float64")
        for r in sums:
            acc[r.cluster, r.pos] = (r.s / _SCALE) / r.n
            counts[r.cluster] = r.n
        nonempty = counts > 0
        new[nonempty] = acc[nonempty]
        cents = new
    return cents


def cluster_sizes(
    corpus: DataFrame, centroids: np.ndarray, vec_col: str = "embedding"
) -> DataFrame:
    """(cluster, n_members) under the given centroids — the cluster-balance
    report used to pick IVF list counts and spot degenerate centroids."""
    return (
        _assigned(corpus, centroids, vec_col)
        .groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("n_members"))
    )
