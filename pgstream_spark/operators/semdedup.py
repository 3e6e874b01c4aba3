"""Semantic deduplication — cluster-then-prune over embeddings.

The SemDeDup recipe (Abbas et al. 2023, "SemDeDup: Data-efficient
learning at web-scale through semantic deduplication", public arXiv
2303.09540): embeddings are first partitioned into clusters so the
quadratic near-duplicate comparison only ever runs WITHIN a cluster,
then inside each cluster any item whose cosine similarity to an
earlier-kept item exceeds a threshold is dropped.  Document-level
near-dup (MinHash / SimHash, L-2) catches lexical copies; this tier
catches paraphrases and template re-writes that share no shingles but
sit on top of each other in embedding space.

Spark-first shape (not a port — the reference engine has no embedding
tier; this extends the L-3 family of `SURVEY.md §2`):

* Cluster assignment here is **bit-sampling LSH**: the sign pattern of
  the first ``sign_bits`` embedding components (an axis-aligned
  sign-random-projection — deterministic, engine-reproducible, and
  expressible in plain SQL so the whole operator sits under the DuckDB
  differential oracle).  A learned k-means assignment drops in
  unchanged (`operators/kmeans.nearest_l2_centroid_col`) — the pruning
  stage below is identical; the LSH key is the oracle-able witness.
* Similarity is **quantized integer cosine**: components are rounded to
  ``scale`` (default 100) fixed-point BIGINTs, and ``cos >= tau`` is
  decided as ``dot > 0 AND dot*dot*scale^2 >= tau_c^2 * |a|^2 * |b|^2``
  — every product stays far inside int64 (dim 64, |x| <= ~0.6:
  dot^2*10^4 <= ~4e15), so Spark and the oracle agree bit-for-bit with
  no float boundary anywhere (the l19/l46/l48 discipline).

Scale shape (100 TB): the pair generation is an EQUI-JOIN on the
cluster key — never a cross join — so the shuffle is one exchange of
the quantized vectors keyed by cluster, and the quadratic term is
bounded by the largest cluster (the published SemDeDup design point:
clusters are sized so within-cluster pairwise is tractable; with k
clusters of average size n/k the pair count is ~n^2/k).  Skewed/outsize
clusters are the same hazard as LSH stop-buckets — cap or split them
with more sign bits (each extra bit halves expected cluster size).  The
earlier-kept rule needs no sequential pass: "has ANY earlier neighbor
above tau" is a grouped count over the pair list, one aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["semdedup", "semdedup_oracle_sql"]


def _quantized(vec_col: str, scale: int) -> Column:
    return F.transform(
        F.col(vec_col),
        lambda x: F.round(x.cast("double") * F.lit(float(scale))).cast("bigint"),
    )


def _sign_cluster(vec_col: str, sign_bits: int) -> Column:
    """Bit-sampling cluster id: bit i set iff component i+1 > 0."""
    c = F.lit(0)
    for i in range(sign_bits):
        c = c + F.when(
            F.element_at(F.col(vec_col), i + 1) > 0.0, F.lit(1 << i)
        ).otherwise(F.lit(0))
    return c.cast("int")


def semdedup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sign_bits: int = 4,
    scale: int = 100,
    threshold_centi: int = 25,
    cluster_expr: Column | None = None,
) -> DataFrame:
    """Cluster-then-prune semantic dedup over an embedding column.

    Returns one row per input row: ``(id, cluster, n_close_earlier,
    kept)`` where ``n_close_earlier`` counts same-cluster items with a
    SMALLER id whose quantized cosine reaches ``threshold_centi/100``,
    and ``kept`` is true iff that count is zero (the smallest-id member
    of every epsilon-ball survives — deterministic, order-free).

    ``cluster_expr`` swaps the assignment stage: pass e.g.
    ``kmeans.nearest_l2_centroid_col(vec_col, centroids)`` for a
    learned partition (the published SemDeDup design) — the prune stage
    is IDENTICAL under any assignment (pytest-pinned), and at corpus
    scale a k-means assignment is the lever when sign-bit buckets skew
    (see SCALE.md "SemDeDup cluster scale law").
    """
    tc = int(threshold_centi)
    assignment = (
        cluster_expr
        if cluster_expr is not None
        else _sign_cluster(vec_col, sign_bits)
    )
    # Spread the quantize off the single-row-group scan task, then
    # persist eagerly: `base` feeds BOTH self-join sides and the final
    # kept-join — three executions of the quantized-vector build
    # otherwise (the dedup-tier discipline).
    nparts = df.sparkSession.sparkContext.defaultParallelism
    base = df.repartition(nparts, F.col(id_col)).select(
        F.col(id_col).alias("id"),
        _quantized(vec_col, scale).alias("__q"),
        assignment.cast("int").alias("cluster"),
    ).withColumn(
        "__n2",
        F.aggregate(
            "__q", F.lit(0).cast("bigint"), lambda acc, x: acc + x * x
        ),
    )
    base = base.persist()
    base.count()
    a = base.select(
        F.col("id").alias("__ida"),
        F.col("cluster").alias("__cl"),
        F.col("__q").alias("__qa"),
        F.col("__n2").alias("__na2"),
    )
    b = base.select(
        F.col("id").alias("__idb"),
        F.col("cluster").alias("__cl"),
        F.col("__q").alias("__qb"),
        F.col("__n2").alias("__nb2"),
    )
    pairs = a.join(b, "__cl").filter(F.col("__ida") < F.col("__idb"))
    dot = F.aggregate(
        F.zip_with("__qa", "__qb", lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    close = pairs.withColumn("__dot", dot).filter(
        (F.col("__dot") > 0)
        & (
            F.col("__dot") * F.col("__dot") * F.lit(scale * scale)
            >= F.lit(tc * tc) * F.col("__na2") * F.col("__nb2")
        )
    )
    n_close = close.groupBy(F.col("__idb").alias("id")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_close_earlier")
    )
    return (
        base.join(n_close, "id", "left")
        .select(
            "id",
            "cluster",
            F.coalesce("n_close_earlier", F.lit(0).cast("bigint")).alias(
                "n_close_earlier"
            ),
            F.col("n_close_earlier").isNull().alias("kept"),
        )
    )


def semdedup_oracle_sql(
    sign_bits: int = 4, scale: int = 100, threshold_centi: int = 25
) -> str:
    """DuckDB SQL computing the identical result on the ``embeddings``
    view (same quantization, same integer comparison)."""
    bits = " + ".join(
        f"(CASE WHEN embedding[{i + 1}] > 0 THEN {1 << i} ELSE 0 END)"
        for i in range(sign_bits)
    )
    tc2 = threshold_centi * threshold_centi
    s2 = scale * scale
    return (
        "WITH q AS (SELECT vec_id, "
        f"CAST(({bits}) AS INT) AS cluster, "
        "list_transform(embedding, x -> "
        f"CAST(round(CAST(x AS DOUBLE) * {scale}.0) AS BIGINT)) AS qv "
        "FROM embeddings), "
        "n AS (SELECT vec_id, cluster, qv, "
        "CAST(list_sum(list_transform(qv, x -> x * x)) AS BIGINT) AS n2 "
        "FROM q), "
        "pairs AS (SELECT b.vec_id AS id, a.n2 AS na2, b.n2 AS nb2, "
        "CAST(list_sum(list_transform(range(1, len(a.qv) + 1), "
        "i -> a.qv[i] * b.qv[i])) AS BIGINT) AS dot "
        "FROM n a JOIN n b ON a.cluster = b.cluster AND a.vec_id < b.vec_id), "
        "close AS (SELECT id, CAST(count(*) AS BIGINT) AS nc FROM pairs "
        f"WHERE dot > 0 AND dot * dot * {s2} >= {tc2} * na2 * nb2 "
        "GROUP BY id) "
        "SELECT n.vec_id AS id, n.cluster, "
        "CAST(coalesce(c.nc, 0) AS BIGINT) AS n_close_earlier, "
        "(c.nc IS NULL) AS kept "
        "FROM n LEFT JOIN close c ON n.vec_id = c.id"
    )
