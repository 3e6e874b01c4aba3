"""Domain-mixture sampling — training-data source reweighting.

A pre-training corpus is assembled from heterogeneous sources (web,
code, books, …) whose *natural* proportions differ from the *target*
mixture the training run wants.  The standard fix is per-source
downsampling: keep each row of source ``s`` with probability ``w_s``.

Two requirements drive the design here:

* **Determinism** — the sample must be reproducible run-over-run and
  engine-over-engine (the md5-bucket trick the rest of the pipeline
  uses, cf. ``inventory.l6_hash_sample``).  Weights are expressed in
  integer basis points (1/10_000) so membership is decided by an
  integer comparison — no float threshold ambiguity anywhere.
* **Scale** — the filter is map-only (md5 + CASE on broadcast-literal
  weights), so it runs at scan speed with no shuffle; planning the
  weights needs one count-by-source aggregation whose result is
  source-cardinality-sized (tiny), the only driver-side data.

Reference parity: the reference delegates sampling to SQL
(``TABLESAMPLE``-style); deterministic mixture sampling is the
100 TB-pipeline extension of the same idea.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "mixture_sample",
    "plan_mixture_weights",
    "temperature_weights",
    "hash_bucket_bp",
    "weighted_sample_ares",
    "epoch_shuffle",
    "stratified_split",
    "cluster_safe_split",
    "split_leakage_audit",
]


def hash_bucket_bp(id_col: Column) -> Column:
    """Deterministic uniform bucket in [0, 10_000) from a row id:
    first 8 md5 hex digits mod 10^4 — identical in Spark and DuckDB
    (``CAST(('0x' || substr(md5(id), 1, 8)) AS BIGINT) % 10000``)."""
    return (
        F.conv(F.substring(F.md5(id_col.cast("string")), 1, 8), 16, 10).cast("long")
        % 10_000
    )


def mixture_sample(
    df: DataFrame,
    weights_bp: dict[str, int],
    source_col: str = "source",
    id_col: str = "doc_id",
    default_bp: int = 0,
) -> DataFrame:
    """Keep each row of source ``s`` with probability
    ``weights_bp[s] / 10_000``, decided by the row's deterministic md5
    bucket.  Sources absent from ``weights_bp`` fall back to
    ``default_bp`` (0 = drop).

    Map-only: the weight lookup is a literal CASE chain (sources are
    few), the bucket an md5 over the row id — no shuffle, no UDF.
    """
    w: Column = F.lit(int(default_bp))
    for s, bp in sorted(weights_bp.items()):
        w = F.when(F.col(source_col) == s, F.lit(int(bp))).otherwise(w)
    return df.filter(hash_bucket_bp(F.col(id_col)) < w)


def weighted_sample_ares(
    df: DataFrame,
    weight_col: str,
    k: int,
    group_cols: list[str] | None = None,
    id_col: str = "doc_id",
    priority_col: str = "priority",
    rank_col: str = "sample_rank",
) -> DataFrame:
    """Deterministic weighted sampling without replacement (top-k per
    group), Efraimidis–Spirakis A-Res: ``priority = u^(1/w)`` with ``u``
    a content-derived uniform — heavier rows win more often, and the
    whole draw replays bit-identically on any cluster because the
    "randomness" is an md5 of the row id, not an RNG.

    This is how a curation pipeline takes "sample 1M docs ∝ quality"
    reproducibly: map-only scoring + the W-family top-k pattern
    (rank-limit pushdown truncates to k per partition before the
    shuffle).  Ranking uses the log-domain key ``ln(u)/w`` — the same
    order as A-Res's ``u^(1/w)`` (ln is monotone) but without its
    saturation toward 1.0 at large weights, where rounding collapsed
    exactly the heaviest contenders into id-ordered ties and biased the
    sample toward low ids.  The key is rounded (9) so the one libm
    ``log`` can't flip cross-engine order; ties break on the id.
    """
    groups = list(group_cols or [])
    # 12 md5 hex digits → uniform in [0,1) with 2^-48 resolution;
    # exactly representable in a double, identical in Spark and DuckDB
    u = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 12), 16, 10
    ).cast("double") / float(16**12)
    pri = F.round(F.log(u) / F.col(weight_col), 9)
    from pyspark.sql import Window

    w = Window.partitionBy(*groups).orderBy(
        F.col(priority_col).desc(), F.col(id_col).asc()
    )
    return (
        df.withColumn(priority_col, pri)
        .withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )


def plan_mixture_weights(
    df: DataFrame,
    targets: dict[str, float],
    source_col: str = "source",
) -> dict[str, int]:
    """Compute per-source keep-weights (basis points) that realize the
    target mixture ``targets`` (source → desired share, summing to ≤1)
    by *downsampling only* (weights capped at 10_000: never upsample).

    Solves for the largest output corpus: the binding source is the one
    with the least data relative to its target share; every other
    source is downsampled to match.  One tiny aggregation (one row per
    source) is collected — source cardinality is assumed human-scale.
    """
    counts = {
        r[0]: r[1]
        for r in df.groupBy(source_col).agg(F.count("*").alias("n")).collect()
    }
    # Largest total N such that target_s * N <= n_s for every targeted s.
    n_total = min(
        counts.get(s, 0) / share for s, share in targets.items() if share > 0
    )
    out: dict[str, int] = {}
    for s, share in targets.items():
        n_s = counts.get(s, 0)
        keep = 0 if n_s == 0 else min(1.0, share * n_total / n_s)
        out[s] = int(round(keep * 10_000))
    return out


def temperature_weights(
    df: DataFrame,
    alpha: float = 0.5,
    source_col: str = "source",
) -> dict[str, int]:
    """Per-source keep-weights (basis points) realizing TEMPERATURE
    mixing: target share ∝ ``n_s^alpha`` — the standard multi-source
    rebalancing rule (GPT-3 / The Pile / mT5's exponential smoothing:
    α < 1 boosts small sources' share, so big sources get downsampled
    harder).  Downsample-only, solved for the largest output corpus
    like `plan_mixture_weights`.

    ``alpha=0.5`` (the common choice) runs ENGINE-EXACT integer
    arithmetic — ``isqrt(n·10^6)`` weights, integer floor solve — so a
    DuckDB oracle reproduces the basis points bit-for-bit; other α use
    Python floats (the plan is still deterministic: it is computed once,
    driver-side, from one source-cardinality-sized aggregation — float
    replication only matters for cross-engine oracle parity).

    Feed the result straight to `mixture_sample` (map-only, md5-bucket
    membership) for the one-pass materialization.
    """
    import math

    counts = {
        r[0]: r[1]
        for r in df.groupBy(source_col).agg(F.count("*").alias("n")).collect()
    }
    if not counts:
        return {}
    if alpha == 0.5:
        w = {s: math.isqrt(n * 1_000_000) for s, n in counts.items()}
        tot = sum(w.values())
        # largest (scaled) corpus N* with share_s·N* <= n_s for every s
        n_tot = min((counts[s] * tot) // w[s] for s in w if w[s] > 0)
        return {
            s: min(10_000, (w[s] * n_tot * 10_000) // (tot * counts[s]))
            for s in counts
            if counts[s] > 0
        }
    pw = {s: float(n) ** alpha for s, n in sorted(counts.items())}
    tot_f = sum(pw.values())
    targets = {s: v / tot_f for s, v in pw.items()}
    n_total = min(counts[s] / sh for s, sh in targets.items() if sh > 0)
    return {
        s: int(round(min(1.0, targets[s] * n_total / counts[s]) * 10_000))
        for s in counts
        if counts[s] > 0
    }


def epoch_shuffle(
    df: DataFrame,
    epochs: int = 1,
    shards: int = 64,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic per-epoch training-data shuffle, sharded for scale.

    Training pipelines need a different document order every epoch that
    is nonetheless bit-reproducible on any cluster.  A global
    ``ORDER BY random()`` is neither (and a global row_number is a
    single-partition scale-killer); instead each (epoch, row) gets a
    content-derived key ``md5(epoch:id)``, the key's top bits pick one
    of ``shards`` shards, and the row's position *within its shard* is
    ranked by the key.  Consumers read shards in order (shard 0's rows,
    then shard 1's, ...), so (shard, shard_pos) IS the global epoch
    order — but every window is shard-sized, the shuffle is keyed by
    (epoch, shard), and rank-limit pushdown applies per shard.  The
    md5 draw makes orders of different epochs independent.

    Returns the input columns plus (epoch, shard, shard_pos).
    """
    if epochs < 1 or shards < 1:
        raise ValueError(f"epochs and shards must be >= 1, got {epochs}, {shards}")
    from pyspark.sql import Window

    e = df.withColumn(
        "epoch", F.explode(F.array(*[F.lit(i) for i in range(epochs)]))
    )
    key = F.md5(
        F.concat(F.col("epoch").cast("string"), F.lit(":"), F.col(id_col).cast("string"))
    )
    # first 12 hex digits: uniform 48-bit int — shard via mod, order via key
    kint = F.conv(F.substring(key, 1, 12), 16, 10).cast("bigint")
    w = Window.partitionBy("epoch", "shard").orderBy(
        F.col("__key").asc(), F.col(id_col).asc()
    )
    return (
        e.withColumn("__key", key)
        .withColumn("shard", (kint % shards).cast("int"))
        .withColumn("shard_pos", F.row_number().over(w))
        .drop("__key")
    )


def stratified_split(
    df: DataFrame,
    id_col: str,
    strata_cols: list[str],
    train_bp: int = 8000,
    val_bp: int = 1000,
) -> DataFrame:
    """Deterministic train/val/test assignment with EXACT per-stratum
    quotas — the split every training run needs to be reproducible
    across re-runs, cluster sizes, and corpus re-shards.

    Rows are ranked within each stratum by ``(hash_bucket_bp(id), id)``
    — a content-derived total order, so membership depends only on the
    data, never on partitioning or arrival order — and the first
    ``floor(n·train_bp/10⁴)`` ranks become ``train``, the next ranks up
    to ``floor(n·(train_bp+val_bp)/10⁴)`` become ``val``, the rest
    ``test``.  Cumulative-floor allocation: the three counts always sum
    to the stratum size n, and every boundary is an exact integer
    (basis points × n DIV 10⁴) — no float fraction crosses engines.

    Against a plain hash-threshold split (bucket < 8000 → train), the
    rank form trades one per-stratum window sort for EXACT quotas —
    tiny strata get their proportional share instead of binomial noise.
    Scale shape: one shuffle keyed on the strata; a hot stratum sorts
    within its partition — the chunked_window mitigation applies if one
    stratum dominates (same hazard/mitigation as w13/t17).

    Returns the input's ``id_col`` + strata plus ``split``.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*strata_cols)
    w_ord = w.orderBy(hash_bucket_bp(F.col(id_col)).asc(), F.col(id_col).asc())
    n = F.count(F.lit(1)).over(w)
    rk = F.row_number().over(w_ord)
    c1 = F.expr(f"(__n * {int(train_bp)}) DIV 10000")
    c2 = F.expr(f"(__n * {int(train_bp) + int(val_bp)}) DIV 10000")
    return (
        df.select(id_col, *strata_cols, n.alias("__n"), rk.alias("__rk"))
        .select(
            id_col,
            *strata_cols,
            F.when(F.col("__rk") <= c1, F.lit("train"))
            .when(F.col("__rk") <= c2, F.lit("val"))
            .otherwise(F.lit("test"))
            .alias("split"),
        )
    )


def split_rule_bp(
    key: Column, train_bp: int = 8000, val_bp: int = 1000
) -> Column:
    """The hash-threshold split rule on an arbitrary key: md5-bucket of
    the key in basis points, ``train`` below ``train_bp``, ``val`` in
    the next ``val_bp``, ``test`` above.  Map-only, reproducible on any
    engine (same rule as ``hash_bucket_bp``)."""
    b = hash_bucket_bp(key)
    return (
        F.when(b < int(train_bp), F.lit("train"))
        .when(b < int(train_bp) + int(val_bp), F.lit("val"))
        .otherwise(F.lit("test"))
    )


def cluster_safe_split(
    df: DataFrame,
    cluster_col: str,
    train_bp: int = 8000,
    val_bp: int = 1000,
    split_col: str = "split",
) -> DataFrame:
    """Leakage-safe train/val/test assignment: the hash-threshold rule
    is applied to the near-dup FAMILY key (``cluster_col``), not the
    row id, so every member of a duplicate family lands in the same
    split by construction.

    Splitting by row id leaks: near-identical documents straddle the
    train/test boundary and the held-out set scores memorization, not
    generalization (the contamination mechanism l11 measures after the
    fact — this operator prevents it structurally).  Keying the rule on
    the family canonical (``dedup_clusters``' ``cluster``, or any
    group key: url host, repository, conversation id) is the standard
    fix (cf. the dedup-before-split discipline in Lee et al. 2022).

    Map-only over a corpus that already carries its cluster key — no
    shuffle, no state; the split is a pure function of the key, so
    re-runs, re-shards, and incremental appends all agree.  Quotas are
    binomial around train_bp/val_bp (families are atomic — exact
    quotas and family atomicity are mutually exclusive; l61's rank
    form gives exact quotas when leakage is not a concern).
    """
    return df.withColumn(
        split_col, split_rule_bp(F.col(cluster_col), train_bp, val_bp)
    )


def split_leakage_audit(
    df: DataFrame,
    cluster_col: str,
    split_col: str = "split",
) -> DataFrame:
    """One-row audit: how many families have members in >1 split.
    Zero for any assignment produced by `cluster_safe_split`; run it on
    a row-id-keyed split to quantify the leakage that rule causes.
    One hash aggregate on the family key — corpus-linear, result is a
    scalar."""
    return (
        df.groupBy(cluster_col)
        .agg(F.countDistinct(split_col).alias("__k"))
        .agg(
            F.sum(F.when(F.col("__k") > 1, 1).otherwise(0))
            .cast("long")
            .alias("leaky_families")
        )
    )
