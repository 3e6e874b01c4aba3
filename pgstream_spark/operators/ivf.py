"""IVF (inverted-file) approximate nearest neighbor — the centroid-bucket
scale path for vector search (SURVEY §2 L-3 extension).

Pipeline (all deterministic, seed-fixed):

1. **Train**: k-means on a driver-side SAMPLE of the corpus (sampling a
   few thousand vectors from 10¹¹ is the standard IVF recipe — training
   never touches the full data).
2. **Assign**: each corpus vector's nearest centroid, computed JVM-side —
   the centroid matrix ships as a broadcast-sized literal array and the
   argmin is a higher-order fold.  Map-only; persists as a `bucket`
   column, which at scale you'd write back partitioned-by-bucket.
3. **Search**: a query probes its ``n_probes`` nearest centroids and
   ranks exact cosine over only those buckets — the candidate equi-join
   on ``bucket`` replaces the full scan, cutting evaluations by
   ~``n_lists / n_probes``.

Compared to the hyperplane LSH in ``similarity.py``: IVF adapts to the
data distribution (centroids follow density), costs one training pass,
and gives a tunable recall/probe dial; LSH is data-independent and
zero-training.  Both share the same bucketed join shape.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from pgstream_spark.operators.similarity import dot_sql, norm_sql  # noqa: F401 — used via generated-SQL helpers
from pgstream_spark.operators.topk import top_k_per_group

__all__ = [
    "train_centroids",
    "assign_buckets",
    "ivf_top_k",
    "write_ivf_index",
    "load_ivf_centroids",
    "ivf_query_index",
    "append_ivf_index",
    "ivf_bucket_stats",
    "ivf_rebuild_needed",
    "ivf_adc_top_k",
]


def train_centroids(
    corpus: DataFrame,
    vec_col: str = "embedding",
    n_lists: int = 16,
    sample_size: int = 2048,
    iters: int = 10,
    seed: int = 42,
) -> np.ndarray:
    """k-means centroids from a bounded sample (Lloyd's algorithm, numpy).

    The sample is the ONLY driver-side materialization — ``sample_size``
    rows regardless of corpus size.  Returns (n_lists, dim) float64.

    Sampling is UNIFORM over the corpus (``sample(fraction)``), not
    ``limit()``: limit takes the first rows of the first partitions, so a
    corpus sorted by source/date/cluster would train centroids on one
    region only (round-1 verdict item).  The one ``count()`` is a
    column-pruned metadata-speed scan.
    """
    want = sample_size * 4
    total = corpus.count()
    if total <= want:
        frac_rows = corpus.select(vec_col).collect()
    else:
        # uniform sample, oversampled 20%; any trim to sample_size happens
        # driver-side with rng (a limit() here would re-bias toward the
        # first partitions of the sampled rows)
        frac = min(1.0, want * 1.2 / total)
        frac_rows = corpus.select(vec_col).sample(fraction=frac, seed=seed).collect()
    rng = np.random.default_rng(seed)
    take = min(sample_size, len(frac_rows))
    idx = rng.choice(len(frac_rows), size=take, replace=False)
    X = np.array([frac_rows[i][0] for i in idx], dtype="float64")

    # farthest-point init (deterministic k-means++ flavor): guarantees one
    # seed per well-separated cluster, where random init can merge two
    k = min(n_lists, len(X))
    first = int(rng.integers(len(X)))
    chosen = [first]
    d2min = ((X - X[first]) ** 2).sum(axis=1)
    for _ in range(1, k):
        nxt = int(d2min.argmax())
        chosen.append(nxt)
        d2min = np.minimum(d2min, ((X - X[nxt]) ** 2).sum(axis=1))
    centroids = X[chosen].copy()
    for _ in range(iters):
        d2 = ((X[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for c in range(len(centroids)):
            members = X[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
    return centroids


def _dlit(x: float) -> str:
    """A Spark SQL double literal with the exact bits of ``x`` (Python
    repr round-trips; Double.parseDouble of that string is the same
    nearest-double)."""
    r = repr(float(x))
    if r in ("inf", "-inf", "nan"):
        raise ValueError(f"non-finite centroid/codeword value {r}")
    return r + "D"


def _darr(values) -> str:
    return "array(" + ",".join(_dlit(x) for x in values) + ")"


def _dot_lit_sql(vec_col: str, values) -> str:
    """Unrolled ``vec · literal-array`` as generated SQL (r12): the old
    ``aggregate(zip_with(vec, array(...), (a,b)->cast(a as double)*b),
    0.0D, (acc,v)->acc+v)`` ran an interpreted lambda fold per row and
    allocated the zipped array; the unrolled sum parses
    left-associative, so every intermediate double is bit-identical to
    that fold (same products, same add order, NULL on a short vector
    either way)."""
    return "0.0D+" + "+".join(
        f"cast(`{vec_col}`[{j}] as double)*{_dlit(x)}"
        for j, x in enumerate(values)
    )


def _nearest_centroid_col(vec_col: str, centroids: np.ndarray) -> Column:
    """Index of the max-dot-product centroid, as a JVM-side expression.

    One dot product per centroid (higher-order fold over a literal array),
    argmax via a struct-max over (score, index) — no Python in the path.

    Built as ONE generated-SQL ``F.expr`` instead of per-literal Column
    calls: the n_lists × dim literal cells otherwise cost one py4j
    round-trip each, which made DataFrame CONSTRUCTION (driver Python)
    the dominant cost of the IVF queries (guide §1.1 first-principles:
    the plan is identical after parsing — same zip_with/aggregate/
    struct/array_max tree, same fold order, bit-identical buckets).
    """
    # NOTE (r12): an unrolled-literal spelling (_dot_lit_sql) of these
    # dots was tried and REVERTED — n_lists × dim terms land in ONE
    # argmax projection and the A/B regressed 2-5× (l3d 1.7→8.8 s,
    # l36 4.6→11.8 s isolated min-of-3: janino pays seconds compiling
    # the ~1k-literal processNext, swamping the interpreted-fold
    # saving).  The fold stays; the unroll only pays where term counts
    # are small per expression (per-pair cosine, the m-term ADC sum).
    structs = ",".join(
        "named_struct('score',"
        f"aggregate(zip_with(`{vec_col}`,{_darr(c)},"
        "(a,b)->cast(a as double)*b),0.0D,(acc,v)->acc+v),"
        f"'idx',{i})"
        for i, c in enumerate(centroids)
    )
    return F.expr(f"array_max(array({structs})).idx")


def assign_buckets(
    corpus: DataFrame,
    centroids: np.ndarray,
    vec_col: str = "embedding",
    bucket_col: str = "bucket",
    max_literal_cells: int = 4096,
) -> DataFrame:
    """Append each vector's IVF bucket (nearest centroid index).

    Small centroid sets (≤ ``max_literal_cells`` total floats) assign
    through a pure JVM expression — one literal-array dot per centroid,
    whole-stage-codegen'd, zero Python.  Large sets (the production
    regime: ``n_lists ~ √N`` puts a 10⁸-vector corpus at ~10k lists,
    i.e. ~10⁶ literal cells — past what Catalyst should be asked to
    codegen) switch to ONE Arrow-batched pandas UDF: the centroid
    matrix rides the task closure (n_lists × dim × 8 B — a few MB, the
    same payload the literal plan would carry) and each batch is a
    single ``X @ C.T`` argmax — matrix-at-a-time numpy, not per-row
    Python.  Tie behavior: the literal path's struct-max breaks exact
    score ties to the HIGHER index, numpy argmax to the LOWER —
    indistinguishable for trained float centroids."""
    if centroids.size <= max_literal_cells:
        return corpus.withColumn(
            bucket_col, _nearest_centroid_col(vec_col, centroids)
        )
    from pyspark.sql.functions import pandas_udf

    C = np.ascontiguousarray(centroids, dtype="float64")

    @pandas_udf("int")
    def _assign(v: pd.Series) -> pd.Series:
        X = np.stack(v.to_numpy()).astype("float64", copy=False)
        return pd.Series(np.argmax(X @ C.T, axis=1).astype("int32"))

    return corpus.withColumn(bucket_col, _assign(F.col(vec_col)))


def _spread_corpus(df: DataFrame, id_col: str = "neighbor_id") -> DataFrame:
    """Spread corpus vectors across all cores BEFORE the assign/encode
    map stage: those are interpreted higher-order-function folds
    (n_lists dot products, m × n_codes codeword distances per row), and
    a single-row-group input file otherwise pins the whole stage to one
    task (the dedup `_spread` lesson; AQE would coalesce a size-based
    repartition of small input right back, so the count is explicit).
    On a many-file 100 TB corpus the scan is already split and this is
    one exchange of (id, vector) rows — small next to the per-row
    expression work it parallelizes."""
    nparts = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(nparts, F.col(id_col))


def ivf_top_k(
    queries: DataFrame,
    corpus: DataFrame,
    centroids: np.ndarray,
    k: int = 5,
    n_probes: int = 4,
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    query_vec: str = "embedding",
    corpus_vec: str = "embedding",
) -> DataFrame:
    """Approximate top-k cosine neighbors via IVF probing.

    Corpus vectors live in 1 bucket each; every query fans out to its
    ``n_probes`` nearest buckets (posexplode of the per-query centroid
    ranking), candidates come from the equi-join on ``bucket``, exact
    cosine ranks them.  Returns (query_id, neighbor_id, cosine, rank).
    """
    # Per-side norms + unrolled codegen dot (r12, guide §4.1): the old
    # per-pair cosine_expr re-folded both norms for every candidate in
    # an interpreted-lambda aggregate; norms are per-row facts computed
    # once here (8 extra bytes through the exchange), and the pair dot
    # is dot_sql — same left-fold order, bit-identical scores.
    from pgstream_spark.operators.similarity import dot_sql, norm_sql

    dim = int(centroids.shape[1])
    bucketed = assign_buckets(
        _spread_corpus(
            corpus.select(
                F.col(corpus_id).alias("neighbor_id"),
                F.col(corpus_vec).alias("__cv"),
                norm_sql(corpus_vec, dim).alias("__cn"),
            )
        ),
        centroids,
        vec_col="__cv",
    )

    # per-query ranking of ALL centroids, keep the n_probes best — one
    # generated-SQL expr for the same reason as _nearest_centroid_col
    # (py4j-per-literal construction cost; identical tree after parse)
    scored_sql = ",".join(
        "named_struct('score',"
        f"aggregate(zip_with(`__qv`,{_darr(c)},"
        "(a,b)->cast(a as double)*b),0.0D,(acc,v)->acc+v),"
        f"'idx',{i})"
        for i, c in enumerate(centroids)
    )
    probes = F.expr(
        f"slice(reverse(array_sort(array({scored_sql}))),1,{int(n_probes)})"
    )

    q = (
        queries.select(
            F.col(query_id).alias("query_id"),
            F.col(query_vec).alias("__qv"),
            norm_sql(query_vec, dim).alias("__qn"),
        )
        .withColumn("__probe", F.explode(probes))
        .select(
            "query_id", "__qv", "__qn",
            F.col("__probe")["idx"].alias("bucket"),
        )
    )

    cand = (
        q.join(bucketed, on="bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine",
            dot_sql("__qv", "__cv", dim) / (F.col("__qn") * F.col("__cn")),
        )
    )
    return top_k_per_group(
        cand,
        ["query_id"],
        [F.col("cosine").desc(), F.col("neighbor_id").asc()],
        k,
        rank_col="rank",
    ).select("query_id", "neighbor_id", "cosine", "rank")


def write_ivf_index(
    corpus: DataFrame,
    centroids: np.ndarray,
    path: str,
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    mode: str = "overwrite",
) -> None:
    """Persist an IVF index: vectors as ``bucket=K/`` partitioned parquet
    plus the centroid table.

    This turns SCALE.md's claim — "bucket-partitioned storage makes
    probes partition-pruned reads" — into a real layout: a probe query
    filters on the bucket column, so Spark's planner prunes every
    non-probed directory and the scan touches ``n_probes/n_lists`` of
    the index bytes (pinned by ``tests/test_plans.py``).  At 10¹¹
    vectors the index is the corpus; reading 4/64ths of it per query
    batch IS the ANN speedup, persisted.
    """
    # Normalized on-disk layout: (neighbor_id, embedding, bucket=K/)
    # regardless of the caller's corpus_id/vec_col names, so readers
    # (ivf_query_index, append_ivf_index) never need the writer's names.
    bucketed = assign_buckets(
        corpus.select(
            F.col(corpus_id).alias("neighbor_id"),
            F.col(vec_col).alias("embedding"),
        ),
        centroids,
        vec_col="embedding",
    )
    (
        bucketed.repartition("bucket")
        .write.mode(mode)
        .partitionBy("bucket")
        .parquet(path + "/vectors")
    )
    cdf = [(int(i), [float(x) for x in c]) for i, c in enumerate(centroids)]
    spark = corpus.sparkSession
    spark.createDataFrame(cdf, "centroid_id int, centroid array<double>").coalesce(
        1
    ).write.mode(mode).parquet(path + "/centroids")


def load_ivf_centroids(spark: SparkSession, path: str) -> np.ndarray:
    """Centroid matrix of a persisted index (tiny: n_lists × dim)."""
    rows = spark.read.parquet(path + "/centroids").orderBy("centroid_id").collect()
    return np.array([r.centroid for r in rows], dtype="float64")


def ivf_query_index(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    k: int = 5,
    n_probes: int = 4,
    query_id: str = "vec_id",
    query_vec: str = "embedding",
) -> DataFrame:
    """Top-k cosine neighbors against a persisted IVF index, reading only
    the probed bucket partitions.

    The probe-bucket set is computed driver-side from the query batch
    (|queries| × n_probes ints — queries are dimension-sized by the ANN
    contract) and pushed into the scan as an IN filter, which is what
    makes the read partition-pruned rather than a full index scan.
    """
    centroids = load_ivf_centroids(spark, path)
    qv = [
        (r[0], list(r[1]))
        for r in queries.select(query_id, query_vec).collect()
    ]
    c = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)
    probe_set: set[int] = set()
    probes_per_q: dict[int, list[int]] = {}
    for qid, vec in qv:
        v = np.asarray(vec, dtype="float64")
        scores = c @ (v / (np.linalg.norm(v) or 1.0))
        top = np.argsort(-scores, kind="stable")[:n_probes]
        probes_per_q[qid] = [int(b) for b in top]
        probe_set.update(int(b) for b in top)

    vectors = spark.read.parquet(path + "/vectors").filter(
        F.col("bucket").isin(sorted(probe_set))
    )
    # Query-id type follows the caller's schema (string ids, ints, ...):
    # hard-coding `long` here broke non-long ids despite the query_id
    # parameter accepting any column.
    id_type = queries.schema[query_id].dataType.simpleString()
    qdf = spark.createDataFrame(
        [
            (qid, vec, b)
            for qid, vec in qv
            for b in probes_per_q[qid]
        ],
        f"query_id {id_type}, __qv array<float>, bucket int",
    )
    from pgstream_spark.operators.similarity import dot_sql, norm_sql

    dim = int(centroids.shape[1])
    cand = (
        F.broadcast(qdf.withColumn("__qn", norm_sql("__qv", dim)))
        .join(
            vectors.withColumn("__cn", norm_sql("embedding", dim)),
            on="bucket",
        )
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine",
            dot_sql("__qv", "embedding", dim)
            / (F.col("__qn") * F.col("__cn")),
        )
    )
    return top_k_per_group(
        cand,
        ["query_id"],
        [F.col("cosine").desc(), F.col("neighbor_id").asc()],
        k,
        rank_col="rank",
    ).select("query_id", "neighbor_id", "cosine", "rank")


def append_ivf_index(
    new_vectors: DataFrame,
    path: str,
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Incremental ingestion into a persisted index: assign the new batch
    to the EXISTING centroids and append into the bucket partitions.

    This is the 100 TB ingestion path — a partitioned ``append`` write
    touches only the ``bucket=K/`` directories the batch lands in; no
    retrain, no rewrite of standing data, and readers see the same
    normalized ``(neighbor_id, embedding, bucket)`` layout, so
    ``ivf_query_index`` needs no code path for "old vs appended" rows.
    The trade-off is centroid drift: appends assign against centroids
    trained on yesterday's distribution, so bucket sizes skew over time —
    monitor with ``ivf_rebuild_needed`` and retrain+rewrite when it
    trips (rebuild cost amortizes across the append window).
    """
    spark = new_vectors.sparkSession
    centroids = load_ivf_centroids(spark, path)
    bucketed = assign_buckets(
        new_vectors.select(
            F.col(corpus_id).alias("neighbor_id"),
            F.col(vec_col).alias("embedding"),
        ),
        centroids,
        vec_col="embedding",
    )
    (
        bucketed.repartition("bucket")
        .write.mode("append")
        .partitionBy("bucket")
        .parquet(path + "/vectors")
    )


def ivf_bucket_stats(spark: SparkSession, path: str) -> dict:
    """Bucket-occupancy profile of a persisted index.

    One count-only aggregation (n_lists result rows); the scan reads no
    vector bytes — column pruning keeps it at parquet-footer speed.
    Returns ``{n_lists, n_vectors, mean, max, n_empty, imbalance}`` where
    ``imbalance = max_bucket / mean_bucket``.
    """
    n_lists = len(load_ivf_centroids(spark, path))
    rows = (
        spark.read.parquet(path + "/vectors")
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    sizes = [r["n"] for r in rows]
    total = sum(sizes)
    mean = total / n_lists if n_lists else 0.0
    mx = max(sizes, default=0)
    return {
        "n_lists": n_lists,
        "n_vectors": total,
        "mean": mean,
        "max": mx,
        "n_empty": n_lists - len(sizes),
        "imbalance": (mx / mean) if mean else 0.0,
    }


def ivf_rebuild_needed(
    spark: SparkSession,
    path: str,
    max_imbalance: float = 4.0,
    max_empty_frac: float = 0.5,
) -> tuple[bool, dict]:
    """Rebuild-trigger heuristic for an append-drifted index.

    Probe cost is proportional to the probed buckets' sizes; a bucket
    ``max_imbalance``× the mean means worst-case probes scan that factor
    more than the ``n_probes/n_lists`` design point, and mostly-empty
    centroid lists (``n_empty``) waste probe slots on no candidates —
    both are symptoms of the data distribution walking away from the
    trained centroids.  Returns ``(needs_rebuild, stats)`` so callers
    can log the evidence; the rebuild itself is ``train_centroids`` on a
    fresh sample + ``write_ivf_index`` (overwrite), scheduled off-peak.
    """
    stats = ivf_bucket_stats(spark, path)
    needs = stats["imbalance"] > max_imbalance or (
        stats["n_lists"] > 0
        and stats["n_empty"] / stats["n_lists"] > max_empty_frac
    )
    return needs, stats


def _with_residual(
    df: DataFrame, centroids: np.ndarray, vec_col: str, out_col: str
) -> DataFrame:
    """Attach the IVFPQ residual ``vec - centroid(bucket)`` (Jégou et
    al., TPAMI 2011): a broadcast join against the tiny centroid table,
    then one zip_with — map-only, JVM-side."""
    spark = df.sparkSession
    cdf = spark.createDataFrame(
        [(int(i), [float(x) for x in c]) for i, c in enumerate(centroids)],
        "bucket int, __cent array<double>",
    )
    return (
        df.join(F.broadcast(cdf), "bucket")
        .withColumn(
            out_col,
            F.zip_with(
                F.col(vec_col), "__cent", lambda a, b: a.cast("double") - b
            ),
        )
        .drop("__cent")
    )


def _adc_probe_batch(
    qrows: list,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    n_probes: int,
    residual: bool,
) -> tuple[list, set]:
    """Driver-side probe selection + ADC lookup tables, shared by the
    in-memory (`ivf_adc_top_k`) and persisted (`ivfpq_query_index`)
    pipelines so the two can never diverge.  Returns (batch rows of
    (qid, vec, lut, bucket), probed-bucket set).  With raw encoding the
    LUT is probe-invariant and computed once per query; with residual
    encoding it is per probed bucket (built from ``q - c_b``, so
    ADC(q,v) ≈ ||(q-c_b)-(v-c_b)||² = ||q-v||²)."""
    m, n_codes, sub = codebooks.shape
    c_norm = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)

    def lut_for(base: np.ndarray) -> list:
        return [
            float(((base[s * sub : (s + 1) * sub] - codebooks[s][c]) ** 2).sum())
            for s in range(m)
            for c in range(n_codes)
        ]

    batch, probe_set = [], set()
    for qid, v in qrows:
        scores = c_norm @ (v / (np.linalg.norm(v) or 1.0))
        probes = [int(b) for b in np.argsort(-scores, kind="stable")[:n_probes]]
        probe_set.update(probes)
        raw_lut = None if residual else lut_for(v)
        for b in probes:
            lut = lut_for(v - centroids[b]) if residual else raw_lut
            batch.append((qid, [float(x) for x in v], lut, b))
    return batch, probe_set


def ivf_adc_top_k(
    queries: DataFrame,
    corpus: DataFrame,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    k: int = 5,
    n_probes: int = 4,
    shortlist: int = 32,
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    query_vec: str = "embedding",
    corpus_vec: str = "embedding",
    residual: bool = True,
) -> DataFrame:
    """IVF-ADC: the full corpus-scale ANN pipeline in one operator —
    IVF probe pruning × PQ-code scanning × exact re-rank.

    1. **Probe** (driver-side, per query in the dimension-sized batch):
       the ``n_probes`` nearest centroids, plus the query's ADC lookup
       table (m × n_codes squared distances — a few KB).
    2. **Scan codes**: candidates come from the (bucket) equi-join of
       the broadcast query batch against the PQ-encoded corpus; the ADC
       distance is ``m`` array reads + a fold per candidate — the scan
       touches 4-bit codes, never vector bytes, and only in probed
       buckets (``n_probes/n_lists`` of the corpus).
    3. **Re-rank**: the ADC top-``shortlist`` per query (rank-limit
       pushdown truncates pre-shuffle) joins back to real vectors for
       exact cosine — vector bytes are read for shortlist×|queries|
       rows only.

    At 10¹¹ vectors this is the difference between scanning 25 TB of
    floats and scanning ~100 GB of codes in probed buckets + a
    shortlist-sized exact pass.  Returns (query_id, neighbor_id,
    cosine, rank).

    ``residual=True`` PQ-encodes the RESIDUAL ``v - centroid(bucket)``
    instead of the raw vector, and builds each query's ADC table from
    the matching per-probe residual ``q - centroid(bucket)`` — the
    canonical IVFPQ formulation (Jégou et al., TPAMI 2011).  This is
    the production setting for clustered corpora: the coarse quantizer
    absorbs the between-cluster offsets, so the 4-bit codes only have
    to resolve WITHIN-cluster geometry.  Measured on the 500k-vector
    decade probe (25 scattered regions): raw encoding recall@10 = 0.40,
    residual encoding = 1.00 at the same codebooks/params (SCALE.md
    round-8) — and 2.2× faster at sf10.  Residual is therefore the
    DEFAULT since round 9; pass ``False`` only to probe an index whose
    codes were deliberately built raw (persisted indexes don't need
    this — their ``meta/`` flag wins).  Pair with residual-trained
    codebooks (``pq.train_residual_codebooks``) for best recall.
    """
    from pgstream_spark.operators.pq import pq_encode

    m, n_codes, sub = codebooks.shape
    spark = queries.sparkSession

    bucketed = assign_buckets(
        _spread_corpus(
            corpus.select(
                F.col(corpus_id).alias("neighbor_id"),
                F.col(corpus_vec).alias("__cv"),
            )
        ),
        centroids,
        vec_col="__cv",
    )
    if residual:
        bucketed = _with_residual(bucketed, centroids, "__cv", "__cvr")
    enc = pq_encode(
        bucketed,
        codebooks,
        vec_col="__cvr" if residual else "__cv",
        id_col="neighbor_id",
        keep_cols=("bucket",),
    )

    qrows = [
        (r[0], np.asarray(r[1], dtype="float64"))
        for r in queries.select(query_id, query_vec).collect()
    ]
    batch, _ = _adc_probe_batch(qrows, centroids, codebooks, n_probes, residual)
    id_type = queries.schema[query_id].dataType.simpleString()
    qdf = spark.createDataFrame(
        batch,
        f"query_id {id_type}, __qv array<double>, __lut array<double>, bucket int",
    )

    # ADC distance as ONE unrolled generated-SQL sum (r12, guide §4.1):
    # the zip_with + transform + aggregate spelling ran an interpreted
    # lambda fold per CANDIDATE — the dominant per-row cost of the code
    # scan.  The unrolled `0.0 + lut[c0+1] + lut[n+c1+1] + …` parses
    # left-associative, so every intermediate double matches the old
    # fold bit for bit.
    adc = F.expr(
        "CAST(0.0 AS DOUBLE)+"
        + "+".join(
            f"element_at(`__lut`, CAST({i * n_codes} + `codes`[{i}] + 1 AS INT))"
            for i in range(m)
        )
    )
    cand = (
        F.broadcast(qdf)
        .join(enc, on="bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("__adc", adc)
    )
    short = top_k_per_group(
        cand,
        ["query_id"],
        [F.col("__adc").asc(), F.col("neighbor_id").asc()],
        shortlist,
        rank_col="__srank",
    ).select("query_id", "__qv", "neighbor_id")

    from pgstream_spark.operators.similarity import dot_sql, norm_sql

    dim = int(centroids.shape[1])
    vecs = corpus.select(
        F.col(corpus_id).alias("neighbor_id"), F.col(corpus_vec).alias("__cv")
    )
    # shortlist×|queries| rows only — unrolled codegen cosine, same
    # left-fold bits as cosine_expr
    rer = short.join(vecs, "neighbor_id").withColumn(
        "cosine",
        dot_sql("__qv", "__cv", dim)
        / (norm_sql("__qv", dim) * norm_sql("__cv", dim)),
    )
    return top_k_per_group(
        rer,
        ["query_id"],
        [F.col("cosine").desc(), F.col("neighbor_id").asc()],
        k,
        rank_col="rank",
    ).select("query_id", "neighbor_id", "cosine", "rank")


def write_ivfpq_index(
    corpus: DataFrame,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    path: str,
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    mode: str = "overwrite",
    residual: bool = True,
) -> None:
    """Persist the composed IVF-PQ index — the FAISS-style on-disk ANN
    layout, assembled from the pieces this module already proves:

    * ``codes/bucket=K/`` — (neighbor_id, codes): the 4-bit PQ codes,
      bucket-partitioned.  This is what query-time ADC scans: at 64×
      compression the probed partitions are ~1.6 % of the vector bytes.
    * ``vectors/bucket=K/`` — (neighbor_id, embedding): exact vectors,
      same partitioning, touched only for the shortlist re-rank.
    * ``centroids/`` + ``codebooks/`` — the tiny trained tables.
    * ``meta/`` — one row of index-level settings (``residual``), read
      back by ``ivfpq_query_index`` so the probe can never mismatch the
      encoding the codes were written under.

    Both data trees share the bucket partitioning, so a probe prunes
    BOTH scans to ``n_probes/n_lists`` of their files.  ``residual=True``
    (the DEFAULT since round 9 — the production recipe the round-8
    decade probe validated) stores codes of ``v - centroid(bucket)``
    (canonical IVFPQ — see ``ivf_adc_top_k``); the vectors tree always
    stays RAW (re-rank needs the true vectors).  Readers never need to
    know: ``meta/`` records the flag and ``ivfpq_query_index`` probes
    accordingly.
    """
    from pgstream_spark.operators.pq import pq_encode

    spark = corpus.sparkSession
    if mode == "append":
        # an appended generation must match the encoding already stored
        # — and the check must run BEFORE any tree is written: a
        # post-write raise would leave mixed raw+residual code rows
        # already persisted, exactly the silent-wrong-distances state
        # the guard exists to prevent (round-9 review finding; the
        # residual default flip makes stock appends to old raw indexes
        # hit this path)
        existing = _ivfpq_encoding_state(spark, path)
        # None = no index present at all — creating a fresh index via
        # append mode (the idempotent-ingest idiom) is allowed; the
        # guard only fires against an EXISTING tree of the other
        # encoding (a missing meta/ over existing codes is the
        # pre-round-8 layout, which is always raw)
        if existing is not None and existing != bool(residual):
            raise ValueError(
                f"index at {path} is {'residual' if existing else 'raw'}-"
                f"encoded; append with residual={residual} would mix "
                f"encodings — rebuild with mode='overwrite' instead"
            )
    bucketed = assign_buckets(
        corpus.select(
            F.col(corpus_id).alias("neighbor_id"),
            F.col(vec_col).alias("embedding"),
        ),
        centroids,
        vec_col="embedding",
    )
    (
        bucketed.repartition("bucket")
        .write.mode(mode)
        .partitionBy("bucket")
        .parquet(path + "/vectors")
    )
    stored = spark.read.parquet(path + "/vectors")
    if residual:
        stored = _with_residual(stored, centroids, "embedding", "__res")
    enc = pq_encode(
        stored,
        codebooks,
        vec_col="__res" if residual else "embedding",
        id_col="neighbor_id",
        keep_cols=("bucket",),
    )
    (
        enc.repartition("bucket")
        .write.mode(mode)
        .partitionBy("bucket")
        .parquet(path + "/codes")
    )
    cdf = [(int(i), [float(x) for x in c]) for i, c in enumerate(centroids)]
    spark.createDataFrame(cdf, "centroid_id int, centroid array<double>").coalesce(
        1
    ).write.mode(mode).parquet(path + "/centroids")
    m, n_codes, sub = codebooks.shape
    cb = [
        (s, c, [float(x) for x in codebooks[s][c]])
        for s in range(m)
        for c in range(n_codes)
    ]
    spark.createDataFrame(
        cb, "sub int, code int, center array<double>"
    ).coalesce(1).write.mode(mode).parquet(path + "/codebooks")
    # meta is a single-row settings table: always overwritten, never
    # appended (an appended second row would make the flag ambiguous)
    spark.createDataFrame(
        [(bool(residual),)], "residual boolean"
    ).coalesce(1).write.mode("overwrite").parquet(path + "/meta")


def _ivfpq_encoding_state(spark: SparkSession, path: str) -> bool | None:
    """Pre-append classification of ``path``: ``None`` = no index
    present (no ``codes/`` tree — a fresh create, nothing to mismatch),
    else the stored encoding flag (`_read_ivfpq_meta`: missing ``meta/``
    over existing codes = the pre-round-8 raw layout)."""
    from pyspark.errors import AnalysisException

    try:
        spark.read.parquet(path + "/codes").schema
    except AnalysisException as e:
        if "PATH_NOT_FOUND" in str(e) or "UNABLE_TO_INFER_SCHEMA" in str(e):
            return None
        raise
    return _read_ivfpq_meta(spark, path)


def _read_ivfpq_meta(spark: SparkSession, path: str) -> bool:
    """The index's residual flag.  Only a MISSING ``meta/`` tree (the
    pre-round-8 layout, which is always raw-encoded) falls back to
    False; any other failure (throttle, permissions, corrupt footer)
    propagates — silently assuming raw against residual codes would
    return plausible-but-wrong rankings (measured 0.40 vs 1.00
    recall)."""
    from pyspark.errors import AnalysisException

    try:
        return bool(spark.read.parquet(path + "/meta").first()["residual"])
    except AnalysisException as e:
        if "PATH_NOT_FOUND" in str(e) or "UNABLE_TO_INFER_SCHEMA" in str(e):
            return False  # pre-meta index layout → raw encoding
        raise


def load_ivfpq_codebooks(spark: SparkSession, path: str) -> np.ndarray:
    rows = spark.read.parquet(path + "/codebooks").orderBy("sub", "code").collect()
    m = max(r.sub for r in rows) + 1
    n_codes = max(r.code for r in rows) + 1
    sub = len(rows[0].center)
    out = np.zeros((m, n_codes, sub), dtype="float64")
    for r in rows:
        out[r.sub][r.code] = r.center
    return out


def ivfpq_query_index(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    k: int = 5,
    n_probes: int = 4,
    shortlist: int = 32,
    query_id: str = "vec_id",
    query_vec: str = "embedding",
) -> DataFrame:
    """Top-k against a persisted IVF-PQ index: probe → pruned CODE scan
    (ADC) → shortlist → pruned VECTOR fetch → exact cosine.

    Identical ranking to the in-memory ``ivf_adc_top_k`` at the same
    centroids/codebooks/parameters (pytest-pinned); the difference is
    what gets READ — probed code partitions plus shortlist-sized vector
    rows, never the full index.  The residual/raw encoding choice is
    read from the index's ``meta/`` table (absent in pre-round-8
    indexes → raw), so a probe can never mismatch the stored codes.
    """
    centroids = load_ivf_centroids(spark, path)
    codebooks = load_ivfpq_codebooks(spark, path)
    m, n_codes, sub = codebooks.shape
    residual = _read_ivfpq_meta(spark, path)

    qrows = [
        (r[0], np.asarray(r[1], dtype="float64"))
        for r in queries.select(query_id, query_vec).collect()
    ]
    batch, probe_set = _adc_probe_batch(
        qrows, centroids, codebooks, n_probes, residual
    )
    id_type = queries.schema[query_id].dataType.simpleString()
    qdf = spark.createDataFrame(
        batch,
        f"query_id {id_type}, __qv array<double>, __lut array<double>, bucket int",
    )

    codes = spark.read.parquet(path + "/codes").filter(
        F.col("bucket").isin(sorted(probe_set))
    )
    # unrolled ADC + codegen re-rank cosine — same bit contract as the
    # ivf_adc_top_k site above (left-fold order preserved)
    adc = F.expr(
        "CAST(0.0 AS DOUBLE)+"
        + "+".join(
            f"element_at(`__lut`, CAST({i * n_codes} + `codes`[{i}] + 1 AS INT))"
            for i in range(m)
        )
    )
    cand = (
        F.broadcast(qdf)
        .join(codes, on="bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("__adc", adc)
    )
    short = top_k_per_group(
        cand,
        ["query_id"],
        [F.col("__adc").asc(), F.col("neighbor_id").asc()],
        shortlist,
        rank_col="__srank",
    ).select("query_id", "__qv", "neighbor_id", "bucket")

    vectors = spark.read.parquet(path + "/vectors").filter(
        F.col("bucket").isin(sorted(probe_set))
    )
    from pgstream_spark.operators.similarity import dot_sql, norm_sql

    dim = int(centroids.shape[1])
    rer = short.join(
        vectors.select("neighbor_id", "embedding"), "neighbor_id"
    ).withColumn(
        "cosine",
        dot_sql("__qv", "embedding", dim)
        / (norm_sql("__qv", dim) * norm_sql("embedding", dim)),
    )
    return top_k_per_group(
        rer,
        ["query_id"],
        [F.col("cosine").desc(), F.col("neighbor_id").asc()],
        k,
        rank_col="rank",
    ).select("query_id", "neighbor_id", "cosine", "rank")
