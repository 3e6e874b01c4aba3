"""Distributed exact Gram matrix + PCA over an embedding column.

The covariance/Gram step of embedding analytics (whitening, PCA
projection, dataset drift in embedding space) reduces 100 TB of vectors
to a d×d matrix — the textbook "tall-skinny" reduction (Spark MLlib's
``RowMatrix.computeGramianMatrix`` shape): every row contributes its
outer product, the cluster sums them, and only the d×d result (d ≤ a few
hundred) ever leaves the executors.  Eigen-decomposition of d×d happens
on the driver with numpy — that is not a scale compromise, it is the
right division of labor (the matrix is tiny; the DATA never moves).

Determinism discipline (SURVEY §5.3): float dot products are
order-dependent, so the Gram sums here are computed over integer-scaled
components (``round(x * scale)`` → BIGINT) — exact, associative,
partition-order-free, and reproducible bit-for-bit on any cluster *and*
in the DuckDB oracle.  Overflow bound: |x| ≤ B ⇒ each product ≤
(B·scale)², so n rows need n·(B·scale)² < 2^63 — at scale=10^6 and unit
vectors that is ~9000 rows per *unique* (i,j) cell times 10^12, i.e.
~9M rows; pass a smaller ``scale`` for larger corpora (scale=10^4
admits ~90B rows).

The upper-triangle pair products are built with nested HOF transforms
(whole-stage codegen, no Python), exploded once, and hash-aggregated:
shuffle carries one partial row per (partition, i, j) — d(d+1)/2 groups
(2080 at d=64), a broadcast-sized result at any input size.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "gram_upper",
    "pca_from_gram",
    "pca_project",
    "jl_sign_matrix",
    "random_projection",
    "group_centroid_outliers",
]


def _q(vec_col: str, scale: int) -> Column:
    return F.transform(
        F.col(vec_col),
        lambda x: F.round(x.cast("double") * float(scale)).cast("bigint"),
    )


def gram_upper(
    df: DataFrame,
    vec_col: str = "embedding",
    scale: int = 1_000_000,
) -> DataFrame:
    """Exact upper-triangle Gram sums: ``(i, j, sxy)`` for j >= i, where
    ``sxy = Σ_rows round(x_i·scale)·round(x_j·scale)`` (BIGINT).
    First moments (for centering) come from `component_sums`.

    Quantization stays a JVM expression (``F.round`` — Spark's HALF_UP
    decimal rounding, which numpy's half-to-even cannot reproduce on
    ties), so the integers entering the reduction are bit-identical to
    the oracle's.  The reduction itself is one int64 ``Xᵀ·X`` matmul
    per Arrow batch (guide §4.2: whole-batch native kernel) — the old
    nested-HOF explode built d(d+1)/2 structs PER ROW in interpreted
    expression code, and was ~10× slower at d=64.  Integer matmul and
    the partial-sum accumulation are associative, so the per-(i,j)
    totals are bit-identical on any partitioning (verified exactly
    equal at sf0.1).  Each task emits one d(d+1)/2-row partial — the
    same shuffle contract as the explode+partial-agg plan.

    The input is repartitioned across cores first: gate-scale tables
    arrive as one row group, which would pin the matmul stage to a
    single task (dedup ``_spread`` lesson; at 100 TB the scan is
    already split and the exchange is one pass of quantized rows).
    """
    import numpy as np
    import pyarrow as pa

    nparts = df.sparkSession.sparkContext.defaultParallelism
    qdf = (
        df.select(F.col(vec_col))
        .repartition(nparts)
        .select(_q(vec_col, scale).alias("__q"))
    )

    def _partial(batches):
        import pyarrow.compute as pc

        acc = None
        d = None
        bound = 0  # running Σ n·m² over accumulated batches
        for b in batches:
            col = b.column(0)
            n = len(col)
            if n == 0:
                continue
            # ADVICE r11 (linalg.py:98): validate PER-ROW lengths from
            # the Arrow offsets, not aggregate divisibility — mixed dims
            # whose total divides evenly (63+65 over 2 rows) reshaped
            # misaligned and summed silently wrong; null slots aliased
            # into a passing check.  list_value_length is O(n) on the
            # offsets buffer, no data pass.
            if col.null_count:
                raise ValueError("gram_upper: null embedding rows")
            lens = pc.unique(pc.list_value_length(col)).to_pylist()
            if len(lens) != 1:
                raise ValueError(
                    f"gram_upper: ragged embedding lengths {sorted(lens)[:8]}"
                )
            if d is None:
                d = lens[0]
            elif lens[0] != d:
                raise ValueError("gram_upper: inconsistent embedding dims")
            flat = col.flatten().to_numpy(zero_copy_only=False)
            X = flat.reshape(n, d).astype(np.int64, copy=False)
            # ADVICE r11 (linalg.py:104): the int64 matmul wraps silently
            # on overflow where the old ANSI bigint sum raised.  Each
            # partial cell is ≤ Σ n·m² (m = max |x| this batch); raise
            # before the matmul when the accumulated bound could exceed
            # int64.  At scale=10⁶ and unit-norm embeddings m ≈ 10⁶, so
            # the guard admits ~9·10⁶ rows per TASK (tasks are ~128 MB
            # splits ≪ that) and costs one vectorized abs().max() pass.
            m = int(np.abs(X).max(initial=0))
            bound += n * m * m
            if bound > (1 << 63) - 1:
                raise ValueError(
                    "gram_upper: int64 overflow risk — per-task partial "
                    f"bound {bound} exceeds 2^63-1; lower `scale` or "
                    "split input into more partitions"
                )
            g = X.T @ X
            acc = g if acc is None else acc + g
        if acc is None:
            return
        iu = np.triu_indices(d)
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(iu[0].astype("int32")),
                pa.array(iu[1].astype("int32")),
                pa.array(acc[iu].astype("int64")),
            ],
            names=["i", "j", "p"],
        )

    return (
        qdf.mapInArrow(_partial, "i int, j int, p bigint")
        .groupBy("i", "j")
        .agg(F.sum("p").alias("sxy"))
    )


def component_sums(
    df: DataFrame,
    vec_col: str = "embedding",
    scale: int = 1_000_000,
) -> DataFrame:
    """Exact per-component sums ``(i, sx)`` plus a row count, for
    centering the Gram matrix into a covariance matrix."""
    q = _q(vec_col, scale)
    return (
        df.select(F.posexplode(q).alias("i", "x"))
        .groupBy("i")
        .agg(F.sum("x").alias("sx"), F.count(F.lit(1)).alias("n"))
    )


def pca_from_gram(
    gram_rows: list,
    sum_rows: list,
    d: int,
    scale: int = 1_000_000,
    k: int = 8,
) -> np.ndarray:
    """Top-k principal axes (k×d, rows = components) from collected
    `gram_upper` and `component_sums` rows — a driver-side d×d eigh.

    Sign convention: each eigenvector is flipped so its
    largest-absolute-value entry is positive (eigenvectors are only
    defined up to sign; pinning makes the result reproducible).
    """
    s2 = np.zeros((d, d), dtype=np.float64)
    for r in gram_rows:
        s2[r["i"], r["j"]] = s2[r["j"], r["i"]] = float(r["sxy"])
    s1 = np.zeros(d, dtype=np.float64)
    n = 0
    for r in sum_rows:
        s1[r["i"]] = float(r["sx"])
        n = int(r["n"])
    if n < 2:
        raise ValueError("PCA needs at least 2 rows")
    cov = (s2 - np.outer(s1, s1) / n) / (n - 1) / (scale * scale)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    top = vecs[:, ::-1][:, :k].T.copy()
    for row in top:
        m = np.argmax(np.abs(row))
        if row[m] < 0:
            row *= -1
    return top


def pca_project(
    df: DataFrame,
    components: np.ndarray,
    vec_col: str = "embedding",
    out_col: str = "pca",
) -> DataFrame:
    """Project each vector onto the (broadcast-literal) component rows —
    a map-only JVM expression per component, no shuffle, no Python."""
    dots = [
        F.aggregate(
            F.zip_with(
                F.col(vec_col),
                F.array(*[F.lit(float(c)) for c in comp]),
                lambda a, b: a.cast("double") * b,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        for comp in components
    ]
    return df.withColumn(out_col, F.array(*dots))


def jl_sign_matrix(d: int, out_dim: int, seed: str = "jl") -> list:
    """Deterministic ±1 sign matrix (d × out_dim) for the projection:
    ``+1`` iff the first hex nibble of ``md5(f"{seed}:{i}:{j}")`` is
    below 8 — an unbiased coin on md5's uniform nibble that any engine
    reproduces exactly (DuckDB spelling:
    ``CAST(('0x' || substr(md5(seed||':'||i||':'||j), 1, 1)) AS BIGINT) < 8``).
    No RNG state anywhere: the matrix is a pure function of (seed, i, j),
    so re-runs, appends, and cross-engine oracles all agree."""
    import hashlib

    return [
        [
            1
            if int(hashlib.md5(f"{seed}:{i}:{j}".encode()).hexdigest()[0], 16) < 8
            else -1
            for j in range(out_dim)
        ]
        for i in range(d)
    ]


def random_projection(
    df: DataFrame,
    vec_col: str = "embedding",
    d: int = 64,
    out_dim: int = 16,
    scale: int = 1_000,
    seed: str = "jl",
    out_col: str = "proj",
) -> DataFrame:
    """Johnson–Lindenstrauss sign projection: d-dim vectors → out_dim
    integer components ``p_j = Σ_i s_ij · round(x_i · scale)`` with
    ``s_ij ∈ {±1}`` from `jl_sign_matrix` (Achlioptas 2003's database-
    friendly ±1 variant — dot products are preserved in expectation up
    to the out_dim scaling, error ~ 1/sqrt(out_dim)).

    This is the DATA-INDEPENDENT dimensionality-reduction path, the
    complement of `pca_from_gram`/`pca_project`: no training pass, no
    collected statistics — the matrix is a hash, so the operator is a
    single map-only JVM expression (zip_with + integer fold per output
    component, whole-stage codegen, no shuffle, no Python) that an
    incremental/streaming ingest can apply row-at-a-time and any later
    batch reproduces bit-exactly.  At 100 TB: scan-speed; nothing
    leaves the executors.

    Determinism discipline: components are integer-quantized BEFORE the
    fold (round(x·scale) → BIGINT), so the sum is exact and associative
    — bit-identical in any execution order and in the DuckDB oracle
    (the l19/l46 quantization discipline).  Overflow bound: |p_j| ≤
    d·B·scale for |x| ≤ B — at d=64, scale=10³, unit-ish components
    that is ~2^17, nowhere near 2^63.

    ``d`` must equal the vector length (zip_with would null-pad a
    mismatch); callers with ragged vectors should filter first.
    """
    signs = jl_sign_matrix(d, out_dim, seed)
    # One generated-SQL F.expr instead of per-literal Column calls:
    # d × out_dim sign cells at one py4j round-trip each made DataFrame
    # CONSTRUCTION a visible cost (the ivf/pq/kmeans lesson).  The
    # quantized array is computed ONCE per row in its own projection —
    # the old build inlined the transform into every component, so each
    # row quantized d values out_dim times; integer sums are exact, so
    # factoring it out is bit-identical (l89's oracle gate pins it).
    # CollapseProject will not re-inline: __jlq is non-cheap and
    # referenced out_dim times.
    q_sql = (
        f"transform(`{vec_col}`, x -> "
        f"CAST(round(CAST(x AS DOUBLE) * {float(scale)!r}D) AS BIGINT))"
    )
    # r12: unrolled integer sum instead of the interpreted
    # zip_with + aggregate fold — bigint adds in the same left-assoc
    # order (exact integers regardless), still a pure map-only
    # expression (test_map_only_plan keeps pinning zero Exchanges).
    comps = []
    for j in range(out_dim):
        comps.append(
            "CAST(0 AS BIGINT)+"
            + "+".join(f"`__jlq`[{i}]*{signs[i][j]}L" for i in range(d))
        )
    # deliberately NO repartition here: the operator's contract is
    # scan-speed map-only (test_map_only_plan pins zero Exchanges) and
    # streaming-safe — a single-row-group LOCAL input pins the folds to
    # one task, but that is the call site's layout problem (l89 spreads
    # there); at 100 TB the scan is already split.
    return (
        df.withColumn("__jlq", F.expr(q_sql))
        .withColumn(out_col, F.expr("array(" + ",".join(comps) + ")"))
        .drop("__jlq")
    )


def group_centroid_outliers(
    df: DataFrame,
    group_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1_000,
    top_fraction_pct: int = 10,
    max_abs: int = 8,
) -> DataFrame:
    """Prototypicality pruning (the SemDeDup/D4 family — Sorscher et
    al. 2022 "Beyond neural scaling laws", Abbas et al. 2023): rank
    each vector by its distance to ITS GROUP'S centroid and flag the
    farthest ``top_fraction_pct`` percent as outliers — the curation
    step that drops least-prototypical examples per cluster/source
    before training.

    Exact-integer discipline end to end, so the verdict frame is
    oracle-checkable bit-for-bit (no trained state — the "clusters"
    are whatever grouping column the caller provides: a label, a
    source, an LSH bucket, a trained assignment):

    1. quantize components (``round(x·scale) + scale·max_abs`` →
       BIGINT — the shift keeps every operand NON-NEGATIVE, where
       Spark's ``DIV`` (truncate toward zero) and an oracle's ``//``
       (floor) agree; the shift cancels in every difference, so
       distances are unchanged.  Components must satisfy
       ``|x| ≤ max_abs`` (default 8 — generous for unit-norm or
       standardized embeddings);
    2. per-group centroid component = ``sum DIV count`` (exact
       integer mean over the shifted domain);
    3. squared distance = Σ (qxᵢ − cᵢ)² — exact BIGINT;
    4. rank by (distance DESC, id ASC) per group;
       ``outlier = rank·100 ≤ n·top_fraction_pct`` (integer
       cross-multiplication — no float percentile).

    Scale shape: the centroid pass explodes to (group, component) and
    map-side combines — the shuffle carries at most partitions ×
    groups × d partial rows, and the result (groups × d, re-packed to
    one ARRAY row per group) is broadcast-sized by construction.  The
    distance pass is then MAP-ONLY: broadcast-join the centroid array
    onto each row and fold ``zip_with`` — the corpus is never exploded
    a second time and never shuffled for the distance.  The only
    corpus-sized shuffle is the per-group window for the rank, which
    the semantics require.  No crossJoin, no UDF.  Returns
    ``(id, group, dist_sq, rank, n_in_group, outlier)``.
    """
    from pyspark.sql import Window

    shift = scale * max_abs
    q = F.transform(
        F.col(vec_col),
        lambda x: F.round(x.cast("double") * float(scale)).cast("bigint")
        + F.lit(shift).cast("bigint"),
    )
    base = df.select(
        F.col(id_col).alias("__id"),
        F.col(group_col).alias("__g"),
        q.alias("__q"),
    )
    cents = (
        base.select("__g", F.posexplode("__q").alias("__i", "__x"))
        .groupBy("__g", "__i")
        .agg(F.expr("CAST(sum(__x) AS BIGINT) DIV count(1)").alias("__c"))
        .groupBy("__g")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(__i, __c))), s -> s.__c)"
            ).alias("__cent")
        )
    )
    d = base.join(F.broadcast(cents), "__g").select(
        "__id",
        "__g",
        F.aggregate(
            F.zip_with(
                "__q", "__cent", lambda a, b: (a - b) * (a - b)
            ),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).alias("dist_sq"),
    )
    w = Window.partitionBy("__g").orderBy(
        F.col("dist_sq").desc(), F.col("__id").asc()
    )
    ranked = d.withColumn("rank", F.row_number().over(w)).withColumn(
        "n_in_group", F.count(F.lit(1)).over(Window.partitionBy("__g"))
    )
    return ranked.select(
        F.col("__id").alias(id_col),
        F.col("__g").alias(group_col),
        "dist_sq",
        "rank",
        "n_in_group",
        (
            F.col("rank") * 100 <= F.col("n_in_group") * top_fraction_pct
        ).alias("outlier"),
    )
