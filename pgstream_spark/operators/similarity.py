"""Vector similarity search — SURVEY §2 L-3.

Cosine/dot arithmetic stays JVM-side via higher-order functions
(``zip_with`` + ``aggregate`` folding in DOUBLE); no Python in the
per-pair path.  Two search strategies:

* ``brute_force_top_k`` — broadcast the (small) query set against the
  corpus, exact top-k per query via ``row_number``.  This is the correct
  baseline and, with Spark's rank-limit pushdown, the shuffle carries only
  k rows per (partition, query).  Cost O(|Q|·|C|) similarity evaluations,
  perfectly parallel — the right plan whenever |Q| is dimension-sized.
* ``lsh_bucketed_top_k`` — random-hyperplane LSH: L independent tables of
  m sign-bits each; query and corpus vectors land in buckets, candidates
  are same-bucket pairs, exact cosine re-ranks.  Evaluations drop to
  |Q|·E[bucket size]·L at a recall cost governed by (m, L).  Hyperplanes
  are generated deterministically (numpy, fixed seed) and shipped as
  literal arrays — dimension-sized, broadcast-friendly.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pgstream_spark.operators.topk import top_k_per_group

__all__ = ["dot_expr", "norm_expr", "cosine_expr", "with_cosine",
           "brute_force_top_k", "lsh_bucketed_top_k",
           "quantize_embeddings"]


def dot_expr(a: Column, b: Column) -> Column:
    """Dot product of two numeric arrays, folded in DOUBLE, index order."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(dot_expr(a, a))


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def dot_sql(a: str, b: str, dim: int) -> Column:
    """``dot_expr`` as ONE generated-SQL expression for a KNOWN ``dim``
    (r12, guide §4.1 expression choice): ``aggregate(zip_with(...))`` is
    an interpreted-lambda fold — no codegen, a zipped struct array
    allocated per row — measured as the dominant re-rank cost on LSH
    candidate streams.  The unrolled ``0.0 + a[0]*b[0] + a[1]*b[1] + …``
    parses left-associative, so the fold ORDER (and therefore every
    intermediate double) is bit-identical to ``dot_expr``'s
    ``((0.0 + p₀) + p₁) + …`` — the cross-engine contract the oracles
    pin.  Requires both arrays to hold exactly ``dim`` elements (an
    out-of-range subscript NULLs the sum, where the HOF form would fold
    the shorter common prefix) — callers in this codebase already
    assume fixed-dim vectors (the plane literals index 0..dim-1).
    """
    terms = "+".join(
        f"CAST(`{a}`[{i}] AS DOUBLE)*CAST(`{b}`[{i}] AS DOUBLE)"
        for i in range(dim)
    )
    return F.expr(f"CAST(0.0 AS DOUBLE)+{terms}")


def norm_sql(a: str, dim: int) -> Column:
    """``norm_expr`` in the :func:`dot_sql` form — same bit contract."""
    return F.sqrt(dot_sql(a, a, dim))


def with_cosine(df: DataFrame, a: str, b: str, out: str = "cosine") -> DataFrame:
    return df.withColumn(out, cosine_expr(F.col(a), F.col(b)))


def brute_force_top_k(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    query_vec: str = "embedding",
    corpus_vec: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Exact top-k cosine neighbors of each query vector (self-matches by
    id are excluded).  Returns (query_id, neighbor_id, cosine, rank).

    ``dim``: when the fixed vector dimension is known, the per-pair
    cosine runs as the unrolled codegen form (:func:`dot_sql`) with
    norms computed once per SIDE row instead of per pair — bit-identical
    doubles (same left-fold order), much cheaper per candidate."""
    q = queries.select(
        F.col(query_id).alias("query_id"), F.col(query_vec).alias("__qv")
    )
    # Spread the corpus before the cosine stage: a single-row-group
    # input otherwise pins every query×corpus cosine to 1-2 scan tasks
    # (the dedup `_spread` lesson); on a many-file table this is one
    # exchange of compact (id, vector) rows.
    nparts = corpus.sparkSession.sparkContext.defaultParallelism
    c = corpus.select(
        F.col(corpus_id).alias("neighbor_id"), F.col(corpus_vec).alias("__cv")
    ).repartition(nparts, F.col("neighbor_id"))
    if dim is not None:
        q = q.withColumn("__qn", norm_sql("__qv", dim))
        c = c.withColumn("__cn", norm_sql("__cv", dim))
        cos = dot_sql("__qv", "__cv", dim) / (F.col("__qn") * F.col("__cn"))
    else:
        cos = cosine_expr(F.col("__qv"), F.col("__cv"))
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", cos)
    )
    return top_k_per_group(
        scored,
        ["query_id"],
        [F.col("cosine").desc(), F.col("neighbor_id").asc()],
        k,
        rank_col="rank",
    ).select("query_id", "neighbor_id", "cosine", "rank")


def _hyperplanes(dim: int, m_bits: int, tables: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((tables, m_bits, dim))


def _dlit(x: float) -> str:
    """Spark SQL double literal with the exact bits of ``x`` (repr
    round-trips; Double.parseDouble gives the same nearest-double)."""
    r = repr(float(x))
    if r in ("inf", "-inf", "nan"):
        raise ValueError(f"non-finite hyperplane value {r}")
    return r + "D"


def _bucket_sql(vec_col: str, planes: np.ndarray) -> str:
    """Sign-bit bucket id of ``vec_col`` for one table's hyperplanes,
    as generated SQL.

    Emitted as one SQL fragment (parsed by a single ``F.expr`` at the
    call site) instead of per-literal Column calls: m_bits × dim plane
    cells per table at one py4j round-trip each made DataFrame
    CONSTRUCTION a visible cost of the LSH queries.  The parsed tree —
    zip_with double-product fold per plane, CASE sign bits, left-assoc
    sum, BIGINT cast — is identical to the old Column build, so buckets
    are bit-identical (the l3b/l3c oracle gates pin it)."""
    # NOTE (r12): an unrolled-literal spelling of these dots (the
    # dot_sql treatment) was tried and REVERTED — all `tables × m_bits`
    # plane dots live in ONE bucket-array projection, and the resulting
    # ~2300-literal expression made the broadcast-relation build fail
    # with "Not enough memory to build and broadcast" at default driver
    # memory (probed at sf0.001).  The zip_with fold stays for the
    # bucket exprs; the per-CANDIDATE cosine (the row-count hot spot)
    # is where the unroll pays, and it lives in dot_sql.
    bits = []
    for i, plane in enumerate(planes):
        arr = "array(" + ",".join(_dlit(w) for w in plane) + ")"
        dot = (
            f"aggregate(zip_with(`{vec_col}`,{arr},"
            "(x,y)->cast(x as double)*cast(y as double)),"
            "0.0D,(acc,v)->acc+v)"
        )
        bits.append(f"(CASE WHEN {dot} > 0 THEN {1 << i} ELSE 0 END)")
    return f"CAST({'+'.join(bits)} AS BIGINT)"


def _bucket_col(vec_col: str, planes: np.ndarray) -> Column:
    """Sign-bit bucket id of ``vec_col`` for one table's hyperplanes."""
    return F.expr(_bucket_sql(vec_col, planes))


def lsh_bucketed_top_k(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    m_bits: int = 8,
    tables: int = 4,
    dim: int = 64,
    seed: int = 42,
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    query_vec: str = "embedding",
    corpus_vec: str = "embedding",
    round_rank_decimals: int | None = None,
) -> DataFrame:
    """Approximate top-k cosine neighbors via random-hyperplane LSH.

    Each vector gets ``tables`` bucket ids; query/corpus equi-join on
    (table, bucket) generates candidates, exact cosine ranks them.  The
    join shuffles on (table, bucket) — no cross join anywhere, so this is
    the 100 TB path.  Recall rises with ``tables`` and falls with
    ``m_bits``; defaults suit ~unit-scale random embeddings.
    """
    planes = _hyperplanes(dim, m_bits, tables, seed)

    def bucketed(df: DataFrame, idc: str, vecc: str, id_out: str) -> DataFrame:
        table_buckets = F.expr(
            "array("
            + ",".join(_bucket_sql(vecc, planes[t]) for t in range(tables))
            + ")"
        )
        return df.select(
            F.col(idc).alias(id_out),
            F.col(vecc).alias(f"__{id_out}_v"),
            F.posexplode(table_buckets).alias("table", "bucket"),
        )

    qb = bucketed(queries, query_id, query_vec, "query_id")
    cb = bucketed(corpus, corpus_id, corpus_vec, "neighbor_id")

    # r12, two changes (scores bit-identical either way — same left-fold
    # cosine, same candidate set):
    #
    # 1. The per-pair cosine runs as the unrolled codegen dot (dot_sql)
    #    with norms computed once per SIDE row — the old cosine_expr
    #    re-folded three interpreted HOF aggregates per candidate.
    # 2. Above a 256 MiB corpus estimate the candidate join and distinct
    #    carry IDS ONLY and vectors re-attach per distinct pair (guide
    #    §2.3: the vectors-through form ships every vector `tables`×
    #    through the (table, bucket) exchange and again through the
    #    distinct — fatal at 100 TB).  Below the knee the
    #    vectors-through form is kept: the two attach joins cost more
    #    than the tiny payload saving (A/B at sf0.1: 2.2 s vs 2.8 s).
    #    Missing stats count as large (the scale-safe side).
    est = int(
        str(corpus._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    )
    if est < (256 << 20):
        cand = (
            qb.withColumn("__qn", norm_sql("__query_id_v", dim))
            .join(
                cb.withColumn("__cn", norm_sql("__neighbor_id_v", dim)),
                on=["table", "bucket"],
            )
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .select(
                "query_id", "neighbor_id",
                "__query_id_v", "__neighbor_id_v", "__qn", "__cn",
            )
            .distinct()
        )
    else:
        cand_ids = (
            qb.drop("__query_id_v")
            .join(cb.drop("__neighbor_id_v"), on=["table", "bucket"])
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .select("query_id", "neighbor_id")
            .distinct()
        )
        qv = queries.select(
            F.col(query_id).alias("query_id"),
            F.col(query_vec).alias("__query_id_v"),
            norm_sql(query_vec, dim).alias("__qn"),
        )
        cv = corpus.select(
            F.col(corpus_id).alias("neighbor_id"),
            F.col(corpus_vec).alias("__neighbor_id_v"),
            norm_sql(corpus_vec, dim).alias("__cn"),
        )
        cand = cand_ids.join(qv, "query_id").join(cv, "neighbor_id")
    cand = cand.withColumn(
        "cosine",
        dot_sql("__query_id_v", "__neighbor_id_v", dim)
        / (F.col("__qn") * F.col("__cn")),
    )
    # ranking on the ROUNDED cosine makes the order reproducible across
    # engines whose float summation differs in the last ulp (oracle mode)
    if round_rank_decimals is not None:
        cand = cand.withColumn("cosine", F.round("cosine", round_rank_decimals))
    return top_k_per_group(
        cand,
        ["query_id"],
        [F.col("cosine").desc(), F.col("neighbor_id").asc()],
        k,
        rank_col="rank",
    ).select("query_id", "neighbor_id", "cosine", "rank")


def lsh_topk_oracle_sql(
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_filter: str = "vec_id < 10",
    k: int = 5,
    m_bits: int = 6,
    tables: int = 6,
    dim: int = 64,
    seed: int = 42,
    decimals: int = 6,
) -> str:
    """DuckDB SQL computing the SAME hyperplane buckets + top-k re-rank
    as ``lsh_bucketed_top_k`` (full-precision plane literals, identical
    left-fold dot order — see ``dedup.embedding_neardup_lsh_oracle_sql``).
    """
    planes = _hyperplanes(dim, m_bits, tables, seed)
    bucket_exprs = []
    for t in range(tables):
        bits = []
        for i in range(m_bits):
            dot = " + ".join(
                f"v[{j + 1}]*({float(w)!r})" for j, w in enumerate(planes[t][i])
            )
            bits.append(f"CASE WHEN ({dot}) > 0 THEN {1 << i} ELSE 0 END")
        bucket_exprs.append(f"({t * (1 << m_bits)} + " + " + ".join(bits) + ")")
    bucket_list = ", ".join(bucket_exprs)
    return (
        f"WITH e AS (SELECT {id_col} AS id, CAST({vec_col} AS DOUBLE[]) AS v "
        f"FROM {table}), "
        f"b AS (SELECT id, unnest([{bucket_list}]) AS bucket FROM e), "
        f"qb AS (SELECT * FROM b WHERE {query_filter.replace(id_col, 'id')}), "
        "cand AS (SELECT DISTINCT q.id AS query_id, c.id AS neighbor_id "
        "FROM qb q JOIN b c ON q.bucket = c.bucket AND q.id <> c.id), "
        "scored AS (SELECT query_id, neighbor_id, "
        f"round(list_cosine_similarity(eq.v, ec.v), {decimals}) AS cosine "
        "FROM cand JOIN e eq ON eq.id = query_id JOIN e ec ON ec.id = neighbor_id), "
        "ranked AS (SELECT query_id, neighbor_id, cosine, "
        "CAST(row_number() OVER (PARTITION BY query_id "
        "ORDER BY cosine DESC, neighbor_id) AS INT) AS rank FROM scored) "
        "SELECT query_id, neighbor_id, cosine, rank FROM ranked "
        f"WHERE rank <= {k}"
    )


def quantize_embeddings(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Symmetric per-vector int8 quantization of a float embedding column.

    ``scale = max(|v_i|) / 127``; each component becomes
    ``floor(v_i / scale + 0.5)`` clamped to int — a 4× storage cut (and a
    proportional shuffle/IO cut) for the 100 TB embedding path, at a
    bounded reconstruction error of ``scale / 2`` per component.  Map-only:
    two higher-order functions per row, no shuffle, runs at scan speed.

    The rounding is written as ``floor(x + 0.5)`` rather than ``round``
    because IEEE floor is bit-identical across engines while round()
    tie-breaking is not — the op is exactly reproducible anywhere doubles
    are IEEE, which also makes it oracle-checkable.

    Returns ``(id, *keep_cols, max_abs, qvec)`` with ``max_abs`` the raw
    pre-division scale numerator (×127 gives back ``scale``); zero vectors
    quantize to all-zero with ``max_abs = 0``.
    """
    v = F.col(vec_col)
    max_abs = F.array_max(F.transform(v, lambda x: F.abs(x.cast("double"))))
    qvec = F.when(
        max_abs == F.lit(0.0),
        F.transform(v, lambda x: F.lit(0)),
    ).otherwise(
        F.transform(
            v,
            lambda x: F.floor(
                (x.cast("double") * F.lit(127.0)) / max_abs + F.lit(0.5)
            ).cast("int"),
        )
    )
    return df.select(
        F.col(id_col),
        *[F.col(c) for c in keep_cols],
        max_abs.alias("max_abs"),
        qvec.alias("qvec"),
    )
