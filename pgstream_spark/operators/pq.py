"""Product quantization (PQ) — sub-vector codebook compression for the
100 TB embedding path (SURVEY §2 L-3 extension; Jégou et al. 2011).

A ``dim``-dimensional float vector is split into ``m`` contiguous
subspaces; each subspace is replaced by the index of its nearest
codeword in a per-subspace codebook of ``n_codes`` entries.  With the
default (m=8, n_codes=16) a 64-dim float32 vector (256 B) becomes 8
4-bit codes (4 B) — 64× smaller, which at corpus scale is the
difference between an index that fits in cluster RAM and one that
doesn't.  Search uses asymmetric distance (ADC): the query stays exact,
each candidate's distance is m lookup-table reads.

ADC is a SHORTLIST generator, not a final ranking: quantization noise
(tunable via m / n_codes) blurs fine distance gaps, so the production
pipeline is ADC top-``shortlist`` → exact re-rank of those rows only —
and at full corpus scale, IVF bucketing in front of both (IVF-ADC), so
the code scan covers probed buckets rather than the corpus.  The recall
pytest pins exactly this contract.

Scale shape: encoding is MAP-ONLY (the codebooks ship as literal
arrays, the per-subspace argmin is a JVM-side fold — no Python, no
shuffle, scan speed); ADC scoring broadcasts one lookup table per query
(m × n_codes doubles — query-batch-sized) and runs as one projection
over the encoded corpus plus the W-family top-k.

Determinism: codebooks from ``train_pq_codebooks`` depend only on
(sample, seed); ``default_codebooks`` trains on a seeded synthetic
unit-norm Gaussian sample — data-independent like ``similarity.py``'s
hyperplanes, so an oracle can embed the same literals and the encode
is bit-reproducible on any engine (``pq_encode_oracle_sql``).

Reference parity: the reference has no vector ops (vectors delegate to
Postgres arrays, `/root/reference/src/Database/PostgreSQL/Stream/FromRow.hs:231-249`);
PQ is part of the LLM-pipeline extension surface.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "train_pq_codebooks",
    "train_residual_codebooks",
    "default_codebooks",
    "pq_encode",
    "pq_decode_error",
    "pq_adc_top_k",
    "pq_encode_oracle_sql",
]


def _kmeans(X: np.ndarray, k: int, iters: int, rng: np.random.Generator) -> np.ndarray:
    """Seeded Lloyd with farthest-point init (ivf.train_centroids recipe)."""
    first = int(rng.integers(len(X)))
    chosen = [first]
    d2min = ((X - X[first]) ** 2).sum(axis=1)
    for _ in range(1, min(k, len(X))):
        nxt = int(d2min.argmax())
        chosen.append(nxt)
        d2min = np.minimum(d2min, ((X - X[nxt]) ** 2).sum(axis=1))
    cents = X[chosen].copy()
    for _ in range(iters):
        d2 = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for c in range(len(cents)):
            members = X[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    return cents


def _sample_vectors(
    corpus: DataFrame, vec_col: str, sample_size: int, seed: int
) -> np.ndarray:
    """Bounded UNIFORM vector sample (the ivf.train_centroids
    discipline: ``sample(fraction)``, never ``limit()`` — limit reads
    the first partitions, which on a source-sorted corpus trains on one
    region only).  The ONLY driver-side materialization in either
    trainer; shared so the two cannot drift."""
    total = corpus.count()
    want = sample_size * 4
    if total <= want:
        rows = corpus.select(vec_col).collect()
    else:
        frac = min(1.0, want * 1.2 / total)
        rows = corpus.select(vec_col).sample(fraction=frac, seed=seed).collect()
    rng = np.random.default_rng(seed)
    take = min(sample_size, len(rows))
    idx = rng.choice(len(rows), size=take, replace=False)
    return np.array([rows[i][0] for i in idx], dtype="float64")


def train_pq_codebooks(
    corpus: DataFrame,
    vec_col: str = "embedding",
    m_subspaces: int = 8,
    n_codes: int = 16,
    sample_size: int = 2048,
    iters: int = 10,
    seed: int = 42,
) -> np.ndarray:
    """Per-subspace k-means codebooks from a bounded uniform sample
    (``_sample_vectors``).  Returns (m_subspaces, n_codes,
    dim // m_subspaces)."""
    X = _sample_vectors(corpus, vec_col, sample_size, seed)
    return _codebooks_from_sample(X, m_subspaces, n_codes, iters, seed)


def train_residual_codebooks(
    corpus: DataFrame,
    centroids: "np.ndarray",
    vec_col: str = "embedding",
    m_subspaces: int = 8,
    n_codes: int = 16,
    sample_size: int = 2048,
    iters: int = 10,
    seed: int = 42,
) -> np.ndarray:
    """Codebooks trained on IVF RESIDUALS ``v - centroid(bucket(v))`` —
    the pairing for ``ivf_adc_top_k(residual=True)`` / IVFPQ (Jégou et
    al., TPAMI 2011).  Same bounded-uniform-sample discipline as
    :func:`train_pq_codebooks` (shared ``_sample_vectors``); the
    residual subtraction happens driver-side on the sample (|sample| ×
    dim floats), never over the corpus."""
    X = _sample_vectors(corpus, vec_col, sample_size, seed)
    # nearest centroid by RAW max dot product — the same assignment rule
    # ivf.assign_buckets applies corpus-side (_nearest_centroid_col)
    buckets = np.argmax(X @ centroids.T, axis=1)
    R = X - centroids[buckets]
    return _codebooks_from_sample(R, m_subspaces, n_codes, iters, seed)


def default_codebooks(
    dim: int = 64,
    m_subspaces: int = 8,
    n_codes: int = 16,
    iters: int = 10,
    seed: int = 42,
    sample_size: int = 2048,
) -> np.ndarray:
    """Data-INDEPENDENT codebooks: k-means on a seeded unit-norm Gaussian
    sample.  For ~unit-scale embeddings this is a serviceable grid, and —
    like the LSH hyperplanes — it lets a SQL oracle embed the identical
    literals regardless of which table the encode later runs on."""
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(sample_size, dim))
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    return _codebooks_from_sample(X, m_subspaces, n_codes, iters, seed)


def _codebooks_from_sample(
    X: np.ndarray, m: int, n_codes: int, iters: int, seed: int
) -> np.ndarray:
    dim = X.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m_subspaces {m}")
    sub = dim // m
    rng = np.random.default_rng(seed + 1)
    books = [
        _kmeans(np.ascontiguousarray(X[:, s * sub : (s + 1) * sub]), n_codes, iters, rng)
        for s in range(m)
    ]
    return np.stack(books)


def _dlit(x: float) -> str:
    """Spark SQL double literal with the exact bits of ``x`` (repr
    round-trips; Double.parseDouble gives the same nearest-double)."""
    r = repr(float(x))
    if r in ("inf", "-inf", "nan"):
        raise ValueError(f"non-finite codeword value {r}")
    return r + "D"


def _sub_argmin_sql(vec_col: str, codebook: np.ndarray, offset: int) -> str:
    """Index of the L2-nearest codeword for one subspace, JVM-side.

    One squared-distance fold per codeword over the sliced vector;
    argmin via ``array_min`` on (distance, index) structs — lexicographic
    min, so ties break to the LOWER index on every engine.

    Emitted as generated SQL (parsed once by ``pq_encode``'s single
    ``F.expr``) rather than per-literal Column calls: m × n_codes × sub
    literal cells at one py4j round-trip each made DataFrame
    CONSTRUCTION the dominant cost of the PQ queries.  The parsed tree —
    slice/zip_with/aggregate fold order, (d, i) struct min — is
    identical, so codes are bit-identical (l35's oracle gate pins it)."""
    # NOTE (r12): an unrolled-literal spelling (the dot_sql treatment)
    # was tried and REVERTED — all m × n_codes × sub squared terms land
    # in ONE encode projection (~2k literal terms × 2 casts each), and
    # janino failed to compile the generated processNext(), killing the
    # query instead of falling back (probed on l36 at sf0.001).  The
    # fold stays here; the unroll lives where term counts are bounded
    # (per-pair cosine dot_sql, the m-term ADC sum).
    structs = []
    for i, c in enumerate(codebook):
        arr = "array(" + ",".join(_dlit(x) for x in c) + ")"
        structs.append(
            "named_struct('d',"
            f"aggregate(zip_with(slice(`{vec_col}`,{offset + 1},{len(c)}),{arr},"
            "(a,b)->(cast(a as double)-b)*(cast(a as double)-b)),"
            "0.0D,(acc,v)->acc+v),"
            f"'i',{i})"
        )
    return f"array_min(array({','.join(structs)})).i"


def pq_encode(
    df: DataFrame,
    codebooks: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    out_col: str = "codes",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Map-only PQ encode: ``(id, *keep_cols, codes array<int>)``."""
    m, _, sub = codebooks.shape
    codes = F.expr(
        "array("
        + ",".join(_sub_argmin_sql(vec_col, codebooks[s], s * sub) for s in range(m))
        + ")"
    )
    return df.select(
        F.col(id_col), *[F.col(c) for c in keep_cols], codes.alias(out_col)
    )


def pq_decode_error(
    df: DataFrame,
    codebooks: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    codes_col: str = "codes",
) -> DataFrame:
    """Per-vector squared reconstruction error of an encode — the
    quantization-quality metric (map-only; used to tune m / n_codes)."""
    m, n_codes, sub = codebooks.shape
    flat = F.array(
        *[
            F.lit(float(x))
            for s in range(m)
            for c in range(n_codes)
            for x in codebooks[s][c]
        ]
    )
    err = F.lit(0.0)
    for s in range(m):
        code = F.element_at(F.col(codes_col), s + 1)
        for j in range(sub):
            rec = F.element_at(
                flat, (F.lit(s * n_codes * sub + j + 1) + code * sub).cast("int")
            )
            x = F.element_at(F.col(vec_col), s * sub + j + 1).cast("double")
            err = err + (x - rec) * (x - rec)
    return df.select(F.col(id_col), err.alias("recon_err2"))


def pq_adc_top_k(
    queries: DataFrame,
    encoded: DataFrame,
    codebooks: np.ndarray,
    k: int = 5,
    query_id: str = "vec_id",
    query_vec: str = "embedding",
    corpus_id: str = "vec_id",
    codes_col: str = "codes",
) -> DataFrame:
    """Asymmetric-distance top-k: exact query vs PQ-coded corpus.

    The per-query lookup table (m × n_codes squared distances) is built
    driver-side from the collected query batch (dimension-sized by the
    ANN contract, the ivf_query_index precedent) and broadcast; scoring
    is one projection over the encoded corpus — ``m`` array reads and a
    fold per row, no vector bytes touched — plus the W-family top-k.
    Returns (query_id, neighbor_id, adc_dist2, rank); rank ascending by
    distance, ties to the lower neighbor id.
    """
    from pgstream_spark.operators.topk import top_k_per_group

    m, n_codes, sub = codebooks.shape
    spark = queries.sparkSession
    qrows = [(r[0], np.asarray(r[1], dtype="float64")) for r in queries.select(query_id, query_vec).collect()]
    luts = []
    for qid, v in qrows:
        lut = [
            float(((v[s * sub : (s + 1) * sub] - codebooks[s][c]) ** 2).sum())
            for s in range(m)
            for c in range(n_codes)
        ]
        luts.append((qid, lut))
    id_type = queries.schema[query_id].dataType.simpleString()
    qdf = spark.createDataFrame(luts, f"query_id {id_type}, __lut array<double>")

    code_idx = F.zip_with(
        F.col(codes_col),
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda c, i: i * n_codes + c + 1,
    )
    dist = F.aggregate(
        F.transform(code_idx, lambda ix: F.element_at("__lut", ix.cast("int"))),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    cand = (
        F.broadcast(qdf)
        .crossJoin(encoded.select(F.col(corpus_id).alias("neighbor_id"), codes_col))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("adc_dist2", dist)
    )
    return top_k_per_group(
        cand,
        ["query_id"],
        [F.col("adc_dist2").asc(), F.col("neighbor_id").asc()],
        k,
        rank_col="rank",
    ).select("query_id", "neighbor_id", "adc_dist2", "rank")


def pq_encode_oracle_sql(
    codebooks: np.ndarray,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB SQL computing the SAME PQ codes as ``pq_encode``:
    full-precision codeword literals, identical left-fold distance
    order, identical (distance, index) lexicographic tie-break — the
    ``lsh_topk_oracle_sql`` discipline.  Codes are emitted CSV-joined
    (the driver gate cannot sort array cells)."""
    m, _, sub = codebooks.shape
    subexprs = []
    for s in range(m):
        structs = []
        for i, c in enumerate(codebooks[s]):
            d2 = " + ".join(
                f"(v[{s * sub + j + 1}]-({float(x)!r}))*(v[{s * sub + j + 1}]-({float(x)!r}))"
                for j, x in enumerate(c)
            )
            structs.append(f"{{'d': {d2}, 'i': {i}}}")
        subexprs.append(f"CAST(list_sort([{', '.join(structs)}])[1].i AS VARCHAR)")
    codes_csv = " || ',' || ".join(subexprs)
    return (
        f"WITH e AS (SELECT {id_col} AS id, "
        f"list_transform({vec_col}, x -> CAST(x AS DOUBLE)) AS v FROM {table}) "
        f"SELECT id AS {id_col}, {codes_csv} AS codes FROM e"
    )
