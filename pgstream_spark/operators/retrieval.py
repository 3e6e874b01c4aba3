"""Keyword retrieval (BM25) and reciprocal-rank fusion.

The reference delegates text search to Postgres (``tsvector``-class
queries); a training-data/RAG pipeline needs the corpus-side ranking
primitives themselves: Okapi BM25 over an inverted term index, and
reciprocal-rank fusion (RRF) to combine a keyword ranking with a vector
ranking — the standard hybrid-search combiner (Cormack et al., the
scheme every production hybrid retriever uses, also the default in
OpenSearch/Elastic hybrid queries).

BM25 here is the classic formula

    score(d) = Σ_{t∈q∩d} ln(1 + (N−df+0.5)/(df+0.5)) ·
               tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))

computed entirely relationally:

* tokenize → (doc, term, tf) hash aggregate (map-side combined);
* document length and the corpus-scalar avgdl are exact integer sums;
* the query-term df table is query-sized → broadcast; the 100 TB corpus
  side streams through ONE join + ONE per-doc aggregate — no shuffle
  carries more than the matched (doc, term) pairs.

Determinism: every input to the score is an exact integer (tf, dl, df,
N) and the float pipeline applies identical IEEE ops on both engines;
the one libm call (``ln``) can differ by 1 ulp, so scores are rounded
(default 4 decimals) and ranks tie-break on the id — the inventory's
standard discipline for cross-engine float reductions.

RRF needs only the two integer ranks: ``1/(k+r_a) + 1/(k+r_b)`` is the
same pair of double divisions on both engines — exact, no rounding
needed.  Missing-from-one-ranking items contribute only the present
side (the usual outer-join convention).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pgstream_spark.operators.terms import term_frequencies
from pgstream_spark.operators.textstats import _tokens

__all__ = ["bm25_scores", "bm25_ranks", "rrf_fusion", "ranking_metrics"]


def bm25_scores(
    df: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    round_digits: int = 4,
) -> DataFrame:
    """Per-document BM25 score against a bag of query terms.

    Returns one row per document matching ≥1 query term: (id, ``score``
    rounded, ``n_matched`` terms).  The query side (terms, their df) is
    broadcast; the corpus side is one tokenize + two hash aggregates.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    tf = term_frequencies(df, text_col=text_col, id_col=id_col)
    dl = df.select(
        F.col(id_col), F.size(_tokens(F.col(text_col))).cast("bigint").alias("dl")
    )
    # `dl` feeds the corpus scalars AND the score join; `qt` feeds the
    # df table AND the score join — each branch pair re-ran its full
    # corpus tokenize without a persist (the dedup-tier discipline).
    # qt is query-bounded; dl persists two compact columns per doc.
    dl = dl.persist()
    # corpus scalars: N and avgdl (exact integer sum / exact count)
    scalars = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    qt = tf.filter(F.col("term").isin(query_terms))
    qt = qt.persist()
    dfreq = qt.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        qt.join(F.broadcast(dfreq), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(scalars))
        .withColumn(
            "_idf",
            F.log(
                1.0
                + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ),
        )
        .withColumn(
            "_s",
            F.col("_idf")
            * (F.col("tf") * (k1 + 1.0))
            / (
                F.col("tf")
                + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
            ),
        )
    )
    return scored.groupBy(id_col).agg(
        F.round(F.sum("_s"), round_digits).alias("score"),
        F.count(F.lit(1)).alias("n_matched"),
    )


def bm25_ranks(
    df: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    **kwargs,
) -> DataFrame:
    """BM25 scores with a deterministic dense ranking (score desc, id asc)."""
    scores = bm25_scores(df, query_terms, text_col=text_col, id_col=id_col, **kwargs)
    w = Window.orderBy(F.col("score").desc(), F.col(id_col).asc())
    return scores.withColumn("rank", F.row_number().over(w))


def rrf_fusion(
    ranks_a: DataFrame,
    ranks_b: DataFrame,
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion of two rankings on a shared id.

    ``rrf = Σ_present 1/(k + rank)``; items absent from one ranking keep
    the other side's contribution (full outer join).  The result carries
    both input ranks (NULL where absent) and a deterministic ``rrf_rank``
    (rrf desc, id asc).

    Note the single-partition ``row_number`` window: ranking is global by
    construction (as in ``bm25_ranks``), correct while fused candidate
    lists are top-k-bounded — fuse *candidates*, not corpora.
    """
    a = ranks_a.select(F.col(id_col), F.col(rank_col).alias("rank_a"))
    bdf = ranks_b.select(F.col(id_col), F.col(rank_col).alias("rank_b"))
    fused = (
        a.join(bdf, id_col, "full_outer")
        .withColumn(
            "rrf",
            F.coalesce(1.0 / (F.lit(k) + F.col("rank_a")), F.lit(0.0))
            + F.coalesce(1.0 / (F.lit(k) + F.col("rank_b")), F.lit(0.0)),
        )
    )
    w = Window.orderBy(F.col("rrf").desc(), F.col(id_col).asc())
    return fused.withColumn("rrf_rank", F.row_number().over(w))


def sparse_cosine_top_k(
    corpus: DataFrame,
    query_pred: Column,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_df: int | None = None,
) -> DataFrame:
    """Lexical cosine top-k via the inverted-index join — similarity
    search with NO embeddings: score(q, d) = tf_q·tf_d / (|tf_q||tf_d|).

    The sparse analogue of `similarity.brute_force_top_k`: instead of a
    query×corpus cross join over dense vectors, documents meet ONLY
    through shared terms (join on ``term``), so cost is Σ_t |P_t(q)|·|P_t|
    — the posting-list sizes, not |q|×|corpus|.  Dot products are exact
    BIGINT sums of term counts; norms are IEEE ``sqrt`` of exact integer
    sums — every score is bit-reproducible on any partitioning (and in
    the DuckDB oracle, l48).

    ``max_df`` is the stop-term guard: terms in more than ``max_df``
    documents are dropped from BOTH sides before the join (impact
    pruning).  At corpus scale the head of the vocabulary ("the") would
    otherwise produce a posting list of nearly |corpus| and a quadratic
    bucket — same discipline as LSH's ``bucket_cap``.  None = exact.

    Returns ``(query_id, neighbor_id, cosine, rank)`` with rank <= k,
    self-matches excluded, ties broken by ascending neighbor id.
    """
    from pyspark.sql import Window

    from pgstream_spark.operators.terms import term_frequencies

    tf = term_frequencies(corpus, text_col=text_col, id_col=id_col)
    if max_df is not None:
        keep = tf.groupBy("term").agg(F.count("*").alias("__df")).filter(
            F.col("__df") <= max_df
        )
        tf = tf.join(keep.select("term"), "term")
    norms = tf.groupBy(id_col).agg(
        F.sqrt(F.sum(F.col("tf") * F.col("tf")).cast("double")).alias("__norm")
    )
    q = corpus.filter(query_pred).select(F.col(id_col).alias("query_id"))
    qtf = tf.join(q, tf[id_col] == q["query_id"]).select(
        "query_id", "term", F.col("tf").alias("__qtf")
    )
    dots = (
        qtf.join(
            tf.select(
                F.col(id_col).alias("neighbor_id"), "term", F.col("tf").alias("__dtf")
            ),
            "term",
        )
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum(F.col("__qtf") * F.col("__dtf")).alias("__dot"))
    )
    scored = (
        dots.join(
            norms.select(F.col(id_col).alias("query_id"), F.col("__norm").alias("__qn")),
            "query_id",
        )
        .join(
            norms.select(
                F.col(id_col).alias("neighbor_id"), F.col("__norm").alias("__dn")
            ),
            "neighbor_id",
        )
        .withColumn(
            "__cos", F.col("__dot").cast("double") / (F.col("__qn") * F.col("__dn"))
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("__cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", F.round("__cos", 6).alias("cosine"), "rank"
        )
    )


def ranking_metrics(
    ranked: DataFrame,
    relevant: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    item_col: str = "neighbor_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Per-query ranking quality: MRR + precision@k of a (query, item,
    rank) ranking against a (query, item) relevance set — the eval-
    harness member that scores RETRIEVAL ORDER, where l65 scores ANN
    candidate RECALL.

    Returns one row per query present in ``ranked``:

    * ``first_rel_rank`` — rank of the first relevant item within the
      top k (0 if none made it);
    * ``rr_micro`` — reciprocal rank in exact micro-units
      (``10^6 DIV first_rel_rank``; 0 if none) — integer arithmetic,
      never a float, so the metric hashes bit-identically on any
      engine (mean MRR is a trivial downstream aggregate);
    * ``rel_at_k`` — relevant items in the top k (precision@k's
      numerator; the denominator is the constant k).

    Scale shape: the ranking is already ≤ k rows per query; one left
    join against the relevance set on (query, item) — both sides
    query-bounded, never corpus-sized — and one per-query aggregate.
    NDCG is deliberately not emitted here: its log2 discount makes the
    metric a float reduction (1-ulp libm hazard) without changing any
    decision MRR/P@k inform at eval time.
    """
    r = ranked.filter(F.col(rank_col) <= k)
    # relevance is a SET: duplicate (query, item) labels in the input
    # would fan out the left join and inflate rel_at_k past k
    rel = (
        relevant.select(query_col, item_col)
        .dropDuplicates([query_col, item_col])
        .withColumn("__rel", F.lit(1))
    )
    j = r.join(rel, [query_col, item_col], "left")
    agg = j.groupBy(query_col).agg(
        F.min(F.when(F.col("__rel") == 1, F.col(rank_col))).alias("__fr"),
        F.sum(F.when(F.col("__rel") == 1, 1).otherwise(0))
        .cast("long")
        .alias(f"rel_at_{k}"),
    )
    return agg.select(
        query_col,
        F.coalesce(F.col("__fr"), F.lit(0)).cast("int").alias("first_rel_rank"),
        F.coalesce(F.expr("1000000 DIV __fr"), F.lit(0))
        .cast("long")
        .alias("rr_micro"),
        f"rel_at_{k}",
    )
